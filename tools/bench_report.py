#!/usr/bin/env python3
"""Render a BENCH json line against the BASELINE.md targets and DuckDB
on the same data.

Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Bench" | tools/bench_report.py <sfDir>
   or: tools/bench_report.py <sfDir> <bench.json>
"""
import json, os, sys, time


def parse_bench(text):
    """Bench prints TWO JSON lines (full line with "queries"/"spread",
    then a <1 KB compact summary without them). Accept either a piped
    stream or a file containing both: scan lines in reverse and return
    the first that parses AND carries the per-query map."""
    for l in reversed(text.splitlines()):
        if '"metric"' not in l:
            continue
        try:
            d = json.loads(l[l.index("{"):])
        except (ValueError, json.JSONDecodeError):
            continue
        if "queries" in d:
            return d
    raise SystemExit("no Bench JSON line with a 'queries' map found "
                     "(grep '\"spread\"' selects the full line)")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    if len(sys.argv) > 2:
        text = open(sys.argv[2]).read()
    else:
        text = sys.stdin.read()
    d = parse_bench(text)
    q = d["queries"]

    import duckdb
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle_path = "/tmp/graft_bench_oracle/oracle_sql.json"
    duck = {}
    if os.path.exists(oracle_path):
        oracle = json.load(open(oracle_path))
        for name, sql in oracle.items():
            t0 = time.time()
            try:
                con.execute(sql).fetchall()
                duck[name] = time.time() - t0
            except Exception:
                pass

    print(f"## BENCH vs BASELINE ({sf_dir})\n")
    print(f"Total: {d['value']:.1f}s across {len(q)} queries\n")
    targets = [
        ("B2 flagship 5-CTE < 10s", "q14_flagship_changes", 10),
        ("B3 latest-active < 2s", "q17_latest_active", 2),
        ("B4 EXCEPT diff < 10s", "q09_except", 10),
        ("B5 calendar build < 5s", "q13_calendar", 5),
    ]
    for label, name, limit in targets:
        v = q.get(name, -1)
        status = "MET" if 0 <= v < limit else "MISSED"
        print(f"- {label}: {v:.2f}s [{status}]")
    print("\n| query | spark s | duckdb s |")
    print("|---|---|---|")
    for k in sorted(q, key=lambda k: -q[k]):
        ds = f"{duck[k]:.2f}" if k in duck else "-"
        print(f"| {k} | {q[k]:.2f} | {ds} |")


if __name__ == "__main__":
    main()
