#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB over a given SF dir — the comparison
side of the "no query >2x its DuckDB time" scale criterion.

Usage: python3 tools/bench_duckdb.py <sfDir> <oracleSqlJson> [runs=3]

Prints one JSON line: {"queries": {name: median_sec}, "total": sec}.
DuckDB gets the same 32 threads Spark's local[32] bench uses.
"""
import json, os, statistics, sys, time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    import duckdb
    con = duckdb.connect()
    # 16 threads is DuckDB's BEST setting for this catalog, not a
    # handicap: at 32 threads the big pair joins (dd05/dd07) spill to
    # disk-death at sf1 (see check_oracle.py). DUCKDB_THREADS overrides.
    con.execute(f"SET threads TO {os.environ.get('DUCKDB_THREADS', 16)}")
    con.execute(f"SET temp_directory='{sf_dir}/duckdb_spill'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(oracle_path))
    out = {}
    for name, sql in sorted(oracle.items()):
        times = []
        for _ in range(runs + 1):  # first run warms the page cache
            t0 = time.time()
            try:
                con.execute(sql).fetchall()
                times.append(time.time() - t0)
            except Exception as e:
                print(f"ERR {name}: {e}", file=sys.stderr)
                times.append(-1.0)
                break
        ok = [t for t in times[1:] if t >= 0]
        out[name] = round(statistics.median(ok), 4) if ok else -1.0
        print(f"{name}: {out[name]}", file=sys.stderr)
    total = sum(v for v in out.values() if v >= 0)
    print(json.dumps({"queries": out, "total": round(total, 2)}))


if __name__ == "__main__":
    main()
