#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB over a given SF dir — the comparison
side of the "no query >2x its DuckDB time" scale criterion.

Usage: python3 tools/bench_duckdb.py <sfDir> <oracleSqlJson> [runs=3]
           [--only name1,name2]

Prints one JSON line: {"queries": {name: median_sec}, "total": sec}.
"""
import json, os, statistics, sys, time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def connect(sf_dir, threads):
    import duckdb
    con = duckdb.connect()
    con.execute(f"SET threads TO {threads}")
    # spill under the repo's .tmp, never into the SF dir itself —
    # /root/testdata is read-only by contract
    con.execute("SET temp_directory='/root/repo/.tmp/duckdb_spill'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 and sys.argv[3].isdigit() else 3
    # 16 threads is DuckDB's BEST setting for this catalog, not a
    # handicap: at 32 threads the big pair joins (dd05/dd07) spill to
    # disk-death at sf1 (see check_oracle.py). DUCKDB_THREADS overrides.
    threads = int(os.environ.get("DUCKDB_THREADS", 16))
    con = connect(sf_dir, threads)
    oracle = json.load(open(oracle_path))
    if "--only" in sys.argv:
        keep = set(sys.argv[sys.argv.index("--only") + 1].split(","))
        oracle = {k: v for k, v in oracle.items() if k in keep}
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
                # an OOM'd query leaves the shared connection's buffer
                # pool full — every later big query then fails too.
                # Reconnect (dropping the old instance and collecting,
                # or the dead pool's memory still counts), and give
                # this query one retry at the flipped thread count
                # (ss08 passes at 32, not 16).
                import gc
                def fresh(n):
                    gc.collect()
                    return connect(sf_dir, n)
                con.close(); con = None
                flipped = 32 if threads == 16 else 16
                try:
                    con = fresh(flipped)
                    t0 = time.time()
                    con.execute(sql).fetchall()
                    times.append(time.time() - t0)
                    print(f"RETRY-OK {name} at {flipped} threads "
                          f"({times[-1]:.1f}s)", file=sys.stderr)
                except Exception as e2:
                    print(f"ERR {name} (retry): {e2}", file=sys.stderr)
                finally:
                    if con is not None:
                        con.close()
                    con = fresh(threads)
                break
        ok = [t for t in times[1:] if t >= 0]
        out[name] = round(statistics.median(ok), 4) if ok else -1.0
        print(f"{name}: {out[name]}", file=sys.stderr, flush=True)
    total = sum(v for v in out.values() if v >= 0)
    print(json.dumps({"queries": out, "total": round(total, 2)}))


if __name__ == "__main__":
    main()
