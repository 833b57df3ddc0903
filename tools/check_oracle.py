#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate:
run graft.Verify at a given SF dir, then run each oracle SQL in DuckDB
over the same parquet tables and compare results.

Usage: python3 tools/check_oracle.py <sfDir> <outDir> [--skip-verify]
           [--only name1,name2] [--no-cache]

DuckDB results are CACHED keyed on (query name, SQL text hash, data
fingerprint): a full-catalog re-sweep whose SQL and parquet inputs are
unchanged re-pays only the engine side — dd05's 19-minute recursive-CC
replay (SWEEP_SF1_r11.log) runs once per (SQL, data) combination, not
once per sweep. Any SQL edit or data regeneration changes the key and
re-runs that row. --no-cache disables both read and write.
"""
import hashlib, json, math, os, pickle, subprocess, sys, time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

CACHE_DIR = "/root/repo/.tmp/oracle_cache"


def data_fingerprint(sf_dir):
    """Hash of (relative path, size, mtime_ns) over every parquet file
    of every table — regeneration or replacement changes the key."""
    h = hashlib.sha256()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        files = []
        if os.path.isdir(p):
            for root, _, names in os.walk(p):
                files += [os.path.join(root, n) for n in names]
        elif os.path.exists(p):
            files = [p]
        for fp in sorted(files):
            st = os.stat(fp)
            h.update(f"{os.path.relpath(fp, sf_dir)}|{st.st_size}|{st.st_mtime_ns}\n".encode())
    return h.hexdigest()[:16]


def cache_path(name, sql, data_fp):
    key = hashlib.sha256(f"{hashlib.sha256(sql.encode()).hexdigest()}|{data_fp}".encode()).hexdigest()[:16]
    return os.path.join(CACHE_DIR, f"{name}.{key}.pkl")


def cache_load(name, sql, data_fp):
    p = cache_path(name, sql, data_fp)
    try:
        with open(p, "rb") as f:
            return pickle.load(f)
    except Exception:
        return None


def cache_store(name, sql, data_fp, cols, rows):
    os.makedirs(CACHE_DIR, exist_ok=True)
    p = cache_path(name, sql, data_fp)
    # keep a few keys per query name (sf0.01 driver gate + sf1/sf10
    # sweeps coexist without thrashing); evict oldest beyond that
    siblings = sorted(
        (os.path.join(CACHE_DIR, f) for f in os.listdir(CACHE_DIR)
         if f.startswith(name + ".") and f.endswith(".pkl") and f != os.path.basename(p)),
        key=os.path.getmtime)
    for old in siblings[:max(0, len(siblings) - 3)]:
        try:
            os.remove(old)
        except OSError:
            pass
    tmp = p + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump((cols, rows), f)
    os.replace(tmp, p)


def norm(v):
    # exact compare by default: every catalog query is engineered to be
    # bit-identical to its oracle (decimal-cast sums, shared rounding
    # semantics). NaN normalization only.
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    if "--skip-verify" not in sys.argv:
        env = dict(os.environ, SPARK_GRAFT_CPUS="8")
        # --only narrows BOTH sides: without this, Verify reruns the
        # whole catalog while the DuckDB compare checks two queries
        if "--only" in sys.argv and "SPARK_GRAFT_ONLY" not in os.environ:
            env["SPARK_GRAFT_ONLY"] = sys.argv[sys.argv.index("--only") + 1]
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
            cwd="/root/repo", env=env, capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stdout[-4000:], r.stderr[-4000:])
            sys.exit(1)
        for line in r.stdout.splitlines():
            if "[verify]" in line:
                print(line)
    import duckdb
    con = duckdb.connect()
    # 16 threads, not the machine's 32: DuckDB's partitioned hash
    # joins hold per-thread build state, and at 32 threads the dd07
    # gram-intersection join at sf1 spills >79 GB and dies, where 16
    # threads stream it in 30 s. Override via GRAFT_ORACLE_THREADS.
    threads = int(os.environ.get("GRAFT_ORACLE_THREADS", 16))

    # explicit memory cap (GRAFT_ORACLE_MEM overrides): DuckDB's
    # default budget is 80% of RAM and ignores what the OS already
    # holds — at sf1 the heavy window replays then die on process-level
    # allocation failure ("Failed to allocate block of 8 bytes"
    # cascades) that no in-process retry survives. A hard cap makes
    # DuckDB spill to temp_directory or abort the QUERY cleanly
    # instead of taking the process down.
    mem = os.environ.get("GRAFT_ORACLE_MEM", "48GB")

    def setup(c, n_threads):
        c.execute(f"SET threads TO {n_threads}")
        c.execute(f"SET memory_limit='{mem}'")
        c.execute(f"SET temp_directory='{out_dir}/duckdb_spill'")
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(p):  # GenData-scaled tables are parquet dirs
                c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
            elif os.path.exists(p):
                c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    setup(con, threads)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if "--only" in sys.argv:
        keep = set(sys.argv[sys.argv.index("--only") + 1].split(","))
        oracle = {k: v for k, v in oracle.items() if k in keep}
    use_cache = "--no-cache" not in sys.argv
    data_fp = data_fingerprint(sf_dir) if use_cache else None
    n_pass = n_fail = n_hit = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        t0 = time.time()
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark output", flush=True)
            n_fail += 1
            continue
        cached = cache_load(name, sql, data_fp) if use_cache else None
        def evaluate(c):
            got = c.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
            gc = sorted(got.columns)
            gr = c.execute(
                f"SELECT {', '.join(gc)} FROM '{res_dir}/*.parquet'").fetchall()
            if cached is not None:
                ec, er = cached
            else:
                exp = c.sql(sql)
                ec = sorted(exp.columns)
                er = c.execute(f"SELECT {', '.join(ec)} FROM ({sql})").fetchall()
            return gc, gr, ec, er
        try:
            try:
                got_cols, got_rows, exp_cols, exp_rows = evaluate(con)
            except Exception as e:
                # DuckDB's memory behavior is thread-count sensitive in
                # BOTH directions at sf1: dd07's gram join spills to
                # death at 32 threads but streams at 16, while ss08's
                # Lloyd replay OOMs at 16 but passes at 32. Retry a
                # resource failure once at the flipped thread count, on
                # a FRESH connection (the failed attempt leaves the
                # buffer pool full; a retry on the same connection
                # fails again even at the good thread count). The MAIN
                # connection is also rebuilt: an OOM'd buffer pool
                # otherwise poisons every later query in the run
                # ("Failed to allocate block of 8 bytes" cascades).
                if not any(s in str(e) for s in ("Out of Memory", "No space left")):
                    raise
                flipped = 32 if threads == 16 else 16
                print(f"RETRY {name} at {flipped} threads: {e}", flush=True)
                try:
                    con.close()
                except Exception:
                    pass
                con = duckdb.connect()
                setup(con, threads)
                con2 = duckdb.connect()
                try:
                    setup(con2, flipped)
                    got_cols, got_rows, exp_cols, exp_rows = evaluate(con2)
                finally:
                    con2.close()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if use_cache and cached is None:
            cache_store(name, sql, data_fp, exp_cols, exp_rows)
        if cached is not None:
            n_hit += 1
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
            continue
        g = [tuple(norm(v) for v in r) for r in got_rows]
        e = [tuple(norm(v) for v in r) for r in exp_rows]
        if g == e:
            hit = " [oracle cached]" if cached is not None else ""
            print(f"PASS {name} ({len(g)} rows, {time.time()-t0:.1f}s){hit}", flush=True)
            n_pass += 1
        elif sorted(map(repr, g)) == sorted(map(repr, e)):
            print(f"WARN {name}: rows match only after sorting ({len(g)} rows)",
                  flush=True)
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: {len(g)} vs {len(e)} rows")
            diff = [(a, b) for a, b in zip(g, e) if a != b][:3]
            for a, b in diff:
                print(f"  spark:  {a}\n  oracle: {b}")
    print(f"\n{n_pass} pass, {n_fail} fail"
          + (f" ({n_hit} oracle-cache hits)" if use_cache else " (cache off)"))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
