#!/usr/bin/env python3
"""Emit BENCHRATIO.md: per-query engine (Spark) vs oracle (DuckDB)
seconds on the same parquet tables — the durable record of the
campaign comparison that previously lived across wipeable .tmp logs.

One invocation regenerates everything it needs:

    python3 tools/bench_ratio.py /root/repo/.tmp/sf1

  1. Spark side: runs `graft.Bench` at the given SF dir (medians over
     --runs measured runs) unless --bench-json points at an existing
     Bench line for that dir.
  2. DuckDB side: times each `SparkEntry.oracleSql` query (sourced
     from a Verify dump's oracle_sql.json; --oracle-json overrides,
     otherwise `sbt runMain graft.Verify` produces one) once on the
     same tables, with check_oracle's thread/memory discipline.
  3. Writes BENCHRATIO.md (or --out) with per-query seconds, the
     ratio, totals, and win counts.

DuckDB timings are single-shot (its run-to-run variance is small and
the campaign cost is dominated by the heavy replays); a query that
errors or exceeds --oracle-timeout is recorded as such, not dropped.
"""
import argparse
import calendar
import hashlib
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle import data_fingerprint  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Rows where the two sides do structurally different work, so the
# ratio is not a plan comparison; kept in the table (the numbers are
# honest) but footnoted and excluded from the headline totals.
ASYMMETRIC = {
    "in07_binary_scan":
        "Spark side STAGES ~N/10 loose binary files and re-scans them "
        "(the landing-zone seam under test); DuckDB reads the parquet "
        "original directly",
    "in08_manifest_scan":
        "Spark side writes shard JSON files + manifest then audits "
        "them; DuckDB aggregates the parquet original directly",
    "in09_curation_e2e":
        "Spark side runs the full E2E pipeline (landing zone, dedup "
        "index writes, registry commits, shard pack); DuckDB replays "
        "only the final counts",
    "mm06_real_image_decode":
        "Spark side runs REAL codecs (JDK PNG/BMP encode + javax.imageio "
        "decode per payload); DuckDB recomputes the decoded facts from "
        "the fixture arithmetic without any codec",
    "mm07_real_audio_decode":
        "Spark side runs REAL codecs (JDK WAV encode + javax.sound "
        "parse per payload); DuckDB recomputes the decoded facts from "
        "the fixture arithmetic without any codec",
    "x34_approx_quantiles":
        "Spark side runs the approx-percentile SKETCH, the exact "
        "percentile, AND a full rank-count verification join (the row's "
        "point is pinning the estimator inside its error bound); DuckDB "
        "replays only the exact PERCENTILE_CONT side of that contract",
}

# Rows whose loss against DuckDB is a structural floor, not a plan
# defect — each gets an in-artifact analysis section (the x24
# adjudication pattern, VERDICT r11 item 9 / r12 item 2). Keyed by
# query name; the value renders given (this_row, all_rows).
def _x24_floor(row, rows):
    q01 = next((r for r in rows if r[0] == "q01_group_agg"), None)
    scan = f"{q01[1]:.2f} s" if q01 else "~0.7 s"
    return (
        f"This campaign: Spark {row[1]:.2f} s vs DuckDB {row[2]:.2f} s "
        f"(ratio {row[3]:.2f}x). Structure: `Quantiles.madOutliers` is "
        f"TWO corpus scans total (one codegen'd IEEE-bits histogram "
        f"aggregation, one bounded terminal collect) — exact "
        f"median+MAD+outlier selection cannot use fewer than two exact "
        f"scans without a sort. The per-scan floor on this host is "
        f"q01's single scan+agg of the same table at {scan}; a 2-scan "
        f"selection therefore bottoms out near 2x that, which is where "
        f"the current number sits. DuckDB's advantage on this row is a "
        f"fused single-node quantile over a table that fits in its "
        f"buffer pool; at 100 TB the histogram-selection shape (shuffle "
        f"O(cells), no sort, no per-group buffers) is the one that "
        f"survives.")


def _x35_floor(row, rows):
    q01 = next((r for r in rows if r[0] == "q01_group_agg"), None)
    scan = f"{q01[1]:.2f} s" if q01 else "~0.7 s"
    return (
        f"This campaign: Spark {row[1]:.2f} s vs DuckDB {row[2]:.2f} s "
        f"(ratio {row[3]:.2f}x). Structure: three EXACT COUNT(DISTINCT) "
        f"aggregates in one aggregation plan Expand the scanned rows 4x "
        f"(one replica per distinct branch + one for the plain "
        f"aggregates) — a deliberate ONE-physical-pass profile of the "
        f"table. The floor is therefore ~4x q01's single scan+agg "
        f"({scan} this campaign), which is where the number sits. "
        f"DuckDB wins locally by running the oracle's THREE separate "
        f"scans against a buffer-pool-resident table; at 100 TB one "
        f"pass at 4x row weight beats three passes over cold storage, "
        f"and the Expand's shuffle carries only per-partition distinct "
        f"values, not the 4x row stream. Splitting the distincts into "
        f"three scans would win this toy-scale row and lose the "
        f"production shape — kept as is, documented here.")


FLOOR_NOTES = {
    "x24_mad_outliers": ("x24_mad_outliers floor analysis (r11 VERDICT item 9)",
                         _x24_floor),
    "x35_profile": ("x35_profile floor analysis (r12 VERDICT item 2)",
                    _x35_floor),
}


# A canary stamp older than this says nothing about THIS measurement
# window; a stale (or absent) stamp must not silently flip the Spark
# aggregate to min-of-runs (the Spark-favorable choice) — that switch
# requires EVIDENCE of degradation, not absence of evidence.
CANARY_MAX_AGE_S = 6 * 3600


def read_canary():
    """Latest tools/bench_canary.py stamp, or None — every artifact
    header carries the host-health verdict it was generated under.
    Stale stamps (> CANARY_MAX_AGE_S) come back with stale=True and are
    treated as absent for aggregate selection."""
    try:
        c = json.load(open("/root/repo/.tmp/canary_last.json"))
    except Exception:
        return None
    try:
        age = time.time() - calendar.timegm(
            time.strptime(c.get("ts", ""), "%Y-%m-%dT%H:%M:%SZ"))
        c["age_s"] = int(age)
        c["stale"] = not (-300 <= age <= CANARY_MAX_AGE_S)
    except Exception:
        c["stale"] = True
    return c


def run_bench(sf_dir, runs):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_BENCH_RUNS=str(runs),
               # campaigns manage their own wall-clock; the global
               # deadline exists for the driver's bare invocation
               SPARK_GRAFT_BENCH_DEADLINE_SEC="100000",
               SPARK_GRAFT_SF1="0")
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       cwd="/root/repo", env=env, capture_output=True, text=True)
    for line in reversed(r.stdout.splitlines()):
        if '"spread"' in line:
            return json.loads(line)
    print(r.stdout[-3000:], r.stderr[-3000:])
    sys.exit("bench produced no JSON line")


def ensure_oracle_json(sf_dir, work_dir, expected=()):
    p = os.path.join(work_dir, "oracle_sql.json")
    # a cached dump from an older catalog silently drops the newest
    # queries' DuckDB side — regenerate when any benched query is absent
    if os.path.exists(p):
        cached = json.load(open(p))
        if any(q not in cached for q in expected):
            os.remove(p)
    if not os.path.exists(p):
        env = dict(os.environ, SPARK_GRAFT_CPUS="8", SPARK_GRAFT_SQL_ONLY="1")
        r = subprocess.run(
            ["sbt", "-batch", f"runMain graft.Verify {sf_dir} {work_dir}"],
            cwd="/root/repo", env=env, capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stdout[-3000:], r.stderr[-3000:])
            sys.exit("verify failed")
    return json.load(open(p))


def duckdb_times(sf_dir, oracle, spill_dir, threads, mem, timeout_s, max_spill,
                 progress_path=None):
    """Single-shot DuckDB timings with CRASH-RESUMABLE progress: each
    completed query is appended to `progress_path`, and entries already
    there are skipped. DuckDB is embedded in-process, so its
    allocation-cascade failure mode (r12: tiny-block bad_alloc ~100
    queries into a campaign, process heap poisoned beyond reconnects)
    can only be cured by a FRESH process — the outer loop in
    run_campaigns.sh reruns this script until every query has a row.

    Progress keying (r13): the file is {"config": fp, "rows": {name:
    {"sql": sha16, "v": seconds-or-string}}}. `config` fingerprints the
    parquet data (check_oracle.data_fingerprint) plus mem/threads/
    timeout/spill-cap — a rerun against regenerated data or different
    resource limits starts FRESH instead of silently reusing stale
    timings. Per-row `sql` hash re-measures any query whose oracle SQL
    changed. "error:"/"timeout:" rows are DROPPED on load so a fresh
    process re-measures them (the cascade failure poisons whole
    suffixes of a campaign); "spill-cap:" rows persist — a rerun under
    the SAME cap would deterministically grind to the same ceiling.
    """
    import duckdb
    import threading

    config_fp = hashlib.sha256(
        f"{data_fingerprint(sf_dir)}|{mem}|{threads}|{timeout_s}|{max_spill}"
        .encode()).hexdigest()[:16]

    def sql_fp(sql):
        return hashlib.sha256(sql.encode()).hexdigest()[:16]

    def connect(n_threads):
        c = duckdb.connect()
        c.execute(f"SET threads TO {n_threads}")
        c.execute(f"SET memory_limit='{mem}'")
        c.execute(f"SET temp_directory='{spill_dir}'")
        # hard spill ceiling: a runaway recursive/pair materialization
        # aborts its own query instead of filling the disk for the box
        c.execute(f"SET max_temp_directory_size='{max_spill}'")
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(p):
                c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
            elif os.path.exists(p):
                c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        return c

    rows = {}
    if progress_path and os.path.exists(progress_path):
        try:
            stored = json.load(open(progress_path))
        except Exception:
            stored = {}
        if stored.get("config") == config_fp:
            for name, r in stored.get("rows", {}).items():
                v = r.get("v")
                if isinstance(v, str) and (v.startswith("error:")
                                           or v.startswith("timeout:")):
                    continue  # re-measure in this fresh process
                rows[name] = r
            print(f"[duckdb] resuming: {len(rows)} rows already measured",
                  flush=True)
        else:
            print("[duckdb] progress file is for a different data/config "
                  "fingerprint (or pre-r13 format) — starting fresh", flush=True)

    def save():
        if progress_path:
            tmp = progress_path + ".tmp"
            json.dump({"config": config_fp, "rows": rows}, open(tmp, "w"))
            os.replace(tmp, progress_path)

    out = {}  # name -> seconds-or-string, for the caller

    con = connect(threads)
    done_since_recycle = 0
    for name, sql in sorted(oracle.items()):
        if name in rows and rows[name].get("sql") == sql_fp(sql):
            out[name] = rows[name]["v"]
            continue
        # proactive connection recycle: bound buffer-pool accumulation
        # across a ~190-query campaign (the cascade precondition)
        if done_since_recycle >= 20:
            try:
                con.close()
            except Exception:
                pass
            con = connect(threads)
            done_since_recycle = 0
        done_since_recycle += 1
        t0 = time.time()
        # cooperative per-query timeout: interrupt() makes the running
        # execute() raise InterruptException; the connection survives
        timer = threading.Timer(timeout_s, con.interrupt)
        timer.start()
        try:
            con.execute(sql).fetchall()
            out[name] = time.time() - t0
        except duckdb.InterruptException:
            out[name] = f"timeout: >{timeout_s}s"
        except Exception as e:
            # same resource-retry discipline as check_oracle: flip the
            # thread count on a fresh connection, rebuild the main one.
            # A spill-cap abort is NOT retried — the retry would just
            # grind to the same ceiling again.
            if "max_temp_directory_size" in str(e):
                out[name] = f"spill-cap: >{max_spill}"
            elif any(s in str(e) for s in ("Out of Memory", "No space left")):
                try:
                    con.close()
                except Exception:
                    pass
                con = connect(threads)
                flipped = 32 if threads == 16 else 16
                try:
                    c2 = connect(flipped)
                    t0 = time.time()
                    t2 = threading.Timer(timeout_s, c2.interrupt)
                    t2.start()
                    try:
                        c2.execute(sql).fetchall()
                        out[name] = time.time() - t0
                    finally:
                        t2.cancel()
                    c2.close()
                except duckdb.InterruptException:
                    out[name] = f"timeout: >{timeout_s}s"
                except Exception as e2:
                    out[name] = f"error: {type(e2).__name__}"
            else:
                out[name] = f"error: {type(e).__name__}"
        finally:
            timer.cancel()
            if name in out:
                rows[name] = {"sql": sql_fp(sql), "v": out[name]}
                save()
        print(f"[duckdb] {name}: {out[name] if isinstance(out[name], str) else '%.2fs' % out[name]}",
              flush=True)
    save()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--bench-json", help="existing Bench JSON line file for sf_dir")
    ap.add_argument("--oracle-json", help="existing oracle_sql.json (a Verify dump)")
    ap.add_argument("--out", default="/root/repo/BENCHRATIO.md")
    ap.add_argument("--work", default="/root/repo/.tmp/bench_ratio_work")
    ap.add_argument("--threads", type=int, default=int(os.environ.get("GRAFT_ORACLE_THREADS", 16)))
    ap.add_argument("--mem", default=os.environ.get("GRAFT_ORACLE_MEM", "48GB"))
    ap.add_argument("--oracle-timeout", type=int, default=600,
                    help="per-query DuckDB wall-clock cap in seconds")
    ap.add_argument("--max-spill", default="40GB",
                    help="DuckDB max_temp_directory_size ceiling")
    ap.add_argument("--agg", choices=["auto", "median", "min"], default="auto",
                    help="per-query Spark aggregate: auto = median on a "
                    "healthy canary, min-of-runs on a degraded one (the "
                    "NOTES measurement-discipline policy)")
    a = ap.parse_args()
    os.makedirs(a.work, exist_ok=True)

    canary = read_canary()
    # min-of-runs requires EVIDENCE of degradation: a missing or stale
    # stamp defaults to median (ADVICE r12 — absence of a canary must
    # not select the Spark-favorable aggregate)
    fresh = canary is not None and not canary.get("stale")
    degraded = fresh and canary.get("status") != "healthy"
    agg = a.agg if a.agg != "auto" else ("min" if degraded else "median")

    if a.bench_json:
        bench = json.load(open(a.bench_json))
    else:
        bench = run_bench(a.sf_dir, a.runs)
    if agg == "min":
        # min-of-runs: one-sided I/O-latency jitter only ADDS time, so
        # the minimum best estimates the un-stalled cost on a degraded
        # host; the medians stay readable in .tmp/bench_last.json
        spark = {k: v.get("min", -1.0) for k, v in bench.get("spread", {}).items()}
    else:
        spark = bench["queries"]

    if a.oracle_json:
        oracle = json.load(open(a.oracle_json))
    else:
        oracle = ensure_oracle_json(a.sf_dir, a.work, expected=spark.keys())
    oracle = {k: v for k, v in oracle.items() if k in spark}

    duck = duckdb_times(a.sf_dir, oracle, f"{a.work}/duckdb_spill", a.threads, a.mem,
                        a.oracle_timeout, a.max_spill,
                        progress_path=f"{a.work}/duck_progress.json")

    rows = []
    for q in sorted(spark):
        s = spark[q]
        d = duck.get(q)
        if isinstance(d, float) and s >= 0:
            rows.append((q, s, d, d / s if s > 0 else float("inf")))
        else:
            rows.append((q, s, d, None))
    ok = [r for r in rows if r[3] is not None and r[0] not in ASYMMETRIC]
    s_tot = sum(r[1] for r in ok)
    d_tot = sum(r[2] for r in ok)
    wins = sum(1 for r in ok if r[1] < r[2])

    with open(a.out, "w") as f:
        f.write("# BENCHRATIO — engine (Spark) vs oracle (DuckDB), same queries, same parquet\n\n")
        f.write(f"- SF dir: `{a.sf_dir}`  \n")
        f.write(f"- Generated: {time.strftime('%Y-%m-%d %H:%M:%S')} by `tools/bench_ratio.py` "
                f"(Spark = {agg} of {bench.get('runs', '?')} runs at local[32]; "
                f"DuckDB = single run, {a.threads} threads, {a.mem} cap, "
                f"{a.oracle_timeout}s/query timeout, {a.max_spill} spill ceiling)  \n")
        if canary:
            f.write(f"- **Host canary** (`tools/bench_canary.py`, {canary.get('ts')}): "
                    f"x42 sf10 {canary.get('x42_sf10')} s (bar {canary.get('x42_max')}), "
                    f"ss19 sf10 {canary.get('ss19_sf10')} s (bar {canary.get('ss19_max')}) "
                    f"→ **{canary.get('status', '?').upper()}**"
                    + (f" — stamp STALE (age {canary.get('age_s', '?')} s > "
                       f"{CANARY_MAX_AGE_S} s): treated as absent; medians "
                       "recorded" if canary.get("stale") else "")
                    + (". Per the measurement-discipline policy (NOTES.md) the "
                       "Spark side records MIN-of-runs (one-sided I/O jitter "
                       "only adds time); DuckDB single-shots ran on the same "
                       "degraded host, unadjusted.  \n" if agg == "min" else ".  \n"))
        else:
            f.write("- Host canary: NOT RUN before this campaign (no stamp file); "
                    "medians recorded.  \n")
        f.write(f"- **Totals over {len(ok)} comparable queries: Spark {s_tot:.1f} s, "
                f"DuckDB {d_tot:.1f} s — ratio {d_tot / s_tot:.2f}x; "
                f"Spark outright faster on {wins}/{len(ok)}.** "
                f"Rows marked † do structurally different work per side "
                f"(footnotes below) and are excluded from these totals.\n\n")
        f.write("| query | spark s | duckdb s | duckdb/spark |\n|---|---|---|---|\n")
        for q, s, d, ratio in sorted(rows, key=lambda r: -(r[3] or -1)):
            ds = f"{d:.2f}" if isinstance(d, float) else (d or "—")
            rs = f"{ratio:.2f}" if ratio is not None else "—"
            mark = " †" if q in ASYMMETRIC else ""
            f.write(f"| {q}{mark} | {s:.2f} | {ds} | {rs} |\n")
        f.write("\n## † asymmetric-compare rows (honest numbers, not plan comparisons)\n\n")
        for q in sorted(ASYMMETRIC):
            f.write(f"- **{q}** — {ASYMMETRIC[q]}.\n")
        for qname, (title, render) in FLOOR_NOTES.items():
            row = next((r for r in rows if r[0] == qname), None)
            if row and row[3] is not None:
                f.write(f"\n## {title}\n\n{render(row, rows)}\n")
    print(f"wrote {a.out}: Spark {s_tot:.1f}s vs DuckDB {d_tot:.1f}s over {len(ok)} queries")


if __name__ == "__main__":
    main()
