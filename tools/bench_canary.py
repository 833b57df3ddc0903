#!/usr/bin/env python3
"""Host-health canary gate for the timing campaigns (the r10
degraded-host policy, now scripted instead of manual):

    python3 tools/bench_canary.py          # exit 0 = healthy, 1 = sick

Runs two sf10 probes that bracket the failure mode observed in r10
(virtio shuffle-write latency stalls that inflate disk-touching
queries 2-8x while CPU canaries stay green):

  - x42_bootstrap_ci   — no-shuffle CPU/scan reference; moved only
                         ~25% on the degraded host
  - ss19_capped_multiprobe (ISOLATED) — the shuffle-write-heavy probe
                         that swung 11.4 -> 78.3 s on identical
                         4362 MB shuffle volume

Thresholds are the healthy-machine readings plus headroom (NOTES r10:
x42 ~4.9 s, ss19 ~8.5 s healthy). Campaigns (bench_scaling,
bench_ratio, the closing bench) must run only after this exits 0; a
sick verdict means record min-of-runs medians with an explicit note
or wait, never commit a polluted artifact.
"""
import argparse
import json
import os
import subprocess
import sys
import time

# Every timing artifact embeds the latest canary verdict (VERDICT r11
# "What's wrong" #1: the closing bench carried no in-artifact host
# note). Bench.scala and the campaign generators read this file.
STAMP = "/root/repo/.tmp/canary_last.json"


def bench(sf_dir, only, runs, timeout_s):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_BENCH_RUNS=str(runs),
               SPARK_GRAFT_ONLY=only,
               SPARK_GRAFT_QUERY_TIMEOUT=str(timeout_s))
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       cwd="/root/repo", env=env, capture_output=True, text=True)
    for line in reversed(r.stdout.splitlines()):
        if '"spread"' in line:
            return json.loads(line)
    print(r.stdout[-2000:], r.stderr[-2000:])
    sys.exit(f"canary bench produced no JSON line ({only})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf10-dir", default="/root/repo/.tmp/sf10")
    ap.add_argument("--x42-max", type=float, default=5.6)
    ap.add_argument("--ss19-max", type=float, default=12.0)
    ap.add_argument("--runs", type=int, default=2)
    a = ap.parse_args()
    if not os.path.exists(os.path.join(a.sf10_dir, "lineitem.parquet")):
        sys.exit(f"sf10 notch missing at {a.sf10_dir} (run tools/bench_scaling.py "
                 "or GenData first)")

    x42 = bench(a.sf10_dir, "x42_bootstrap_ci", a.runs, 180)
    t_x42 = x42["queries"].get("x42_bootstrap_ci", -1.0)
    print(f"[canary] x42_bootstrap_ci sf10: {t_x42:.2f} s "
          f"(max {a.x42_max}) spread={x42['spread']['x42_bootstrap_ci']['sec']}")

    ss19 = bench(a.sf10_dir, "ss19_capped_multiprobe", a.runs, 300)
    t_ss19 = ss19["queries"].get("ss19_capped_multiprobe", -1.0)
    print(f"[canary] ss19_capped_multiprobe sf10 (isolated): {t_ss19:.2f} s "
          f"(max {a.ss19_max}) spread={ss19['spread']['ss19_capped_multiprobe']['sec']}")

    healthy = 0 <= t_x42 <= a.x42_max and 0 <= t_ss19 <= a.ss19_max
    print(f"[canary] verdict: {'HEALTHY' if healthy else 'SICK'}")
    # one compact line, < 600 chars (Bench.scala's embed guard): probe
    # seconds, bars, verdict, timestamp — the in-artifact host stamp
    stamp = {
        "x42_sf10": round(t_x42, 2), "ss19_sf10": round(t_ss19, 2),
        "x42_max": a.x42_max, "ss19_max": a.ss19_max,
        "x42_runs": [round(s, 2) for s in x42["spread"]["x42_bootstrap_ci"]["sec"]],
        "ss19_runs": [round(s, 2) for s in ss19["spread"]["ss19_capped_multiprobe"]["sec"]],
        "status": "healthy" if healthy else "degraded",
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    os.makedirs(os.path.dirname(STAMP), exist_ok=True)
    with open(STAMP, "w") as f:
        f.write(json.dumps(stamp, separators=(",", ":")) + "\n")
    print(f"[canary] stamp written to {STAMP}")
    sys.exit(0 if healthy else 1)


if __name__ == "__main__":
    main()
