#!/usr/bin/env python3
"""Healthy-window revalidation loop (VERDICT r12 item 3): five
consecutive sessions measured on a DEGRADED host mean the shuffle-write
rows (ss19, dd01, dd21, mm07 in SCALING; the closing-bench medians)
have never been re-measured clean since their code last changed. This
script automates catching the first healthy window instead of hoping a
human happens to probe at the right time:

    python3 tools/healthy_window.py                 # default: probe every 25 min, up to 8 h
    python3 tools/healthy_window.py --once          # single probe+maybe-campaign cycle

Each cycle:
  1. skip if `.tmp/campaign.lock` exists (a campaign is running — a
     probe under self-inflicted load would read SICK and mean nothing);
  2. run tools/bench_canary.py (stamps `.tmp/canary_last.json`);
  3. on a HEALTHY verdict, immediately run the mini campaign — the
     shuffle-write-sensitive rows at sf10 (2 runs) plus the same rows
     at sf1 — and write HEALTHYWINDOW.md with the numbers and the
     passing stamp, then exit 0.

Exit 0 = a healthy-window artifact was written; exit 3 = the loop
expired without one (every probe stayed degraded — itself evidence,
logged per probe).
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = "/root/repo"
LOCK = f"{REPO}/.tmp/campaign.lock"
STAMP = f"{REPO}/.tmp/canary_last.json"

# The rows whose only readings since their code last changed were taken
# on a degraded host (VERDICT r12 "What's wrong" #2).
ROWS = ["ss19_capped_multiprobe", "dd01_minhash_lsh", "dd21_sorted_neighborhood",
        "mm07_real_audio_decode", "mm08_audio_headers", "x42_bootstrap_ci",
        "ss20_dedup_then_ann"]


def bench(sf_dir, runs, timeout_s):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_BENCH_RUNS=str(runs),
               SPARK_GRAFT_ONLY=",".join(ROWS),
               SPARK_GRAFT_QUERY_TIMEOUT=str(timeout_s),
               SPARK_GRAFT_BENCH_DEADLINE_SEC="100000",
               SPARK_GRAFT_SF1="0")
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       cwd=REPO, env=env, capture_output=True, text=True)
    for line in reversed(r.stdout.splitlines()):
        if '"spread"' in line:
            return json.loads(line)
    print(r.stdout[-2000:], r.stderr[-2000:])
    sys.exit(f"mini-campaign bench produced no JSON line for {sf_dir}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", type=int, default=1500,
                    help="seconds between probes (default 25 min)")
    ap.add_argument("--max-hours", type=float, default=8.0)
    ap.add_argument("--once", action="store_true")
    ap.add_argument("--sf1-dir", default=f"{REPO}/.tmp/sf1")
    ap.add_argument("--sf10-dir", default=f"{REPO}/.tmp/sf10")
    ap.add_argument("--out", default=f"{REPO}/HEALTHYWINDOW.md")
    a = ap.parse_args()

    t0 = time.time()
    probes = []
    while True:
        if os.path.exists(LOCK):
            print(f"[healthy-window] campaign lock present, skipping probe", flush=True)
        else:
            rc = subprocess.run([sys.executable, f"{REPO}/tools/bench_canary.py"],
                                cwd=REPO).returncode
            stamp = json.load(open(STAMP))
            probes.append(stamp)
            print(f"[healthy-window] probe: {stamp.get('status')} "
                  f"(x42 {stamp.get('x42_sf10')}, ss19 {stamp.get('ss19_sf10')})", flush=True)
            if rc == 0 and stamp.get("status") == "healthy":
                print("[healthy-window] HEALTHY — firing mini campaign", flush=True)
                b10 = bench(a.sf10_dir, 2, 600)
                b1 = bench(a.sf1_dir, 3, 600)
                with open(a.out, "w") as f:
                    f.write("# HEALTHYWINDOW — first clean-host re-measure of the "
                            "shuffle-write-sensitive rows\n\n")
                    f.write(f"- Generated: {time.strftime('%Y-%m-%d %H:%M:%S')} by "
                            f"`tools/healthy_window.py` after {len(probes)} probe(s)  \n")
                    f.write(f"- Passing canary: x42 sf10 {stamp.get('x42_sf10')} s "
                            f"(bar {stamp.get('x42_max')}), ss19 sf10 "
                            f"{stamp.get('ss19_sf10')} s (bar {stamp.get('ss19_max')}) "
                            f"at {stamp.get('ts')}  \n")
                    f.write("- Medians of 2 (sf10) / 3 (sf1) runs; spreads below.\n\n")
                    f.write("| query | sf1 s | sf10 s | sf10 spread |\n|---|---|---|---|\n")
                    s10 = b10.get("spread", {})
                    for q in ROWS:
                        t1 = b1.get("queries", {}).get(q, -1.0)
                        t10 = b10.get("queries", {}).get(q, -1.0)
                        sp = s10.get(q, {})
                        f.write(f"| {q} | {t1:.2f} | {t10:.2f} | "
                                f"[{sp.get('min', -1):.2f}, {sp.get('max', -1):.2f}] |\n")
                    f.write("\nFull JSON lines: `.tmp/healthy_window_sf10.json`, "
                            "`.tmp/healthy_window_sf1.json`.\n")
                json.dump(b10, open(f"{REPO}/.tmp/healthy_window_sf10.json", "w"))
                json.dump(b1, open(f"{REPO}/.tmp/healthy_window_sf1.json", "w"))
                print(f"[healthy-window] wrote {a.out}", flush=True)
                return 0
        if a.once or time.time() - t0 > a.max_hours * 3600:
            print(f"[healthy-window] expired after {len(probes)} probes, all degraded "
                  "— no clean window this session (that is itself the finding)", flush=True)
            return 3
        time.sleep(a.interval)


if __name__ == "__main__":
    sys.exit(main())
