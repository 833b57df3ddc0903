#!/bin/bash
# One-shot timing-campaign runner (r12): canary-stamped per the NOTES
# measurement-discipline policy, then the three artifacts in the
# cheap-to-expensive order the r10 VERDICT prescribed.
#
#   tools/run_campaigns.sh [round]      # default round suffix: r12
#
# The canary verdict no longer BLOCKS the campaigns (the r11 lesson:
# waiting for a healthy window slipped the artifacts two rounds).
# Instead its stamp is embedded in every artifact and a degraded
# verdict switches the generators to min-of-runs automatically
# (--agg auto); the artifacts are never silently polluted.
#
# Artifacts: SCALING.md, BENCHRATIO.md, BENCH_CLOSING_<round>.json.
set -e
cd /root/repo
# campaign lock: tools/healthy_window.py skips canary probes while a
# campaign owns the box (a probe under self-inflicted load reads SICK
# and means nothing)
mkdir -p .tmp; touch .tmp/campaign.lock
trap 'rm -f .tmp/campaign.lock' EXIT
R="${1:-r13}"
echo "== canary (stamps .tmp/canary_last.json; does not gate) =="
python3 tools/bench_canary.py || echo "host SICK - generators will record min-of-runs with the in-artifact stamp"
echo "== SCALING (subset, sf1 + sf10) =="
python3 tools/bench_scaling.py
echo "== BENCHRATIO (full catalog, sf1, Spark vs DuckDB; 100GB oracle RAM, 1500s/query so dd05's ~19min replay completes) =="
python3 tools/bench_ratio.py /root/repo/.tmp/sf1 --mem 100GB --oracle-timeout 1500
echo "== closing bench (dual-scale sf0.1 + sf1, full catalog) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_DEADLINE_SEC=100000 \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"spread"' > "BENCH_CLOSING_${R}.json"
python3 -c "import json,sys; d=json.load(open('BENCH_CLOSING_${R}.json')); print('closing ok:', d['totals'], 'host:', d.get('host_canary',{}).get('status','unstamped'), 'note:', d.get('note','-'))"
echo "== done =="
