#!/bin/bash
# One-shot timing-campaign runner (r11): canary-gated per the NOTES
# measurement-discipline policy, then the three artifacts in the
# cheap-to-expensive order the r10 VERDICT prescribed.
#
#   tools/run_campaigns.sh [--force]    # --force skips the canary gate
#
# Artifacts: SCALING.md, BENCHRATIO.md, BENCH_CLOSING_r11.json.
set -e
cd /root/repo
if [ "$1" != "--force" ]; then
  echo "== canary =="
  python3 tools/bench_canary.py || { echo "host SICK - aborting (use --force for min-of-runs policy)"; exit 1; }
fi
echo "== SCALING (subset, sf1 + sf10) =="
python3 tools/bench_scaling.py
echo "== BENCHRATIO (189 queries, sf1, Spark vs DuckDB) =="
python3 tools/bench_ratio.py /root/repo/.tmp/sf1
echo "== closing bench (dual-scale sf0.1 + sf1, full catalog) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' > BENCH_CLOSING_r11.json
python3 -c "import json; d=json.load(open('BENCH_CLOSING_r11.json')); print('closing ok:', d['totals'])"
echo "== done =="
