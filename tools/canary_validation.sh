#!/bin/bash
# Validates the Bench contention canary (round-12 verdict ask #2):
# runs a small query set twice — quiet, then alongside a deliberate
# memory-bandwidth co-tenant (the r11 cotenant_repro class: numpy
# full-array rewrite threads) — and prints both bench artifacts. The
# canary is validated when the contended run's per-query `canary`
# values inflate over `canary_base`/the quiet run on the SAME queries
# whose cpu readings inflate, i.e. the canary measures exactly the
# contamination class the graded components-trio outliers showed.
#
# Usage: tools/canary_validation.sh
#   SF=/root/testdata/sf0.1 QS=a1_agg_stats,... to override.
set -e
cd "$(dirname "$0")/.."
SF=${SF:-/root/testdata/sf0.1}
QS=${QS:-a1_agg_stats,b8_degree_histogram,f11_char_entropy}

echo "== quiet" >&2
SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_ONLY=$QS \
  SPARK_GRAFT_BENCH_OUT=tools/canary_quiet.json \
  sbt -batch "runMain graft.Bench" >/dev/null 2>&1 || \
  echo "(quiet run errored — see json)" >&2
cat tools/canary_quiet.json

echo "== contended (2 procs x 14 numpy rewrite threads, 512 MB each)" >&2
HOGS=""
for p in 1 2; do
python3 - <<'EOF' &
import threading
import time

import numpy as np


def hog():
    a = np.zeros(64 << 20, dtype=np.float64)  # 512 MB, streams DRAM
    while True:
        a += 1.0


for _ in range(14):
    threading.Thread(target=hog, daemon=True).start()
time.sleep(900)
EOF
HOGS="$HOGS $!"
done
trap 'kill $HOGS 2>/dev/null || true' EXIT
sleep 5  # let the hog threads reach steady state
SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_ONLY=$QS \
  SPARK_GRAFT_BENCH_OUT=tools/canary_contended.json \
  sbt -batch "runMain graft.Bench" >/dev/null 2>&1 || \
  echo "(contended run errored — see json)" >&2
kill $HOGS 2>/dev/null || true
cat tools/canary_contended.json
