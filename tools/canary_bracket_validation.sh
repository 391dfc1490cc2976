#!/bin/bash
# Validates the canary BRACKET (the post-batch-5 canary_post sample):
# unlike canary_validation.sh's steady co-tenant, the memory-bandwidth
# hogs here start DELAYED — partway through the bench run — so the
# artifact must show the onset signature a single pre-query sample
# cannot: rows finishing before the onset read ~base in BOTH samples,
# rows after it read inflated in both, and the boundary row (running
# when the hogs start) reads clean `canary` but inflated
# `canary_post`. That boundary row is precisely the contamination
# class the r12 validation documented as undetectable pre-bracket
# ("a query spanning a contention phase can read clean").
#
# Usage: tools/canary_bracket_validation.sh
#   SF=... QS=... DELAY=... to override. Output:
#   tools/canary_bracket.json (one bench artifact; read canary vs
#   canary_post per row against canary_base).
set -e
cd "$(dirname "$0")/.."
SF=${SF:-/root/testdata/sf0.1}
# ~12 alphabetical queries x 1-6 s keeps the run long enough that the
# delayed onset lands strictly inside it.
QS=${QS:-a13_diff_snapshots,a15_metrics_summary,a17_normalize_names,a6_group_collect,a7_window_topk,a9_dedup_first_by_key,d2_dedup_ngram_jaccard,d7_dedup_components,d8_dedup_canonical,f10_repetition,f8_tfidf,g1_sessionize}
# Seconds from bench launch to hog start: past sbt startup + warmup
# (~50-70 s) and into the middle of the query sequence.
DELAY=${DELAY:-85}

echo "== delayed co-tenant: hogs start ${DELAY}s in (2 procs x 14 numpy rewrite threads, 512 MB each)" >&2
HOGS=""
for p in 1 2; do
( sleep "$DELAY"; exec python3 - <<'EOF'
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
) &
HOGS="$HOGS $!"
done
trap 'kill $HOGS 2>/dev/null || true' EXIT
SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_ONLY=$QS \
  SPARK_GRAFT_BENCH_OUT=tools/canary_bracket.json \
  sbt -batch "runMain graft.Bench" >/dev/null 2>&1 || \
  echo "(run errored — see json)" >&2
kill $HOGS 2>/dev/null || true
cat tools/canary_bracket.json
