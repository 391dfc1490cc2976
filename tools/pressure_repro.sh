#!/bin/bash
# Storage-constrained repro for the round-10 components-family cpu
# anomaly (VERDICT r10, "What's wrong #1"): under co-tenant memory
# pressure d16/d19/p5 multiplied their task CPU 9-21x while 122 other
# queries stayed flat. Mechanism: iterative operators localCheckpoint
# a corpus-sized frame per round and never freed the superseded
# rounds' blocks, so live storage grew as rounds x |frame| and, once
# the storage pool was squeezed, every remaining round re-churned the
# dead blocks through spill/serialization — task CPU amplified by the
# remaining round count.
#
# This script recreates the squeeze deliberately (a small driver heap
# instead of a co-tenant) and runs the affected query twice:
#   off — SPARK_GRAFT_UNCUT=0 restores the pre-fix keep-every-round
#         behavior (the round-10 code path);
#   on  — the fix (Checkpoints.uncut frees each superseded round).
# Compare the "cpu" field of the two JSON lines against the quiet
# (unconstrained) value: the fix is proven when constrained-on stays
# within ~2x quiet while constrained-off shows the blow-up.
#
# Usage: tools/pressure_repro.sh [query] (default d16_components_incremental)
#   MEM=2500m SF=/root/testdata/sf0.1 to override.
set -e
cd "$(dirname "$0")/.."
SF=${SF:-/root/testdata/sf0.1}
MEM=${MEM:-2500m}
Q=${1:-d16_components_incremental}
for mode in off on; do
  if [ "$mode" = off ]; then export SPARK_GRAFT_UNCUT=0; else unset SPARK_GRAFT_UNCUT; fi
  echo "== $Q constrained ($MEM heap), uncut=$mode" >&2
  SPARK_DRIVER_MEM=$MEM SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_ONLY=$Q \
    SPARK_GRAFT_BENCH_OUT=tools/pressure_${mode}.json \
    sbt -batch "runMain graft.Bench" >/dev/null 2>&1 || echo "(run errored — see json)" >&2
  cat tools/pressure_${mode}.json 2>/dev/null || echo "{}"
done
