#!/bin/bash
# Induced-pressure A/B of the cut storage mechanism (r14 verdict ask
# #1b): the iterative family localCheckpoints a corpus-sized frame per
# round, and MEMORY_AND_DISK cut blocks live in the unified storage
# pool — under memory pressure (a busy multi-tenant cluster, or here a
# deliberately small driver heap) superseded blocks churn through
# eviction/re-serialization and task CPU amplifies with the remaining
# round count (r10 measured 20.9x on d16; the r14 driver artifact read
# 85x CPU). The uncut() discipline frees DEAD rounds but cannot help
# the rounds still alive inside one query.
#
# This script runs the affected family under the SAME induced squeeze
# in three cut modes and writes one bench JSON per (query, mode):
#   memdisk  — localCheckpoint default (MEMORY_AND_DISK, the r14 code)
#   disk     — SPARK_GRAFT_CUT_STORAGE=DISK_ONLY (blocks bypass the
#              storage-memory pool entirely; reads stream from local
#              disk)
#   reliable — SPARK_GRAFT_CHECKPOINT_DIR=<tmp> (reliable checkpoint
#              files; blocks never persist at all)
# plus one UNCONSTRAINED pass per mode (the quiet floor each mode is
# judged against). Compare "cpu" per query: the mode whose
# constrained/quiet ratio stays lowest bounds the amplification.
#
# Usage: tools/pressure_ab.sh [out_prefix]
#   QUERIES=d16_...,p5_... MEM=2500m SF=/root/testdata/sf0.1 CPUS=8
#   REPS (default 1) override.
set -e
cd "$(dirname "$0")/.."
SF=${SF:-/root/testdata/sf0.1}
MEM=${MEM:-2500m}
CPUS=${CPUS:-8}
QUERIES=${QUERIES:-d16_components_incremental,d19_components_serving,p5_serving_ingest,b4_closure_incremental}
OUT=${1:-tools/pressure_ab}
CKPT=$(mktemp -d /tmp/graft_ckpt.XXXXXX)
trap 'rm -rf "$CKPT"' EXIT
for heap in quiet "$MEM"; do
  for mode in memdisk disk reliable; do
    unset SPARK_GRAFT_CUT_STORAGE SPARK_GRAFT_CHECKPOINT_DIR
    case $mode in
      disk) export SPARK_GRAFT_CUT_STORAGE=DISK_ONLY ;;
      reliable) export SPARK_GRAFT_CHECKPOINT_DIR="$CKPT" ;;
    esac
    if [ "$heap" = quiet ]; then unset SPARK_DRIVER_MEM; tag=quiet; \
    else export SPARK_DRIVER_MEM="$heap"; tag=squeezed; fi
    echo "== $tag / $mode (${QUERIES})" >&2
    SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_SF_DIR=$SF \
      SPARK_GRAFT_ONLY=$QUERIES \
      SPARK_GRAFT_BENCH_OUT=${OUT}_${tag}_${mode}.json \
      sbt -batch "runMain graft.Bench" >/dev/null 2>&1 \
      || echo "($tag/$mode errored — see json)" >&2
    python3 - "${OUT}_${tag}_${mode}.json" <<'EOF'
import json, sys
try:
    d = json.load(open(sys.argv[1]))
except Exception as e:
    print(f"  (unreadable: {e})"); raise SystemExit
for q, w in sorted(d.get("queries", {}).items()):
    cpu = d.get("cpu", {}).get(q, 0)
    gc = d.get("gc", {}).get(q, 0)
    dw = d.get("blk_disk_w", {}).get(q, 0)
    print(f"  {q:34s} wall {w:8.2f}  cpu {cpu:8.2f}  gc {gc:6.2f}  blk_disk_w {dw}")
EOF
  done
done
echo "done: ${OUT}_{quiet,squeezed}_{memdisk,disk,reliable}.json" >&2
