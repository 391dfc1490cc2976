#!/bin/bash
# Validates the storage-latency canary kernel (round-16 verdict ask
# #1): the r16 driver artifact read d19 at 145.5 s wall (pin 3.87 s,
# judge quiet rerun 5.5 s) while serial, parallel AND chase mid-shot
# canaries all stayed in their quiet bands — its stage breakdown
# showed 1-task checkpoint-bearing stages at wall >> cpu, i.e.
# storage/scheduling latency dilation, the one contamination mode no
# memory kernel probes. This script shows the fourth kernel branding
# it: it samples all four kernels quiet, then alongside a deliberate
# fsync-saturating co-tenant (graft.tools.DiskHog — small ring-file
# writers that keep the ext4 journal commit machinery continuously
# busy so every other process's fsync queues behind them; latency
# contention at modest bandwidth, far below the host throttling
# cliff), and emits one JSON artifact with per-kernel medians +
# ratios.
#
# PASS = disk ratio > 5x while serial < 1.5x AND parallel < 2x AND
# chase < 2x — contention every memory kernel reads as quiet, branded
# by the disk probe.
#
# Usage: tools/disk_canary_validation.sh [out.json]
set -e
cd "$(dirname "$0")/.."
OUT=${1:-tools/disk_canary_validation.json}
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/scala-library-2.13.17.jar)"
SECS=${SECS:-25}
HOGCFG=${HOGCFG:-6 8}

sample() { # $1 = output txt
  java -cp "$CP" graft.tools.CanaryCal "$SECS" > "$1" 2>&1
}

echo "== quiet" >&2
sample /tmp/disk_val_quiet.txt

echo "== contended (DiskHog $HOGCFG)" >&2
java -cp "$CP" graft.tools.DiskHog $HOGCFG 2>/dev/null &
HOG=$!
trap 'kill $HOG 2>/dev/null || true' EXIT
sleep 6
sample /tmp/disk_val_hog.txt
kill $HOG 2>/dev/null || true

python3 - "$OUT" <<'EOF'
import json, statistics, sys

def stats(path):
    s, p, c, d = [], [], [], []
    for line in open(path):
        if not line.startswith("[canary]"):
            continue
        f = line.split()
        s.append(float(f[2])); p.append(float(f[4])); c.append(float(f[6]))
        if float(f[8]) >= 0:  # -1 = probe could not run
            d.append(float(f[8]))
    return {"serial": s, "parallel": p, "chase": c, "disk": d}

quiet = stats("/tmp/disk_val_quiet.txt")
hog = stats("/tmp/disk_val_hog.txt")
# Quiet reference is a FLOOR (min), matching Bench's canary_base
# min-of-3 convention; the contended side uses the MEDIAN — the claim
# is "the bulk of the window was contended", which one lucky sample
# must not disprove (same adjudication scheme as the chase kernel's
# validation artifact).
qf = {k: min(v) for k, v in quiet.items()}
hm = {k: statistics.median(v) for k, v in hog.items()}
ratios = {k: hm[k] / qf[k] for k in ("serial", "parallel", "chase", "disk")}
out = {"quiet_floor": qf,
       "quiet_med": {k: statistics.median(v) for k, v in quiet.items()},
       "hog_med": hm, "n_quiet": len(quiet["serial"]), "n_hog": len(hog["serial"]),
       "ratio_vs_floor": ratios,
       "pass": ratios["disk"] > 5.0 and ratios["serial"] < 1.5
               and ratios["parallel"] < 2.0 and ratios["chase"] < 2.0}
open(sys.argv[1], "w").write(json.dumps(out, indent=1) + "\n")
print(json.dumps(out, indent=1))
EOF
