#!/bin/bash
# Validates the latency-chase canary kernel (round-15 verdict ask #1):
# the r15 driver artifact read p5 at 806.8 s summed task CPU against
# an 8-9 s pin band while BOTH stream canaries stayed 1.2-1.8× — a
# contention mode (LLC/latency thrash) the stream kernels cannot
# brand. This script shows the third kernel branding it: it samples
# all three kernels quiet, then alongside a deliberate LLC-thrashing
# co-tenant (graft.tools.MemHog randread with a REUSED 16 MiB
# working set per thread — reuse defeats the LLC's adaptive
# thrash-protection, eviction pressure with only modest bandwidth),
# and emits one JSON artifact with per-kernel medians + ratios.
#
# PASS = chase ratio > 5x while serial ratio < 1.5x — contention the
# serial stream kernel reads as quiet, branded by the chase.
#
# Usage: tools/canary_chase_validation.sh [out.json]
set -e
cd "$(dirname "$0")/.."
OUT=${1:-tools/canary_chase_validation.json}
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/scala-library-2.13.17.jar)"
SECS=${SECS:-25}
HOGCFG=${HOGCFG:-randread 16 16}

sample() { # $1 = output txt
  java -cp "$CP" graft.tools.CanaryCal "$SECS" > "$1" 2>&1
}

echo "== quiet" >&2
sample /tmp/chase_val_quiet.txt

echo "== contended (MemHog $HOGCFG)" >&2
java -Xmx8g -cp "$CP" graft.tools.MemHog $HOGCFG 2>/dev/null &
HOG=$!
trap 'kill $HOG 2>/dev/null || true' EXIT
sleep 6
sample /tmp/chase_val_hog.txt
kill $HOG 2>/dev/null || true

python3 - "$OUT" <<'EOF'
import json, statistics, sys

def stats(path):
    s, p, c = [], [], []
    for line in open(path):
        if not line.startswith("[canary]"):
            continue
        f = line.split()
        s.append(float(f[2])); p.append(float(f[4])); c.append(float(f[6]))
    return {"serial": s, "parallel": p, "chase": c}

quiet = stats("/tmp/chase_val_quiet.txt")
hog = stats("/tmp/chase_val_hog.txt")
# The quiet reference is a FLOOR (min), matching Bench's own
# canary_base = min-of-3 convention: ambient machine noise inflates a
# quiet median sample-to-sample, and a floor is what per-shot
# dilations are read against in the artifact. The contended side uses
# the MEDIAN — the claim is "the bulk of the shot was contended",
# which one lucky sample must not disprove.
qf = {k: min(v) for k, v in quiet.items()}
hm = {k: statistics.median(v) for k, v in hog.items()}
ratios = {k: hm[k] / qf[k] for k in ("serial", "parallel", "chase")}
out = {"quiet_floor": qf, "quiet_med": {k: statistics.median(v) for k, v in quiet.items()},
       "hog_med": hm, "n_quiet": len(quiet["serial"]), "n_hog": len(hog["serial"]),
       "ratio_vs_floor": ratios,
       "pass": ratios["chase"] > 5.0 and ratios["serial"] < 1.5}
open(sys.argv[1], "w").write(json.dumps(out, indent=1) + "\n")
print(json.dumps(out, indent=1))
EOF
