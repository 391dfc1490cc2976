#!/usr/bin/env python3
"""Summarize the r18 full-suite heap A/B (24g vs 8g, interleaved
fresh-JVM, single-shot both sides) — the r17 verdict's ask #3: split
the r17 headline into plan-term vs JVM-sizing-term. Reads
/tmp/membench_{24g,8g}_{1,2}.json, writes tools/membench_full_r18.json
with per-side totals, gc totals, canaries, and the rows whose wall
bands separate."""
import json

runs = {}
for side in ("24g", "8g"):
    for i in (1, 2):
        runs[f"{side}_{i}"] = json.load(open(f"/tmp/membench_{side}_{i}.json"))

out = {"design": "full suite sf0.1 local[32], SPARK_DRIVER_MEM 24g,8g,24g,8g "
                 "interleaved fresh JVM, SPARK_GRAFT_BENCH_REPS=1, shared "
                 "warm model store (pre-fit by run 1)",
       "totals": {}, "separated_rows": {}}
for tag, d in runs.items():
    out["totals"][tag] = {"wall": round(d["value"], 2),
                          "cpu": round(d["cpu_total"], 2),
                          "gc": round(d["gc_total"], 2),
                          "stall": round(d["stall_total"], 2),
                          "canary_base": round(d["canary_base"], 3),
                          "canary_min": round(d["canary_min"], 3)}

qs = runs["24g_1"]["queries"].keys()
for q in qs:
    b24 = [runs[f"24g_{i}"]["queries"][q] for i in (1, 2)]
    b8 = [runs[f"8g_{i}"]["queries"][q] for i in (1, 2)]
    if min(b8) > max(b24) or min(b24) > max(b8):
        if max(max(b24), max(b8)) >= 1.0:  # ignore sub-second floor noise
            out["separated_rows"][q] = {
                "24g": [round(x, 2) for x in b24],
                "8g": [round(x, 2) for x in b8],
                "gc_24g": [round(runs[f"24g_{i}"]["gc"][q], 2) for i in (1, 2)],
                "gc_8g": [round(runs[f"8g_{i}"]["gc"][q], 2) for i in (1, 2)],
            }

json.dump(out, open("tools/membench_full_r18.json", "w"), indent=1)
print(json.dumps(out["totals"], indent=1))
print("separated rows:", len(out["separated_rows"]))
for q, v in sorted(out["separated_rows"].items()):
    print(q, v["24g"], "vs", v["8g"])
