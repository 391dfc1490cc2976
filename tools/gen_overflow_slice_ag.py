#!/usr/bin/env python3
"""~sf1-equivalent lineitem + events slice for the A/G overflow hash
gate (r16 verdict ask #4): the r16 gate covered the D/F overflow
families on a 10x documents slice; the A/G families carry their own
width-sensitive spots — a37's Sum d^2 closed form (decimal(37,0)
products), a38's integer-cents moments, g8/g9's Sum / Sum^2 integer
window sums, g4's offset fan-out — which only a 10x lineitem/events
volume exercises.

Slice design (stress WIDTH, not just row count):
 - lineitem 10x: copy i shifts l_partkey by +i*10_000_000 and leaves
   l_orderkey UNCHANGED, so every collection grows 10x in MEMBERS
   (a37's Sum d^2 grows ~n^3 per group — the width-sensitive term —
   and a15/a38's per-order sums and member aggregates 10x); copies
   keep price/quantity, so rank ties are broken by the member id
   exactly as the registered ordering declares.
 - events 10x: copy i shifts user_id by +i*10_000_000 and event_id by
   +i*100_000_000 with ts UNCHANGED, so every window's counts and
   value sums grow 10x in place (g8's trailing Sum and Sum^2 of
   window counts grow 10x/100x; g9's HLL register occupancy sees 10x
   the distinct users; g4's x3 offset fan-out rides the same rows).
 - everything else symlinked from sf0.1 so Verify/DuckDB register
   every view (orders stays 1x: a38's collection-rank side is the
   orders frame — member growth is the stress axis).

Run the gate afterwards (records tools/overflow_gate_r17.txt):
  python3 tools/gen_overflow_slice_ag.py /tmp/sf10xag
  QS=a15_metrics_summary,a37_rank_correlation,a38_rank_describe,\
g4_hopping_counts,g8_anomaly_zscore,g9_hll_distinct
  SPARK_GRAFT_CPUS=16 sbt "runMain graft.Verify /tmp/sf10xag /tmp/vgateag $QS"
  python3 tools/verify_local.py /tmp/sf10xag /tmp/vgateag $QS
"""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.1"
COPIES = 10


def replicate(path, shifts):
    t = pq.read_table(path)
    parts = []
    for i in range(COPIES):
        cols = {}
        for name in t.column_names:
            c = t.column(name)
            if i and name in shifts:
                c = pa.compute.add(c, shifts[name] * i)
            cols[name] = c
        parts.append(pa.table(cols, schema=pa.schema(
            [t.schema.field(n) for n in t.column_names])))
    return pa.concat_tables(parts)


def main(out):
    os.makedirs(out, exist_ok=True)
    li = replicate(f"{SF}/lineitem.parquet", {"l_partkey": 10_000_000})
    pq.write_table(li, f"{out}/lineitem.parquet")
    ev = replicate(f"{SF}/events.parquet",
                   {"user_id": 10_000_000, "event_id": 100_000_000})
    pq.write_table(ev, f"{out}/events.parquet")
    for f in os.listdir(SF):
        if f.endswith(".parquet") and f not in ("lineitem.parquet",
                                                "events.parquet"):
            dst = f"{out}/{f}"
            if not os.path.exists(dst):
                os.symlink(f"{SF}/{f}", dst)
    print(f"wrote {li.num_rows} lineitem + {ev.num_rows} event rows to "
          f"{out}, symlinked the rest")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10xag")
