#!/usr/bin/env python3
"""One-off ~sf1-equivalent documents slice for the overflow hash gate
(r15 verdict ask #6): 10x the sf0.1 documents table — doc_ids shifted
per copy, odd copies vowel-rotated (pair structure both within and
ACROSS copies: unrotated copies are exact near-dup groups, which is
deliberate stress for the pair-count / span-coverage / CMS sum widths
— the gate wants MORE pairs than sf0.1, not a clean distribution),
other tables symlinked from sf0.1 so Verify/DuckDB can register every
view. Output dir is the single argument (default /tmp/sf10x).

Run the gate afterwards (records tools/overflow_gate_r16.txt):
  python3 tools/gen_overflow_slice.py /tmp/sf10x
  QS=d1...,d2...,...  # the overflow-sensitive families
  SPARK_GRAFT_CPUS=8 sbt "runMain graft.Verify /tmp/sf10x /tmp/vgate $QS"
  python3 tools/verify_local.py /tmp/sf10x /tmp/vgate $QS
"""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.1"
VOWEL_IN = "aeiou"
VOWEL_OUT = "eioua"


def rotate(s):
    return s.translate(str.maketrans(VOWEL_IN, VOWEL_OUT))


def main(out):
    os.makedirs(out, exist_ok=True)
    t = pq.read_table(f"{SF}/documents.parquet")
    cols = t.column_names
    rows = t.to_pylist()
    big = []
    for i in range(10):
        for r in rows:
            r2 = dict(r)
            r2["doc_id"] = r["doc_id"] + i * 10_000_000
            if i % 2 == 1:
                r2["text"] = rotate(r["text"])
                r2["n_chars"] = len(r2["text"])
            big.append(r2)
    pq.write_table(pa.Table.from_pylist(big, schema=t.schema), f"{out}/documents.parquet")
    for f in os.listdir(SF):
        if f.endswith(".parquet") and f != "documents.parquet":
            dst = f"{out}/{f}"
            if not os.path.exists(dst):
                os.symlink(f"{SF}/{f}", dst)
    print(f"wrote {len(big)} docs to {out}/documents.parquet "
          f"(+{len(cols) - 1} passthrough columns), symlinked the rest")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10x")
