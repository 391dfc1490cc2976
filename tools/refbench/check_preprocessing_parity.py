#!/usr/bin/env python3
"""Cross-check the r6 reference stage (wordninja preprocessing over
exported data — run_preprocessing.py output) against a41's own
registered output (graft.Verify's a41_segment_names parquet dump):
every name's segmentation and every collection's token counts must be
IDENTICAL. This is reference-IMPLEMENTATION parity on real data, one
level stronger than the unit-test example pins: the reference's float
Zipf costs and graft's integer micro-ln costs must induce the same
argmin on every exported name.

Usage: check_preprocessing_parity.py R6_OUT_JSONL A41_PARQUET_DIR
"""
import json
import sys

import duckdb


def main():
    r6_out, a41_dir = sys.argv[1], sys.argv[2]

    # Reference side: coll id from 'coll-<n>', names aligned with the
    # export's ORDER BY p_partkey inside each collection.
    ref = {}   # (coll, name_index_in_coll) is implicit; compare by sets
    ref_counts = {}
    ref_tokens = set()
    with open(r6_out, encoding='utf-8') as f:
        for line in f:
            o = json.loads(line)
            coll = int(o['collection_name'].split('-')[1])
            ref_counts[coll] = {k: int(v)
                                for k, v in o['tokenized_names_counts'].items()}
            for toks in o['tokenized_names']:
                ref_tokens.add((coll, ' '.join(toks)))
            ref[coll] = o

    # graft side: (coll, lower(name) -> tokens) plus the rendered
    # coll_counts string.
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT coll, name, tokens, coll_counts "
        f"FROM '{a41_dir}/*.parquet'").fetchall()
    graft_tokens = set()
    graft_counts = {}
    for coll, name, tokens, cc in rows:
        graft_tokens.add((coll, tokens))
        graft_counts[coll] = {kv.rsplit(':', 1)[0]: int(kv.rsplit(':', 1)[1])
                              for kv in cc.split(',')}

    # Wordninja lowercases inside the service (name.lower() before
    # split), so both sides' token strings are lowercase already.
    only_ref = ref_tokens - graft_tokens
    only_graft = graft_tokens - ref_tokens
    assert not only_ref and not only_graft, (
        f"segmentations diverge: only_ref={sorted(only_ref)[:5]} "
        f"only_graft={sorted(only_graft)[:5]}")

    assert set(ref_counts) == set(graft_counts), (
        f"collection sets diverge: {set(ref_counts) ^ set(graft_counts)}")
    for coll in ref_counts:
        assert ref_counts[coll] == graft_counts[coll], (
            f"counts diverge for coll {coll}: "
            f"ref={ref_counts[coll]} graft={graft_counts[coll]}")

    print(f"PARITY: {len(rows)} names, {len(ref_counts)} collections — "
          f"reference wordninja output == a41 output exactly")


if __name__ == '__main__':
    main()
