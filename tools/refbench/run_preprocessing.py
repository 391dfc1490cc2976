#!/usr/bin/env python3
"""Drive the reference's collections-preprocessing COMPUTE
(collections-preprocessing/src/preprocessing_service.py
preprocess_collections — wordninja segmentation + per-collection
token counts) over an exported collections.json, minus its FastAPI
transport shell (strictly less work than the POST round-trip the real
service pays). Writes the augmented collections as JSONL — the r6
stage of run_refbench.py, a41's reference baseline."""
import json
import sys

sys.path.insert(0, '/root/reference/collections-preprocessing/src')
from model import Collection                       # noqa: E402
from preprocessing_service import preprocess_collections  # noqa: E402


def main():
    inp, outp = sys.argv[1], sys.argv[2]
    with open(inp, encoding='utf-8') as f:
        data = json.load(f)
    cols = [Collection(**obj) for obj in data]
    aug = preprocess_collections(cols)
    with open(outp, 'w', encoding='utf-8') as f:
        for a in aug:
            f.write(json.dumps({
                'collection_name': a.collection_name,
                'tokenized_names': a.tokenized_names,
                'tokenized_names_counts': a.tokenized_names_counts,
            }, ensure_ascii=False))
            f.write('\n')


if __name__ == '__main__':
    main()
