#!/usr/bin/env python3
"""Time the reference's five pure-compute pipeline stages on exported
graft testdata (see export_refdata.py). Each stage runs exactly as the
reference runs it — `python3 <script> <args>` single-process — with
PYTHONPATH supplying the offline shims (jsonlines/tqdm pass-throughs,
dict-backed rocksdict; all transport libs import-only). Wall time
includes interpreter startup (~0.05 s, noise at these runtimes) and
all of the stage's own input parsing and output writing, exactly the
cost a reference user pays per stage.

Usage: run_refbench.py EXPORT_DIR OUT_JSON   (run once per scale factor)
"""
import json
import os
import subprocess
import sys
import time

REF = '/root/reference/scripts'
SHIMS = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'shims')

STAGES = [
    ('r1_reformat_csv_to_json', 'reformat_csv_to_json.py', 'r1',
     ['members.csv', 'out.jsonl', '--list_of_collections', 'collections.json']),
    ('r2_merge_lists_and_categories', 'merge_lists_and_categories.py', 'r2',
     ['lists.jsonl', 'categories.jsonl', 'out.jsonl']),
    ('r3_filter_articles2', 'filter_articles2.py', 'r3',
     ['collections.jsonl', 'out.jsonl']),
    ('r4_filter_duplicates', 'filter_duplicates.py', 'r4',
     ['collections.jsonl', 'out.jsonl']),
    ('r5_merge_collections_ending_with_letters',
     'merge_collections_ending_with_letters.py', 'r5',
     ['collections.jsonl', 'out.jsonl']),
    # r6 <-> a41_segment_names: the collections-preprocessing service's
    # compute (wordninja DP segmentation + per-collection token counts)
    # via the run_preprocessing.py driver (absolute path — the script
    # lives beside this runner, not under the reference's scripts/);
    # the wordninja shim loads the exported corpus-derived wordlist
    # from the stage cwd.
    ('r6_preprocess_collections',
     os.path.join(os.path.dirname(os.path.abspath(__file__)),
                  'run_preprocessing.py'), 'r6',
     ['collections.json', 'out.jsonl']),
]


def main():
    export_dir, out_json = sys.argv[1], sys.argv[2]
    env = dict(os.environ)
    env['PYTHONPATH'] = SHIMS + ':' + REF
    results, outs = {}, {}
    for name, script, sub, args in STAGES:
        cwd = os.path.join(export_dir, sub)
        script_path = script if os.path.isabs(script) \
            else os.path.join(REF, script)
        t0 = time.perf_counter()
        r = subprocess.run(
            [sys.executable, script_path] + args,
            cwd=cwd, env=env, stdout=subprocess.DEVNULL,
            stderr=subprocess.PIPE)
        dt = time.perf_counter() - t0
        if r.returncode != 0:
            print(f'{name} FAILED rc={r.returncode}', file=sys.stderr)
            sys.stderr.write(r.stderr.decode()[-2000:])
            sys.exit(1)
        results[name] = round(dt, 3)
        out_path = os.path.join(cwd, 'out.jsonl')
        outs[name] = sum(1 for _ in open(out_path, encoding='utf-8'))
        print(f'{name}: {dt:.2f}s, {outs[name]} rows out')
    with open(out_json, 'w') as f:
        json.dump({'export_dir': export_dir, 'stages_sec': results,
                   'rows_out': outs}, f, indent=1)
    print('wrote', out_json)


if __name__ == '__main__':
    main()
