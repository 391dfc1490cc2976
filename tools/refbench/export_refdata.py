#!/usr/bin/env python3
"""Export graft testdata into the REFERENCE's input formats, so the
reference's own pure-compute pipeline stages can be timed on the same
data the registered graft queries run on (BASELINE.md grounding).

Five stages, chosen because they are the reference's analytics-bearing
batch steps that run WITHOUT network/service dependencies (everything
else is transport: SPARQL/WikiAPI/NameAI/Elasticsearch):

  r1  reformat_csv_to_json.py                <-> a6_group_collect
  r2  merge_lists_and_categories.py          <-> a24_merge_by_relation (+ a12 filters)
  r3  filter_articles2.py                    <-> b2_validate_members
  r4  filter_duplicates.py                   <-> a10_merge_by_name
  r5  merge_collections_ending_with_letters.py <-> a11_merge_letter_ranges

Role-mapping (the same one GroupP/PipelineSpec pin): orders are
collection seeds, lineitem is membership, part is entities AND the
k -> k//2 type tree. Name-duplicate multiplicities for r4/r5/r2 are
pinned SMALL (2-6 per group, ~ the reference's own reported
distribution: "about 7k have the same name ... 3, 3, 2, 2") because
merge_collections re-sorts the accumulated member list on every merge
— feeding it the 64-value p_name key (300-way groups at sf0.1) would
punish it quadratically on a distribution its data never has. The
graft queries keep their registered (coarser, heavier) groupings.

Usage: export_refdata.py SF_DIR OUT_DIR
"""
import json
import os
import sys

import duckdb


def member_obj(okey_or_curated, rank):
    return {
        'curated': okey_or_curated,
        'tokenized': [okey_or_curated],
        'interesting_score': None,
        'rank': float(rank),
        'status': 'valid',
    }


def collection_obj(item_id, name, types, members, rank):
    return {
        'item': f'Q{item_id}',
        'types': [[t, 'label'] for t in types],
        'article': f'col-{item_id}',
        'name': name,
        'members': members,
        'valid_members_count': len(members),
        'invalid_members_count': 0,
        'keywords': [],
        'description': None,
        'image': None,
        'page_banner': None,
        'rank': float(rank),
        'is_merged': False,
    }


def write_jsonl(path, objs):
    with open(path, 'w', encoding='utf-8') as f:
        for o in objs:
            f.write(json.dumps(o, ensure_ascii=False))
            f.write('\n')


def part_members(con, sf):
    """member lists per part, from lineitem (l_partkey -> part)."""
    rows = con.sql(f"""
        SELECT l_partkey, list(ROW(l_orderkey, l_linenumber, l_extendedprice))
        FROM '{sf}/lineitem.parquet' GROUP BY l_partkey
    """).fetchall()
    out = {}
    for pk, lst in rows:
        ms = [member_obj(f"m{o}l{ln}", price) for (o, ln, price) in lst]
        ms.sort(key=lambda m: -m['rank'])
        out[pk] = ms
    return out


def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    parts = con.sql(
        f"SELECT p_partkey, p_name, p_size, p_retailprice FROM '{sf}/part.parquet' ORDER BY p_partkey"
    ).fetchall()
    max_pk = max(p[0] for p in parts)
    pmembers = part_members(con, sf)

    # ---- r1: reformat_csv_to_json — grouped (collection, member) CSV +
    # the collections lookup JSON. One group per order (a6's grouping).
    r1 = os.path.join(out, 'r1')
    os.makedirs(r1, exist_ok=True)
    okeys = [r[0] for r in con.sql(
        f"SELECT DISTINCT o_orderkey FROM '{sf}/orders.parquet' ORDER BY 1").fetchall()]
    with open(os.path.join(r1, 'collections.json'), 'w', encoding='utf-8') as f:
        json.dump([{'item': f'Q{k}', 'type': [f'Q{k % 30 + 2}'],
                    'article': f'col-{k}'} for k in okeys], f)
    csv_rows = con.sql(f"""
        SELECT 'col-' || CAST(l_orderkey AS VARCHAR), 'part_' || CAST(l_partkey AS VARCHAR)
        FROM '{sf}/lineitem.parquet' ORDER BY 1, 2
    """).fetchall()
    with open(os.path.join(r1, 'members.csv'), 'w', encoding='utf-8') as f:
        f.write('collection,member\n')
        for k, m in csv_rows:
            f.write(f'{k},{m}\n')

    # ---- r2: merge_lists_and_categories — lists/categories JSONL split
    # by part-key parity (a24's construction: even = lists, odd =
    # categories; %4==1 -> list k+1, %4==3 -> list k-1) + db4 relations.
    r2 = os.path.join(out, 'r2')
    os.makedirs(os.path.join(r2, 'data', 'db4.rocks'), exist_ok=True)
    lists_, cats, db4 = [], [], {}
    for pk, pname, psize, price in parts:
        name = f'{pname} {pk // 8}'
        c = collection_obj(pk, name, [f'Q{psize}'], pmembers.get(pk, []), price)
        if pk % 2 == 0:
            lists_.append(c)
        else:
            cats.append(c)
            lk = pk + 1 if pk % 4 == 1 else pk - 1
            if 0 <= lk <= max_pk:
                db4[f'Q{pk}'] = {'list_related_to_category': [f'Q{lk}']}
                db4.setdefault(f'Q{lk}', {}).setdefault(
                    'category_related_to_list', []).append(f'Q{pk}')
    write_jsonl(os.path.join(r2, 'lists.jsonl'), lists_)
    write_jsonl(os.path.join(r2, 'categories.jsonl'), cats)
    with open(os.path.join(r2, 'data', 'db4.rocks', 'db.json'), 'w') as f:
        json.dump(db4, f)

    # ---- r3: filter_articles2 — collections from orders, members from
    # lineitem, db1 title->id, db2 the k -> k//2 type tree, db6 empty.
    r3 = os.path.join(out, 'r3')
    for d in ('db1.rocks', 'db2.rocks', 'db6.rocks'):
        os.makedirs(os.path.join(r3, 'data', d), exist_ok=True)
    omembers = con.sql(f"""
        SELECT l_orderkey, list(l_partkey ORDER BY l_linenumber)
        FROM '{sf}/lineitem.parquet' GROUP BY l_orderkey ORDER BY l_orderkey
    """).fetchall()
    with open(os.path.join(r3, 'collections.jsonl'), 'w', encoding='utf-8') as f:
        for okey, pks in omembers:
            f.write(json.dumps({
                'item': f'Q{okey}',
                'type': [f'Q{okey % 30 + 2}'],
                'article': f'col-{okey}',
                'members': [f'part {pk}' for pk in pks],
            }))
            f.write('\n')
    db1 = {f'part_{pk}': {'about': f'Q{pk}'} for (pk, _, _, _) in parts}
    db2 = {f'Q{pk}': {'instance_of': [f'Q{pk}'],
                      'subclass_of': ([f'Q{pk // 2}'] if pk >= 2 else [])}
           for (pk, _, _, _) in parts}
    with open(os.path.join(r3, 'data', 'db1.rocks', 'db.json'), 'w') as f:
        json.dump(db1, f)
    with open(os.path.join(r3, 'data', 'db2.rocks', 'db.json'), 'w') as f:
        json.dump(db2, f)
    with open(os.path.join(r3, 'data', 'db6.rocks', 'db.json'), 'w') as f:
        json.dump({}, f)

    # ---- r4: filter_duplicates — 10% of collections share a name
    # pairwise (multiplicity 2, ~ the reference's own reported dup
    # distribution); the rest are unique.
    r4 = os.path.join(out, 'r4')
    os.makedirs(r4, exist_ok=True)
    r4cols = []
    for pk, pname, psize, price in parts:
        name = f'dup {pk // 20}' if pk % 10 == 0 else f'col {pk}'
        r4cols.append(collection_obj(pk, name, [f'Q{psize}'],
                                     pmembers.get(pk, []), price))
    write_jsonl(os.path.join(r4, 'collections.jsonl'), r4cols)

    # ---- r5: merge_collections_ending_with_letters — a11's ranged-name
    # construction (': A' / ': B' / plain by pk%3), 6 collections per
    # prefix so merges stay at the reference's real multiplicities.
    r5 = os.path.join(out, 'r5')
    os.makedirs(r5, exist_ok=True)
    suffix = {0: ': A', 1: ': B', 2: ''}
    r5cols = []
    for pk, pname, psize, price in parts:
        name = f'col {pk // 6}' + suffix[pk % 3]
        r5cols.append(collection_obj(pk, name, [f'Q{psize}'],
                                     pmembers.get(pk, []), price))
    write_jsonl(os.path.join(r5, 'collections.jsonl'), r5cols)

    # ---- r6: collections-preprocessing service (wordninja
    # segmentation + per-collection token counts) — a41's EXACT input
    # derivation: coll = p_partkey // 20, glued names (spaces removed,
    # every 3rd uppercased, every 5th with an out-of-dictionary 'q7'
    # suffix), plus the corpus-derived frequency-ranked wordlist the
    # wordninja shim loads (rank order = count DESC, token — the same
    # ranking Text.segmentDict uses, so the two engines score with the
    # same dictionary).
    r6 = os.path.join(out, 'r6')
    os.makedirs(r6, exist_ok=True)
    r6rows = con.sql(f"""
        SELECT p_partkey // 20 AS coll,
          list(
            (CASE WHEN p_partkey % 3 = 0
                  THEN upper(replace(p_name, ' ', ''))
                  ELSE replace(p_name, ' ', '') END ||
             CASE WHEN p_partkey % 5 = 0 THEN 'q7' ELSE '' END)
            ORDER BY p_partkey) AS names
        FROM '{sf}/part.parquet' GROUP BY 1 ORDER BY 1
    """).fetchall()
    with open(os.path.join(r6, 'collections.json'), 'w',
              encoding='utf-8') as f:
        json.dump([{'collection_name': f'coll-{c}', 'keywords': [],
                    'names': ns, 'description': ''} for c, ns in r6rows], f)
    r6toks = con.sql(f"""
        SELECT tok FROM (
          SELECT unnest(string_split(p_name, ' ')) AS tok
          FROM '{sf}/part.parquet')
        GROUP BY tok ORDER BY count(*) DESC, tok
    """).fetchall()
    with open(os.path.join(r6, 'wordninja_words.txt'), 'w',
              encoding='utf-8') as f:
        f.write('\n'.join(t[0] for t in r6toks) + '\n')

    print(f'exported {sf} -> {out}: parts={len(parts)} orders={len(okeys)} '
          f'lineitems={len(csv_rows)}')


if __name__ == '__main__':
    main()
