#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/verify_local.py <sfdir> <outdir>
  (run `sbt "runMain graft.Verify <sfdir> <outdir>"` first)

For each <outdir>/<name> parquet dir with an oracle in oracle_sql.json,
runs the oracle in DuckDB against the sf tables, sorts columns by name,
sorts rows, and compares cell-by-cell (floats with tight tolerance).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def sort_key(x):
    # Floats sort on a representation rounded to the comparison
    # tolerance so two rows differing only below tolerance cannot sort
    # into different positions on the got vs want side.
    if x is None:
        return (True, "")
    if isinstance(x, float):
        # Rounded one order coarser than the comparison tolerance so
        # tolerance-equal values cannot straddle a rounding boundary
        # into different sort positions.
        return (False, f"{x:.6g}" if math.isfinite(x) else str(x))
    return (False, str(x))


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(out, key=lambda t: tuple(sort_key(x) for x in t)), \
        [cols[i] for i in order]


def eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return a == b


def main(sfdir, outdir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    if only:
        oracles = {k: v for k, v in oracles.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            grows, gcols = canon(got.fetchall(), got.columns)
            want = con.sql(sql)
            wrows, wcols = canon(want.fetchall(), want.columns)
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} != {wcols}")
            n_fail += 1
            continue
        if len(grows) != len(wrows):
            print(f"FAIL {name}: rows {len(grows)} != {len(wrows)}")
            n_fail += 1
            continue
        bad = None
        for i, (g, w) in enumerate(zip(grows, wrows)):
            if not all(eq(a, b) for a, b in zip(g, w)):
                bad = (i, g, w)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}\n  got  {bad[1]}\n  want {bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    # Optional 3rd arg: comma-separated query names (focused runs that
    # only dumped a subset — mirrors graft.Verify's 3rd arg).
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
