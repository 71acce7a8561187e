#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB oracle gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [nameFilter]

Reads each <verifyOutDir>/<name>/*.parquet written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB over the same sfDir tables, sorts
columns by name (as the driver does), and compares values exactly.
Dev-only tool: not part of the shipped library.
"""
import json
import math
import sys
from glob import glob

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows):
    out = []
    for row in rows:
        r = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    r.append("NaN")
                else:
                    r.append(repr(v))
            elif isinstance(v, list):
                r.append(tuple(v))
            else:
                r.append(v)
        out.append(tuple(r))
    return out


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    flt = sys.argv[3] if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if flt and flt not in name:
            continue
        files = sorted(glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
            odf = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        # The DRIVER harness sorts rows with pandas, which cannot sort
        # array cells (round-11 k18_encode red row). Mirror that limit:
        # any list-typed Spark output column is a hard FAIL here.
        import pyarrow.types as pat
        listy = [f.name for f in sdf.schema
                 if pat.is_list(f.type) or pat.is_large_list(f.type)]
        if listy:
            print(f"FAIL {name}: array-typed output columns {listy} "
                  "(driver harness cannot sort array cells — stringify)")
            n_fail += 1
            continue
        scols, ocols = sorted(sdf.column_names), sorted(odf.column_names)
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        sdf, odf = sdf.select(scols), odf.select(ocols)
        srows = canon([tuple(r.values()) for r in sdf.to_pylist()])
        orows = canon([tuple(r.values()) for r in odf.to_pylist()])
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        if srows == orows:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
        else:
            # also try order-insensitive compare to distinguish sort-only issues
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
            sorted_eq = sorted(map(str, srows)) == sorted(map(str, orows))
            tag = " (equal if re-sorted!)" if sorted_eq else ""
            print(f"FAIL {name}: {len(diffs)}/{len(srows)} rows differ{tag}")
            for i, a, b in diffs[:3]:
                print(f"  row {i}:\n    spark : {a}\n    oracle: {b}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
