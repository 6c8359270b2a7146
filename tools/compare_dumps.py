#!/usr/bin/env python3
"""Bit-parity check between two graft.Verify output dirs (dev tool only).

Usage: python3 tools/compare_dumps.py <outDirA> <outDirB>

The pre-freeze hygiene trio's third leg: after a COLD six-gate matrix,
re-run Verify WARM (caches populated) and assert the two dumps are
bit-identical under canonical order — run-to-run determinism measured
across cache states, not assumed. Also used cross-layout (warm lake vs
cold single-file). Exact equality on every cell, floats included: no
tolerance, the claim is bit-parity.
"""
import sys, json, glob
import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main():
    a, b = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # union of BOTH dumps' query sets: iterating only A's would silently
    # skip queries present only in B and overstate parity (r13 review) —
    # a name missing on either side surfaces as DIFF via the glob check
    names = sorted(set(json.load(open(f"{a}/oracle_sql.json"))) |
                   set(json.load(open(f"{b}/oracle_sql.json"))))
    n_same = n_diff = 0
    for name in names:
        fa = glob.glob(f"{a}/{name}/*.parquet")
        fb = glob.glob(f"{b}/{name}/*.parquet")
        if not fa or not fb:
            print(f"DIFF {name}: missing dump ({len(fa)} vs {len(fb)} files)")
            n_diff += 1
            continue
        da = canon(con.sql(f"SELECT * FROM read_parquet({fa!r})").df())
        db = canon(con.sql(f"SELECT * FROM read_parquet({fb!r})").df())
        if list(da.columns) != list(db.columns):
            print(f"DIFF {name}: columns {list(da.columns)} != {list(db.columns)}")
            n_diff += 1
        elif len(da) != len(db):
            print(f"DIFF {name}: rows {len(da)} != {len(db)}")
            n_diff += 1
        else:
            same = True
            for c in da.columns:
                ga, gb = da[c], db[c]
                eq = (ga == gb) | (ga.isna() & gb.isna())
                if not eq.all():
                    i = (~eq).idxmax()
                    print(f"DIFF {name}: col {c} row {i}: {ga[i]!r} != {gb[i]!r}")
                    n_diff += 1
                    same = False
                    break
            if same:
                n_same += 1
    print(f"\n{n_same} identical, {n_diff} different")
    sys.exit(1 if n_diff else 0)


if __name__ == "__main__":
    main()
