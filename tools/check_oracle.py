#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tool only; the
shipped library is pure Scala/Spark).

Usage: python3 tools/check_oracle.py <sfDir> <outDir>

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran. For each
query: reads the Spark result parquet, runs the oracle SQL in DuckDB over
views named after the tables, sorts columns by name and rows by all
columns, and compares exactly (with a float-tolerance diagnostic when the
exact compare fails).
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = canon(con.sql(
            f"SELECT * FROM read_parquet({files!r})").df())
        exp = canon(con.sql(oracle[name]).df())
        status, detail = compare(got, exp)
        if status:
            n_pass += 1
            print(f"PASS {name}: {len(got)} rows x {len(got.columns)} cols")
        else:
            n_fail += 1
            print(f"FAIL {name}: {detail}")
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


def compare(got: pd.DataFrame, exp: pd.DataFrame):
    if list(got.columns) != list(exp.columns):
        return False, f"columns {list(got.columns)} != {list(exp.columns)}"
    if len(got) != len(exp):
        return False, f"rows {len(got)} != {len(exp)}"
    exact = True
    max_rel = 0.0
    bad_col = None
    for c in got.columns:
        g, e = got[c], exp[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(e):
            ga = pd.to_numeric(g, errors="coerce")
            ea = pd.to_numeric(e, errors="coerce")
            neq = ~((ga == ea) | (ga.isna() & ea.isna()))
            if neq.any():
                exact = False
                denom = ea.abs().clip(lower=1e-12)
                rel = ((ga - ea).abs() / denom)[neq].max()
                if not math.isnan(rel) and rel > max_rel:
                    max_rel, bad_col = rel, c
        else:
            gs, es = g.astype(str), e.astype(str)
            if not gs.equals(es):
                i = (gs != es).idxmax()
                return False, f"col {c} mismatch at row {i}: {g[i]!r} != {e[i]!r}"
    if exact:
        return True, ""
    return False, f"float mismatch, max rel diff {max_rel:.2e} in col {bad_col}"


if __name__ == "__main__":
    main()
