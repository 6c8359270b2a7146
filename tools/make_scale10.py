#!/usr/bin/env python3
"""Synthesize a ~10x scale probe from sf0.1 (dev tool only; the shipped
library is pure Scala/Spark). Writes to the output dir (default
/tmp/scale10):

- events:     10 time-shifted copies (each copy offset by the full span),
              so the resampled per-series bucket count grows 10x — the
              input shape that stresses the chunked-window machinery.
- documents:  10 copies with every token suffixed `_k` per copy, so the
              copies share NO shingles — candidate/pair workload grows
              10x (not 100x from cross-copy dup clusters).
- embeddings: 10 copies circular-shifted by k dims per copy — near-
              orthogonal across copies, so ANN/near-dup workload grows
              ~10x without a cross-copy pair explosion.
- all other tables: copied through unchanged.

Usage: python3 tools/make_scale10.py [outDir] [copies]
"""
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10

PASSTHROUGH = ["region", "nation", "customer", "supplier", "part",
               "orders", "lineitem"]


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    for t in PASSTHROUGH:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")
    con = duckdb.connect()
    span = con.sql(
        f"SELECT epoch_us(max(ts)) - epoch_us(min(ts)) + CAST(3600 AS BIGINT)*1000000 "
        f"FROM '{SRC}/events.parquet'").fetchone()[0]
    maxid = con.sql(
        f"SELECT max(event_id) + 1 FROM '{SRC}/events.parquet'").fetchone()[0]
    con.sql(f"""
      COPY (
        SELECT e.event_id + k.k * {maxid} AS event_id,
               e.ts + to_microseconds(CAST(k.k * {span} AS BIGINT)) AS ts,
               e.user_id, e.event_type, e.value, e.props
        FROM '{SRC}/events.parquet' e
        CROSS JOIN (SELECT unnest(generate_series(0, {K - 1})) AS k) k
      ) TO '{OUT}/events.parquet' (FORMAT PARQUET)""")
    maxdoc = con.sql(
        f"SELECT max(doc_id) + 1 FROM '{SRC}/documents.parquet'").fetchone()[0]
    con.sql(f"""
      COPY (
        SELECT d.doc_id + k.k * {maxdoc} AS doc_id,
               CASE WHEN k.k = 0 THEN d.text
                    ELSE replace(d.text, ' ', '_' || k.k || ' ')
                         || '_' || k.k END AS text,
               d.lang, d.source, d.n_chars
        FROM '{SRC}/documents.parquet' d
        CROSS JOIN (SELECT unnest(generate_series(0, {K - 1})) AS k) k
      ) TO '{OUT}/documents.parquet' (FORMAT PARQUET)""")
    maxvec = con.sql(
        f"SELECT max(vec_id) + 1 FROM '{SRC}/embeddings.parquet'").fetchone()[0]
    con.sql(f"""
      COPY (
        SELECT v.vec_id + k.k * {maxvec} AS vec_id,
               -- shift by (k mod D); negate for k >= D. A plain shift
               -- wraps at D copies: k = D slices to [] ++ full = an
               -- EXACT duplicate (and k > D clamps likewise), which
               -- plants cos=1.0 ties that saturate recall@k for every
               -- ANN method. The negated shifts stay distinct up to 2D
               -- copies.
               CASE WHEN k.k = 0 THEN v.embedding
                    ELSE list_transform(
                      list_concat(
                        v.embedding[(k.k % len(v.embedding)) + 1:],
                        v.embedding[1:(k.k % len(v.embedding))]),
                      x -> CASE WHEN k.k >= len(v.embedding)
                                THEN -x ELSE x END) END AS embedding,
               v.label
        FROM '{SRC}/embeddings.parquet' v
        CROSS JOIN (SELECT unnest(generate_series(0, {K - 1})) AS k) k
      ) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)""")
    for t in ["events", "documents", "embeddings"]:
        n = con.sql(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
