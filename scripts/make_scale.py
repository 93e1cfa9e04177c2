#!/usr/bin/env python3
"""Build R-times-replicated documents/embeddings for the scaling-curve
measurement (round-6 verdict #6). Replication preserves the PER-CAPITA
duplicate structure instead of inflating it:

- documents: replica r prefixes every word with 'r<r>', so shingle sets
  are disjoint across replicas (cross-replica jaccard = 0) while each
  replica's internal near-dup pairs are bit-identical to the original's
  -> true pair count grows LINEARLY with corpus size, and any
  super-linear runtime growth is the algorithm's, not the data's.
- embeddings: replica r applies a deterministic per-replica sign-flip
  (a diagonal orthogonal transform), which preserves every intra-replica
  cosine exactly and scrambles cross-replica cosines to ~0.

Other tables are symlinked from the source sf dir (Bench warm-up loads
them). Usage: make_scale.py <src_sf_dir> <out_dir> <replicas>
"""
import sys, os
import duckdb

src, out, R = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

con.execute(f"""
COPY (
  SELECT d.doc_id + r.i * (SELECT max(doc_id) + 1 FROM '{src}/documents.parquet') AS doc_id,
         CASE WHEN r.i = 0 THEN d.text
              ELSE array_to_string(list_transform(string_split(d.text, ' '),
                     w -> 'r' || r.i || w), ' ') END AS text,
         d.lang, d.source,
         CAST(length(CASE WHEN r.i = 0 THEN d.text
              ELSE array_to_string(list_transform(string_split(d.text, ' '),
                     w -> 'r' || r.i || w), ' ') END) AS BIGINT) AS n_chars
  FROM '{src}/documents.parquet' d, range({R}) r(i)
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")

con.execute(f"""
COPY (
  SELECT e.vec_id + r.i * (SELECT max(vec_id) + 1 FROM '{src}/embeddings.parquet') AS vec_id,
         CAST(list_transform(e.embedding,
           (x, j) -> CASE WHEN hash(r.i * 4096 + j) % 2 = 0 THEN x ELSE -x END)
           AS FLOAT[]) AS embedding,
         e.label
  FROM '{src}/embeddings.parquet' e, range({R}) r(i)
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")

for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events"]:
    dst = f"{out}/{t}.parquet"
    # abspath: a relative src would be stored relative to OUT and dangle;
    # lexists: a dangling link fails os.path.exists but still collides
    if os.path.lexists(dst):
        os.remove(dst)
    os.symlink(os.path.abspath(f"{src}/{t}.parquet"), dst)

for t in ["documents", "embeddings"]:
    n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")
