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
them). Usage: make_scale.py <src_sf_dir> <out_dir> <replicas> [--relational]

With --relational the TPC-H-shaped tables are ALSO replicated R times
(sf0.1 x 10 = a true sf1-equivalent): every key column is shifted by
replica * (max_key + 1) with FOREIGN keys shifted by the SAME replica
index, so each replica is a self-contained join-closed copy — join
fan-outs, per-key group sizes, and selectivities are preserved exactly,
and result sizes grow linearly. region/nation stay fixed-size (as in
TPC-H scaling; their keys are referenced unshifted). events shifts
event_id and user_id (per-user session/state structure constant).
"""
import sys, os
import duckdb

src, out, R = sys.argv[1], sys.argv[2], int(sys.argv[3])
relational = "--relational" in sys.argv[4:]
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
) TO '{out}/documents.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 2048)
""")

def rg_size(table):
    """Row-group size targeting ~64 groups per written table, so every
    scan can feed a 32-core budget with margin. This corpus exists to
    measure LOCAL parallelism — size groups by count here; a real 100 TB
    ingest sizes them by bytes (~64-128 MB). r13: the r12 corpus shipped
    embeddings as ONE row group (duckdb's 122880-row default > the whole
    table), serializing every pre-shuffle signature/decode stage of the
    s/d05/d06 block; the audit below now fails generation on that."""
    n = con.execute(f"SELECT count(*) FROM '{src}/{table}.parquet'"
                    ).fetchone()[0] * R
    return max(512, n // 64)


con.execute(f"""
COPY (
  SELECT e.vec_id + r.i * (SELECT max(vec_id) + 1 FROM '{src}/embeddings.parquet') AS vec_id,
         CAST(list_transform(e.embedding,
           (x, j) -> CASE WHEN hash(r.i * 4096 + j) % 2 = 0 THEN x ELSE -x END)
           AS FLOAT[]) AS embedding,
         e.label
  FROM '{src}/embeddings.parquet' e, range({R}) r(i)
) TO '{out}/embeddings.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE {rg_size("embeddings")})
""")

# key columns to shift per replicated table: (primary keys + foreign keys
# into other REPLICATED tables). Foreign keys into fixed-size tables
# (n_nationkey refs) stay unshifted. Shift amounts come from the PARENT
# table's own key space so child FKs land exactly on the parent's shifted
# keys (same replica index -> same offset -> join-closed replicas).
SHIFT = {
    "customer": [("c_custkey", "customer", "c_custkey")],
    "supplier": [("s_suppkey", "supplier", "s_suppkey")],
    "part":     [("p_partkey", "part", "p_partkey")],
    "orders":   [("o_orderkey", "orders", "o_orderkey"),
                 ("o_custkey", "customer", "c_custkey")],
    "lineitem": [("l_orderkey", "orders", "o_orderkey"),
                 ("l_partkey", "part", "p_partkey"),
                 ("l_suppkey", "supplier", "s_suppkey")],
    "events":   [("event_id", "events", "event_id"),
                 ("user_id", "events", "user_id")],
}

replicated, linked = [], ["region", "nation"]
if relational:
    replicated = ["customer", "supplier", "part", "orders", "lineitem",
                  "events"]
else:
    linked += ["customer", "supplier", "part", "orders", "lineitem",
               "events"]

for t in replicated:
    cols = [c[0] for c in con.execute(
        f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
    shifts = {col: (ptab, pkey) for col, ptab, pkey in SHIFT[t]}
    exprs = []
    for c in cols:
        if c in shifts:
            ptab, pkey = shifts[c]
            exprs.append(
                f"t.{c} + r.i * (SELECT max({pkey}) + 1 "
                f"FROM '{src}/{ptab}.parquet') AS {c}")
        else:
            exprs.append(f"t.{c}")
    con.execute(f"""
    COPY (
      SELECT {', '.join(exprs)}
      FROM '{src}/{t}.parquet' t, range({R}) r(i)
    ) TO '{out}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE {rg_size(t)})
    """)

# DuckDB writes TIMESTAMP as µs/NTZ — the same physical encoding the
# driver corpus now carries; the repo's reads are schema-adaptive
# (Tables.normalizeTs), so no physical-type rewrite is needed here.

for t in linked:
    dst = f"{out}/{t}.parquet"
    # abspath: a relative src would be stored relative to OUT and dangle;
    # lexists: a dangling link fails os.path.exists but still collides
    if os.path.lexists(dst):
        os.remove(dst)
    os.symlink(os.path.abspath(f"{src}/{t}.parquet"), dst)

for t in ["documents", "embeddings"] + replicated:
    n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")

# Post-write layout assertion (r12 verdict #4): the rowGroupAudit rule —
# scan parallelism is bounded by ROW GROUPS per file, not split math — as
# a generation-time guardrail. A beyond-one-split table written with
# fewer row groups than the core budget serializes a 32-core scan (the
# r11 sf1 incident: 1 row group/file => a narrow pass ran on 3 tasks).
# DuckDB clamps ROW_GROUP_SIZE to ~2048-row multiples, so a table whose
# target group is smaller (embeddings: 312 rows) still comes out bound —
# those are REWRITTEN in place with pyarrow (lossless arrow round-trip,
# honors arbitrary group sizes), then re-checked; a table still bound
# after the rewrite fails generation. Deeper audit:
#   sbt "runMain graft.AuditMain <out>"
import pyarrow.parquet as pq
CORE_BUDGET = 32
MAX_PARTITION_BYTES = 128 * 1024 * 1024
# the BENCH session's conf (Graft.tuneLocalScanSplits), not the spark
# default 4 MB: the lower open cost plans more splits, making row groups
# the binding constraint more often — "ok" here must mean "ok in the
# sweeps this corpus exists for"
OPEN_COST = 262144


def layout_verdict(path):
    groups = pq.ParquetFile(path).metadata.num_row_groups
    size = os.path.getsize(path)
    # FilePartition.maxSplitBytes with minPartitionNum=cores: for
    # mid-size tables the split shrinks to ~total/cores, so split math
    # plans ~core-budget tasks — the 128 MB constant alone is too lenient
    max_split = min(MAX_PARTITION_BYTES,
                    max(OPEN_COST, (size + OPEN_COST) // CORE_BUDGET))
    splits = -(-size // max_split)  # ceil: tasks split math would plan
    # ok = under one split (small/serial by nature), or row groups can
    # feed every core, or row groups aren't the binding constraint
    # (groups >= splits => split_bound, a session knob, not a file fix)
    return groups, size, size <= max_split or groups >= min(CORE_BUDGET, splits)


bad = []
for t in ["documents", "embeddings"] + replicated:
    path = f"{out}/{t}.parquet"
    groups, size, ok = layout_verdict(path)
    if not ok:
        tbl = pq.read_table(path)
        pq.write_table(tbl, path,
                       row_group_size=max(256, tbl.num_rows // 64))
        groups, size, ok = layout_verdict(path)
    print(f"{t}: {groups} row groups, {size / 1e6:.1f} MB "
          f"{'ok' if ok else 'ROW_GROUP_BOUND'}")
    if not ok:
        bad.append(t)
if bad:
    sys.exit(f"LAYOUT REGRESSION: {bad} still row-group-bound after the "
             f"pyarrow rewrite — not shipping a serialized-scan corpus")
