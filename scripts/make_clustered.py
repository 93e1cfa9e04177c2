#!/usr/bin/env python3
"""Planted-cluster embeddings fixture for the IVF calibration probe
(r15 verdict #4 -> r16): a mixture-of-Gaussians corpus where IVF's
"clustered corpora prune harder" claim can be MEASURED instead of
argued. The shipped synthetic embeddings are near-uniform on the
sphere (measured alpha ~= 2.6-3.4, PERF.md r15), which forces the
recall-targeted sizer to scan fractions near 0.78 for a 0.95 floor;
real embedding corpora are clustered, where small nprobe already
captures each query's neighborhood.

Generation (seeded, deterministic): K centers ~ N(0, I_64) normalized;
each point = normalize(center_c + sigma * N(0, I_64)) with c = i mod K.
sigma controls cluster tightness: the noise norm is sigma*sqrt(dim), so
point-center cosine concentrates near 1/sqrt(1+dim*sigma^2) and
intra-cluster pair cosine near 1/(1+dim*sigma^2) (sigma=0.06, dim=64 ->
~0.90 / ~0.81); cross-cluster around 0. Writes ONLY embeddings.parquet (vec_id, embedding float[64]) with
the same row-group sizing rule make_scale.py applies, so IvfProbe can
point SPARK_GRAFT_SF_DIR at the output dir unchanged.

Usage: make_clustered.py <out_dir> <n_rows> <n_clusters> [sigma]
"""
import sys, os
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

out, n, k = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
sigma = float(sys.argv[4]) if len(sys.argv) > 4 else 0.06
dim = 64
rng = np.random.default_rng(42)

centers = rng.standard_normal((k, dim))
centers /= np.linalg.norm(centers, axis=1, keepdims=True)
assign = np.arange(n) % k
pts = centers[assign] + sigma * rng.standard_normal((n, dim))
pts /= np.linalg.norm(pts, axis=1, keepdims=True)
pts = pts.astype(np.float32)

os.makedirs(out, exist_ok=True)
tbl = pa.table({
    "vec_id": pa.array(np.arange(n, dtype=np.int64)),
    "embedding": pa.FixedSizeListArray.from_arrays(
        pa.array(pts.reshape(-1)), dim).cast(pa.list_(pa.float32())),
})
# same sizing rule as make_scale.py (line 59): ~64 row groups so local
# scan stages keep their parallelism (the r13 single-row-group lesson)
rows_per_group = max(512, n // 64)
pq.write_table(tbl, os.path.join(out, "embeddings.parquet"),
               row_group_size=rows_per_group)
# intra/cross cosine sanity so the fixture's tightness is recorded
intra = float(np.mean(np.sum(pts[assign == 0][:50] * centers[0], axis=1)))
print(f"wrote {n} rows, {k} clusters, sigma={sigma}, dim={dim}, "
      f"rows_per_group={rows_per_group}, mean point-center cosine "
      f"(cluster 0 sample)={intra:.3f}")
