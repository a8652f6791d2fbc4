"""One-time generator for operators/pq_codebooks.json — per-subspace
k-means codebooks for product quantization (m=8 subspaces x 8 dims,
16 codes each), trained on the sf0.01 embeddings with a fixed seed.

Frozen-artifact pattern (same as operators/ivf_centroids.json): the
codebooks are plan literals shared by the Spark expressions and the DuckDB
oracle, so both engines score identically. Re-run only if the synthetic
corpus changes; at real scale the kmeans trainer (operators/kmeans.py)
would produce these per-subspace in one pass each.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow.parquet as pq

M = 8          # subspaces
SUB = 8        # dims per subspace (8 * 8 = 64)
K = 16         # codes per subspace (4-bit codes)
ITERS = 10
SEED = 20240814


def kmeans_np(x: np.ndarray, k: int, iters: int, rng: np.random.Generator):
    init_idx = rng.choice(len(x), size=k, replace=False)
    c = x[init_idx].astype(np.float64)
    for _ in range(iters):
        d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for j in range(k):
            mask = a == j
            if mask.any():
                c[j] = x[mask].mean(axis=0)
    return c


def main() -> None:
    t = pq.read_table("/root/testdata/sf0.01/embeddings.parquet")
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    rng = np.random.default_rng(SEED)
    books = []
    for s in range(M):
        sub = emb[:, s * SUB : (s + 1) * SUB]
        c = kmeans_np(sub, K, ITERS, rng)
        books.append([[float(v) for v in row] for row in c])
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "purldb_spark",
        "operators",
        "pq_codebooks.json",
    )
    with open(out, "w") as fh:
        json.dump(books, fh)
    print(f"wrote {M}x{K}x{SUB} codebooks to {out}")


if __name__ == "__main__":
    main()
