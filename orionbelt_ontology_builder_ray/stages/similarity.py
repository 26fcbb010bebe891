"""Similarity search over an embedding column (list<float>).

- ``ann_topk`` — brute-force cosine top-k: the query matrix is
  broadcast (``ray.put``) once; each batch does one float64 matmul and
  keeps a local top-k; the driver merges the tiny per-batch heaps.
  At 100 TB the same shape holds — only k rows per batch leave the
  workers.
- ``ivf_topk`` — the scale path: k-means-lite coarse quantizer built
  on a sample, vectors bucketed by nearest centroid (one shuffle by
  int key), queries probe the ``nprobe`` nearest buckets only.
"""

from __future__ import annotations

import heapq
from typing import List, Tuple

import numpy as np
import pandas as pd

from ..functions.terms import pool_size


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


class BatchTopK:
    """map_batches stage: local cosine top-k per batch against the
    broadcast query matrix."""

    def __init__(self, query_ref, k: int, id_col: str, vec_col: str,
                 exclude_ids=()):
        try:
            import ray

            if isinstance(query_ref, ray.ObjectRef):
                query_ref = ray.get(query_ref)
        except ImportError:
            pass
        self.q = _normalize(np.atleast_2d(np.asarray(query_ref, dtype=np.float64)))
        self.k = k
        self.id_col, self.vec_col = id_col, vec_col
        self.exclude = set(exclude_ids)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[self.id_col].to_numpy()
        keep = ~np.isin(ids, list(self.exclude)) if self.exclude else slice(None)
        ids = ids[keep]
        if len(ids) == 0:
            return pd.DataFrame({"query_idx": pd.Series([], dtype=np.int64),
                                 self.id_col: pd.Series([], dtype=np.int64),
                                 "cosine": pd.Series([], dtype=np.float64)})
        mat = _normalize(np.stack(batch[self.vec_col].to_numpy()[keep])
                         .astype(np.float64))
        sims = self.q @ mat.T  # (n_queries, n_batch)
        k = min(self.k, sims.shape[1])
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        return pd.DataFrame({
            "query_idx": np.repeat(np.arange(sims.shape[0], dtype=np.int64), k),
            self.id_col: ids[idx.ravel()],
            "cosine": np.take_along_axis(sims, idx, axis=1).ravel(),
        })


def ann_topk(ds, query_matrix: np.ndarray, k: int = 10, id_col: str = "vec_id",
             vec_col: str = "embedding", exclude_ids=(),
             batch_size: int = 4096) -> pd.DataFrame:
    """Global cosine top-k per query row; returns a small pandas frame
    (query_idx, id, cosine, rnk) with rank ties broken by id."""
    try:
        import ray

        ref = ray.put(np.asarray(query_matrix, dtype=np.float64))
    except ImportError:
        ref = query_matrix
    partial = ds.map_batches(
        BatchTopK,
        fn_constructor_kwargs=dict(query_ref=ref, k=k, id_col=id_col,
                                   vec_col=vec_col, exclude_ids=exclude_ids),
        batch_format="pandas", batch_size=batch_size, concurrency=pool_size())
    all_parts = partial.to_pandas()
    out_frames = []
    for qi, g in all_parts.groupby("query_idx"):
        g = g.sort_values(["cosine", id_col],
                          ascending=[False, True]).head(k).copy()
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        out_frames.append(g)
    if not out_frames:
        return pd.DataFrame({"query_idx": [], id_col: [], "cosine": [],
                             "rnk": []})
    return pd.concat(out_frames, ignore_index=True)


# ---------------------------------------------------------------------------
# IVF-style bucketed variant (scale path)
# ---------------------------------------------------------------------------


def train_centroids(ds, n_centroids: int = 16, sample_rows: int = 2048,
                    iters: int = 10, vec_col: str = "embedding",
                    seed: int = 13) -> np.ndarray:
    """k-means-lite on a driver-side sample (deterministic seed)."""
    sample = ds.select_columns([vec_col]).take(sample_rows)
    mat = _normalize(np.stack([np.asarray(r[vec_col], dtype=np.float64)
                               for r in sample]))
    rng = np.random.RandomState(seed)
    centroids = mat[rng.choice(len(mat), size=min(n_centroids, len(mat)),
                               replace=False)]
    for _ in range(iters):
        assign = (mat @ centroids.T).argmax(axis=1)
        for c in range(len(centroids)):
            members = mat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def ivf_topk(ds, query_matrix: np.ndarray, k: int = 10, n_centroids: int = 16,
             nprobe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding", exclude_ids=()) -> pd.DataFrame:
    """IVF: assign vectors to coarse buckets, probe only the nearest
    ``nprobe`` buckets per query. One int-key shuffle; per-bucket exact.
    With ``nprobe == n_centroids`` every bucket is probed and the
    result equals brute-force top-k exactly."""
    import ray

    centroids = train_centroids(ds, n_centroids, vec_col=vec_col)
    cref = ray.put(centroids)
    q = _normalize(np.atleast_2d(np.asarray(query_matrix, dtype=np.float64)))
    probe = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]
    wanted = np.unique(probe.ravel()).astype(np.int32)

    class AssignAndProbe:
        """Assign each vector its nearest centroid and keep only rows
        falling in a probed bucket — one vectorized pass (the probe
        mask is fused here; a per-row Python filter over the corpus
        would dominate at scale)."""

        def __init__(self):
            self.c = ray.get(cref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            mat = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
            bucket = (mat @ self.c.T).argmax(axis=1).astype(np.int32)
            return batch[np.isin(bucket, wanted)]

    probed = ds.map_batches(AssignAndProbe, batch_format="pandas",
                            concurrency=pool_size())
    return ann_topk(probed, q, k=k, id_col=id_col, vec_col=vec_col,
                    exclude_ids=exclude_ids)
