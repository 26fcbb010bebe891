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
             vec_col: str = "embedding", exclude_ids=(),
             centroids: np.ndarray = None) -> pd.DataFrame:
    """IVF: assign vectors to coarse buckets, probe only the nearest
    ``nprobe`` buckets per query. One int-key shuffle; per-bucket exact.
    With ``nprobe == n_centroids`` every bucket is probed and the
    result equals brute-force top-k exactly.

    ``centroids``: optionally pass a precomputed quantizer — e.g. the
    full-corpus ``kmeans_embeddings`` output (normalized here) instead
    of the default sample-trained k-means-lite."""
    import ray

    if centroids is None:
        centroids = train_centroids(ds, n_centroids, vec_col=vec_col)
    else:
        centroids = _normalize(np.asarray(centroids, dtype=np.float64))
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


class _AssignPartial:
    """map_batches stage for one Lloyd iteration: per-batch nearest-
    centroid assignment (squared L2, argmin tie -> smallest cid) and
    the per-centroid (count, vector-sum) PARTIAL — only k rows of
    k x dim partials leave each batch, never the vectors (the
    combiner-before-shuffle shape; the 'shuffle' here is a driver
    merge of k x n_blocks tiny rows)."""

    def __init__(self, cents_ref, id_col: str, vec_col: str,
                 emit: str = "partial"):
        import ray

        self.c = (ray.get(cents_ref)
                  if isinstance(cents_ref, ray.ObjectRef) else cents_ref)
        self.c_sq = (self.c * self.c).sum(axis=1)
        self.id_col, self.vec_col, self.emit = id_col, vec_col, emit

    def _assign(self, mat: np.ndarray) -> np.ndarray:
        # squared L2 = |x|^2 - 2 x.c + |c|^2; |x|^2 constant per row
        # so argmin over (-2 x.c + |c|^2) matches argmin over the true
        # sqrt distance (monotonic); np.argmin takes the FIRST minimum
        # = smallest cid, mirroring the oracle's ORDER BY dist, cid
        return (self.c_sq - 2.0 * (mat @ self.c.T)).argmin(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            if self.emit == "assign":
                return pd.DataFrame({
                    self.id_col: pd.Series([], dtype=np.int64),
                    "cluster": pd.Series([], dtype=np.int64)})
            return pd.DataFrame({
                "cid": pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64),
                "s": pd.Series([], dtype=object)})
        mat = np.stack(batch[self.vec_col].to_numpy()).astype(np.float64)
        a = self._assign(mat)
        if self.emit == "assign":
            return pd.DataFrame({
                self.id_col: batch[self.id_col].to_numpy(np.int64),
                "cluster": a.astype(np.int64)})
        if self.emit == "assign_keep":
            # assignment + the vector itself, so downstream
            # within-cluster stages (semdedup) need no payload join
            return pd.DataFrame({
                self.id_col: batch[self.id_col].to_numpy(np.int64),
                "cluster": a.astype(np.int64),
                self.vec_col: list(batch[self.vec_col])})
        cids, counts, sums = [], [], []
        for cid in np.unique(a):
            m = a == cid
            cids.append(int(cid))
            counts.append(int(m.sum()))
            sums.append(mat[m].sum(axis=0))
        return pd.DataFrame({
            "cid": np.asarray(cids, np.int64),
            "n": np.asarray(counts, np.int64),
            "s": pd.Series(sums, dtype=object)})


def kmeans_embeddings(ds, k: int = 8, n_iter: int = 4,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      init: str = "ids", sample_rows: int = 4096):
    """Distributed Lloyd's k-means over an embedding column — the
    semantic-clustering primitive (SemDeDup-style dedup buckets,
    domain discovery, IVF training) expressed Ray-Data-first:

    - init ``"ids"`` (oracle mode): centroids = the embeddings of
      the ``k`` smallest ids (deterministic; per-block local
      k-smallest, k x blocks driver merge — no sort, no full collect);
      init ``"spread"`` (production mode): greedy farthest-point
      (k-means++-style without RNG) over a deterministic
      ``sample_rows``-row prefix sample — far better seeds on clumped
      data, still fully deterministic, no SQL mirror;
    - each iteration: broadcast the k x dim centroid matrix via
      ``ray.put``, one streaming pass emits per-batch per-centroid
      (count, sum) partials, the driver folds k x n_blocks partial
      rows into new means.  Data never shuffles; only centroid-sized
      state moves.  Empty clusters keep their previous centroid.
    - means are rounded to 6 decimals each iteration so the numpy and
      DuckDB mirrors see bit-identical centroids (both engines round
      the same exact-int-free mean to the same decimal, absorbing
      summation-order ulps), making an ITERATIVE algorithm fully
      oracle-checkable (sql_embedding_clusters);
    - final pass: (id, cluster) assignment, streaming.

    Returns (assignments Dataset, centroid matrix np.ndarray).
    """
    import ray

    work = ds.select_columns([id_col, vec_col]).materialize()

    # ---- deterministic init
    def local_min(b: pd.DataFrame) -> pd.DataFrame:
        return b.nsmallest(k, id_col)[[id_col, vec_col]]

    if init == "ids":
        cand = work.map_batches(local_min, batch_format="pandas").to_pandas()
        cand = cand.nsmallest(k, id_col).sort_values(id_col)
        cents = np.stack(cand[vec_col].to_numpy()).astype(np.float64)
    elif init == "spread":
        # greedy farthest-point: seed with the smallest-id vector,
        # then repeatedly take the sample vector farthest from its
        # nearest chosen centroid (deterministic ties -> smallest idx)
        sample = work.take(sample_rows)
        sample.sort(key=lambda r: r[id_col])
        mat = np.stack([np.asarray(r[vec_col], dtype=np.float64)
                        for r in sample])
        chosen = [0]
        d2 = ((mat - mat[0]) ** 2).sum(axis=1)
        while len(chosen) < min(k, len(mat)):
            nxt = int(d2.argmax())
            chosen.append(nxt)
            d2 = np.minimum(d2, ((mat - mat[nxt]) ** 2).sum(axis=1))
        cents = mat[chosen]
    else:
        raise ValueError(f"unknown init {init!r}")

    # task-pool stages, NOT an actor pool: a fresh actor pool per
    # Lloyd iteration costs ~1.2 s spin-up each (measured 6.0 s ->
    # 0.5 s for the whole job at sf0.1 when switched to tasks), and
    # the per-task state rebuild is one zero-copy plasma read of the
    # k x dim centroid matrix plus a k-row dot — negligible at any
    # scale.
    def _stage(cref, emit):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            return _AssignPartial(cref, id_col, vec_col, emit=emit)(b)
        return f

    for _ in range(n_iter):
        cref = ray.put(cents)
        parts = work.map_batches(
            _stage(cref, "partial"), batch_format="pandas").to_pandas()
        new = cents.copy()
        for cid, g in parts.groupby("cid"):
            total = np.sum(np.stack(g["s"].to_numpy()), axis=0)
            new[int(cid)] = total / g["n"].sum()
        cents = np.round(new, 6)

    cref = ray.put(cents)
    assign = work.map_batches(_stage(cref, "assign"), batch_format="pandas")
    return assign, cents


def semdedup_embeddings(ds, k: int = 8, n_iter: int = 4,
                        threshold: float = 0.45, id_col: str = "vec_id",
                        vec_col: str = "embedding", init: str = "ids"):
    """SemDeDup (Abbas et al. 2023) end to end: k-means buckets ->
    WITHIN-bucket cosine near-dup pairs -> connected components ->
    (vec_id, cluster = min id in component; singletons keep their own
    id).  Downstream dedup keeps one representative per cluster.

    Scale shape: the whole point of SemDeDup is that the quadratic
    cosine comparison runs inside k-means buckets of ~n/k vectors
    (production k is large, e.g. 100k), never corpus-wide.  Here:
    kmeans trains with centroid-only traffic (stages above), ONE
    streaming pass re-assigns while KEEPING the vector (emit=
    "assign_keep" — no payload join), one cluster-key groupby
    co-locates each bucket, and the per-bucket kernel is a
    normalize + matmul.  Pairs can only form within a bucket, so the
    CC closure input is bucket-local; the closure itself reuses the
    distributed min-label machinery.  The cosine-threshold float
    contract is the embedding_near_dups one (pair set stable; the
    value never compared)."""
    import ray

    from .dedup import _propagate_min_labels, assign_clusters

    _, cents = kmeans_embeddings(ds, k=k, n_iter=n_iter, id_col=id_col,
                                 vec_col=vec_col, init=init)
    cref = ray.put(cents)

    def assign_keep(b: pd.DataFrame) -> pd.DataFrame:
        return _AssignPartial(cref, id_col, vec_col,
                              emit="assign_keep")(b)

    assigned = ds.select_columns([id_col, vec_col]).map_batches(
        assign_keep, batch_format="pandas")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64)})
        mat = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                          1e-12)
        sims = mat @ mat.T
        ia, ib = np.nonzero(sims >= threshold)
        ids = g[id_col].to_numpy(np.int64)
        a, b = ids[ia], ids[ib]
        keep = a < b
        return pd.DataFrame({"id_a": a[keep], "id_b": b[keep]})

    pairs = assigned.groupby("cluster").map_groups(
        bucket_pairs, batch_format="pandas")
    labels = _propagate_min_labels(pairs)
    return assign_clusters(ds, labels, id_col=id_col)
