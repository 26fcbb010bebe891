"""Distributed PageRank over the KG entity graph.

The missing graph-analytics family: entity centrality over the
knowledge graph the engine itself builds (reference analog: the
importance ordering behind get_visualization_data's node selection,
app.py's graph views — re-expressed as a first-class distributed
operator).  Like k-means (stages/similarity.py) it is ITERATIVE, and
like k-means it is driver-checkable against an unrolled DuckDB oracle
— but where k-means re-syncs float means via ROUND(x, 6) each
iteration, PageRank here is defined as **e6 fixed-point integer
PageRank**: every rank is an int64 count of 1e-6 "rank mass" units
and every operation is integer arithmetic (multiply, floor-divide,
sum), so both engines are bit-identical BY CONSTRUCTION — no
summation-order ulps exist at all.

The data contract (documented, deterministic, engine-independent):

- graph: distinct (src, dst) pairs from URI-object triples,
  ``predicate != rdf:type``, self-loops dropped;
- ``r0(v) = 1_000_000`` for every node (total mass = N * 1e6);
- per iteration, with ``d = 85/100`` damping::

      contrib(u -> v) = (85 * r(u)) // (100 * outdeg(u))
      dangling_share  = (85 * sum(r(u) for outdeg(u) == 0)) // (100 * N)
      r'(v)           = 150_000 + dangling_share + sum(contrib(* -> v))

  Floor division loses < 1 mass unit (1e-6) per edge per iteration —
  negligible bias, and identical in numpy int64 and DuckDB BIGINT
  (both floor on non-negative operands; verified).  Overflow bound:
  ``85 * r`` stays inside int64 while total mass N * 1e6 < ~1e17,
  i.e. N < ~1e11 nodes — document-and-monitor territory at 100 TB.

Two execution paths, auto-selected by edge count (the dedup
BROADCAST_ID_CAP precedent), pytest-pinned equal:

- **broadcast** (default, edges <= ``PAGERANK_BROADCAST_EDGE_CAP``):
  node vocabulary + out-degrees fold once on the driver; per
  iteration only the N-sized int64 rank array moves (``ray.put``
  once, zero-copy plasma read per task), each task emits per-batch
  (dst, partial-sum) rows combined locally with ``np.add.at`` —
  the k-means shape with N instead of k x dim.
- **shuffle fallback** (above the cap): ranks stay a Dataset; per
  iteration one groupby(src) co-groups each node's rank row with its
  out-edges (out-degree = the group's edge count — never
  materialized globally), emits integer contributions, and one
  groupby(dst) sums them; dangling mass is a scalar aggregate.
  Nothing driver-sized anywhere; two shuffles per iteration is the
  honest price of an N > 10^10 graph.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.terms import RDF_TYPE

# Above this many (distinct) edges the driver no longer folds the
# node vocabulary / rank vector; the shuffle fallback takes over.
# 20M edges -> <= 40M nodes -> <= ~2.4 GB of driver string+int state,
# the same comfort bound as dedup._INCR_BROADCAST_MAX.
PAGERANK_BROADCAST_EDGE_CAP = 20_000_000

_TELEPORT = 150_000        # (1 - 0.85) * 1e6, exact
_R0 = 1_000_000            # initial mass per node, exact
_DANGLING_KEY = "\x00dangling\x00"  # out-of-band dst tag (never a URI)


def entity_edges(triples_ds, num_buckets: int = 32):
    """Distinct entity->entity edges: URI-object triples minus
    rdf:type rows and self-loops.  One projection pass with per-batch
    LOCAL dedup, then one (src, dst)-hash bucket shuffle with a
    VECTORIZED per-bucket drop_duplicates — the dedup.py idiom.  A
    naive ``groupby([src, dst]).map_groups`` pays a Python call per
    DISTINCT EDGE (measured: the 51 s cliff at sf0.1x4); this pays
    ``num_buckets`` calls."""

    def proj(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(t["object_kind"], "uri"),
            pc.and_(pc.not_equal(t["predicate"], RDF_TYPE),
                    pc.not_equal(t["subject"], t["object"])))
        out = t.filter(keep).select(["subject", "object"]) \
            .rename_columns(["src", "dst"])
        # local distinct in arrow's C++ hash-groupby, THEN hash only
        # the survivors for the bucket column (the full batch never
        # touches pandas — measured 10.7 s -> arrow path below)
        out = out.group_by(["src", "dst"]).aggregate([])
        h = pd.util.hash_pandas_object(
            out["src"].to_pandas(), index=False).to_numpy() \
            ^ pd.util.hash_pandas_object(
            out["dst"].to_pandas(), index=False).to_numpy()
        return out.append_column(
            "_b", pa.array((h % num_buckets).astype(np.int32), pa.int32()))

    pairs = triples_ds.map_batches(proj, batch_format="pyarrow")

    def bucket_distinct(g: pa.Table) -> pa.Table:
        return g.select(["src", "dst"]).group_by(
            ["src", "dst"]).aggregate([])

    return pairs.groupby("_b").map_groups(bucket_distinct,
                                          batch_format="pyarrow")


# ---------------------------------------------------------------------------
# broadcast path
# ---------------------------------------------------------------------------


class _ContribPartial:
    """Per-batch integer contribution partials: for each edge batch,
    contrib = (85 * r[src]) // (100 * deg[src]), locally combined by
    dst (np.add.at on a compacted array — exact int64, unlike
    bincount's float weights)."""

    def __init__(self, ranks_ref, deg_ref):
        import ray
        self._r = ray.get(ranks_ref)
        self._d = ray.get(deg_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        contrib = (85 * self._r[src]) // (100 * self._d[src])
        uniq, inv = np.unique(dst, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, contrib)
        return pa.table({"dst": pa.array(uniq, pa.int64()),
                         "s": pa.array(sums, pa.int64())})


def _pagerank_broadcast(edges, n_iter: int, seed_prefix: str = None,
                        folded=None):
    """``seed_prefix`` switches to PERSONALIZED PageRank: the whole
    teleport mass (0.15 of the total, = 15 * N * 1e6 / 100 micro
    units) and the dangling redistribution flow ONLY to nodes whose
    URI starts with the prefix, instead of uniformly — same integer
    contract (floor divisions by the seed count), still bit-identical
    across engines.  r0 stays uniform (the iteration forgets it).
    ``folded`` = a components.fold_vocab(edges) result to share the
    vocabulary fold across the graph-op family."""
    import ray
    import ray.data as rd

    if folded is not None:
        nodes, int_edges = folded
    else:
        # one vocabulary fold + integer-ize pass (shared via
        # components.fold_vocab when the caller runs several ops)
        from .components import fold_vocab

        nodes, int_edges = fold_vocab(edges)
    if nodes is None or len(nodes) == 0:
        return rd.from_arrow(pa.table(
            {"uri": pa.array([], pa.string()), "r": pa.array([], pa.int64())}))
    n = len(nodes)

    # out-degrees: per-block partials -> driver fold (N-sized, in-cap)
    def deg_partial(t: pa.Table) -> pa.Table:
        uniq, cnt = np.unique(t["src"].to_numpy(zero_copy_only=False),
                              return_counts=True)
        return pa.table({"src": pa.array(uniq, pa.int64()),
                         "c": pa.array(cnt, pa.int64())})

    dparts = int_edges.map_batches(deg_partial,
                                   batch_format="pyarrow").to_pandas()
    deg = np.zeros(n, dtype=np.int64)
    np.add.at(deg, dparts["src"].to_numpy(),
              dparts["c"].to_numpy().astype(np.int64))
    dangling_mask = deg == 0
    deg_safe = np.where(dangling_mask, 1, deg)  # never read where deg==0
    dref = ray.put(deg_safe)

    seed_mask = None
    if seed_prefix is not None:
        seed_mask = pc.starts_with(
            pa.array(nodes, pa.string()),
            pattern=seed_prefix).to_numpy(zero_copy_only=False)
        n_seeds = int(seed_mask.sum())
        if n_seeds == 0:
            return rd.from_arrow(pa.table(
                {"uri": pa.array([], pa.string()),
                 "r": pa.array([], pa.int64())}))

    ranks = np.full(n, _R0, dtype=np.int64)
    for _ in range(n_iter):
        rref = ray.put(ranks)

        def stage(t: pa.Table, rref=rref) -> pa.Table:
            return _ContribPartial(rref, dref)(t)

        parts = int_edges.map_batches(
            stage, batch_format="pyarrow").to_pandas()
        contribs = np.zeros(n, dtype=np.int64)
        np.add.at(contribs, parts["dst"].to_numpy(),
                  parts["s"].to_numpy().astype(np.int64))
        # python ints on the driver: no overflow on the global sums
        dangling = int(ranks[dangling_mask].sum())
        if seed_mask is None:
            share = (85 * dangling) // (100 * n)
            ranks = _TELEPORT + share + contribs
        else:
            seed_base = (15 * n * 1_000_000) // (100 * n_seeds) \
                + (85 * dangling) // (100 * n_seeds)
            ranks = np.where(seed_mask, seed_base, 0) + contribs

    return rd.from_arrow(pa.table({"uri": pa.array(nodes, pa.string()),
                                   "r": pa.array(ranks, pa.int64())}))


# ---------------------------------------------------------------------------
# shuffle fallback (nothing driver-sized)
# ---------------------------------------------------------------------------


def _pagerank_shuffle(edges, n_iter: int, seed_prefix: str = None):
    """Per iteration: groupby(node) co-groups the node's rank row with
    its out-edges (kind 0 = rank, kind 1 = edge), emits integer
    contributions (out-degree = the group's own edge count); dangling
    rank rows emit under _DANGLING_KEY; one groupby(dst) + node
    re-join completes the step."""
    from ray.data.aggregate import Sum

    def init_ranks(t: pa.Table) -> pa.Table:
        return pa.table({
            "uri": t["uri"],
            "r": pa.array(np.full(len(t), _R0, np.int64), pa.int64())})

    def node_proj(t: pa.Table) -> pa.Table:
        vals = pa.concat_arrays([t["src"].combine_chunks().cast(pa.string()),
                                 t["dst"].combine_chunks().cast(pa.string())])
        return pa.table({"uri": pc.unique(vals)})

    from ray.data.aggregate import Count

    nodes = (edges.map_batches(node_proj, batch_format="pyarrow")
             .groupby("uri").aggregate(Count(alias_name="_c"))
             .map_batches(lambda t: t.select(["uri"]),
                          batch_format="pyarrow")
             .materialize())
    n = nodes.count()
    if n == 0:
        import ray.data as rd
        return rd.from_arrow(pa.table(
            {"uri": pa.array([], pa.string()), "r": pa.array([], pa.int64())}))

    n_seeds = None
    if seed_prefix is not None:
        # seed count: one scalar, invariant across iterations
        n_seeds = nodes.map_batches(
            lambda t: t.filter(pc.starts_with(t["uri"], seed_prefix)),
            batch_format="pyarrow").count()
        if n_seeds == 0:
            import ray.data as rd

            return rd.from_arrow(pa.table(
                {"uri": pa.array([], pa.string()),
                 "r": pa.array([], pa.int64())}))

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow")

    def tag_rank(t: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(len(t), np.int8), pa.int8())
        return pa.table({"key": t["uri"], "kind": z,
                         "dst": pa.nulls(len(t), pa.string()), "r": t["r"]})

    def tag_edge(t: pa.Table) -> pa.Table:
        o = pa.array(np.ones(len(t), np.int8), pa.int8())
        return pa.table({"key": t["src"], "kind": o, "dst": t["dst"],
                         "r": pa.array(np.zeros(len(t), np.int64),
                                       pa.int64())})

    def emit_contribs(g: pa.Table) -> pa.Table:
        kind = g["kind"].to_numpy(zero_copy_only=False)
        r = int(g["r"].to_numpy(zero_copy_only=False)[kind == 0][0])
        d = int((kind == 1).sum())
        if d == 0:  # dangling: hand the full rank to the collector row
            return pa.table({"dst": pa.array([_DANGLING_KEY], pa.string()),
                             "s": pa.array([r], pa.int64())})
        dsts = g.filter(pa.array(kind == 1))["dst"]
        c = (85 * r) // (100 * d)
        return pa.table({"dst": dsts,
                         "s": pa.array(np.full(d, c, np.int64), pa.int64())})

    tagged_edges = edges.map_batches(tag_edge, batch_format="pyarrow")
    for _ in range(n_iter):
        both = ranks.map_batches(tag_rank,
                                 batch_format="pyarrow").union(tagged_edges)
        contribs = (both.groupby("key")
                    .map_groups(emit_contribs, batch_format="pyarrow")
                    .groupby("dst").aggregate(Sum(on="s", alias_name="s"))
                    .materialize())
        # the dangling total is ONE scalar row — oracle-sized collect
        dang = contribs.map_batches(
            lambda t: t.filter(pc.equal(t["dst"], _DANGLING_KEY)),
            batch_format="pyarrow").to_pandas()
        dang_total = int(dang["s"].sum()) if len(dang) else 0
        if seed_prefix is None:
            base_all = _TELEPORT + (85 * dang_total) // (100 * n)
            base_seed = base_all
        else:
            base_all = 0
            base_seed = (15 * n * 1_000_000) // (100 * n_seeds) \
                + (85 * dang_total) // (100 * n_seeds)

        def tag_contrib(t: pa.Table) -> pa.Table:
            keep = t.filter(pc.not_equal(t["dst"], _DANGLING_KEY))
            return pa.table({"key": keep["dst"], "kind": pa.array(
                np.ones(len(keep), np.int8), pa.int8()), "s": keep["s"]})

        def tag_node(t: pa.Table) -> pa.Table:
            return pa.table({"key": t["uri"], "kind": pa.array(
                np.zeros(len(t), np.int8), pa.int8()),
                "s": pa.array(np.zeros(len(t), np.int64), pa.int64())})

        def finalize(g: pa.Table, base_all=base_all,
                     base_seed=base_seed) -> pa.Table:
            s = int(g["s"].to_numpy(zero_copy_only=False).sum())
            uri = g["key"][0].as_py()
            base = base_seed if (seed_prefix is not None
                                 and uri.startswith(seed_prefix)) \
                else base_all
            return pa.table({"uri": pa.array([uri], pa.string()),
                             "r": pa.array([base + s], pa.int64())})

        ranks = (nodes.map_batches(tag_node, batch_format="pyarrow")
                 .union(contribs.map_batches(tag_contrib,
                                             batch_format="pyarrow"))
                 .groupby("key").map_groups(finalize, batch_format="pyarrow")
                 .materialize())
    return ranks


def degree_histograms(edges):
    """In/out-degree histograms of the entity graph: two key-only
    groupby chains (node -> degree, degree -> node count); the
    payload never moves and every row that shuffles is one (key,
    count) pair.  Zero-degree nodes are counted from the node total
    minus the distinct src/dst counts.  Returns a pandas DataFrame
    (kind 'outdeg'|'indeg', d, n_nodes) — histogram-sized."""
    from ray.data.aggregate import Count

    import pyarrow as _pa

    def nodes_proj(t: _pa.Table) -> _pa.Table:
        vals = _pa.concat_arrays([
            t["src"].combine_chunks().cast(_pa.string()),
            t["dst"].combine_chunks().cast(_pa.string())])
        return _pa.table({"uri": pc.unique(vals)})

    n_nodes = (edges.map_batches(nodes_proj, batch_format="pyarrow")
               .groupby("uri").aggregate(Count(alias_name="_c"))
               .count())

    out = []
    for kind, col in (("outdeg", "src"), ("indeg", "dst")):
        per_node = edges.groupby(col).aggregate(Count(alias_name="d"))
        hist = per_node.map_batches(
            lambda t: t.select(["d"]), batch_format="pyarrow") \
            .groupby("d").aggregate(Count(alias_name="n_nodes")) \
            .to_pandas()
        n_zero = n_nodes - int(hist["n_nodes"].sum())
        if n_zero:
            hist = pd.concat([hist, pd.DataFrame(
                {"d": [0], "n_nodes": [n_zero]})], ignore_index=True)
        hist.insert(0, "kind", kind)
        out.append(hist)
    res = pd.concat(out, ignore_index=True)
    res["d"] = res["d"].astype(np.int64)
    res["n_nodes"] = res["n_nodes"].astype(np.int64)
    return res


def triangle_count(edges, num_buckets: int = 32,
                   edge_cap: int = PAGERANK_BROADCAST_EDGE_CAP) -> int:
    """Exact triangle count of the entity graph's undirected support —
    the degree-oriented "compact-forward" algorithm (Latapy 2008),
    the shape that survives hubs: every undirected edge is oriented
    from its lower-(degree, id) endpoint to the higher one, so each
    node's ORIENTED out-degree is O(sqrt(E)) and the wedge set
    (pairs of oriented out-neighbors) cannot explode quadratically on
    a hot node the way naive neighbor-pairing does.

    Distributed shape (everything after the one string pass is int64):

    1. node vocabulary folds once on the driver (same
       ``edge_cap``-guarded bound as the PageRank broadcast path; ids
       are searchsorted ranks of the SORTED vocab, so id order ==
       string order and the SQL mirror's LEAST/GREATEST tie-breaks
       agree by construction);
    2. undirected canonical edges: per-batch local distinct on the
       ``lo * n + hi`` composite (int64-exact while n < ~3e9 nodes —
       documented bound), one int-bucket shuffle, vectorized
       per-bucket distinct;
    3. degrees fold like PageRank's (N int64s, broadcast once);
    4. orientation + wedge generation: one src-bucket shuffle, each
       bucket sorts its adjacency and emits triu pairs ordered by the
       broadcast (deg, id) key;
    5. closure: wedges and oriented edges co-shuffle on the composite
       pair key, each bucket counts membership with one ``np.isin``;
       block-count-sized partial sums fold on the driver.
    """
    import ray
    import ray.data as rd

    def block_nodes(t: pa.Table) -> pa.Table:
        vals = pa.concat_arrays([t["src"].combine_chunks().cast(pa.string()),
                                 t["dst"].combine_chunks().cast(pa.string())])
        return pa.table({"uri": pc.unique(vals)})

    parts = edges.map_batches(block_nodes,
                              batch_format="pyarrow").to_pandas()
    if not len(parts):  # empty edge set (Ray drops schema on empty)
        return 0
    nodes = np.unique(parts["uri"].to_numpy())
    n = len(nodes)
    if n < 3:
        return 0
    nref = ray.put(nodes)

    def to_und(t: pa.Table) -> pa.Table:
        vocab = ray.get(nref)
        src = np.searchsorted(vocab, t["src"].to_numpy(zero_copy_only=False))
        dst = np.searchsorted(vocab, t["dst"].to_numpy(zero_copy_only=False))
        lo = np.minimum(src, dst).astype(np.int64)
        hi = np.maximum(src, dst).astype(np.int64)
        key = np.unique(lo * n + hi)
        return pa.table({"k": pa.array(key, pa.int64()),
                         "_b": pa.array((key % num_buckets).astype(np.int32),
                                        pa.int32())})

    und = (edges.map_batches(to_und, batch_format="pyarrow")
           .groupby("_b").map_groups(
               lambda t: pa.table({"k": pc.unique(t["k"])}),
               batch_format="pyarrow")
           .materialize())

    # degree fold over the undirected support
    def deg_partial(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        ends = np.concatenate([k // n, k % n])
        uniq, cnt = np.unique(ends, return_counts=True)
        return pa.table({"x": pa.array(uniq, pa.int64()),
                         "c": pa.array(cnt.astype(np.int64), pa.int64())})

    dparts = und.map_batches(deg_partial, batch_format="pyarrow").to_pandas()
    deg = np.zeros(n, dtype=np.int64)
    np.add.at(deg, dparts["x"].to_numpy(),
              dparts["c"].to_numpy().astype(np.int64))
    dref = ray.put(deg)

    def orient(t: pa.Table) -> pa.Table:
        d = ray.get(dref)
        k = t["k"].to_numpy(zero_copy_only=False)
        lo, hi = k // n, k % n
        fwd = (d[lo] < d[hi]) | ((d[lo] == d[hi]) & (lo < hi))
        s = np.where(fwd, lo, hi)
        e = np.where(fwd, hi, lo)
        return pa.table({"s": pa.array(s, pa.int64()),
                         "t": pa.array(e, pa.int64()),
                         "_b": pa.array((s % num_buckets).astype(np.int32),
                                        pa.int32())})

    oriented = und.map_batches(orient,
                               batch_format="pyarrow").materialize()

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        # flat-batch pair expansion (the dedup.py offsets idiom — a
        # Python loop over per-src groups is a measured cliff at 400k
        # srcs): sort by (src, deg[t], t) so within-group order IS the
        # orientation key, then emit every intra-group (earlier,
        # later) pair with one arange
        from .dedup import _expand_run_offsets

        d = ray.get(dref)
        empty = pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                              "kind": pd.Series([], dtype=np.int8)})
        s = g["s"].to_numpy()
        t = g["t"].to_numpy()
        if len(s) < 2:
            return empty
        order = np.lexsort((t, d[t], s))
        s, t = s[order], t[order]
        m = len(s)
        new = np.empty(m, dtype=bool)
        new[0] = True
        new[1:] = s[1:] != s[:-1]
        grp_start = np.flatnonzero(new)
        grp_sizes = np.diff(np.append(grp_start, m))
        pos = np.arange(m) - np.repeat(grp_start, grp_sizes)
        run = np.repeat(grp_sizes, grp_sizes) - 1 - pos
        a_idx = np.repeat(np.arange(m), run)
        if not len(a_idx):
            return empty
        b_idx = a_idx + _expand_run_offsets(run)
        k = t[a_idx] * n + t[b_idx]
        return pd.DataFrame({"k": k, "kind": np.ones(len(k), np.int8)})

    wset = oriented.groupby("_b").map_groups(wedges, batch_format="pandas")

    def edge_keys(t: pa.Table) -> pa.Table:
        k = t["s"].to_numpy(zero_copy_only=False) * n \
            + t["t"].to_numpy(zero_copy_only=False)
        return pa.table({"k": pa.array(k, pa.int64()),
                         "kind": pa.array(np.zeros(len(k), np.int8),
                                          pa.int8())})

    ekeys = oriented.map_batches(edge_keys, batch_format="pyarrow")

    def add_kbucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_b"] = (b["k"].to_numpy() % num_buckets).astype(np.int32)
        return b

    def count_closed(g: pd.DataFrame) -> pd.DataFrame:
        es = g.loc[g["kind"] == 0, "k"].to_numpy()
        ws = g.loc[g["kind"] == 1, "k"].to_numpy()
        hit = int(np.isin(ws, es).sum()) if len(ws) and len(es) else 0
        return pd.DataFrame({"n": pd.Series([hit], dtype=np.int64)})

    cparts = (wset.union(ekeys)
              .map_batches(add_kbucket, batch_format="pandas")
              .groupby("_b").map_groups(count_closed,
                                        batch_format="pandas")
              .to_pandas())
    return int(cparts["n"].sum()) if len(cparts) else 0


def pagerank_fixed_point(triples_ds, n_iter: int = 4,
                         edge_cap: int = PAGERANK_BROADCAST_EDGE_CAP,
                         edges=None, seed_prefix: str = None,
                         folded=None):
    """e6 fixed-point PageRank over ``entity_edges(triples_ds)``.
    Returns a Dataset of (uri: string, r: int64 e6 rank mass).
    Path auto-selected by distinct-edge count vs ``edge_cap``.
    Callers that already hold the distinct-edge Dataset pass it via
    ``edges`` (kg_statistics shares one edge build between PageRank
    and the degree histograms).  ``seed_prefix`` selects PERSONALIZED
    PageRank: the teleport + dangling mass flows only to nodes whose
    URI starts with the prefix (same integer contract, floor
    divisions by the seed count)."""
    import ray.data as rd

    if edges is None:
        edges = entity_edges(triples_ds).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table(
            {"uri": pa.array([], pa.string()), "r": pa.array([], pa.int64())}))
    if n_edges <= edge_cap:
        return _pagerank_broadcast(edges, n_iter, seed_prefix=seed_prefix,
                                   folded=folded)
    return _pagerank_shuffle(edges, n_iter, seed_prefix=seed_prefix)


# ---------------------------------------------------------------------------
# HITS hubs / authorities
# ---------------------------------------------------------------------------


class _SumPartial:
    """Per-batch integer sum partials: for each edge batch, offer
    vec[key_col] to group_col and combine locally with np.add.at —
    the _ContribPartial shape without the damping arithmetic."""

    def __init__(self, vec_ref, key_col: str, group_col: str):
        import ray
        self._v = ray.get(vec_ref)
        self.key_col, self.group_col = key_col, group_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        key = batch[self.key_col].to_numpy(zero_copy_only=False)
        grp = batch[self.group_col].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(grp, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, self._v[key])
        return pa.table({"g": pa.array(uniq, pa.int64()),
                         "s": pa.array(sums, pa.int64())})


def _norm_e6(raw: np.ndarray) -> np.ndarray:
    """Max-normalization in EXACT integer arithmetic:
    (raw * 1e6) // max(raw) — both engines floor non-negative BIGINT
    division identically.  Overflow bound: raw * 1e6 must stay in
    int64, i.e. max raw degree-sum < ~9.2e12 (max in/out-degree
    < ~9.2e6 at e6 mass) — document-and-monitor at 100 TB (the SQL
    mirror computes the same values in HUGEINT, so a violation shows
    up as a driver-check mismatch, not silent corruption)."""
    mx = int(raw.max()) if len(raw) else 0
    if mx == 0:
        return np.zeros_like(raw)
    return (raw * np.int64(1_000_000)) // np.int64(mx)


def _hits_broadcast(edges, n_iter: int, folded=None):
    import ray
    import ray.data as rd

    if folded is not None:
        nodes, int_edges = folded
    else:
        from .components import fold_vocab

        nodes, int_edges = fold_vocab(edges)
    if nodes is None or len(nodes) == 0:
        return rd.from_arrow(pa.table(
            {"uri": pa.array([], pa.string()),
             "hub": pa.array([], pa.int64()),
             "auth": pa.array([], pa.int64())}))
    n = len(nodes)

    def half_step(vec: np.ndarray, key_col: str, group_col: str):
        vref = ray.put(vec)

        def stage(t: pa.Table, vref=vref) -> pa.Table:
            return _SumPartial(vref, key_col, group_col)(t)

        parts = int_edges.map_batches(
            stage, batch_format="pyarrow").to_pandas()
        raw = np.zeros(n, dtype=np.int64)
        if len(parts):
            np.add.at(raw, parts["g"].to_numpy(),
                      parts["s"].to_numpy().astype(np.int64))
        return _norm_e6(raw)

    hub = np.full(n, 1_000_000, dtype=np.int64)
    auth = np.zeros(n, dtype=np.int64)
    for _ in range(n_iter):
        auth = half_step(hub, "src", "dst")   # a(v) <- sum h(u), u->v
        hub = half_step(auth, "dst", "src")   # h(u) <- sum a(v), u->v
    return rd.from_arrow(pa.table({
        "uri": pa.array(nodes, pa.string()),
        "hub": pa.array(hub, pa.int64()),
        "auth": pa.array(auth, pa.int64())}))


def _hits_shuffle(edges, n_iter: int):
    """Above-cap HITS: scores stay Datasets keyed by URI.  Each half
    step is the pagerank-shuffle co-group (kind 0 = score row, kind 1
    = edge row keyed by the offering endpoint) followed by a
    groupby-sum; the max for normalization is ONE scalar aggregate.
    Four shuffles per iteration — the honest price above the cap."""
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    def node_proj(t: pa.Table) -> pa.Table:
        vals = pa.concat_arrays([t["src"].combine_chunks().cast(pa.string()),
                                 t["dst"].combine_chunks().cast(pa.string())])
        return pa.table({"uri": pc.unique(vals)})

    from ray.data.aggregate import Count

    nodes = (edges.map_batches(node_proj, batch_format="pyarrow")
             .groupby("uri").aggregate(Count(alias_name="_c"))
             .map_batches(lambda t: t.select(["uri"]),
                          batch_format="pyarrow")
             .materialize())
    if nodes.count() == 0:
        return rd.from_arrow(pa.table(
            {"uri": pa.array([], pa.string()),
             "hub": pa.array([], pa.int64()),
             "auth": pa.array([], pa.int64())}))

    def tagged(key_col: str, other_col: str):
        def tag(t: pa.Table) -> pa.Table:
            return pa.table({
                "key": t[key_col].combine_chunks().cast(pa.string()),
                "kind": pa.array(np.ones(len(t), np.int8), pa.int8()),
                "to": t[other_col].combine_chunks().cast(pa.string()),
                "v": pa.array(np.zeros(len(t), np.int64), pa.int64())})
        return edges.map_batches(tag, batch_format="pyarrow") \
            .materialize()

    fwd = tagged("src", "dst")   # offer hub scores to dst
    rev = tagged("dst", "src")   # offer auth scores to src

    def tag_score(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["uri"],
                         "kind": pa.array(np.zeros(len(t), np.int8),
                                          pa.int8()),
                         "to": pa.nulls(len(t), pa.string()),
                         "v": t["v"]})

    def offer(g: pa.Table) -> pa.Table:
        kind = g["kind"].to_numpy(zero_copy_only=False)
        rows = g.filter(pa.array(kind == 0))["v"]
        v = int(rows[0].as_py()) if len(rows) else 0
        tos = g.filter(pa.array(kind == 1))["to"].combine_chunks()
        return pa.table({"uri": tos,
                         "v": pa.array(np.full(len(tos), v, np.int64),
                                       pa.int64())})

    def half_step(scores, tagged_edges):
        raw = (scores.map_batches(tag_score, batch_format="pyarrow")
               .union(tagged_edges)
               .groupby("key").map_groups(offer, batch_format="pyarrow")
               .groupby("uri").aggregate(Sum(on="v", alias_name="raw"))
               .materialize())
        mxdf = raw.aggregate(Max(on="raw", alias_name="m"))
        mx = int(mxdf["m"]) if mxdf and mxdf.get("m") is not None else 0

        def norm(t: pa.Table, mx=mx) -> pa.Table:
            r = t["raw"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = np.zeros(len(r), np.int64) if mx == 0 \
                else (r * np.int64(1_000_000)) // np.int64(mx)
            return pa.table({"uri": t["uri"], "v": pa.array(v, pa.int64())})

        # nodes absent from the groupby (no incoming offers) are 0;
        # re-attach them so the next co-group sees every node
        def zero(t: pa.Table) -> pa.Table:
            return pa.table({"uri": t["uri"],
                             "v": pa.array(np.zeros(len(t), np.int64),
                                           pa.int64())})

        got = raw.map_batches(norm, batch_format="pyarrow")
        return (nodes.map_batches(zero, batch_format="pyarrow")
                .union(got)
                .groupby("uri").aggregate(Max(on="v", alias_name="v"))
                .materialize())

    def init(t: pa.Table) -> pa.Table:
        return pa.table({"uri": t["uri"],
                         "v": pa.array(np.full(len(t), 1_000_000,
                                               np.int64), pa.int64())})

    hub = nodes.map_batches(init, batch_format="pyarrow").materialize()
    auth = None
    for _ in range(n_iter):
        auth = half_step(hub, fwd)
        hub = half_step(auth, rev)

    def tag_h(t: pa.Table) -> pa.Table:
        return pa.table({"uri": t["uri"], "hub": t["v"],
                         "auth": pa.array(np.zeros(len(t), np.int64),
                                          pa.int64())})

    def tag_a(t: pa.Table) -> pa.Table:
        return pa.table({"uri": t["uri"],
                         "hub": pa.array(np.zeros(len(t), np.int64),
                                         pa.int64()),
                         "auth": t["v"]})

    def merge(g: pa.Table) -> pa.Table:
        return pa.table({
            "uri": g["uri"][:1],
            "hub": pa.array([int(pc.max(g["hub"]).as_py())], pa.int64()),
            "auth": pa.array([int(pc.max(g["auth"]).as_py())],
                             pa.int64())})

    return (hub.map_batches(tag_h, batch_format="pyarrow")
            .union(auth.map_batches(tag_a, batch_format="pyarrow"))
            .groupby("uri").map_groups(merge, batch_format="pyarrow"))


def hits_scores(triples_ds, n_iter: int = 4,
                edge_cap: int = PAGERANK_BROADCAST_EDGE_CAP,
                edges=None, folded=None):
    """HITS hubs/authorities (Kleinberg 1999) over the DIRECTED
    distinct entity graph, as a fixed-round integer contract: h0 =
    1e6 per node; per iteration a_raw(v) = sum of h over in-edges
    then a = (a_raw * 1e6) // max(a_raw) (exact non-negative BIGINT
    floor — no float anywhere, see _norm_e6 for the overflow bound),
    then the symmetric hub half-step.  Both engines bit-identical by
    construction; the oracle unrolls the same iterations in HUGEINT.
    Returns a Dataset (uri, hub: int64 e6, auth: int64 e6) with one
    row per graph node.  Path auto-selected by edge count; ``folded``
    shares the kg_statistics vocabulary fold."""
    import ray.data as rd

    if edges is None:
        edges = entity_edges(triples_ds).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table(
            {"uri": pa.array([], pa.string()),
             "hub": pa.array([], pa.int64()),
             "auth": pa.array([], pa.int64())}))
    if n_edges <= edge_cap:
        return _hits_broadcast(edges, n_iter, folded=folded)
    return _hits_shuffle(edges, n_iter)
