"""Fixed-round min-propagation graph analytics over the KG entity
graph: connected-component labels/sizes and BFS hop distances.

Like PageRank (stages/pagerank.py) these are ITERATIVE algorithms made
driver-checkable by defining the contract as a FIXED number of
propagation rounds, unrolled in the DuckDB oracle:

- **components_fixed_rounds**: per node, the lexicographically
  smallest URI reachable within ``n_rounds`` undirected hops
  (min-label propagation; converged = true weakly-connected
  components whenever the component diameter <= n_rounds).  Surfaced
  as the node's COMPONENT SIZE (count of nodes sharing its label) so
  the result rides the (type_uri, n:int64) statistics union.
- **bfs_hops**: per node, the exact BFS hop distance from the nearest
  seed node (URI prefix match), for every node reached within
  ``n_rounds`` hops; unreached nodes are absent (the personalized-
  PageRank seed idiom).

Both are pure integer min-plus iterations — bit-identical across the
numpy engine and the unrolled SQL by construction (no floats, no
ties: min is total on int64 / VARCHAR-lexicographic, and the sorted
node vocabulary makes index order == URI order).

Two execution paths, auto-selected by edge count (the PageRank cap
precedent), pytest-pinned equal:

- **broadcast** (edges <= cap): node vocabulary folds once on the
  driver; per round only the N-sized int64 label/dist array moves
  (``ray.put`` once, zero-copy plasma read per task); each task emits
  per-batch (node, min-candidate) partials combined locally with
  ``np.minimum.at`` — the PageRank _ContribPartial shape with min
  instead of sum.  One fold is SHARED between the cc and hop passes
  (``graph_min_rounds`` computes both).
- **shuffle fallback** (above the cap): labels stay a Dataset; per
  round one groupby(node) co-groups each node's label row with its
  incident edges and emits min-candidates, one groupby(node).min
  folds candidates with the previous labels.  Nothing driver-sized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .pagerank import PAGERANK_BROADCAST_EDGE_CAP, entity_edges

# sentinel for "unreached" BFS distances; +1 per round can never
# overflow int64 from here
_FAR = np.int64(2) ** 62

# propagation rounds in the documented data contract (oracle-unrolled)
DEFAULT_ROUNDS = 6


def _empty(col: str):
    import ray.data as rd

    return rd.from_arrow(pa.table(
        {"uri": pa.array([], pa.string()), col: pa.array([], pa.int64())}))


# ---------------------------------------------------------------------------
# broadcast path
# ---------------------------------------------------------------------------


def fold_vocab(edges):
    """Sorted node vocabulary + integer-ized DIRECTED edges (the
    pagerank._pagerank_broadcast fold, label flavour: no degrees).
    Returns (nodes: np.ndarray[str], int_edges: materialized Dataset)
    or (None, None) on an empty graph.  Build ONCE and share across
    the broadcast-path graph ops (pagerank ``folded=``,
    graph_min_rounds, kcore_fixed_rounds): the fold — a full edge
    scan, a driver string-unique and an integer-ize pass — is the
    dominant fixed cost of every op in the family."""
    import ray
    import ray.data as rd

    def block_nodes(t: pa.Table) -> pa.Table:
        vals = pa.concat_arrays([t["src"].combine_chunks().cast(pa.string()),
                                 t["dst"].combine_chunks().cast(pa.string())])
        return pa.table({"uri": pc.unique(vals)})

    parts = edges.map_batches(block_nodes, batch_format="pyarrow") \
        .to_pandas()
    nodes = np.unique(parts["uri"].to_numpy())
    if len(nodes) == 0:
        return None, None
    nref = ray.put(nodes)

    def to_ids(t: pa.Table) -> pa.Table:
        vocab = ray.get(nref)
        src = np.searchsorted(
            vocab, t["src"].to_numpy(zero_copy_only=False))
        dst = np.searchsorted(
            vocab, t["dst"].to_numpy(zero_copy_only=False))
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    int_edges = edges.map_batches(to_ids,
                                  batch_format="pyarrow").materialize()
    return nodes, int_edges


class _MinPartial:
    """Per-batch min-candidates over the UNDIRECTED support: each
    directed edge (s, d) offers label[s]+inc to d and label[d]+inc to
    s, locally folded by node with np.minimum.at.  MULTI-CHANNEL:
    ``labs_ref`` holds a (C, n) int64 array — one row per concurrent
    propagation (cc labels, hop distances) — so C passes share one
    edge scan per round."""

    def __init__(self, labs_ref, incs):
        import ray
        self._labs = ray.get(labs_ref)
        self._incs = incs

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        tgt = np.concatenate([dst, src])
        uniq, inv = np.unique(tgt, return_inverse=True)
        out = {"node": pa.array(uniq, pa.int64())}
        for ci, inc in enumerate(self._incs):
            lab = self._labs[ci]
            cand = np.concatenate([lab[src], lab[dst]]) + np.int64(inc)
            mins = np.full(len(uniq), _FAR, dtype=np.int64)
            np.minimum.at(mins, inv, cand)
            out[f"m{ci}"] = pa.array(mins, pa.int64())
        return pa.table(out)


def _min_rounds_broadcast(int_edges, inits, n_rounds: int,
                          incs) -> list:
    """Run ``len(inits)`` min-propagations concurrently over one edge
    scan per round; returns the final arrays in input order."""
    import ray

    labs = np.stack(inits).astype(np.int64)
    incs = list(incs)
    for _ in range(n_rounds):
        lref = ray.put(labs)

        def stage(t: pa.Table, lref=lref) -> pa.Table:
            return _MinPartial(lref, incs)(t)

        parts = int_edges.map_batches(
            stage, batch_format="pyarrow").to_pandas()
        node = parts["node"].to_numpy()
        new = np.full_like(labs, _FAR)
        for ci in range(labs.shape[0]):
            np.minimum.at(new[ci], node,
                          parts[f"m{ci}"].to_numpy().astype(np.int64))
        labs = np.minimum(labs, new)
    return [labs[ci] for ci in range(labs.shape[0])]


# ---------------------------------------------------------------------------
# shuffle fallback (nothing driver-sized)
# ---------------------------------------------------------------------------


def _min_rounds_shuffle(edges, init_ds, n_rounds: int, inc: int):
    """``init_ds``: Dataset (uri, lab:int64) for EVERY node (unreached
    BFS nodes carry the _FAR sentinel).  Per round: groupby(uri)
    co-groups the node's label row (kind 0) with its incident
    undirected edge rows (kind 1), emits (neighbor, lab+inc)
    candidates plus the node's own (uri, lab) keep-row; one
    groupby(uri).min folds them.  Two shuffles per round — the honest
    price above the broadcast cap (the pagerank shuffle shape)."""
    from ray.data.aggregate import Min

    def und(t: pa.Table) -> pa.Table:
        s = t["src"].combine_chunks().cast(pa.string())
        d = t["dst"].combine_chunks().cast(pa.string())
        return pa.table({"key": pa.concat_arrays([s, d]),
                         "kind": pa.array(np.ones(2 * len(t), np.int8),
                                          pa.int8()),
                         "nbr": pa.concat_arrays([d, s]),
                         "lab": pa.array(np.zeros(2 * len(t), np.int64),
                                         pa.int64())})

    tagged_edges = edges.map_batches(und, batch_format="pyarrow") \
        .materialize()

    def tag_lab(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["uri"],
                         "kind": pa.array(np.zeros(len(t), np.int8),
                                          pa.int8()),
                         "nbr": pa.nulls(len(t), pa.string()),
                         "lab": t["lab"]})

    def emit(g: pa.Table) -> pa.Table:
        kind = g["kind"].to_numpy(zero_copy_only=False)
        lab = int(g["lab"].to_numpy(zero_copy_only=False)[kind == 0][0])
        uri = g["key"][0].as_py()
        nbrs = g.filter(pa.array(kind == 1))["nbr"]
        out_uri = pa.concat_arrays(
            [pa.array([uri], pa.string()), nbrs.combine_chunks()])
        cand = min(lab + inc, _FAR)  # sentinel never grows
        vals = np.full(len(out_uri), cand, dtype=np.int64)
        vals[0] = lab  # the keep-row
        return pa.table({"uri": out_uri,
                         "lab": pa.array(vals, pa.int64())})

    labels = init_ds
    for _ in range(n_rounds):
        both = labels.map_batches(tag_lab,
                                  batch_format="pyarrow").union(tagged_edges)
        labels = (both.groupby("key")
                  .map_groups(emit, batch_format="pyarrow")
                  .groupby("uri").aggregate(Min(on="lab", alias_name="lab"))
                  .materialize())
    return labels


# ---------------------------------------------------------------------------
# public operators
# ---------------------------------------------------------------------------


def components_fixed_rounds(triples_ds, n_rounds: int = DEFAULT_ROUNDS,
                            edge_cap: int = PAGERANK_BROADCAST_EDGE_CAP,
                            edges=None):
    """Per-node component SIZE after ``n_rounds`` of undirected
    min-URI-label propagation.  Returns a Dataset (uri: string,
    n: int64)."""
    cc, _ = graph_min_rounds(triples_ds, seed_prefix=None,
                             n_rounds=n_rounds, edge_cap=edge_cap,
                             edges=edges)
    return cc


def bfs_hops(triples_ds, seed_prefix: str,
             n_rounds: int = DEFAULT_ROUNDS,
             edge_cap: int = PAGERANK_BROADCAST_EDGE_CAP,
             edges=None):
    """Exact BFS hop distance (undirected) from the nearest node whose
    URI starts with ``seed_prefix``, for nodes reached within
    ``n_rounds`` hops.  Returns a Dataset (uri: string, n: int64)."""
    _, hop = graph_min_rounds(triples_ds, seed_prefix=seed_prefix,
                              n_rounds=n_rounds, edge_cap=edge_cap,
                              edges=edges, want_cc=False)
    return hop


def graph_min_rounds(triples_ds, seed_prefix: str | None,
                     n_rounds: int = DEFAULT_ROUNDS,
                     edge_cap: int = PAGERANK_BROADCAST_EDGE_CAP,
                     edges=None, want_cc: bool = True, folded=None):
    """Run both min-propagation passes over ONE folded graph: returns
    (cc_sizes, hops) Datasets — ``hops`` is None when ``seed_prefix``
    is None, ``cc_sizes`` is None when ``want_cc`` is False.  The
    kg_statistics caller shares the fold between the two passes (and
    the edge build with PageRank via ``edges=``); callers that hold a
    ``fold_vocab(edges)`` result pass it via ``folded`` (broadcast
    path only — ignored above the cap)."""
    import ray.data as rd

    if edges is None:
        edges = entity_edges(triples_ds).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return (_empty("n") if want_cc else None,
                _empty("n") if seed_prefix is not None else None)

    if n_edges <= edge_cap:
        nodes, int_edges = folded if folded is not None \
            else fold_vocab(edges)
        cc_ds = hop_ds = None
        # stack the wanted channels so one edge scan per round serves
        # both propagations (measured: cc+hops share >90% of the work)
        inits, incs, kinds = [], [], []
        if want_cc:
            inits.append(np.arange(len(nodes), dtype=np.int64))
            incs.append(0)
            kinds.append("cc")
        seed = None
        if seed_prefix is not None:
            seed = pc.starts_with(
                pa.array(nodes, pa.string()),
                pattern=seed_prefix).to_numpy(zero_copy_only=False)
            if not seed.any():
                hop_ds = _empty("n")
            else:
                inits.append(np.where(seed, np.int64(0), _FAR))
                incs.append(1)
                kinds.append("hop")
        finals = _min_rounds_broadcast(int_edges, inits, n_rounds,
                                       incs) if inits else []
        for kind, arr in zip(kinds, finals):
            if kind == "cc":
                _, inv, counts = np.unique(arr, return_inverse=True,
                                           return_counts=True)
                cc_ds = rd.from_arrow(pa.table({
                    "uri": pa.array(nodes, pa.string()),
                    "n": pa.array(counts[inv].astype(np.int64),
                                  pa.int64())}))
            else:
                reached = arr < _FAR
                hop_ds = rd.from_arrow(pa.table({
                    "uri": pa.array(nodes[reached], pa.string()),
                    "n": pa.array(arr[reached], pa.int64())}))
        return cc_ds, hop_ds

    return (_cc_shuffle(edges, n_rounds) if want_cc else None,
            _hops_shuffle(edges, seed_prefix, n_rounds)
            if seed_prefix is not None else None)


def kcore_fixed_rounds(triples_ds, k: int = 3,
                       n_rounds: int = DEFAULT_ROUNDS,
                       edge_cap: int = PAGERANK_BROADCAST_EDGE_CAP,
                       edges=None, folded=None):
    """Fixed-round k-core peeling over the undirected support: round i
    keeps exactly the nodes with >= ``k`` neighbors among round-(i-1)
    survivors (converged = the true k-core whenever peeling stabilizes
    within ``n_rounds``).  Returns a Dataset (uri: string, n: int64)
    with one row per surviving node, n = its degree among the final
    survivor set (0 if all its neighbors fell in the last round).
    Pure integer thresholding — bit-identical across engines."""
    import ray.data as rd

    if edges is None:
        edges = entity_edges(triples_ds).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return _empty("n")

    if n_edges <= edge_cap:
        nodes, int_edges = folded if folded is not None \
            else fold_vocab(edges)
        n = len(nodes)
        # undirected degree fold: each directed distinct edge counts
        # once per endpoint (self-loops were dropped at the edge build;
        # reverse duplicates cannot exist per (src,dst) distinctness --
        # BUT (a,b) and (b,a) may BOTH exist; collapse to the
        # undirected support first, driver-side on the int pairs
        pairs = int_edges.to_pandas()
        a = np.minimum(pairs["src"].to_numpy(), pairs["dst"].to_numpy())
        b = np.maximum(pairs["src"].to_numpy(), pairs["dst"].to_numpy())
        und = np.unique(a * np.int64(n) + b)
        ua, ub = und // n, und % n
        alive = np.ones(n, dtype=bool)
        for _ in range(n_rounds):
            live = alive[ua] & alive[ub]
            deg = np.bincount(ua[live], minlength=n) \
                + np.bincount(ub[live], minlength=n)
            alive = deg >= k
        if not alive.any():
            return _empty("n")
        live = alive[ua] & alive[ub]
        deg = np.bincount(ua[live], minlength=n) \
            + np.bincount(ub[live], minlength=n)
        return rd.from_arrow(pa.table({
            "uri": pa.array(nodes[alive], pa.string()),
            "n": pa.array(deg[alive].astype(np.int64), pa.int64())}))

    return _kcore_shuffle(edges, k, n_rounds)


def _und_pairs(edges):
    """Distinct undirected support as a Dataset (a, b) with a < b:
    per-batch local canonicalization + the bucketed distinct idiom."""

    def canon(t: pa.Table) -> pa.Table:
        s = t["src"].combine_chunks().cast(pa.string())
        d = t["dst"].combine_chunks().cast(pa.string())
        a = pc.min_element_wise(s, d)
        b = pc.max_element_wise(s, d)
        out = pa.table({"a": a, "b": b})
        return out.group_by(["a", "b"]).aggregate([])

    import numpy as _np
    import pandas as _pd

    def bucketed(t: pa.Table) -> pa.Table:
        h = _pd.util.hash_pandas_object(
            t["a"].to_pandas(), index=False).to_numpy() \
            ^ _pd.util.hash_pandas_object(
            t["b"].to_pandas(), index=False).to_numpy()
        return t.append_column(
            "_b", pa.array((h % 32).astype(_np.int32), pa.int32()))

    def distinct(g: pa.Table) -> pa.Table:
        return g.select(["a", "b"]).group_by(["a", "b"]).aggregate([])

    return (edges.map_batches(canon, batch_format="pyarrow")
            .map_batches(bucketed, batch_format="pyarrow")
            .groupby("_b").map_groups(distinct, batch_format="pyarrow"))


def _kcore_shuffle(edges, k: int, n_rounds: int):
    """Shuffle-path k-core: survivors stay a Dataset.  Per round, two
    co-group passes gate the undirected edge list on alive endpoints
    (kind 0 = alive row, kind 1 = edge row, keyed by one endpoint per
    pass), then a groupby-count thresholds the degrees.  Three
    shuffles per round — the honest fallback above the cap."""
    from ray.data.aggregate import Count

    und = _und_pairs(edges).materialize()
    alive = _node_ds(edges)

    def gate(und_ds, alive_ds, key_col, other_col):
        def tag_alive(t: pa.Table) -> pa.Table:
            return pa.table({"key": t["uri"],
                             "kind": pa.array(np.zeros(len(t), np.int8),
                                              pa.int8()),
                             "other": pa.nulls(len(t), pa.string())})

        def tag_edge(t: pa.Table) -> pa.Table:
            return pa.table({"key": t[key_col],
                             "kind": pa.array(np.ones(len(t), np.int8),
                                              pa.int8()),
                             "other": t[other_col]})

        def emit(g: pa.Table) -> pa.Table:
            kind = g["kind"].to_numpy(zero_copy_only=False)
            if not (kind == 0).any():  # endpoint not alive: drop edges
                return pa.table({"a": pa.array([], pa.string()),
                                 "b": pa.array([], pa.string())})
            e = g.filter(pa.array(kind == 1))
            return pa.table({"a": e["key"], "b": e["other"]})

        return (alive_ds.map_batches(tag_alive, batch_format="pyarrow")
                .union(und_ds.map_batches(tag_edge,
                                          batch_format="pyarrow"))
                .groupby("key").map_groups(emit, batch_format="pyarrow"))

    def survivors(live_edges):
        def both_dirs(t: pa.Table) -> pa.Table:
            return pa.table({"uri": pa.concat_arrays(
                [t["a"].combine_chunks().cast(pa.string()),
                 t["b"].combine_chunks().cast(pa.string())])})

        deg = (live_edges.map_batches(both_dirs, batch_format="pyarrow")
               .groupby("uri").aggregate(Count(alias_name="n")))
        return deg

    for _ in range(n_rounds):
        live = gate(gate(und, alive, "a", "b"), alive, "b", "a") \
            .materialize()
        deg = survivors(live)
        alive = deg.map_batches(
            lambda t, k=k: t.filter(
                pc.greater_equal(t["n"], k)).select(["uri"]),
            batch_format="pyarrow").materialize()
    live = gate(gate(und, alive, "a", "b"), alive, "b", "a")
    deg = survivors(live)
    # final rows: every survivor, degree 0 if no surviving edges
    def tag_deg(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["uri"],
                         "kind": pa.array(np.ones(len(t), np.int8),
                                          pa.int8()),
                         "n": t["n"].cast(pa.int64())})

    def tag_alive0(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["uri"],
                         "kind": pa.array(np.zeros(len(t), np.int8),
                                          pa.int8()),
                         "n": pa.array(np.zeros(len(t), np.int64),
                                       pa.int64())})

    def emit_final(g: pa.Table) -> pa.Table:
        kind = g["kind"].to_numpy(zero_copy_only=False)
        if not (kind == 0).any():  # degree row without an alive row
            return pa.table({"uri": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        n = g["n"].to_numpy(zero_copy_only=False)[kind == 1]
        return pa.table({"uri": pa.array([g["key"][0].as_py()],
                                         pa.string()),
                         "n": pa.array([int(n[0]) if len(n) else 0],
                                       pa.int64())})

    return (alive.map_batches(tag_alive0, batch_format="pyarrow")
            .union(deg.map_batches(tag_deg, batch_format="pyarrow"))
            .groupby("key").map_groups(emit_final,
                                       batch_format="pyarrow"))


def comention_pairs(triples_ds, predicate: str, num_buckets: int = 32):
    """Entity co-occurrence edge construction: for every unordered
    entity pair (a < b) mentioned by the SAME subject (turn) via
    ``predicate``, the number of such subjects.  The standard KG
    enrichment self-join (co-mention edges), distributed as: project
    (turn, entity), hash-bucket by TURN so each turn's mention set is
    co-located, per-bucket VECTORIZED pandas self-merge + local pair
    count (the combiner), then one (a, b) groupby-sum of the
    bucket-local partials.  No per-turn Python calls, no row loops;
    skew-safe because turns carry only a handful of mentions each
    (the heavy key would be an entity, and entities never key a
    shuffle here).  Returns a Dataset (a, b, n)."""
    import pandas as _pd
    from ray.data.aggregate import Sum

    def proj(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["predicate"], predicate)
        out = t.filter(keep).select(["subject", "object"]) \
            .rename_columns(["turn", "ent"])
        h = _pd.util.hash_pandas_object(
            out["turn"].to_pandas(), index=False).to_numpy()
        return out.append_column(
            "_b", pa.array((h % num_buckets).astype(np.int32), pa.int32()))

    mentions = triples_ds.map_batches(proj, batch_format="pyarrow")

    def expand(g: pa.Table) -> pa.Table:
        df = g.select(["turn", "ent"]).to_pandas()
        m = df.merge(df, on="turn")
        m = m[m["ent_x"] < m["ent_y"]]
        cnt = m.groupby(["ent_x", "ent_y"]).size().reset_index(name="n")
        return pa.table({"a": pa.array(cnt["ent_x"], pa.string()),
                         "b": pa.array(cnt["ent_y"], pa.string()),
                         "n": pa.array(cnt["n"].to_numpy(np.int64),
                                       pa.int64())})

    partials = mentions.groupby("_b").map_groups(expand,
                                                 batch_format="pyarrow")
    return partials.groupby(["a", "b"]).aggregate(
        Sum(on="n", alias_name="n"))


def comention_pmi(triples_ds, predicate: str, num_buckets: int = 32,
                  pairs=None):
    """PMI-weighted co-mention edges — the standard co-occurrence
    edge weighting for KG enrichment:

        pmi_e6(a, b) = round(ln(n_ab * T / (n_a * n_b)) * 1e6)

    where n_ab = turns co-mentioning (a, b), n_a/n_b = turns
    mentioning each entity, T = distinct mentioning turns.  The e6
    ROUND absorbs the numpy-log vs DuckDB-ln ulp gap (the documented
    tfidf idf_e6 contract, stages/relevance.py:13); everything else is
    exact integers.  Per-entity counts broadcast as a driver dict —
    the entity vocabulary is the SMALL side (the pair table is the
    big one), the dedup broadcast-side idiom.  Returns a Dataset
    (a, b, pmi_e6: int64)."""
    import ray

    if pairs is None:
        pairs = comention_pairs(triples_ds, predicate,
                                num_buckets=num_buckets).materialize()

    def proj(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["predicate"], predicate)
        return t.filter(keep).select(["subject", "object"]) \
            .rename_columns(["turn", "ent"])

    mentions = triples_ds.map_batches(proj, batch_format="pyarrow")
    from ray.data.aggregate import Count

    ent_counts = mentions.groupby("ent").aggregate(
        Count(alias_name="n")).to_pandas()
    # T: distinct mentioning turns — a count-distinct on the small
    # key side (turn ids), per-block unique partials + driver fold
    tparts = mentions.map_batches(
        lambda t: pa.table({"turn": pc.unique(
            t["turn"].combine_chunks().cast(pa.string()))}),
        batch_format="pyarrow").to_pandas()
    T = int(np.unique(tparts["turn"].to_numpy()).size)
    if T == 0 or len(ent_counts) == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
            "pmi_e6": pa.array([], pa.int64())}))
    cref = ray.put(dict(zip(ent_counts["ent"], ent_counts["n"]
                            .to_numpy(np.int64))))

    def score(t: pa.Table) -> pa.Table:
        counts = ray.get(cref)
        # exact int64 products on both sides of ONE double division --
        # the same expression shape as the SQL mirror, so the only
        # float ops are /, ln, *1e6, round (ulp gap absorbed by the
        # e6 ROUND contract)
        na = np.array([counts[x] for x in t["a"].to_pylist()], np.int64)
        nb = np.array([counts[x] for x in t["b"].to_pylist()], np.int64)
        nab = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        num = (nab * np.int64(T)).astype(np.float64)
        den = (na * nb).astype(np.float64)
        pmi = np.round(np.log(num / den) * 1e6).astype(np.int64)
        return pa.table({"a": t["a"], "b": t["b"],
                         "pmi_e6": pa.array(pmi, pa.int64())})

    return pairs.map_batches(score, batch_format="pyarrow")


def _node_ds(edges):
    from ray.data.aggregate import Count

    def node_proj(t: pa.Table) -> pa.Table:
        vals = pa.concat_arrays([t["src"].combine_chunks().cast(pa.string()),
                                 t["dst"].combine_chunks().cast(pa.string())])
        return pa.table({"uri": pc.unique(vals)})

    return (edges.map_batches(node_proj, batch_format="pyarrow")
            .groupby("uri").aggregate(Count(alias_name="_c"))
            .map_batches(lambda t: t.select(["uri"]),
                         batch_format="pyarrow")
            .materialize())


def _cc_shuffle(edges, n_rounds: int):
    """Shuffle-path component sizes.  Labels ARE the URIs here (no
    driver-sized vocabulary exists above the cap to rank them), so
    the propagation runs the string flavour of the min kernel —
    lexicographic min matches the broadcast path's sorted-vocab index
    min exactly.  Sizes then co-group (label -> count) back onto the
    members."""
    from ray.data.aggregate import Count

    nodes = _node_ds(edges)

    def init_lab(t: pa.Table) -> pa.Table:
        return pa.table({"uri": t["uri"], "lab": t["uri"]})

    labels = _str_min_rounds_shuffle(
        edges, nodes.map_batches(init_lab, batch_format="pyarrow"),
        n_rounds)
    # component size: count per label, co-grouped back onto members
    sizes = labels.groupby("lab").aggregate(Count(alias_name="n"))

    def tag_size(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["lab"],
                         "kind": pa.array(np.zeros(len(t), np.int8),
                                          pa.int8()),
                         "uri": pa.nulls(len(t), pa.string()),
                         "n": t["n"].cast(pa.int64())})

    def tag_member(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["lab"],
                         "kind": pa.array(np.ones(len(t), np.int8),
                                          pa.int8()),
                         "uri": t["uri"],
                         "n": pa.array(np.zeros(len(t), np.int64),
                                       pa.int64())})

    def emit_sizes(g: pa.Table) -> pa.Table:
        kind = g["kind"].to_numpy(zero_copy_only=False)
        n = int(g["n"].to_numpy(zero_copy_only=False)[kind == 0][0])
        members = g.filter(pa.array(kind == 1))["uri"]
        return pa.table({"uri": members,
                         "n": pa.array(np.full(len(members), n, np.int64),
                                       pa.int64())})

    return (sizes.map_batches(tag_size, batch_format="pyarrow")
            .union(labels.map_batches(tag_member, batch_format="pyarrow"))
            .groupby("key").map_groups(emit_sizes, batch_format="pyarrow"))


def _str_min_rounds_shuffle(edges, init_ds, n_rounds: int):
    """String-label flavour of _min_rounds_shuffle (labels are URIs,
    lexicographic min; inc has no meaning)."""
    from ray.data.aggregate import Min

    def und(t: pa.Table) -> pa.Table:
        s = t["src"].combine_chunks().cast(pa.string())
        d = t["dst"].combine_chunks().cast(pa.string())
        return pa.table({"key": pa.concat_arrays([s, d]),
                         "kind": pa.array(np.ones(2 * len(t), np.int8),
                                          pa.int8()),
                         "nbr": pa.concat_arrays([d, s]),
                         "lab": pa.nulls(2 * len(t), pa.string())})

    tagged_edges = edges.map_batches(und, batch_format="pyarrow") \
        .materialize()

    def tag_lab(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["uri"],
                         "kind": pa.array(np.zeros(len(t), np.int8),
                                          pa.int8()),
                         "nbr": pa.nulls(len(t), pa.string()),
                         "lab": t["lab"]})

    def emit(g: pa.Table) -> pa.Table:
        kind = g["kind"].to_numpy(zero_copy_only=False)
        lab = g.filter(pa.array(kind == 0))["lab"][0].as_py()
        uri = g["key"][0].as_py()
        nbrs = g.filter(pa.array(kind == 1))["nbr"]
        out_uri = pa.concat_arrays(
            [pa.array([uri], pa.string()), nbrs.combine_chunks()])
        return pa.table({"uri": out_uri,
                         "lab": pa.array([lab] * len(out_uri), pa.string())})

    labels = init_ds
    for _ in range(n_rounds):
        both = labels.map_batches(tag_lab,
                                  batch_format="pyarrow").union(tagged_edges)
        labels = (both.groupby("key")
                  .map_groups(emit, batch_format="pyarrow")
                  .groupby("uri").aggregate(Min(on="lab", alias_name="lab"))
                  .materialize())
    return labels


def _hops_shuffle(edges, seed_prefix: str, n_rounds: int):
    nodes = _node_ds(edges)
    n_seeds = nodes.map_batches(
        lambda t: t.filter(pc.starts_with(t["uri"], pattern=seed_prefix)),
        batch_format="pyarrow").count()
    if n_seeds == 0:
        return _empty("n")

    def init_dist(t: pa.Table) -> pa.Table:
        seed = pc.starts_with(t["uri"], pattern=seed_prefix) \
            .to_numpy(zero_copy_only=False)
        return pa.table({"uri": t["uri"],
                         "lab": pa.array(
                             np.where(seed, np.int64(0), _FAR), pa.int64())})

    dists = _min_rounds_shuffle(
        edges, nodes.map_batches(init_dist, batch_format="pyarrow"),
        n_rounds, inc=1)
    return dists.map_batches(
        lambda t: t.filter(pc.less(t["lab"], int(_FAR)))
        .rename_columns(["uri", "n"]),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# link prediction over the co-mention graph
# ---------------------------------------------------------------------------


def linkpred_scores(pairs, num_buckets: int = 32, deg_cap: int = None):
    """Common-neighbor link-prediction scores over an undirected
    entity graph given as DISTINCT unordered edges ``(a, b)`` (the
    ``comention_pairs`` output contract, a < b) — the classic KG
    completion / entity-suggestion triple (Liben-Nowell & Kleinberg
    2003):

    - ``cn``      = |N(a) ∩ N(b)| — exact int64;
    - ``jac_e6``  = round_half_up(1e6 * cn / (deg_a + deg_b - cn)),
      computed as PURE integer arithmetic
      ``(2_000_000*cn + den) // (2*den)`` so the two engines cannot
      disagree even at exact .5 boundaries (stronger than the e6
      float contract — no float ops at all);
    - ``aa_e6``   = Adamic–Adar: sum over common neighbors c of
      ``round(1e6 / ln(deg_c))`` — each term e6-rounded to an int64
      BEFORE the sum, so the sum is order-free exact integer
      arithmetic and only the per-term ln carries the documented
      tfidf idf_e6 ulp trade (stages/relevance.py:13).

    Every scored pair is a wedge endpoint pair (>=1 common neighbor);
    pairs that are also edges are included (both engines agree — a
    client filters to non-edges for suggestion ranking).

    Distributed shape (the triangle_count machinery, un-oriented):
    node vocabulary folds once on the driver (entity vocabulary = the
    small side; the PageRank/fold_vocab bound), ids are searchsorted
    ranks of the SORTED vocab so id order == URI order and the SQL
    mirror's ``<`` tie-breaks agree by construction; degrees fold as
    N int64s and broadcast once; ONE center-bucket shuffle co-locates
    each node's adjacency; per bucket the neighbor pairs expand via
    the flat-batch offsets idiom (no per-center Python loop) and
    combine locally (groupby pair-key: count + weight sum); one
    int-key groupby-sum folds bucket partials; the final scoring pass
    is a broadcast-degree map.  Per-center wedge cost is O(deg^2):
    ``deg_cap`` (default None = exact) drops centers above the cap —
    the df_cap hot-shingle idiom for hub entities at 100-TB scale
    (a hub's neighbor pairs are the least informative predictions).

    Returns a Dataset (a, b, cn, jac_e6, aa_e6), a < b by URI.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    empty = pa.table({"a": pa.array([], pa.string()),
                      "b": pa.array([], pa.string()),
                      "cn": pa.array([], pa.int64()),
                      "jac_e6": pa.array([], pa.int64()),
                      "aa_e6": pa.array([], pa.int64())})

    def block_nodes(t: pa.Table) -> pa.Table:
        vals = pa.concat_arrays([t["a"].combine_chunks().cast(pa.string()),
                                 t["b"].combine_chunks().cast(pa.string())])
        return pa.table({"uri": pc.unique(vals)})

    parts = pairs.map_batches(block_nodes,
                              batch_format="pyarrow").to_pandas()
    if not len(parts):
        return rd.from_arrow(empty)
    nodes = np.unique(parts["uri"].to_numpy())
    n = len(nodes)
    nref = ray.put(nodes)

    def sym(t: pa.Table) -> pa.Table:
        vocab = ray.get(nref)
        a = np.searchsorted(vocab, t["a"].to_numpy(zero_copy_only=False))
        b = np.searchsorted(vocab, t["b"].to_numpy(zero_copy_only=False))
        src = np.concatenate([a, b]).astype(np.int64)
        dst = np.concatenate([b, a]).astype(np.int64)
        return pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "_b": pa.array((src % num_buckets).astype(np.int32), pa.int32())})

    adj = pairs.map_batches(sym, batch_format="pyarrow").materialize()

    # degree fold (N int64s; input edges are distinct so counts are
    # exact neighbor counts)
    def deg_partial(t: pa.Table) -> pa.Table:
        uniq, cnt = np.unique(t["src"].to_numpy(zero_copy_only=False),
                              return_counts=True)
        return pa.table({"x": pa.array(uniq, pa.int64()),
                         "c": pa.array(cnt.astype(np.int64), pa.int64())})

    dparts = adj.map_batches(deg_partial, batch_format="pyarrow").to_pandas()
    deg = np.zeros(n, dtype=np.int64)
    np.add.at(deg, dparts["x"].to_numpy(),
              dparts["c"].to_numpy().astype(np.int64))
    dref = ray.put(deg)

    def wedge_partials(g: "pd.DataFrame") -> "pd.DataFrame":
        # all intra-center neighbor pairs (x < y by id == by URI),
        # flat-batch offsets expansion + local combine
        import pandas as pd

        from .dedup import _expand_run_offsets

        d = ray.get(dref)
        out_empty = pd.DataFrame({
            "k": pd.Series([], dtype=np.int64),
            "cnt": pd.Series([], dtype=np.int64),
            "w": pd.Series([], dtype=np.int64)})
        s = g["src"].to_numpy()
        t = g["dst"].to_numpy()
        if deg_cap is not None:
            keep = d[s] <= deg_cap
            s, t = s[keep], t[keep]
        if len(s) < 2:
            return out_empty
        order = np.lexsort((t, s))
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
            return out_empty
        b_idx = a_idx + _expand_run_offsets(run)
        k = t[a_idx] * n + t[b_idx]
        # per-center Adamic–Adar term: e6-rounded int BEFORE summing
        w = np.round(1e6 / np.log(d[s[a_idx]])).astype(np.int64)
        df = pd.DataFrame({"k": k, "w": w})
        agg = df.groupby("k", sort=False).agg(
            cnt=("w", "size"), w=("w", "sum")).reset_index()
        agg["cnt"] = agg["cnt"].astype(np.int64)
        return agg

    partials = adj.groupby("_b").map_groups(wedge_partials,
                                            batch_format="pandas")
    totals = partials.groupby("k").aggregate(
        Sum(on="cnt", alias_name="cn"), Sum(on="w", alias_name="aa_e6"))

    def score(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        vocab, d = ray.get(nref), ray.get(dref)
        k = t["k"].to_numpy(zero_copy_only=False)
        x, y = k // n, k % n
        cn = t["cn"].to_numpy(zero_copy_only=False).astype(np.int64)
        den = d[x] + d[y] - cn
        jac = (np.int64(2_000_000) * cn + den) // (2 * den)
        return pa.table({
            "a": pa.array(vocab[x], pa.string()),
            "b": pa.array(vocab[y], pa.string()),
            "cn": pa.array(cn, pa.int64()),
            "jac_e6": pa.array(jac, pa.int64()),
            "aa_e6": t["aa_e6"].cast(pa.int64())})

    return totals.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# label-propagation communities (fixed-round synchronous LPA)
# ---------------------------------------------------------------------------

LPA_ROUNDS = 4


def lpa_communities(triples_ds, n_rounds: int = LPA_ROUNDS,
                    edge_cap: int = PAGERANK_BROADCAST_EDGE_CAP,
                    edges=None, folded=None):
    """Community sizes after ``n_rounds`` of SYNCHRONOUS label
    propagation (Raghavan et al. 2007) over the undirected distinct
    entity-graph support: init label[v] = v's own URI; each round
    every node adopts the label held by the MOST of its (distinct)
    neighbors, ties broken by lexicographically smallest label.
    Fixed rounds make the iterative algorithm a deterministic
    driver-checkable contract (the pagerank/cc precedent) — sync LPA
    can oscillate on bipartite-ish structure, and both engines agree
    on the oscillating state too.  Tie-break parity holds because
    node ids are searchsorted ranks of the SORTED vocab (rank order
    == URI order == the SQL mirror's VARCHAR min).

    Broadcast path (edges <= cap): the kcore shape — int pairs
    collapse to the distinct undirected support driver-side, then
    each round is two vectorized passes (composite-key unique counts
    + grouped argmax via lexsort); nothing but the N-sized label
    vector persists.  Shuffle fallback above the cap: per round, one
    co-group joins labels onto the symmetric edge list, one
    (node,label) groupby counts, one node groupby argmaxes — nothing
    driver-sized.  Returns a Dataset (uri, n = community size).
    """
    import ray.data as rd

    if edges is None:
        edges = entity_edges(triples_ds).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return _empty("n")

    if n_edges <= edge_cap:
        nodes, int_edges = folded if folded is not None \
            else fold_vocab(edges)
        n = len(nodes)
        pairs = int_edges.to_pandas()
        a = np.minimum(pairs["src"].to_numpy(), pairs["dst"].to_numpy())
        b = np.maximum(pairs["src"].to_numpy(), pairs["dst"].to_numpy())
        und = np.unique(a * np.int64(n) + b)
        ua, ub = und // n, und % n
        sym_s = np.concatenate([ua, ub])
        sym_d = np.concatenate([ub, ua])
        lab = np.arange(n, dtype=np.int64)
        for _ in range(n_rounds):
            key = sym_d * np.int64(n) + lab[sym_s]
            uniq, cnt = np.unique(key, return_counts=True)
            v, lv = uniq // n, uniq % n
            order = np.lexsort((lv, -cnt, v))
            v_o = v[order]
            first = np.ones(len(v_o), dtype=bool)
            first[1:] = v_o[1:] != v_o[:-1]
            new = lab.copy()
            new[v_o[first]] = lv[order][first]
            lab = new
        sizes = np.bincount(lab, minlength=n)
        return rd.from_arrow(pa.table({
            "uri": pa.array(nodes, pa.string()),
            "n": pa.array(sizes[lab].astype(np.int64), pa.int64())}))

    return _lpa_shuffle(edges, n_rounds)


def _lpa_shuffle(edges, n_rounds: int):
    """Above-cap LPA: labels stay a Dataset keyed by URI.  Per round:
    co-group (kind 0 = label row, kind 1 = symmetric edge row) emits
    (neighbor, my-label) votes; groupby(node, label).count; one
    groupby(node) argmax (count desc, label asc).  Three shuffles per
    round — the kcore/_min_rounds_shuffle price above the cap."""
    from ray.data.aggregate import Count

    und = _und_pairs(edges).materialize()

    def sym(t: pa.Table) -> pa.Table:
        x = t["a"].combine_chunks().cast(pa.string())
        y = t["b"].combine_chunks().cast(pa.string())
        return pa.table({"key": pa.concat_arrays([x, y]),
                         "kind": pa.array(np.ones(2 * len(t), np.int8),
                                          pa.int8()),
                         "nbr": pa.concat_arrays([y, x]),
                         "lab": pa.nulls(2 * len(t), pa.string())})

    tagged_edges = edges.map_batches(
        lambda t: pa.table({"uri": pc.unique(pa.concat_arrays(
            [t["src"].combine_chunks().cast(pa.string()),
             t["dst"].combine_chunks().cast(pa.string())]))}),
        batch_format="pyarrow")
    labels = tagged_edges.groupby("uri").map_groups(
        lambda g: pa.table({"uri": g["uri"][:1],
                            "lab": g["uri"][:1]}),
        batch_format="pyarrow").materialize()
    sym_edges = und.map_batches(sym, batch_format="pyarrow") \
        .materialize()

    def tag_lab(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["uri"],
                         "kind": pa.array(np.zeros(len(t), np.int8),
                                          pa.int8()),
                         "nbr": pa.nulls(len(t), pa.string()),
                         "lab": t["lab"]})

    def votes(g: pa.Table) -> pa.Table:
        kind = g["kind"].to_numpy(zero_copy_only=False)
        lab = g.filter(pa.array(kind == 0))["lab"][0].as_py()
        nbrs = g.filter(pa.array(kind == 1))["nbr"].combine_chunks()
        return pa.table({
            "uri": nbrs,
            "lab": pa.array([lab] * len(nbrs), pa.string())})

    def argmax(g: pa.Table) -> pa.Table:
        c = g["n"].to_numpy(zero_copy_only=False)
        lv = g["lab"].to_pandas().to_numpy(dtype=object)
        order = np.lexsort((lv, -c))
        return pa.table({"uri": g["uri"][:1],
                         "lab": pa.array([lv[order[0]]], pa.string())})

    for _ in range(n_rounds):
        both = labels.map_batches(tag_lab,
                                  batch_format="pyarrow").union(sym_edges)
        counts = (both.groupby("key")
                  .map_groups(votes, batch_format="pyarrow")
                  .groupby(["uri", "lab"])
                  .aggregate(Count(alias_name="n")))
        labels = counts.groupby("uri").map_groups(
            argmax, batch_format="pyarrow").materialize()

    def sizes(g: pa.Table) -> pa.Table:
        return pa.table({
            "uri": g["uri"],
            "n": pa.array(np.full(len(g), len(g), np.int64), pa.int64())})

    return labels.groupby("lab").map_groups(sizes, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# entity mention time spans (temporal KG: first/last seen)
# ---------------------------------------------------------------------------


def mention_time_spans(triples_ds, predicate: str, ts_pred: str,
                       num_buckets: int = 32):
    """First/last mention time per entity — the temporal-KG "entity
    activity span" projection (when did this entity first/last appear
    in the conversation stream?).  Joins mention rows (turn ->
    entity) to the turn's ``ts_pred`` timestamp literal and
    min/max-aggregates per entity as EXACT epoch microseconds (int64
    == DuckDB epoch_us, verified bit-equal).

    Shape: one projection pass tags mention + timestamp rows, ONE
    turn-hash bucket shuffle co-locates each turn's rows (the
    comention_pairs machinery), each bucket merges vectorized and
    emits per-entity (min, max) partials; the driver folds
    entity-vocab-sized partials (the small side — the PageRank fold
    bound).  Returns a Dataset (ent, first_us, last_us)."""
    import pandas as _pd
    import ray.data as rd

    from .extract import TS_FORMAT

    empty = pa.table({"ent": pa.array([], pa.string()),
                      "first_us": pa.array([], pa.int64()),
                      "last_us": pa.array([], pa.int64())})

    def proj(t: pa.Table) -> pa.Table:
        is_m = pc.equal(t["predicate"], predicate)
        is_t = pc.equal(t["predicate"], ts_pred)
        tt = t.filter(pc.or_(is_m, is_t))
        if len(tt) == 0:
            return pa.table({"turn": pa.array([], pa.string()),
                             "val": pa.array([], pa.string()),
                             "kind": pa.array([], pa.int8()),
                             "_b": pa.array([], pa.int32())})
        kind = pc.cast(pc.equal(tt["predicate"], predicate), pa.int8())
        h = _pd.util.hash_pandas_object(
            tt["subject"].to_pandas(), index=False).to_numpy()
        return pa.table({
            "turn": tt["subject"].combine_chunks().cast(pa.string()),
            "val": tt["object"].combine_chunks().cast(pa.string()),
            "kind": kind,
            "_b": pa.array((h % num_buckets).astype(np.int32),
                           pa.int32())})

    def spans(g: _pd.DataFrame) -> _pd.DataFrame:
        out_empty = _pd.DataFrame({
            "ent": _pd.Series([], dtype=object),
            "mn": _pd.Series([], dtype=np.int64),
            "mx": _pd.Series([], dtype=np.int64)})
        ts = g[g["kind"] == 0]
        m = g[g["kind"] == 1]
        if not len(ts) or not len(m):
            return out_empty
        j = m[["turn", "val"]].rename(columns={"val": "ent"}).merge(
            ts[["turn", "val"]].rename(columns={"val": "iso"}), on="turn")
        if not len(j):
            return out_empty
        us = _pd.to_datetime(j["iso"], format=TS_FORMAT) \
            .astype("int64") // 1000
        agg = j.assign(us=us).groupby("ent", sort=False)["us"] \
            .agg(mn="min", mx="max").reset_index()
        agg["mn"] = agg["mn"].astype(np.int64)
        agg["mx"] = agg["mx"].astype(np.int64)
        return agg

    parts = (triples_ds.map_batches(proj, batch_format="pyarrow")
             .groupby("_b").map_groups(spans, batch_format="pandas")
             .to_pandas())
    if not len(parts):
        return rd.from_arrow(empty)
    fold = parts.groupby("ent", sort=False).agg(
        first_us=("mn", "min"), last_us=("mx", "max")).reset_index()
    return rd.from_arrow(pa.table({
        "ent": pa.array(fold["ent"].tolist(), pa.string()),
        "first_us": pa.array(fold["first_us"].to_numpy(np.int64)),
        "last_us": pa.array(fold["last_us"].to_numpy(np.int64))}))
