"""Deterministic seeded graph walks — the DeepWalk/node2vec walk
CORPUS generator (Perozzi et al. 2014), derandomized so both engines
agree exactly.

A graph-embedding pipeline at 100 TB starts by materializing random
walks; "random" only needs to be uniform-ish and REPRODUCIBLE, so the
next hop is the neighbor minimizing ``md5(walk_id | step | neighbor)``
(ties -> smallest neighbor URI; md5 hex compares identically as a
DuckDB VARCHAR and a Python str).  That makes the walk corpus a pure
function of the graph — resumable, cacheable, and driver-checkable
against an unrolled SQL mirror, unlike a seeded-RNG implementation
whose state depends on execution order.

Distributed shape (works at ANY edge count — no broadcast cap):
the walk frontier is seed-set-sized and broadcasts each step
(``ray.put`` of a {cur -> [walk_ids]} dict); each step is ONE
distributed edge scan where every batch filters to frontier-incident
rows (vectorized ``np.isin``) and emits its LOCAL per-walk minimum
candidate (at most n_walks rows per batch); the driver folds
frontier-sized partials.  Nothing edge-sized ever reaches the driver
and the md5 loop runs only over frontier-incident edges.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .pagerank import entity_edges

WALK_STEPS = 4


def _empty_walks():
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "walk_id": pa.array([], pa.string()),
        "step": pa.array([], pa.int64()),
        "node": pa.array([], pa.string())}))


def seeded_walks(triples_ds, seed_prefix: str,
                 n_steps: int = WALK_STEPS, edges=None):
    """One walk per seed node (URI prefix match) over the undirected
    distinct entity-graph support; ``walk_id`` = the seed URI.  Step
    i moves to ``argmin_{nbr}(md5(f"{walk_id}|{i}|{nbr}"), nbr)`` over
    the current node's neighbors — walks may backtrack (standard for
    DeepWalk corpora).  Returns a Dataset (walk_id, step, node)
    including step 0 = the seed itself."""
    import ray
    import ray.data as rd

    if edges is None:
        edges = entity_edges(triples_ds).materialize()

    def nodes_proj(t: pa.Table) -> pa.Table:
        vals = pa.concat_arrays([t["src"].combine_chunks().cast(pa.string()),
                                 t["dst"].combine_chunks().cast(pa.string())])
        u = pc.unique(vals)
        return pa.table({"uri": u.filter(
            pc.starts_with(u, pattern=seed_prefix))})

    parts = edges.map_batches(nodes_proj, batch_format="pyarrow") \
        .to_pandas()
    if not len(parts):
        return _empty_walks()
    seeds = np.unique(parts["uri"].to_numpy())

    cur = {s: s for s in seeds}  # walk_id -> current node
    out_w = list(seeds)
    out_s = [0] * len(seeds)
    out_n = list(seeds)

    for step in range(1, n_steps + 1):
        inv: dict = {}
        for wid, c in cur.items():
            inv.setdefault(c, []).append(wid)
        fref = ray.put(inv)
        fkeys = ray.put(np.array(sorted(inv), dtype=object))

        def cand(t: pa.Table, step=step, fref=fref,
                 fkeys=fkeys) -> pa.Table:
            frontier = ray.get(fref)
            keys = ray.get(fkeys)
            s = t["src"].to_pandas().to_numpy(dtype=object)
            d = t["dst"].to_pandas().to_numpy(dtype=object)
            x = np.concatenate([s, d])   # walk position candidates
            y = np.concatenate([d, s])   # their neighbors
            hit = np.isin(x, keys)
            best: dict = {}
            for xv, yv in zip(x[hit], y[hit]):
                for wid in frontier[xv]:
                    h = hashlib.md5(
                        f"{wid}|{step}|{yv}".encode()).hexdigest()
                    k = (h, yv)
                    if wid not in best or k < best[wid]:
                        best[wid] = k
            return pa.table({
                "w": pa.array(list(best.keys()), pa.string()),
                "h": pa.array([v[0] for v in best.values()], pa.string()),
                "nxt": pa.array([v[1] for v in best.values()],
                                pa.string())})

        parts = edges.map_batches(cand, batch_format="pyarrow") \
            .to_pandas()
        best: dict = {}
        for wid, h, nxt in zip(parts["w"], parts["h"], parts["nxt"]):
            k = (h, nxt)
            if wid not in best or k < best[wid]:
                best[wid] = k
        cur = {wid: k[1] for wid, k in best.items()}
        for wid in sorted(cur):
            out_w.append(wid)
            out_s.append(step)
            out_n.append(cur[wid])

    return rd.from_arrow(pa.table({
        "walk_id": pa.array(out_w, pa.string()),
        "step": pa.array(np.array(out_s, np.int64), pa.int64()),
        "node": pa.array(out_n, pa.string())}))
