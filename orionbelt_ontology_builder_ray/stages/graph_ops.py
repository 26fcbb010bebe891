"""Whole-graph operators over triples Datasets: merge, diff, conflict
detection, delete, rename — the reference's graph algebra at scale.

All comparisons run on 64-bit row-content hashes: the 8-byte hash
column shuffles/broadcasts instead of the string payload (same design
as ``stages.dedup``).  Each op documents its small-side assumption.

Reference parity: merge strategies ontology_manager.py:2112-2172,
conflict detection :2068-2110, diff :2412-2486, deletes :480-485/
872-877/1055-1059, renames :341-369.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.terms import CONFLICT_PREDICATES, pool_size
from .extract import TRIPLE_COLS


# Set membership runs on a 128-bit composite of two independent 64-bit
# row hashes (different pandas hash keys).  A single 64-bit hash makes
# a silent cross-dataset collision plausible at 10^10-row scale
# (birthday bound); at 128 bits the collision probability is ~2^-128
# per pair — effectively exact, with no payload confirmation join.
_HASH_DTYPE = np.dtype([("h1", "i8"), ("h2", "i8")])
_SECOND_HASH_KEY = "graft2ndhashkey!"  # 16 chars, pandas requirement


def _row_hashes(batch: pd.DataFrame) -> np.ndarray:
    out = np.empty(len(batch), dtype=_HASH_DTYPE)
    out["h1"] = pd.util.hash_pandas_object(
        batch[TRIPLE_COLS], index=False).to_numpy().view(np.int64)
    out["h2"] = pd.util.hash_pandas_object(
        batch[TRIPLE_COLS], index=False,
        hash_key=_SECOND_HASH_KEY).to_numpy().view(np.int64)
    return out


def collect_hashes(ds) -> np.ndarray:
    """Sorted 128-bit row-content hashes of a triples Dataset (16
    bytes/row to the driver; beyond ~10^10 rows switch to a
    bucket-shuffle join)."""
    parts = [
        _row_hashes(b) for b in
        ds.iter_batches(batch_size=65536, batch_format="pandas")
    ]
    return np.sort(np.concatenate(parts)) if parts else \
        np.array([], dtype=_HASH_DTYPE)


def _sorted_member(sorted_arr: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Vectorized membership of ``q`` in a sorted (structured) array."""
    if len(sorted_arr) == 0 or len(q) == 0:
        return np.zeros(len(q), dtype=bool)
    idx = np.searchsorted(sorted_arr, q)
    idx[idx >= len(sorted_arr)] = len(sorted_arr) - 1
    return sorted_arr[idx] == q


class _HashFilter:
    """Keep (or drop) rows whose content hash is in the broadcast set."""

    def __init__(self, hashes_ref, keep: bool):
        try:
            import ray

            if isinstance(hashes_ref, ray.ObjectRef):
                hashes_ref = ray.get(hashes_ref)
        except ImportError:
            pass
        self.hashes = np.asarray(hashes_ref)
        self.keep = keep

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return batch
        present = _sorted_member(self.hashes, _row_hashes(batch))
        return batch[present if self.keep else ~present]


def _broadcast(value):
    try:
        import ray

        return ray.put(value)
    except ImportError:
        return value


def subtract_triples(ds_a, ds_b):
    """A − B (set difference): anti-join via broadcast hash set of B."""
    ref = _broadcast(collect_hashes(ds_b))
    return ds_a.map_batches(_HashFilter, fn_constructor_kwargs=dict(
        hashes_ref=ref, keep=False), batch_format="pandas", concurrency=pool_size())


def intersect_triples(ds_a, ds_b):
    """A ∩ B: semi-join via broadcast hash set of B."""
    ref = _broadcast(collect_hashes(ds_b))
    return ds_a.map_batches(_HashFilter, fn_constructor_kwargs=dict(
        hashes_ref=ref, keep=True), batch_format="pandas", concurrency=pool_size())


def merge_triples(ds_current, ds_incoming, strategy: str = "merge"):
    """Merge strategies over Datasets (om:2112-2172).

    - replace: incoming wins wholesale
    - merge: set union (dedup downstream)
    - merge_overwrite: for the 6 conflict predicates, incoming (s,p)
      values replace ALL current values when they differ; everything
      else unions.  The conflict-predicate slice of either side is
      schema-sized (labels/domains/ranges), so the incoming (s,p)
      conflict-key set broadcasts.
    """
    from .dedup import dedup_triples

    if strategy == "replace":
        return ds_incoming
    if strategy == "merge":
        return dedup_triples(ds_current.union(ds_incoming))
    if strategy != "merge_overwrite":
        raise ValueError(f"Unknown merge strategy: {strategy}")

    conflict_preds = sorted(CONFLICT_PREDICATES)

    def conflict_keys(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch[batch["predicate"].isin(conflict_preds)]
        return m[["subject", "predicate"]].drop_duplicates()

    incoming_keys = (ds_incoming.map_batches(conflict_keys,
                                             batch_format="pandas")
                     .to_pandas().drop_duplicates())
    key_set = set(map(tuple, incoming_keys.to_numpy()))
    key_ref = _broadcast(key_set)

    class DropOverwritten:
        def __init__(self):
            try:
                import ray

                self.keys = (ray.get(key_ref)
                             if not isinstance(key_ref, set) else key_ref)
            except ImportError:
                self.keys = key_ref

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if not self.keys:
                return batch
            mask = [
                (s, p) not in self.keys
                for s, p in zip(batch["subject"], batch["predicate"])
            ]
            return batch[np.array(mask, dtype=bool)]

    kept = ds_current.map_batches(DropOverwritten, batch_format="pandas",
                                  concurrency=pool_size())
    return dedup_triples(kept.union(ds_incoming))


def detect_conflicts_ds(ds_current, ds_incoming) -> pd.DataFrame:
    """Same-(s,p)-different-object over the conflict predicates
    (om:2068-2110).  Both conflict slices are schema-sized → driver
    pandas join after a filtered, deduplicated fetch."""
    preds = sorted(CONFLICT_PREDICATES)

    def slice_(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch[batch["predicate"].isin(preds)]
        return m[TRIPLE_COLS].drop_duplicates()

    cur = ds_current.map_batches(slice_, batch_format="pandas").to_pandas()
    inc = ds_incoming.map_batches(slice_, batch_format="pandas").to_pandas()
    if cur.empty or inc.empty:
        return pd.DataFrame({"subject": [], "predicate": [],
                             "incoming_value": []})
    merged = inc.merge(cur, on=["subject", "predicate"],
                       suffixes=("_inc", "_cur"))
    differs = merged[
        (merged["object_inc"] != merged["object_cur"])
        | (merged["lang_inc"] != merged["lang_cur"])
        | (merged["datatype_inc"] != merged["datatype_cur"])]
    # conflict iff NO current value equals the incoming one
    eq = merged[(merged["object_inc"] == merged["object_cur"])
                & (merged["lang_inc"] == merged["lang_cur"])
                & (merged["datatype_inc"] == merged["datatype_cur"])]
    eq_keys = set(map(tuple, eq[["subject", "predicate",
                                 "object_inc"]].to_numpy()))
    out = differs[[not ((s, p, o) in eq_keys)
                   for s, p, o in zip(differs["subject"], differs["predicate"],
                                      differs["object_inc"])]]
    out = (out[["subject", "predicate", "object_inc"]]
           .rename(columns={"object_inc": "incoming_value"})
           .drop_duplicates(["subject", "predicate"])
           .sort_values(["subject", "predicate"]).reset_index(drop=True))
    return out


def diff_stats(ds_a, ds_b) -> Dict[str, int]:
    """Triple-level diff counts (om:2412-2486): added/removed split by
    bnode-rooted vs named, plus unchanged — all computed from the two
    hash sets (payload never moves)."""

    def hashes_and_bnode(ds):
        named, bnode = [], []
        for b in ds.iter_batches(batch_size=65536, batch_format="pandas"):
            h = _row_hashes(b)
            is_b = b["subject"].str.startswith("_:").to_numpy()
            named.append(h[~is_b])
            bnode.append(h[is_b])
        cat = (lambda xs: np.sort(np.concatenate(xs)) if xs
               else np.array([], dtype=_HASH_DTYPE))
        return cat(named), cat(bnode)

    def n_only(xs: np.ndarray, other_sorted: np.ndarray) -> int:
        u = np.unique(xs)
        return int((~_sorted_member(other_sorted, u)).sum())

    a_named, a_bnode = hashes_and_bnode(ds_a)
    b_named, b_bnode = hashes_and_bnode(ds_b)
    a_all = np.sort(np.concatenate([a_named, a_bnode]))
    b_all = np.sort(np.concatenate([b_named, b_bnode]))
    unchanged = int(_sorted_member(b_all, np.unique(a_all)).sum())
    return {
        "added": n_only(b_named, a_named),
        "removed": n_only(a_named, b_named),
        "bnode_added": n_only(b_bnode, a_bnode),
        "bnode_removed": n_only(a_bnode, b_bnode),
        "unchanged": unchanged,
    }


def delete_entity(ds, uri: str):
    """Remove (uri, *, *) and (*, *, uri) — delete_class/individual
    semantics (om:480-485, 1055-1059); vectorized filter, no shuffle."""
    def flt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.and_(pc.invert(pc.equal(t["subject"], uri)),
                       pc.invert(pc.and_(pc.equal(t["object"], uri),
                                         pc.equal(t["object_kind"], "uri"))))
        return t.filter(keep)

    return ds.map_batches(flt, batch_format="pyarrow")


def delete_property_ds(ds, uri: str):
    """delete_property also removes rows using it as predicate (om:872-877)."""
    def flt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.and_(
            pc.and_(pc.invert(pc.equal(t["subject"], uri)),
                    pc.invert(pc.equal(t["predicate"], uri))),
            pc.invert(pc.and_(pc.equal(t["object"], uri),
                              pc.equal(t["object_kind"], "uri"))))
        return t.filter(keep)

    return ds.map_batches(flt, batch_format="pyarrow")


def rename_entity(ds, old_uri: str, new_uri: str,
                  include_predicate: bool = False):
    """Distributed rename_* (om:341-369): rewrite subject/object (and
    optionally predicate) occurrences — a one-entry canonical map."""
    from .canonicalize import CanonicalRewriter

    mapping = {old_uri: new_uri}
    out = ds.map_batches(CanonicalRewriter,
                         fn_constructor_kwargs=dict(mapping_ref=mapping),
                         batch_format="pyarrow", concurrency=pool_size())
    if include_predicate:
        import pyarrow.compute as pc

        def fix_pred(t: pa.Table) -> pa.Table:
            pred = t["predicate"]
            new = pc.if_else(pc.equal(pred, old_uri),
                             pa.scalar(new_uri, pa.string()), pred)
            return t.set_column(t.column_names.index("predicate"),
                                "predicate", new)

        out = out.map_batches(fix_pred, batch_format="pyarrow")
    return out
