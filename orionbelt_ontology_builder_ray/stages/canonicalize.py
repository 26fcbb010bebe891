"""Stage 3: canonicalization — merge co-referent entities.

Distributed analog of the reference's ``rename_*`` reference rewriting
(ontology_manager.py:341-369), ``owl:sameAs`` / ``skos:exactMatch``
machinery, and merge-overwrite precedence: entities sharing a
normalized surface form (the duplicate-label grouping key,
om:2837-2841) or linked by explicit sameAs pairs are merged onto one
canonical URI (min URI wins, deterministically), and every subject /
object reference is rewritten through the canonical map.

Shape: ``groupby(norm_label)`` → per-group merge → union-find closure
over the (tiny, entity-sized) pair set → broadcast map → vectorized
rewrite ``map_batches``.  The canonical map is vocabulary-sized
(entities, not rows); at 10^12 rows the rewrite is still one
broadcast + one streaming pass.  Hot surface forms (e.g. "user") are
salted two-phase in ``normalized_label_pairs`` via per-batch local
dedup before the shuffle.
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, List, Tuple

import numpy as np
import pandas as pd

from ..functions.terms import (OWL_SAME_AS, SKOS_EXACT_MATCH,
                               SKOS_PREF_LABEL, pool_size)

_NORM_RE = re.compile(r"[^a-z0-9]+")


def normalize_surface(s: str) -> str:
    """Casefold + collapse non-alphanumerics (the canonicalization key)."""
    return _NORM_RE.sub(" ", s.casefold()).strip()


def normalized_label_pairs(triples_ds, num_salts: int = 8) -> List[Tuple[str, str]]:
    """(entity, entity') pairs sharing a normalized prefLabel.

    Skew handling (north_rule: salted repartitioning for hot keys) is
    two-phase: per batch, (subject, norm) rows dedup locally; the
    first groupby keys on ``(norm, salt(entity))`` so a hot surface
    form ("user", "assistant") splits across ``num_salts`` groups, each
    emitting a star to its local min entity; the second phase merges
    only the per-salt representatives — group size is bounded by
    ``num_salts``, never by the hot key's population.
    """
    def extract(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch[batch["predicate"] == SKOS_PREF_LABEL]
        if not len(m):
            return pd.DataFrame({"entity": pd.Series([], dtype=str),
                                 "norm": pd.Series([], dtype=str),
                                 "salt": pd.Series([], dtype=np.int32)})
        out = pd.DataFrame({
            "entity": m["subject"].to_numpy(),
            "norm": [normalize_surface(v) for v in m["object"]],
        }).drop_duplicates()
        salt = pd.util.hash_pandas_object(out["entity"], index=False)
        out["salt"] = (salt % num_salts).astype(np.int32)
        return out

    def to_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ents = np.sort(g["entity"].unique())
        if len(ents) < 2:
            # singleton groups still surface their representative so the
            # cross-salt phase can merge them
            reps = ents
        else:
            reps = ents[:1]
        star = pd.DataFrame({"a": np.repeat(ents[0], len(ents) - 1),
                             "b": ents[1:]}) if len(ents) > 1 else \
            pd.DataFrame({"a": pd.Series([], dtype=str),
                          "b": pd.Series([], dtype=str)})
        star["rep"] = ""
        rep_rows = pd.DataFrame({"a": reps, "b": reps, "rep": "rep"})
        rep_rows["norm"] = g["norm"].iloc[0]
        star["norm"] = g["norm"].iloc[0] if len(g) else ""
        return pd.concat([star, rep_rows], ignore_index=True)

    salted = (triples_ds.map_batches(extract, batch_format="pandas")
              .groupby(["norm", "salt"])
              .map_groups(to_pairs, batch_format="pandas"))
    rows = salted.take_all()
    pairs = [(r["a"], r["b"]) for r in rows if r["rep"] == "" and r["a"] != r["b"]]
    # phase 2: merge per-salt representatives of the same norm (tiny:
    # <= num_salts rows per surface form)
    reps_by_norm: dict = {}
    for r in rows:
        if r["rep"] == "rep":
            reps_by_norm.setdefault(r["norm"], []).append(r["a"])
    for norm, reps in reps_by_norm.items():
        reps = sorted(set(reps))
        pairs += [(reps[0], other) for other in reps[1:]]
    return pairs


def same_as_pairs(triples_ds) -> List[Tuple[str, str]]:
    """Explicit owl:sameAs / skos:exactMatch assertions as merge pairs."""
    def extract(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch[batch["predicate"].isin([OWL_SAME_AS, SKOS_EXACT_MATCH])
                  & (batch["object_kind"] == "uri")]
        return m[["subject", "object"]].rename(
            columns={"subject": "a", "object": "b"}).drop_duplicates()

    return [(r["a"], r["b"])
            for r in triples_ds.map_batches(extract, batch_format="pandas")
            .take_all()]


def union_find_canonical_map(pairs: Iterable[Tuple[str, str]]) -> Dict[str, str]:
    """Transitive closure over merge pairs; min URI is canonical.

    The pair set is entity-sized (bounded by the vocabulary), so the
    union-find runs on the driver; the result is broadcast.
    """
    parent: Dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent if find(x) != x}


class CanonicalRewriter:
    """Vectorized subject/object rewrite through the canonical map
    (distributed rename_class/rename_individual, om:341-369)."""

    def __init__(self, mapping_ref):
        try:
            import ray

            if isinstance(mapping_ref, ray.ObjectRef):
                mapping_ref = ray.get(mapping_ref)
        except ImportError:
            pass
        self.mapping: Dict[str, str] = mapping_ref

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not self.mapping:
            return batch
        batch = batch.copy()
        subj = batch["subject"].map(self.mapping)
        batch["subject"] = subj.fillna(batch["subject"])
        is_uri = batch["object_kind"] == "uri"
        obj = batch.loc[is_uri, "object"].map(self.mapping)
        batch.loc[is_uri, "object"] = obj.fillna(batch.loc[is_uri, "object"])
        return batch


def canonicalize(triples_ds, extra_pairs: Iterable[Tuple[str, str]] = (),
                 use_labels: bool = True):
    """Full stage: derive pairs → union-find → broadcast rewrite.

    Returns (rewritten_ds, canonical_map).
    """
    pairs = list(extra_pairs)
    if use_labels:
        pairs += normalized_label_pairs(triples_ds)
    pairs += same_as_pairs(triples_ds)
    mapping = union_find_canonical_map(pairs)
    if not mapping:
        return triples_ds, mapping
    try:
        import ray

        ref = ray.put(mapping)
    except ImportError:
        ref = mapping
    out = triples_ds.map_batches(
        CanonicalRewriter, fn_constructor_kwargs=dict(mapping_ref=ref),
        batch_format="pandas", concurrency=pool_size())
    return out, mapping
