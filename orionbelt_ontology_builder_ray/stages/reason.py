"""Distributed RDFS forward chaining (SURVEY.md §2.11, §7 step 9).

Semi-naive evaluation over a triples Dataset:

- schema rules (subClassOf/subPropertyOf transitivity) run driver-side
  on the schema slice — the class/property hierarchy is
  vocabulary-sized even at 10^12 assertions;
- instance rules (rdfs2/3/7/9: domain/range typing, subproperty
  propagation, type inheritance) run as ONE vectorized ``map_batches``
  pass per round over the assertion stream, joining each batch against
  the broadcast schema closure.  Rounds are bounded by hierarchy depth
  (1 pass suffices once the schema closure is precomputed).

The reference applies owlrl in-process over workbench-sized graphs
(ontology_manager.py:2853-2864); full OWL-RL on the assertion stream
is explicitly out of scope — the driver-side ``TripleStore.
apply_reasoning`` covers the schema plane.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Set

import pandas as pd

from ..functions.terms import (
    pool_size,
    RDF_TYPE, RDFS_DOMAIN, RDFS_RANGE, RDFS_SUBCLASSOF, RDFS_SUBPROPERTYOF,
)
from .extract import TRIPLE_COLS


def _transitive_closure(edges) -> Dict[str, Set[str]]:
    parents = defaultdict(set)
    for a, b in edges:
        parents[a].add(b)
    changed = True
    while changed:
        changed = False
        for a in list(parents):
            expand = set()
            for b in parents[a]:
                expand |= parents.get(b, set())
            if not expand <= parents[a]:
                parents[a] |= expand
                changed = True
    return dict(parents)


def collect_schema(ds) -> dict:
    """Gather the (small) schema slice: subClassOf / subPropertyOf /
    domain / range edges -> closed maps ready to broadcast."""
    preds = [RDFS_SUBCLASSOF, RDFS_SUBPROPERTYOF, RDFS_DOMAIN, RDFS_RANGE]

    def slice_(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch[batch["predicate"].isin(preds)
                  & (batch["object_kind"] == "uri")
                  & ~batch["object"].str.startswith("_:")]
        return m[["subject", "predicate", "object"]].drop_duplicates()

    schema = ds.map_batches(slice_, batch_format="pandas").to_pandas() \
        .drop_duplicates()
    by_pred = {p: list(zip(g["subject"], g["object"]))
               for p, g in schema.groupby("predicate")}
    return {
        "class_parents": _transitive_closure(by_pred.get(RDFS_SUBCLASSOF, [])),
        "prop_parents": _transitive_closure(by_pred.get(RDFS_SUBPROPERTYOF, [])),
        "domains": dict(by_pred.get(RDFS_DOMAIN, [])),
        "ranges": dict(by_pred.get(RDFS_RANGE, [])),
    }


class RdfsInferencer:
    """map_batches stage: emit inferred rows for one batch (input rows
    pass through; inferred rows appended; dedup happens downstream)."""

    def __init__(self, schema_ref):
        try:
            import ray

            if isinstance(schema_ref, ray.ObjectRef):
                schema_ref = ray.get(schema_ref)
        except ImportError:
            pass
        self.schema = schema_ref
        # exploded (child, parent) frames built ONCE per actor so the
        # per-batch rules are pure pandas merges — type rows are the
        # bulk of the stream at scale, so a per-row Python loop here
        # would dominate the whole closure
        s = schema_ref
        self._cls_parents = pd.DataFrame(
            [(c, p) for c, ps in s["class_parents"].items() for p in ps],
            columns=["_cls", "_parent"])
        self._prop_parents = pd.DataFrame(
            [(c, p) for c, ps in s["prop_parents"].items() for p in ps],
            columns=["_prop", "_parent"])

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = self.schema
        frames = [batch]

        def rows(subj, pred, obj, kind):
            return pd.DataFrame({
                "subject": subj, "predicate": pred, "object": obj,
                "object_kind": kind, "lang": "", "datatype": "",
            })

        # rdfs9: type inheritance through the closed class hierarchy
        # (vectorized merge of the batch's type rows against the
        # exploded child→parent frame)
        types = batch[(batch["predicate"] == RDF_TYPE)
                      & (batch["object_kind"] == "uri")]
        if len(types) and len(self._cls_parents):
            inh = types[["subject", "object"]].merge(
                self._cls_parents, left_on="object", right_on="_cls")
            if len(inh):
                frames.append(rows(inh["subject"].to_numpy(), RDF_TYPE,
                                   inh["_parent"].to_numpy(), "uri"))

        # rdfs7: subproperty propagation (copies the full row identity)
        if len(self._prop_parents):
            sub = batch.merge(self._prop_parents, left_on="predicate",
                              right_on="_prop")
            if len(sub):
                sub = sub.drop(columns=["predicate", "_prop"]).rename(
                    columns={"_parent": "predicate"})
                frames.append(sub[TRIPLE_COLS])

        # rdfs2/rdfs3: domain/range typing (through closure afterwards
        # via the emitted rdf:type rows + rdfs9 in the same pass order;
        # a second pass closes any remaining chain)
        dom = batch[batch["predicate"].isin(s["domains"].keys())]
        if len(dom):
            frames.append(rows(
                dom["subject"].to_numpy(),
                RDF_TYPE,
                dom["predicate"].map(s["domains"]).to_numpy(), "uri"))
        rng = batch[batch["predicate"].isin(s["ranges"].keys())
                    & (batch["object_kind"] == "uri")]
        if len(rng):
            frames.append(rows(
                rng["object"].to_numpy(),
                RDF_TYPE,
                rng["predicate"].map(s["ranges"]).to_numpy(), "uri"))
        return pd.concat(frames, ignore_index=True)[TRIPLE_COLS]


def apply_rdfs_closure(ds, rounds: int = 2):
    """Dataset -> Dataset with the RDFS closure materialized.

    ``rounds=2`` closes domain/range-derived types through the class
    hierarchy (round 1 emits the type, round 2 inherits it); the
    schema hierarchies themselves are pre-closed driver-side, so no
    further rounds are needed.
    """
    try:
        import ray

        schema_ref = ray.put(collect_schema(ds))
    except ImportError:
        schema_ref = collect_schema(ds)
    from .dedup import dedup_triples

    out = ds
    for _ in range(rounds):
        out = out.map_batches(RdfsInferencer,
                              fn_constructor_kwargs=dict(schema_ref=schema_ref),
                              batch_format="pandas", concurrency=pool_size())
        out = dedup_triples(out)
    return out
