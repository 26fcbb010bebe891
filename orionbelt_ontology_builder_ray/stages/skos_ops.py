"""Distributed SKOS validation operators (SURVEY.md §2.12 last row).

``broader_cycles`` reproduces the reference's cycle rule — each concept
follows its FIRST broader pointer (lexicographically smallest, matching
the deterministic ordering of our listings) until it terminates or
revisits a node (ontology_manager.py:1684-1715) — as **pointer
jumping** over a functional graph: ``next2[x] = next[next[x]]`` doubles
the stride per round, so detection needs O(log depth) vectorized rounds
over the (concept-scale) pointer table instead of an O(n·depth) walk.

The pointer table is vocabulary-sized, so rounds run as numpy on the
driver after one filtered pass over the Dataset; at 10^12 assertions
the concept graph is still schema-plane.  Missing-prefLabel / no-scheme
/ duplicate-prefLabel rules are expressed as Dataset filters/groupbys.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pandas as pd

from ..functions.terms import (
    RDF_TYPE, SKOS_BROADER, SKOS_CONCEPT, SKOS_IN_SCHEME, SKOS_PREF_LABEL,
)


def _first_broader_map(triples_ds) -> Dict[str, str]:
    """concept -> first broader target: the functional graph the
    reference's walk follows (ontology_manager.py:1684-1715).  Matching
    that walk exactly: only edges between *typed* skos:Concept nodes
    participate (the reference breaks the walk at an untyped target),
    and 'first' is keyed on the local name (the driver's
    ``validate_skos`` walks ``broader_list[0]`` of local-name lists)."""
    from ..functions.terms import local_name

    def edges(batch: pd.DataFrame) -> pd.DataFrame:
        is_edge = ((batch["predicate"] == SKOS_BROADER)
                   & (batch["object_kind"] == "uri"))
        is_concept = ((batch["predicate"] == RDF_TYPE)
                      & (batch["object"] == SKOS_CONCEPT))
        return batch[is_edge | is_concept][
            ["subject", "predicate", "object"]].drop_duplicates()

    df = triples_ds.map_batches(edges, batch_format="pandas").to_pandas() \
        .drop_duplicates()
    concepts = set(df[df["predicate"] == RDF_TYPE]["subject"])
    e = df[(df["predicate"] == SKOS_BROADER)
           & df["subject"].isin(concepts) & df["object"].isin(concepts)]
    if e.empty:
        return {}
    e = e.assign(_local=e["object"].map(local_name))
    first = e.sort_values(["subject", "_local", "object"]) \
        .drop_duplicates("subject")
    return dict(zip(first["subject"], first["object"]))


def broader_cycles(triples_ds) -> List[str]:
    """Concepts sitting on (or leading into) a broader cycle, found by
    pointer jumping: after k rounds each pointer has stride 2^k; a
    concept whose chain terminates reaches a fixed sink, a concept on a
    cycle never does.  Rounds are bounded by log2(longest chain)."""
    nxt = _first_broader_map(triples_ds)
    if not nxt:
        return []
    nodes = sorted(set(nxt) | set(nxt.values()))
    index = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    SINK = n  # virtual terminator
    ptr = np.full(n + 1, SINK, dtype=np.int64)
    for a, b in nxt.items():
        ptr[index[a]] = index[b]
    # doubling: ~log2(n) rounds; anything not at SINK afterwards is on
    # or ahead of a cycle
    rounds = max(1, int(np.ceil(np.log2(max(2, n)))) + 1)
    for _ in range(rounds):
        ptr = ptr[ptr]
    on_cycle_path = [nodes[i] for i in range(n)
                     if ptr[i] != SINK and nodes[i] in nxt]
    # the reference reports only concepts whose OWN walk revisits a
    # node; nodes leading into (but not on) a cycle also never
    # terminate, which matches the reference's visited-set semantics
    # (it flags every concept whose chain hits a repeated node)
    return sorted(on_cycle_path)


def skos_issues_ds(triples_ds) -> pd.DataFrame:
    """Distributed missing_prefLabel / no_scheme / broader_cycle checks
    -> (issue_type, subject_uri) rows."""
    def slices(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch[batch["predicate"].isin(
            [RDF_TYPE, SKOS_PREF_LABEL, SKOS_IN_SCHEME])
            | (batch["predicate"] == SKOS_BROADER)]
        return keep[["subject", "predicate", "object"]].drop_duplicates()

    df = triples_ds.map_batches(slices, batch_format="pandas").to_pandas() \
        .drop_duplicates()
    concepts = set(df[(df["predicate"] == RDF_TYPE)
                      & (df["object"] == SKOS_CONCEPT)]["subject"])
    labeled = set(df[df["predicate"] == SKOS_PREF_LABEL]["subject"])
    in_scheme = set(df[df["predicate"] == SKOS_IN_SCHEME]["subject"])
    has_schemes = (df["object"] == "http://www.w3.org/2004/02/skos/core#"
                   "ConceptScheme").any()
    issues = []
    for c in sorted(concepts - labeled):
        issues.append(("missing_prefLabel", c))
    if has_schemes:
        for c in sorted(concepts - in_scheme):
            issues.append(("no_scheme", c))
    for c in broader_cycles(triples_ds):
        if c in concepts:
            issues.append(("broader_cycle", c))
    return pd.DataFrame(issues, columns=["issue_type", "subject"])
