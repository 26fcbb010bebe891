"""Metamorphic properties of TripleStore mutations (hypothesis):
add-then-delete is identity, rename round-trips, snapshot/restore is
exact — over randomized small op sequences.  These pin the inverse
cleanup semantics (delete_concept removes the auto-emitted narrower
inverse, delete_class removes subclass references, etc.) that example
tests can miss."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from orionbelt_ontology_builder_ray.state.graph import TripleStore

B = "http://prop.org/ont#"

names = st.text(string.ascii_lowercase, min_size=1, max_size=6)
labels = st.text(string.ascii_letters + " ", min_size=0, max_size=12)


def _base_store():
    s = TripleStore(B)
    s.add_class("Anchor", label="Anchor")
    return s


@settings(max_examples=40, deadline=None)
@given(name=names, label=labels, parent=st.booleans())
def test_add_delete_class_identity(name, label, parent):
    s = _base_store()
    before = set(s.rows)
    s.add_class(name, parent="Anchor" if parent else None,
                label=label or None)
    s.delete_class(name)
    assert s.rows == before


@settings(max_examples=40, deadline=None)
@given(name=names, broader=st.booleans(), pref=labels)
def test_add_delete_concept_identity(name, broader, pref):
    """delete_concept must also clean the auto-emitted narrower
    inverse on the broader target (om:1625-1632)."""
    s = _base_store()
    s.add_concept_scheme("Scheme")
    s.add_concept("Top", "Scheme", pref_label="Top")
    before = set(s.rows)
    if name in ("Top", "Scheme", "Anchor"):
        return
    s.add_concept(name, "Scheme", pref_label=pref or None,
                  broader="Top" if broader else None)
    s.delete_concept(name)
    assert s.rows == before


@settings(max_examples=40, deadline=None)
@given(name=names, label=labels)
def test_rename_roundtrip_identity(name, label):
    if name == "Anchor" or name + "X" == "Anchor":
        return
    s = _base_store()
    s.add_class(name, parent="Anchor", label=label or None)
    s.add_individual("thing", name)
    before = set(s.rows)
    s.rename_class(name, name + "X")
    assert not any(t.subject == B + name or t.object == B + name
                   for t in s.rows if t.object_kind == "uri"
                   and t.predicate != "http://www.w3.org/2000/01/"
                   "rdf-schema#label")
    s.rename_class(name + "X", name)
    # rename rewrites references but keeps labels: renaming back must
    # restore the exact row set (labels unchanged by rename)
    assert s.rows == before


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(names, labels), min_size=1, max_size=5))
def test_snapshot_restore_exact(ops):
    s = _base_store()
    s.add_concept_scheme("S")
    for name, label in ops:
        if name in ("Anchor", "S"):
            continue
        s.add_class(name, label=label or None)
        s.add_individual("i_" + name, name, label=label or None)
    snap = s.take_snapshot()
    rows = set(s.rows)
    s.add_class("garbage")
    s.delete_class(ops[0][0]) if ops[0][0] not in ("Anchor", "S") else None
    s.restore_snapshot(snap)
    assert s.rows == rows


# ---------------------------------------------------------------------------
# incremental-dedup anti-join kernel (pure, no Ray): the 128-bit
# hash-pair membership must agree exactly with text-set membership
# over randomized corpora — including duplicated store texts
# (duplicated-h1 side-table path) and empty sides.
# ---------------------------------------------------------------------------

texts_st = st.lists(st.text(string.ascii_lowercase + " ",
                            min_size=0, max_size=12),
                    min_size=0, max_size=50)


@settings(max_examples=60, deadline=None)
@given(store=texts_st, new=texts_st)
def test_hash_pair_anti_join_kernel_matches_text_membership(store, new):
    import numpy as np

    from orionbelt_ontology_builder_ray.pipelines.kg_build import (
        _pair_index, _pair_member)
    from orionbelt_ontology_builder_ray.stages.dedup import _doc_hash_pair

    if store:
        h1, h2 = _doc_hash_pair(store)
        idx = _pair_index(h1, h2)
    else:
        idx = _pair_index(np.empty(0, np.int64), np.empty(0, np.int64))
    if new:
        n1, n2 = _doc_hash_pair(new)
        got = _pair_member(idx, n1, n2)
    else:
        got = np.zeros(0, dtype=bool)
    expect = np.array([t in set(store) for t in new], dtype=bool)
    assert (got == expect).all()


# ---------------------------------------------------------------------------
# RepetitionStats formula vs an independent brute force over random
# ASCII corpora (the oracle pins DuckDB parity; this pins the math).
# ---------------------------------------------------------------------------

docs_st = st.lists(st.text(string.ascii_lowercase[:4] + "  ",
                           min_size=0, max_size=40),
                   min_size=1, max_size=25)


@settings(max_examples=50, deadline=None)
@given(texts=docs_st)
def test_repetition_stats_brute_force(texts):
    import numpy as np
    import pandas as pd

    from orionbelt_ontology_builder_ray.stages.textops import RepetitionStats

    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    out = RepetitionStats()(df).set_index("doc_id")
    for i, t in enumerate(texts):
        toks = t.split()  # ASCII input: unicode/ascii split agree
        if not toks:
            assert (out.loc[i] == 0.0).all()
            continue
        from collections import Counter

        c = Counter(toks)
        assert out.loc[i, "top_token_frac"] == max(c.values()) / len(toks)
        if len(toks) >= 2:
            bg = Counter(zip(toks, toks[1:]))
            assert out.loc[i, "top_bigram_frac"] == \
                max(bg.values()) / (len(toks) - 1)
            assert out.loc[i, "dup_bigram_frac"] == \
                1.0 - len(bg) / (len(toks) - 1)
        if len(toks) >= 5:
            ng = len(toks) - 4
            distinct = len({tuple(toks[j:j + 5]) for j in range(ng)})
            assert out.loc[i, "dup_5gram_frac"] == 1.0 - distinct / ng
