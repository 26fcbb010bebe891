"""Distributed graph-op tests: set algebra, merge strategies, conflicts,
diff stats, deletes, renames over triples Datasets."""

import pandas as pd
import pytest

from orionbelt_ontology_builder_ray.state.graph import TripleStore

B = "http://test.org/ont#"
LBL = "http://www.w3.org/2000/01/rdf-schema#label"


def ds_of(store, ray_session):
    import ray.data as rd

    return rd.from_arrow(store.to_arrow())


@pytest.fixture
def base_store():
    s = TripleStore(B)
    s.add_class("Person", label="Person")
    s.add_class("Employee", parent="Person", label="Employee")
    s.add_individual("alice", "Employee", label="Alice")
    return s


def test_subtract_and_intersect(ray_session, base_store):
    from orionbelt_ontology_builder_ray.stages.graph_ops import (
        intersect_triples, subtract_triples,
    )

    other = base_store.copy()
    other.add_class("Robot", label="Robot")
    a, b = ds_of(base_store, ray_session), ds_of(other, ray_session)
    added = subtract_triples(b, a).to_pandas()
    assert len(added) == 2  # Robot type + label
    assert set(added.subject) == {B + "Robot"}
    inter = intersect_triples(b, a).to_pandas()
    assert len(inter) == len(base_store.rows)


def test_merge_strategies_ds(ray_session, base_store):
    from orionbelt_ontology_builder_ray.stages.graph_ops import merge_triples

    conflicting = TripleStore(B)
    conflicting.add_class("Person", label="Human Being")
    cur = ds_of(base_store, ray_session)
    inc = ds_of(conflicting, ray_session)

    merged = merge_triples(cur, inc, "merge").to_pandas()
    labels = set(merged[(merged.subject == B + "Person")
                        & (merged.predicate == LBL)].object)
    assert labels == {"Person", "Human Being"}

    over = merge_triples(cur, inc, "merge_overwrite").to_pandas()
    labels = set(over[(over.subject == B + "Person")
                      & (over.predicate == LBL)].object)
    assert labels == {"Human Being"}
    # non-conflict rows kept
    assert (over.subject == B + "alice").any()

    with pytest.raises(ValueError):
        merge_triples(cur, inc, "bogus")


def test_detect_conflicts_ds(ray_session, base_store):
    from orionbelt_ontology_builder_ray.stages.graph_ops import (
        detect_conflicts_ds,
    )

    conflicting = TripleStore(B)
    conflicting.add_class("Person", label="Human Being")
    conflicting.add_class("NewThing", label="New")  # not a conflict
    out = detect_conflicts_ds(ds_of(base_store, ray_session),
                              ds_of(conflicting, ray_session))
    assert list(out["subject"]) == [B + "Person"]
    assert list(out["incoming_value"]) == ["Human Being"]


def test_diff_stats_ds(ray_session, base_store):
    from orionbelt_ontology_builder_ray.stages.graph_ops import diff_stats

    other = base_store.copy()
    other.add_class("Robot", label="Robot")
    other.delete_individual("alice")
    other.add_restriction("Person", "p", "minCardinality", 1)
    stats = diff_stats(ds_of(base_store, ray_session),
                       ds_of(other, ray_session))
    assert stats["added"] == 3  # Robot x2 + Person subClassOf bnode-link
    assert stats["removed"] == 3  # alice rows
    assert stats["bnode_added"] == 3  # restriction node rows
    assert stats["bnode_removed"] == 0
    assert stats["unchanged"] == len(base_store.rows) - 3


def test_delete_and_rename_ds(ray_session, base_store):
    from orionbelt_ontology_builder_ray.stages.graph_ops import (
        delete_entity, rename_entity,
    )

    ds = ds_of(base_store, ray_session)
    without = delete_entity(ds, B + "Person").to_pandas()
    assert not (without.subject == B + "Person").any()
    assert not ((without.object == B + "Person")
                & (without.object_kind == "uri")).any()
    # literal "Person" labels unaffected by URI deletion semantics
    renamed = rename_entity(ds, B + "alice", B + "alicia").to_pandas()
    assert not (renamed.subject == B + "alice").any()
    assert (renamed.subject == B + "alicia").sum() == 3
