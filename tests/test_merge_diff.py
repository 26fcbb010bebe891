"""Merge strategies, conflict detection, diff (reference tests/test_merge.py
and tests/test_diff.py model; FIXTURES.md §3.4)."""

import pytest

from orionbelt_ontology_builder_ray.state.graph import (
    IMPORT_MERGE, IMPORT_MERGE_OVERWRITE, IMPORT_REPLACE, TripleStore,
)

B = "http://test.org/ont#"


@pytest.fixture
def second():
    """SECOND_ONT_TTL analog: Vehicle, Car subClassOf Vehicle."""
    s = TripleStore(B)
    s.add_class("Vehicle", label="Vehicle")
    s.add_class("Car", parent="Vehicle", label="Car")
    return s


@pytest.fixture
def conflicting():
    """CONFLICTING_TTL analog: Person/Employee with different labels."""
    s = TripleStore(B)
    s.add_class("Person", label="Human Being")
    s.add_class("Employee", label="Worker")
    return s


def test_merge_adds_disjoint_content(populated, second):
    stats = populated.merge_from(second, IMPORT_MERGE)
    names = {c["name"] for c in populated.get_classes()}
    assert {"Vehicle", "Car", "Person", "Employee", "Organization"} <= names
    assert stats["triples_added"] > 0
    assert stats["conflicts_resolved"] == 0


def test_merge_keeps_both_labels(populated, conflicting):
    populated.merge_from(conflicting, IMPORT_MERGE)
    labels = {t.object for t in populated.match(B + "Person",
              "http://www.w3.org/2000/01/rdf-schema#label", None)}
    assert labels == {"Person", "Human Being"}


def test_merge_overwrite_resolves_conflicts(populated, conflicting):
    stats = populated.merge_from(conflicting, IMPORT_MERGE_OVERWRITE)
    labels = {t.object for t in populated.match(B + "Person",
              "http://www.w3.org/2000/01/rdf-schema#label", None)}
    assert labels == {"Human Being"}
    assert stats["conflicts_resolved"] == 2  # Person + Employee labels


def test_replace_swaps_graph(populated, second):
    populated.merge_from(second, IMPORT_REPLACE)
    names = {c["name"] for c in populated.get_classes()}
    assert names == {"Vehicle", "Car"}


def test_detect_conflicts(populated, conflicting):
    conflicts = populated.detect_conflicts(conflicting)
    by_subject = {c["subject"]: c for c in conflicts}
    assert set(by_subject) == {"Person", "Employee"}
    assert by_subject["Person"]["incoming_value"] == "Human Being"
    assert by_subject["Person"]["current_values"] == ["Person"]
    # no conflict when values agree
    assert populated.detect_conflicts(populated.copy()) == []


def test_diff_classification(populated, second):
    merged = populated.copy()
    merged.merge_from(second, IMPORT_MERGE)
    merged.delete_class("Organization")
    merged.update_class("Person", new_label="Human")
    diff = populated.compare(merged)
    changes = {r["name"]: r["change_type"] for r in diff["modified_resources"]}
    assert changes["Vehicle"] == "added"
    assert changes["Car"] == "added"
    assert changes["Organization"] == "removed"
    assert changes["Person"] == "modified"
    stats = diff["stats"]
    assert stats["resources_added"] == 2
    assert stats["resources_removed"] >= 1
    assert stats["resources_modified"] >= 1
    assert stats["unchanged"] > 0


def test_diff_bnode_triples_counted_separately(populated):
    other = populated.copy()
    other.add_restriction("Person", "worksFor", "someValuesFrom", "Organization")
    diff = populated.compare(other)
    # bnode-rooted rows (type/onProperty/someValuesFrom) are excluded from
    # the named diff; the subClassOf link from Person is bnode-valued but
    # named-subject so it stays
    assert diff["stats"]["bnode_added"] == 3
    assert diff["stats"]["added"] == 1


def test_diff_identical_graphs(populated):
    diff = populated.compare(populated.copy())
    assert diff["stats"]["added"] == 0
    assert diff["stats"]["removed"] == 0
    assert diff["modified_resources"] == []
