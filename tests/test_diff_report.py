"""Diff summaries, format_diff_report, preview_import (mirrors
reference tests/test_diff.py TestSummarizeChanges/TestFormatDiffReport
and tests/test_merge.py TestPreviewImport/TestPrefixConflicts)."""

import pytest

from orionbelt_ontology_builder_ray.state.graph import TripleStore

B = "http://test.org/ont#"

SECOND_ONT_TTL = """
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix : <http://test.org/ont#> .

<http://test.org/ont> a owl:Ontology ; rdfs:label "Second" .
:Vehicle a owl:Class ; rdfs:label "Vehicle" .
:Car a owl:Class ; rdfs:subClassOf :Vehicle ; rdfs:label "Car" .
"""


@pytest.fixture
def base():
    s = TripleStore(B)
    s.add_class("Animal", label="Animal")
    s.add_class("Dog", parent="Animal", label="Dog")
    return s


def test_summary_contains_added_class(base):
    other = base.copy()
    other.add_class("Cat", label="Cat")
    diff = base.compare(other)
    assert any("Added" in s and "Cat" in s for s in diff["summary"])
    assert any("class" in s for s in diff["summary"])


def test_summary_contains_removed_class(base):
    other = base.copy()
    other.delete_class("Dog")
    diff = base.compare(other)
    assert any("Removed" in s and "Dog" in s for s in diff["summary"])


def test_summary_modified_details(base):
    other = base.copy()
    other.update_class("Dog", new_label="Doggo")
    diff = base.compare(other)
    mod = [s for s in diff["summary"] if s.startswith("Modified")]
    assert mod and "label" in mod[0]


def test_markdown_report_has_headings(base):
    other = base.copy()
    other.add_class("Cat")
    report = base.format_diff_report(base.compare(other),
                                     report_format="markdown")
    assert "# Ontology Change Report" in report
    assert "## Summary" in report
    assert "## Added Resources" in report
    assert "### Cat" in report


def test_text_report_format(base):
    report = base.format_diff_report(base.compare(base.copy()),
                                     report_format="text")
    assert "Ontology Change Report" in report


def test_compare_to_string(base):
    ttl = """
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix : <http://test.org/ont#> .
:Animal a owl:Class ; rdfs:label "Animal" .
:Cat a owl:Class ; rdfs:label "Cat" .
"""
    diff = base.compare_to_string(ttl, format="turtle")
    assert diff["stats"]["added"] > 0


def test_preview_does_not_modify_store(base):
    before = len(base.rows)
    preview = base.preview_import(SECOND_ONT_TTL, format="turtle")
    assert len(base.rows) == before
    for key in ("diff", "incoming_stats", "incoming_meta", "conflicts",
                "prefix_conflicts"):
        assert key in preview


def test_preview_shows_incoming_stats_and_meta(base):
    preview = base.preview_import(SECOND_ONT_TTL, format="turtle")
    assert preview["incoming_stats"]["classes"] >= 2  # Vehicle, Car
    assert preview["incoming_meta"]["uri"] == "http://test.org/ont"
    assert preview["incoming_meta"]["label"] == "Second"


def test_preview_detects_value_conflicts(base):
    conflicting = """
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix : <http://test.org/ont#> .
:Dog a owl:Class ; rdfs:label "Hound" .
"""
    preview = base.preview_import(conflicting, format="turtle")
    assert any(c["subject"] == "Dog" and c["predicate"] == "label"
               for c in preview["conflicts"])


def test_prefix_conflict_detection(base):
    clash = """
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix zoo: <http://other.org/zoo#> .
@prefix : <http://test.org/ont#> .
:Thing a owl:Class .
"""
    base.add_prefix("zoo", "http://mine.org/zoo#")
    preview = base.preview_import(clash, format="turtle")
    pcs = preview["prefix_conflicts"]
    assert {"prefix": "zoo", "current_namespace": "http://mine.org/zoo#",
            "incoming_namespace": "http://other.org/zoo#"} in pcs
