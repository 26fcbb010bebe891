"""Template parity (reference tests/test_templates.py model)."""

import pytest

from orionbelt_ontology_builder_ray.state.templates import (
    apply_template, build_template, get_template_names,
)
from orionbelt_ontology_builder_ray.state.graph import TripleStore


def test_template_names():
    assert get_template_names() == [
        "Organization", "Product Catalog", "Event", "Person / Contact",
        "SKOS Thesaurus"]


@pytest.mark.parametrize("name,classes,obj_props,data_props", [
    ("Organization", 4, 4, 3),
    ("Product Catalog", 4, 4, 4),
    ("Event", 4, 3, 5),
    ("Person / Contact", 3, 3, 9),
])
def test_owl_template_counts(name, classes, obj_props, data_props):
    s = build_template(name)
    stats = s.get_statistics()
    assert stats["classes"] == classes
    assert stats["object_properties"] == obj_props
    assert stats["data_properties"] == data_props


def test_skos_template():
    s = build_template("SKOS Thesaurus")
    stats = s.get_statistics()
    assert stats["concept_schemes"] == 1
    assert stats["concepts"] == 6
    h = s.get_concept_hierarchy()
    assert sorted(h["Science"]) == ["NaturalScience", "SocialScience"]
    assert sorted(h["NaturalScience"]) == ["Biology", "Physics"]


def test_template_base_uri_substitution():
    s = build_template("Organization", "http://mine.org/v1#")
    assert s.has("http://mine.org/v1#Person",
                 "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                 "http://www.w3.org/2002/07/owl#Class")


def test_apply_template_merge():
    target = TripleStore("http://mine.org/ont#")
    target.add_class("Existing")
    apply_template(target, "Organization")
    names = {c["name"] for c in target.get_classes()}
    assert "Existing" in names and "Department" in names


def test_knows_is_symmetric():
    s = build_template("Person / Contact")
    props = {p["name"]: p for p in s.get_object_properties()}
    assert props["knows"]["symmetric"]
