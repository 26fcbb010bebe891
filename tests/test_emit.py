"""Emission-rule parity tests (SURVEY.md §2.2; FIXTURES.md §3)."""

from orionbelt_ontology_builder_ray.functions import emit
from orionbelt_ontology_builder_ray.functions.terms import (
    OWL, RDF, RDFS, SKOS, XSD, Triple, local_name, mint_uri, stable_bnode,
)

B = "http://test.org/ont#"


def t(s, p, o, kind="uri", lang="", dt=""):
    return Triple(s, p, o, kind, lang, dt)


def test_mint_and_local_name():
    assert mint_uri(B, "Person") == B + "Person"
    assert mint_uri(B, "http://other.org/X") == "http://other.org/X"
    assert local_name(B + "Person") == "Person"
    assert local_name("http://x.org/a/b") == "b"


def test_add_class_full():
    rows = set(emit.add_class(B, "Employee", parent="Person",
                              label="Employee", comment="A worker"))
    assert rows == {
        t(B + "Employee", RDF + "type", OWL + "Class"),
        t(B + "Employee", RDFS + "subClassOf", B + "Person"),
        t(B + "Employee", RDFS + "label", "Employee", "literal"),
        t(B + "Employee", RDFS + "comment", "A worker", "literal"),
    }


def test_add_class_minimal():
    assert set(emit.add_class(B, "Thing2")) == {
        t(B + "Thing2", RDF + "type", OWL + "Class")}


def test_add_object_property_flags_and_inverse():
    rows = set(emit.add_object_property(
        B, "worksFor", domain="Person", range_="Organization",
        label="works for", functional=True, transitive=True,
        inverse_of="employs"))
    p = B + "worksFor"
    assert rows == {
        t(p, RDF + "type", OWL + "ObjectProperty"),
        t(p, RDF + "type", OWL + "FunctionalProperty"),
        t(p, RDF + "type", OWL + "TransitiveProperty"),
        t(p, RDFS + "domain", B + "Person"),
        t(p, RDFS + "range", B + "Organization"),
        t(p, RDFS + "label", "works for", "literal"),
        t(p, OWL + "inverseOf", B + "employs"),
    }


def test_add_data_property_range_fallback():
    # Unknown range falls back to xsd:string (om:797)
    rows = set(emit.add_data_property(B, "hasName", domain="Person",
                                      range_="bogus"))
    assert t(B + "hasName", RDFS + "range", XSD + "string") in rows
    rows2 = set(emit.add_data_property(B, "age", range_="integer"))
    assert t(B + "age", RDFS + "range", XSD + "integer") in rows2


def test_add_individual_emits_both_types():
    rows = set(emit.add_individual(B, "alice", "Employee", label="Alice"))
    assert rows == {
        t(B + "alice", RDF + "type", OWL + "NamedIndividual"),
        t(B + "alice", RDF + "type", B + "Employee"),
        t(B + "alice", RDFS + "label", "Alice", "literal"),
    }


def test_add_individual_property():
    assert emit.add_individual_property(B, "alice", "worksFor", "acme") == [
        t(B + "alice", B + "worksFor", B + "acme")]
    assert emit.add_individual_property(B, "alice", "hasName", "Alice",
                                        is_object_property=False) == [
        t(B + "alice", B + "hasName", "Alice", "literal")]


def test_add_annotation_name_map_and_passthrough():
    assert emit.add_annotation(B, "Person", "prefLabel", "Person", "en") == [
        t(B + "Person", SKOS + "prefLabel", "Person", "literal", "en")]
    assert emit.add_annotation(B, "Person", "http://x.org/p", "v") == [
        t(B + "Person", "http://x.org/p", "v", "literal")]
    # unknown local name is minted in the base namespace
    assert emit.add_annotation(B, "Person", "myNote", "v") == [
        t(B + "Person", B + "myNote", "v", "literal")]


def test_add_concept_auto_inverse():
    rows = set(emit.add_concept(B, "Dog", "MyScheme", pref_label="Dog",
                                broader="Animal"))
    assert t(B + "Dog", SKOS + "broader", B + "Animal") in rows
    assert t(B + "Animal", SKOS + "narrower", B + "Dog") in rows
    assert t(B + "Dog", SKOS + "prefLabel", "Dog", "literal", "en") in rows
    assert t(B + "Dog", SKOS + "inScheme", B + "MyScheme") in rows


def test_concept_relation_symmetric_mirror():
    rows = set(emit.add_concept_relation(B, "Dog", "related", "Cat"))
    assert rows == {
        t(B + "Dog", SKOS + "related", B + "Cat"),
        t(B + "Cat", SKOS + "related", B + "Dog"),
    }
    rows = set(emit.add_concept_relation(B, "Dog", "broader", "Animal"))
    assert rows == {
        t(B + "Dog", SKOS + "broader", B + "Animal"),
        t(B + "Animal", SKOS + "narrower", B + "Dog"),
    }


def test_entity_relations():
    assert emit.add_class_relation(B, "A", "disjointWith", "B1") == [
        t(B + "A", OWL + "disjointWith", B + "B1")]
    assert emit.add_property_relation(B, "p", "inverseOf", "q") == [
        t(B + "p", OWL + "inverseOf", B + "q")]
    assert emit.add_individual_relation(B, "a", "sameAs", "b") == [
        t(B + "a", OWL + "sameAs", B + "b")]


def test_restriction_some_values_from():
    bnode, rows = emit.add_restriction(B, "Person", "hasPet", "someValuesFrom",
                                       "Animal")
    rows = set(rows)
    assert t(bnode, RDF + "type", OWL + "Restriction") in rows
    assert t(bnode, OWL + "onProperty", B + "hasPet") in rows
    assert t(bnode, OWL + "someValuesFrom", B + "Animal") in rows
    assert t(B + "Person", RDFS + "subClassOf", bnode, "bnode") in rows


def test_restriction_cardinality_and_determinism():
    b1, rows1 = emit.add_restriction(B, "Person", "hasPet", "minCardinality", 2)
    b2, rows2 = emit.add_restriction(B, "Person", "hasPet", "minCardinality", 2)
    assert b1 == b2 and set(rows1) == set(rows2)  # content-hashed bnode ids
    assert t(b1, OWL + "minCardinality", "2", "literal", "",
             XSD + "nonNegativeInteger") in set(rows1)
    # exactCardinality maps to owl:cardinality
    b3, rows3 = emit.add_restriction(B, "Person", "hasPet", "exactCardinality", 1)
    assert any(r.predicate == OWL + "cardinality" for r in rows3)


def test_restriction_qualified_on_class():
    b, rows = emit.add_restriction(B, "Person", "hasPet",
                                   "qualifiedCardinality", 1, on_class="Dog")
    assert t(b, OWL + "onClass", B + "Dog") in set(rows)


def test_restriction_has_value_heuristic():
    _, rows = emit.add_restriction(B, "Person", "hasName", "hasValue", "Bob")
    assert any(r.object == "Bob" and r.object_kind == "literal" for r in rows)
    _, rows = emit.add_restriction(B, "Person", "seeAlso", "hasValue",
                                   "http://x.org/bob")
    assert any(r.object == "http://x.org/bob" and r.object_kind == "uri"
               for r in rows)


def test_property_chain_rdf_list():
    rows = emit.add_property_chain(B, "hasUncle", ["hasParent", "hasBrother"])
    firsts = [r for r in rows if r.predicate == RDF + "first"]
    rests = [r for r in rows if r.predicate == RDF + "rest"]
    assert [r.object for r in firsts] == [B + "hasParent", B + "hasBrother"]
    assert rests[-1].object == RDF + "nil"
    chain_axiom = [r for r in rows if r.predicate == OWL + "propertyChainAxiom"]
    assert len(chain_axiom) == 1 and chain_axiom[0].object == firsts[0].subject


def test_class_expression_union_and_complement():
    rows = emit.add_class_expression(B, "Parent", "unionOf", ["Mother", "Father"])
    assert any(r.predicate == OWL + "unionOf" for r in rows)
    rows = emit.add_class_expression(B, "NonHuman", "complementOf", ["Human"])
    assert rows == [t(B + "NonHuman", OWL + "complementOf", B + "Human")]


def test_all_different_and_has_key():
    d, rows = emit.add_all_different(B, ["a", "b", "c"])
    rows = set(rows)
    assert t(d, RDF + "type", OWL + "AllDifferent") in rows
    key_rows = emit.add_has_key(B, "Person", ["ssn"])
    assert any(r.predicate == OWL + "hasKey" for r in key_rows)


def test_stable_bnode_deterministic():
    assert stable_bnode("a", 1) == stable_bnode("a", 1)
    assert stable_bnode("a", 1) != stable_bnode("a", 2)
    assert stable_bnode("x").startswith("_:")
