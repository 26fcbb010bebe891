"""RDF/XML parse/serialize (sources/rdfxml.py) — synthetic fixtures
covering the constructs the reference sample corpus uses (typed nodes,
rdf:ID, property attributes, parseType=Collection/Resource, xml:lang
inheritance, nodeID); reference load path ontology_manager.py:2000-2024
via rdflib format="xml"."""

from orionbelt_ontology_builder_ray.functions.terms import (
    OWL, RDF, RDFS, XSD, Triple,
)
from orionbelt_ontology_builder_ray.sources.rdfxml import (
    extract_prefixes, parse_rdfxml, serialize_rdfxml,
)

DOC = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
    xmlns:owl="http://www.w3.org/2002/07/owl#"
    xmlns:ex="http://e.org/x#"
    xmlns:dc="http://purl.org/dc/elements/1.1/"
    xml:base="http://e.org/base.owl">
  <owl:Ontology rdf:about="http://e.org/x" dc:title="X onto"/>
  <owl:Class rdf:about="http://e.org/x#Pizza">
    <rdfs:label xml:lang="en">Pizza</rdfs:label>
    <rdfs:subClassOf>
      <owl:Restriction>
        <owl:onProperty rdf:resource="http://e.org/x#hasTopping"/>
        <owl:someValuesFrom rdf:resource="http://e.org/x#Topping"/>
      </owl:Restriction>
    </rdfs:subClassOf>
  </owl:Class>
  <owl:Class rdf:ID="Topping">
    <owl:equivalentClass>
      <owl:Class>
        <owl:unionOf rdf:parseType="Collection">
          <owl:Class rdf:about="http://e.org/x#Cheese"/>
          <owl:Class rdf:about="http://e.org/x#Meat"/>
        </owl:unionOf>
      </owl:Class>
    </owl:equivalentClass>
  </owl:Class>
  <rdf:Description rdf:about="http://e.org/x#n">
    <ex:count rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">5</ex:count>
    <ex:nested rdf:parseType="Resource">
      <rdfs:label>inner</rdfs:label>
    </ex:nested>
  </rdf:Description>
</rdf:RDF>
"""


def test_parse_typed_nodes_and_about():
    ts = set(parse_rdfxml(DOC))
    assert Triple("http://e.org/x#Pizza", RDF + "type", OWL + "Class",
                  "uri", "", "") in ts
    assert Triple("http://e.org/x#Pizza", RDFS + "label", "Pizza",
                  "literal", "en", "") in ts


def test_property_attribute_literal():
    ts = parse_rdfxml(DOC)
    title = next(t for t in ts
                 if t.predicate == "http://purl.org/dc/elements/1.1/title")
    assert (title.subject, title.object) == ("http://e.org/x", "X onto")


def test_rdf_id_resolves_against_base():
    ts = parse_rdfxml(DOC)
    assert any(t.subject == "http://e.org/base.owl#Topping" for t in ts)


def test_nested_restriction_bnode():
    ts = parse_rdfxml(DOC)
    sub = next(t for t in ts if t.predicate == RDFS + "subClassOf")
    assert sub.object_kind == "bnode"
    inner = {t.predicate for t in ts if t.subject == sub.object}
    assert OWL + "someValuesFrom" in inner


def test_parse_type_collection():
    ts = parse_rdfxml(DOC)
    firsts = [t.object for t in ts if t.predicate == RDF + "first"]
    assert firsts == ["http://e.org/x#Cheese", "http://e.org/x#Meat"]
    rests = [t.object for t in ts if t.predicate == RDF + "rest"]
    assert rests[-1] == RDF + "nil"


def test_parse_type_resource_and_datatype():
    ts = parse_rdfxml(DOC)
    count = next(t for t in ts if t.predicate.endswith("count"))
    assert count.datatype == XSD + "integer"
    nested = next(t for t in ts if t.predicate.endswith("nested"))
    assert nested.object_kind == "bnode"
    assert any(t.subject == nested.object and t.object == "inner"
               for t in ts)


def test_extract_prefixes():
    p = extract_prefixes(DOC)
    assert p["owl"] == OWL and p["ex"] == "http://e.org/x#"


def test_serialize_roundtrip_exact():
    ts = set(parse_rdfxml(DOC))
    out = serialize_rdfxml(ts, extract_prefixes(DOC))
    assert set(parse_rdfxml(out)) == ts


def test_roundtrip_escaping():
    rows = {Triple("http://e.org/s", "http://e.org/p",
                   'a <b> & "c"\n', "literal", "", ""),
            Triple("_:b1", "http://e.org/p", "_:b2", "bnode", "", "")}
    out = serialize_rdfxml(rows)
    assert set(parse_rdfxml(out)) == rows
