"""JSON-LD import parity (mirrors reference tests/test_jsonld.py:
import, hierarchy, no-context, prefix extraction incl. list contexts
and invalid JSON, round trip, loaded-prefix adoption)."""

from orionbelt_ontology_builder_ray.sources.jsonld import (
    extract_context_prefixes,
)
from orionbelt_ontology_builder_ray.sources.rdf_io import (
    load_store, serialize_string,
)

JSONLD_MINIMAL = """{
  "@context": {
    "owl": "http://www.w3.org/2002/07/owl#",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "ex": "http://example.org/ont#"
  },
  "@graph": [
    {"@id": "http://example.org/ont", "@type": "owl:Ontology"},
    {"@id": "ex:Animal", "@type": "owl:Class", "rdfs:label": "Animal"},
    {"@id": "ex:Dog", "@type": "owl:Class", "rdfs:label": "Dog",
     "rdfs:subClassOf": {"@id": "ex:Animal"}}
  ]
}"""

JSONLD_NO_CONTEXT = """{
  "@graph": [
    {"@id": "http://example.org/ont",
     "@type": "http://www.w3.org/2002/07/owl#Ontology"},
    {"@id": "http://example.org/ont#Thing",
     "@type": "http://www.w3.org/2002/07/owl#Class"}
  ]
}"""


def test_import_minimal_jsonld():
    store = load_store(JSONLD_MINIMAL, "json-ld")
    names = [c["name"] for c in store.get_classes()]
    assert "Animal" in names and "Dog" in names


def test_import_preserves_hierarchy():
    store = load_store(JSONLD_MINIMAL, "json-ld")
    dog = next(c for c in store.get_classes() if c["name"] == "Dog")
    hierarchy = store.get_class_hierarchy()
    assert "Dog" in hierarchy.get("Animal", []) or dog["n_parents"] >= 1


def test_import_without_context():
    store = load_store(JSONLD_NO_CONTEXT, "json-ld")
    assert "Thing" in [c["name"] for c in store.get_classes()]


def test_extracts_prefixes_from_context():
    p = extract_context_prefixes(JSONLD_MINIMAL)
    assert p["ex"] == "http://example.org/ont#"


def test_no_context_returns_empty():
    assert extract_context_prefixes(JSONLD_NO_CONTEXT) == {}


def test_invalid_json_returns_empty():
    assert extract_context_prefixes("not json at all") == {}


def test_list_context_merged():
    data = """{
      "@context": [
        {"ex": "http://example.org/"},
        {"foaf": "http://xmlns.com/foaf/0.1/"}
      ],
      "@graph": [{"@id": "ex:a", "@type": "foaf:Person"}]
    }"""
    p = extract_context_prefixes(data)
    assert p == {"ex": "http://example.org/",
                 "foaf": "http://xmlns.com/foaf/0.1/"}
    store = load_store(data, "json-ld")
    assert store.has("http://example.org/a",
                     "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                     "http://xmlns.com/foaf/0.1/Person")


def test_export_import_roundtrip():
    store = load_store(JSONLD_MINIMAL, "json-ld")
    out = serialize_string(store.to_rows(), "json-ld",
                           store.loaded_prefixes)
    store2 = load_store(out, "json-ld")
    assert store2.rows == store.rows


def test_loaded_prefixes_populated():
    store = load_store(JSONLD_MINIMAL, "json-ld")
    assert store.loaded_prefixes.get("ex") == "http://example.org/ont#"
