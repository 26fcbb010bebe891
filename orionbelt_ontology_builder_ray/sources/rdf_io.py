"""Format dispatch for schema-plane RDF I/O.

Reference analog: load_from_file/load_from_string/export_to_string
(ontology_manager.py:2000-2024, 2295-2297) and the extension→format
map (app.py:2223-2234).  Turtle and N-Triples are native; other
reference formats (RDF/XML, JSON-LD, N3) raise a clear error — the
data plane interchanges via Parquet and N-Triples.
"""

from __future__ import annotations

import os
from typing import List, Optional

from ..functions.terms import Triple
from . import jsonld, ntriples, rdfxml, turtle

# app.py:2223-2234 extension map
FORMAT_BY_EXTENSION = {
    ".ttl": "turtle", ".owl": "xml", ".rdf": "xml", ".xml": "xml",
    ".n3": "n3", ".nt": "nt", ".jsonld": "json-ld", ".json": "json-ld",
}

# "n3" is handled by the Turtle engine: the reference serializes N3 via
# rdflib's notation3 writer, whose output for ontology content is plain
# Turtle (no N3-only rules/quantifiers appear in the workbench surface).
SUPPORTED = {"turtle", "nt", "json-ld", "xml", "n3"}


def detect_format(path: str) -> str:
    return FORMAT_BY_EXTENSION.get(os.path.splitext(path)[1].lower(), "turtle")


def parse_string(data: str, format: str = "turtle",
                 base_uri: str = "") -> List[Triple]:
    if format in ("turtle", "n3"):
        return turtle.parse_turtle(data, base_uri)
    if format == "nt":
        return ntriples.parse_rows(data)
    if format == "json-ld":
        return jsonld.parse_jsonld(data)
    if format == "xml":
        return rdfxml.parse_rdfxml(data, base_uri)
    raise ValueError(
        f"Format {format!r} is not supported natively (supported: "
        f"{sorted(SUPPORTED)}); convert to Turtle/N-Triples or Parquet")


def serialize_string(rows, format: str = "turtle",
                     prefixes: Optional[dict] = None) -> str:
    if format in ("turtle", "n3"):
        return turtle.serialize_turtle(rows, prefixes)
    if format == "nt":
        return ntriples.serialize_rows(sorted(Triple(*r) for r in rows))
    if format == "json-ld":
        return jsonld.serialize_jsonld(rows, prefixes)
    if format == "xml":
        return rdfxml.serialize_rdfxml(rows, prefixes)
    raise ValueError(
        f"Format {format!r} is not supported natively (supported: "
        f"{sorted(SUPPORTED)})")


def load_file(path: str, format: Optional[str] = None,
              base_uri: str = "http://example.org/ontology#"):
    """load_from_file analog (ontology_manager.py:2000-2012): format
    from the extension map when not given, then load_store."""
    with open(path, encoding="utf-8") as f:
        data = f.read()
    return load_store(data, format or detect_format(path), base_uri)


def load_store(data: str, format: str = "turtle",
               base_uri: str = "http://example.org/ontology#"):
    """Parse into a fresh TripleStore, adopting @prefix bindings and
    inferring the base URI from the ontology declaration when present
    (reference _update_namespace_from_graph, om:2206-2293)."""
    from ..functions.terms import OWL_ONTOLOGY, RDF_TYPE
    from ..state.graph import TripleStore

    rows = parse_string(data, format, "")
    inferred = None
    has_ontology_decl = False
    for t in rows:
        if t.predicate == RDF_TYPE and t.object == OWL_ONTOLOGY:
            has_ontology_decl = True
            if t.subject.endswith(("#", "/")):
                inferred = t.subject
            else:
                sep = "#" if any(r.subject.startswith(t.subject + "#")
                                 for r in rows) else "/"
                inferred = t.subject + sep
            break
    if inferred is None:
        # most-common namespace among typed resources (om:2261-2293)
        from collections import Counter

        counts = Counter()
        for t in rows:
            if t.predicate == RDF_TYPE and not t.subject.startswith("_:"):
                ns = t.subject.rsplit("#", 1)[0] + "#" if "#" in t.subject \
                    else t.subject.rsplit("/", 1)[0] + "/"
                counts[ns] += 1
        inferred = counts.most_common(1)[0][0] if counts else base_uri
    store = TripleStore(inferred)
    store.rows = set(rows)
    if has_ontology_decl:
        # keep the document's own declaration subject authoritative
        store.ontology_uri = next(
            t.subject for t in rows
            if t.predicate == RDF_TYPE and t.object == OWL_ONTOLOGY)
    else:
        store.add(Triple(store.ontology_uri, RDF_TYPE, OWL_ONTOLOGY,
                         "uri", "", ""))
    if format in ("turtle", "n3"):
        store.loaded_prefixes.update(turtle.extract_prefixes(data))
    elif format == "xml":
        store.loaded_prefixes.update(
            {p: ns for p, ns in rdfxml.extract_prefixes(data).items() if p})
    elif format == "json-ld":
        store.loaded_prefixes.update(
            {p: ns for p, ns in jsonld.extract_context_prefixes(data).items()
             if p})
    return store
