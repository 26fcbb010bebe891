"""JSON-LD parser / serializer — schema-plane.

Covers both the flattened shape and NESTED node expansion the
reference's rdflib import path accepts (app.py extension map
.jsonld/.json, reference tests/test_jsonld.py): a top-level
``@context`` of prefix -> namespace mappings and term definitions
(``{"@id": ...}`` objects), nodes as objects with ``@id`` / ``@type``
and term-or-IRI keys, values as strings / native JSON numbers and
booleans (typed xsd:integer / xsd:double / xsd:boolean, rdflib
semantics) or ``{"@value": ..., "@language"/"@type": ...}`` /
``{"@id": ...}`` objects, ``@list`` arrays (rdf:first/rest cons
cells), an optional ``@graph`` array, a top-level node array, and
arbitrarily nested node objects (anonymous nested nodes get fresh
blank nodes).  Reference analog: JSON-LD context prefix extraction
(ontology_manager.py:195-225).
"""

from __future__ import annotations

import json
from typing import Dict, List, Tuple

from ..functions.terms import (
    BNODE, LITERAL, RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE, URI, XSD,
    XSD_STRING, Triple,
)


def extract_context_prefixes(data: str) -> Dict[str, str]:
    """Collect prefix -> http(s) namespace pairs from @context
    (om:195-225: only http(s)-valued string entries count; list
    contexts are merged left-to-right; invalid JSON yields {} rather
    than raising — reference tests/test_jsonld.py:86-103)."""
    try:
        doc = json.loads(data)
    except (ValueError, TypeError):
        return {}
    if not isinstance(doc, dict):
        return {}
    ctx = doc.get("@context", {})
    merged: Dict[str, str] = {}
    parts = ctx if isinstance(ctx, list) else [ctx]
    for part in parts:
        if isinstance(part, dict):
            merged.update(part)
    return {k: v for k, v in merged.items()
            if isinstance(v, str) and v.startswith(("http://", "https://"))}


def _expand(term: str, ctx: Dict[str, str]) -> str:
    if term.startswith(("http://", "https://", "_:")):
        return term
    prefix, sep, local = term.partition(":")
    if sep and prefix in ctx:
        return ctx[prefix] + local
    if term in ctx:
        return ctx[term]
    if "" in ctx:  # @vocab-style default namespace under ''
        return ctx[""] + term
    return term


def _term_map(ctx) -> Dict[str, str]:
    """Full term -> IRI expansion map, including ``{"@id": ...}`` term
    definitions and list contexts merged left-to-right
    (extract_context_prefixes keeps the reference's narrower
    http-string-only view for prefix adoption)."""
    parts = ctx if isinstance(ctx, list) else [ctx]
    out: Dict[str, str] = {}
    for part in parts:
        if not isinstance(part, dict):
            continue
        for k, v in part.items():
            if isinstance(v, str):
                out[k] = v
            elif isinstance(v, dict) and isinstance(v.get("@id"), str):
                out[k] = v["@id"]
    return out


def _used_bnode_labels(obj, out=None) -> set:
    """Explicit ``_:`` labels anywhere in the document — generated
    anonymous ids must not collide with them (silent node merge)."""
    if out is None:
        out = set()
    if isinstance(obj, dict):
        v = obj.get("@id")
        if isinstance(v, str) and v.startswith("_:"):
            out.add(v)
        for val in obj.values():
            _used_bnode_labels(val, out)
    elif isinstance(obj, list):
        for val in obj:
            _used_bnode_labels(val, out)
    return out


class _JsonLdParser:
    def __init__(self, ctx: Dict[str, str], used_labels=()):
        self.ctx = ctx
        self.triples: List[Triple] = []
        self._gen = 0
        self._used_labels = set(used_labels)

    def _fresh(self) -> str:
        while True:
            self._gen += 1
            label = f"_:genid{self._gen}"
            if label not in self._used_labels:
                return label

    def node(self, obj: dict) -> Tuple[str, str]:
        """Emit a node object's triples (recursing into nested nodes);
        returns its (id, kind)."""
        subj = obj.get("@id")
        if subj is None:
            subj, kind = self._fresh(), BNODE
        else:
            subj = _expand(subj, self.ctx)
            kind = BNODE if subj.startswith("_:") else URI
        types = obj.get("@type", [])
        if isinstance(types, str):
            types = [types]
        for t in types:
            self.triples.append(
                Triple(subj, RDF_TYPE, _expand(t, self.ctx), URI, "", ""))
        for key, values in obj.items():
            if key.startswith("@"):
                if key == "@graph":  # named-graph content flattens in
                    for child in (values if isinstance(values, list)
                                  else [values]):
                        if isinstance(child, dict):
                            self.node(child)
                continue
            pred = _expand(key, self.ctx)
            for v in (values if isinstance(values, list) else [values]):
                self.value(subj, pred, v)
        return subj, kind

    def term(self, v) -> Tuple[str, str, str, str]:
        """A value position -> (object, kind, lang, datatype)."""
        if isinstance(v, dict):
            if "@value" in v:
                val = v["@value"]
                if "@type" in v:
                    dtype = _expand(v["@type"], self.ctx)
                elif isinstance(val, bool):
                    dtype = XSD + "boolean"  # natives type identically
                elif isinstance(val, int):
                    dtype = XSD + "integer"  # whether bare or in @value
                elif isinstance(val, float):
                    dtype = XSD + "double"
                else:
                    dtype = ""
                if dtype == XSD_STRING:
                    dtype = ""
                val = self._native_str(val) if not isinstance(val, str) \
                    else val
                return val, LITERAL, v.get("@language", ""), dtype
            if "@list" in v:
                return self.rdf_list(v["@list"])
            obj, kind = self.node(v)
            return obj, kind, "", ""
        if isinstance(v, bool):
            return ("true" if v else "false"), LITERAL, "", XSD + "boolean"
        if isinstance(v, int):
            return str(v), LITERAL, "", XSD + "integer"
        if isinstance(v, float):
            return repr(v), LITERAL, "", XSD + "double"
        return str(v), LITERAL, "", ""

    @staticmethod
    def _native_str(val) -> str:
        if isinstance(val, bool):
            return "true" if val else "false"
        return repr(val) if isinstance(val, float) else str(val)

    def rdf_list(self, members) -> Tuple[str, str, str, str]:
        if not members:
            return RDF_NIL, URI, "", ""
        cells = [self._fresh() for _ in members]
        for i, m in enumerate(members):
            obj, kind, lang, dtype = self.term(m)
            self.triples.append(
                Triple(cells[i], RDF_FIRST, obj, kind, lang, dtype))
            if i + 1 < len(cells):
                self.triples.append(
                    Triple(cells[i], RDF_REST, cells[i + 1], BNODE, "", ""))
            else:
                self.triples.append(
                    Triple(cells[i], RDF_REST, RDF_NIL, URI, "", ""))
        return cells[0], BNODE, "", ""

    def value(self, subj: str, pred: str, v) -> None:
        obj, kind, lang, dtype = self.term(v)
        self.triples.append(Triple(subj, pred, obj, kind, lang, dtype))


def parse_jsonld(data: str) -> List[Triple]:
    doc = json.loads(data)
    if isinstance(doc, list):
        nodes, ctx = doc, {}
    else:
        ctx = doc.get("@context", {})
        nodes = doc.get("@graph")
        if nodes is None:
            nodes = [doc] if any(not k.startswith("@") or k in
                                 ("@id", "@type") for k in doc) else []
    p = _JsonLdParser(_term_map(ctx), _used_bnode_labels(doc))
    for node in nodes:
        if isinstance(node, dict):
            p.node(node)
    return p.triples


def serialize_jsonld(rows, context: Dict[str, str] | None = None) -> str:
    """Flattened JSON-LD: one node object per subject, @type collected,
    literals as @value objects when lang/datatype present."""
    context = dict(context or {})
    inv = sorted(context.items(), key=lambda kv: -len(kv[1]))

    def compact(uri: str) -> str:
        for prefix, ns in inv:
            if uri.startswith(ns):
                return f"{prefix}:{uri[len(ns):]}" if prefix else uri[len(ns):]
        return uri

    nodes: Dict[str, dict] = {}
    for r in sorted(Triple(*t) for t in rows):
        node = nodes.setdefault(r.subject, {"@id": compact(r.subject)})
        if r.predicate == RDF_TYPE and r.object_kind == URI:
            node.setdefault("@type", []).append(compact(r.object))
            continue
        key = compact(r.predicate)
        if r.object_kind in (URI, BNODE):
            value = {"@id": compact(r.object)}
        elif r.lang or (r.datatype and r.datatype != XSD_STRING):
            value = {"@value": r.object}
            if r.lang:
                value["@language"] = r.lang
            else:
                value["@type"] = compact(r.datatype)
        else:
            value = r.object
        node.setdefault(key, []).append(value)
    doc = {"@context": context, "@graph": list(nodes.values())}
    return json.dumps(doc, indent=2, sort_keys=True)
