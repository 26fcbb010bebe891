"""JSON-LD (flattened form) parser / serializer — schema-plane.

Covers the flattened/compacted shape the reference's import path
accepts (app.py extension map .jsonld/.json): a top-level ``@context``
of prefix -> namespace mappings, nodes as objects with ``@id`` /
``@type`` and term-or-IRI keys, values as strings or
``{"@value": ..., "@language"/"@type": ...}`` / ``{"@id": ...}``
objects, and an optional ``@graph`` array.  Nested node objects are
NOT expanded (flatten first); reference analog: JSON-LD context prefix
extraction (ontology_manager.py:195-225).
"""

from __future__ import annotations

import json
from typing import Dict, List

from ..functions.terms import (
    BNODE, LITERAL, RDF_TYPE, URI, XSD_STRING, Triple,
)


def extract_context_prefixes(data: str) -> Dict[str, str]:
    """Collect prefix -> http(s) namespace pairs from @context
    (om:195-225: only http(s)-valued string entries count)."""
    doc = json.loads(data)
    ctx = doc.get("@context", {})
    if not isinstance(ctx, dict):
        return {}
    return {k: v for k, v in ctx.items()
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


def _node_triples(node: dict, ctx: Dict[str, str]) -> List[Triple]:
    subj = node.get("@id")
    if subj is None:
        return []
    subj = _expand(subj, ctx)
    out: List[Triple] = []
    types = node.get("@type", [])
    if isinstance(types, str):
        types = [types]
    for t in types:
        out.append(Triple(subj, RDF_TYPE, _expand(t, ctx), URI, "", ""))
    for key, values in node.items():
        if key.startswith("@"):
            continue
        pred = _expand(key, ctx)
        if not isinstance(values, list):
            values = [values]
        for v in values:
            if isinstance(v, dict):
                if "@id" in v:
                    obj = _expand(v["@id"], ctx)
                    kind = BNODE if obj.startswith("_:") else URI
                    out.append(Triple(subj, pred, obj, kind, "", ""))
                elif "@value" in v:
                    dtype = _expand(v["@type"], ctx) if "@type" in v else ""
                    out.append(Triple(subj, pred, str(v["@value"]), LITERAL,
                                      v.get("@language", ""), dtype))
            else:
                out.append(Triple(subj, pred, str(v), LITERAL, "", ""))
    return out


def parse_jsonld(data: str) -> List[Triple]:
    doc = json.loads(data)
    ctx = extract_context_prefixes(doc if isinstance(doc, str)
                                   else json.dumps({"@context":
                                                    doc.get("@context", {})}))
    nodes = doc.get("@graph")
    if nodes is None:
        nodes = [doc] if "@id" in doc else []
    out: List[Triple] = []
    for node in nodes:
        out.extend(_node_triples(node, ctx))
    return out


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
