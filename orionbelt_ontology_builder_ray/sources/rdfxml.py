"""RDF/XML parser / serializer (driver-side, schema-plane).

Covers the RDF/XML surface the reference's sample corpus exercises
(pizza.owl, foaf.rdf, wine.owl, goodrelations.owl — 4 of the 6 sample
ontologies; registry in reference tests/test_samples.py:14-21, load via
rdflib format="xml" in ontology_manager.py:2000-2024): typed node
elements and rdf:Description, rdf:about / rdf:ID / rdf:nodeID /
anonymous bnodes, property elements with rdf:resource / nested nodes /
literals (xml:lang inheritance, rdf:datatype), property *attributes*
(foaf.rdf style), rdf:parseType="Collection" (rdf:first/rest cons
cells), parseType="Resource" and parseType="Literal", xml:base, and
internal DTD entities (expat expands those natively, wine.owl relies
on it).

Built on the stdlib ``xml.etree.ElementTree`` — no rdflib in this
environment.  Schema-plane only: big data interchanges via Parquet /
N-Triples.
"""

from __future__ import annotations

import io
import re
import xml.etree.ElementTree as ET
from typing import Dict, List, Tuple
from xml.sax.saxutils import escape, quoteattr

from ..functions.terms import (
    BNODE, LITERAL, RDF, RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE,
    STANDARD_PREFIXES, URI, XSD_STRING, Triple,
)

_XMLNS = "http://www.w3.org/XML/1998/namespace"
_XML_BASE = "{%s}base" % _XMLNS
_XML_LANG = "{%s}lang" % _XMLNS

_RDF_ABOUT = "{%s}about" % RDF
_RDF_ID = "{%s}ID" % RDF
_RDF_NODEID = "{%s}nodeID" % RDF
_RDF_RESOURCE = "{%s}resource" % RDF
_RDF_DATATYPE = "{%s}datatype" % RDF
_RDF_PARSETYPE = "{%s}parseType" % RDF
_RDF_DESCRIPTION = RDF + "Description"
_RDF_XMLLITERAL = RDF + "XMLLiteral"

# rdf: attributes that are syntax markers, never property attributes
_SYNTAX_ATTRS = {_RDF_ABOUT, _RDF_ID, _RDF_NODEID, _RDF_RESOURCE,
                 _RDF_DATATYPE, _RDF_PARSETYPE, "{%s}li" % RDF}


def _tag_uri(el) -> str:
    tag = el.tag
    if tag.startswith("{"):
        ns, local = tag[1:].split("}", 1)
        return ns + local
    return tag


def _defrag(uri: str) -> str:
    return uri.split("#", 1)[0]


def extract_prefixes(data: str) -> Dict[str, str]:
    """xmlns declarations, for prefix adoption on load (reference
    _update_namespace_from_graph adopts rdflib's bindings)."""
    out: Dict[str, str] = {}
    try:
        for _, (prefix, uri) in ET.iterparse(io.StringIO(data),
                                             events=["start-ns"]):
            if prefix != "xml":
                out[prefix] = uri
    except ET.ParseError:
        pass
    return out


class _XmlParser:
    def __init__(self, base_uri: str, used_labels=()):
        self.base = base_uri
        self.triples: List[Triple] = []
        self._gen = 0
        # generated anonymous ids must not collide with explicit
        # rdf:nodeID labels (silent node merge)
        self._used_labels = set(used_labels)

    def _fresh(self) -> str:
        while True:
            self._gen += 1
            label = f"_:genid{self._gen}"
            if label not in self._used_labels:
                return label

    def _resolve(self, ref: str, base: str) -> str:
        if "://" in ref or ref.startswith("urn:"):
            return ref
        if ref == "":
            return base
        if ref.startswith("#"):
            return _defrag(base) + ref
        from urllib.parse import urljoin

        return urljoin(base, ref) if base else ref

    # -- node elements -----------------------------------------------------
    def node_element(self, el, base: str, lang: str) -> Tuple[str, str]:
        base = el.attrib.get(_XML_BASE, base)
        lang = el.attrib.get(_XML_LANG, lang)
        if _RDF_ABOUT in el.attrib:
            subj, kind = self._resolve(el.attrib[_RDF_ABOUT], base), URI
        elif _RDF_ID in el.attrib:
            subj, kind = _defrag(base) + "#" + el.attrib[_RDF_ID], URI
        elif _RDF_NODEID in el.attrib:
            subj, kind = "_:" + el.attrib[_RDF_NODEID], BNODE
        else:
            subj, kind = self._fresh(), BNODE
        tag = _tag_uri(el)
        if tag != _RDF_DESCRIPTION:
            self.triples.append(Triple(subj, RDF_TYPE, tag, URI, "", ""))
        # property attributes (foaf.rdf: dc:title="..." on owl:Ontology)
        for attr, val in el.attrib.items():
            if attr in _SYNTAX_ATTRS or attr in (_XML_BASE, _XML_LANG) \
                    or not attr.startswith("{"):
                continue
            ns, local = attr[1:].split("}", 1)
            if ns == _XMLNS:
                continue
            pred = ns + local
            if pred == RDF_TYPE:
                self.triples.append(
                    Triple(subj, RDF_TYPE, self._resolve(val, base),
                           URI, "", ""))
            else:
                self.triples.append(
                    Triple(subj, pred, val, LITERAL, lang, ""))
        for child in el:
            self.property_element(subj, child, base, lang)
        return subj, kind

    # -- property elements -------------------------------------------------
    def property_element(self, subj: str, el, base: str, lang: str) -> None:
        base = el.attrib.get(_XML_BASE, base)
        lang = el.attrib.get(_XML_LANG, lang)
        pred = _tag_uri(el)
        ptype = el.attrib.get(_RDF_PARSETYPE)
        if ptype == "Collection":
            members = [self.node_element(c, base, lang) for c in el]
            if not members:
                self.triples.append(
                    Triple(subj, pred, RDF_NIL, URI, "", ""))
                return
            cells = [self._fresh() for _ in members]
            self.triples.append(Triple(subj, pred, cells[0], BNODE, "", ""))
            for i, (obj, kind) in enumerate(members):
                self.triples.append(
                    Triple(cells[i], RDF_FIRST, obj, kind, "", ""))
                if i + 1 < len(cells):
                    self.triples.append(
                        Triple(cells[i], RDF_REST, cells[i + 1], BNODE,
                               "", ""))
                else:
                    self.triples.append(
                        Triple(cells[i], RDF_REST, RDF_NIL, URI, "", ""))
            return
        if ptype == "Resource":
            node = self._fresh()
            self.triples.append(Triple(subj, pred, node, BNODE, "", ""))
            for c in el:
                self.property_element(node, c, base, lang)
            return
        if ptype == "Literal":
            inner = (el.text or "") + "".join(
                ET.tostring(c, encoding="unicode") for c in el)
            self.triples.append(
                Triple(subj, pred, inner, LITERAL, "", _RDF_XMLLITERAL))
            return
        if _RDF_RESOURCE in el.attrib:
            self.triples.append(
                Triple(subj, pred,
                       self._resolve(el.attrib[_RDF_RESOURCE], base),
                       URI, "", ""))
            return
        if _RDF_NODEID in el.attrib:
            self.triples.append(
                Triple(subj, pred, "_:" + el.attrib[_RDF_NODEID], BNODE,
                       "", ""))
            return
        children = list(el)
        if children:
            obj, kind = self.node_element(children[0], base, lang)
            self.triples.append(Triple(subj, pred, obj, kind, "", ""))
            return
        # property attributes on an empty property element → implicit bnode
        prop_attrs = [(a, v) for a, v in el.attrib.items()
                      if a.startswith("{") and a not in _SYNTAX_ATTRS
                      and not a.startswith("{" + _XMLNS)]
        if prop_attrs and not (el.text or "").strip():
            node = self._fresh()
            self.triples.append(Triple(subj, pred, node, BNODE, "", ""))
            for attr, val in prop_attrs:
                ns, local = attr[1:].split("}", 1)
                self.triples.append(
                    Triple(node, ns + local, val, LITERAL, lang, ""))
            return
        dtype = el.attrib.get(_RDF_DATATYPE, "")
        if dtype == XSD_STRING:
            dtype = ""  # RDF 1.1: "x"^^xsd:string ≡ plain literal
        self.triples.append(
            Triple(subj, pred, el.text or "", LITERAL,
                   "" if dtype else lang, dtype))


def parse_rdfxml(data: str, base_uri: str = "") -> List[Triple]:
    """Parse an RDF/XML document into triple rows."""
    root = ET.fromstring(data)
    base = root.attrib.get(_XML_BASE, base_uri)
    lang = root.attrib.get(_XML_LANG, "")
    used = {"_:" + el.attrib[_RDF_NODEID]
            for el in root.iter() if _RDF_NODEID in el.attrib}
    p = _XmlParser(base, used)
    if _tag_uri(root) == RDF + "RDF":
        for child in root:
            p.node_element(child, base, lang)
    else:
        # document whose root is itself a node element
        p.node_element(root, base, lang)
    return p.triples


# ---------------------------------------------------------------------------
# Serialization
# ---------------------------------------------------------------------------

_NCNAME_SPLIT = re.compile(r"^(.*?)([A-Za-z_][A-Za-z0-9_.-]*)$")


def _split_uri(uri: str) -> Tuple[str, str]:
    """Split a predicate/type URI into (namespace, xml-legal local name)."""
    for sep in ("#", "/"):
        if sep in uri:
            ns, local = uri.rsplit(sep, 1)
            if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_.-]*", local):
                return ns + sep, local
    m = _NCNAME_SPLIT.match(uri)
    if m and m.group(1):
        return m.group(1), m.group(2)
    raise ValueError(f"Cannot split URI for XML serialization: {uri!r}")


def serialize_rdfxml(rows, prefixes: Dict[str, str] | None = None) -> str:
    """Serialize triple rows as rdf:Description-style RDF/XML.

    Blank nodes round-trip via rdf:nodeID, so an export→import cycle
    through ``parse_rdfxml`` preserves the exact 6-tuple set (the
    reference's xml round-trip test allows <10% bnode drift; we do
    better).
    """
    prefixes = {**STANDARD_PREFIXES, **(prefixes or {})}
    ns_to_prefix: Dict[str, str] = {}
    for p, ns in sorted(prefixes.items()):
        if p and ns not in ns_to_prefix:
            ns_to_prefix[ns] = p
    auto = 0

    def prefix_for(ns: str) -> str:
        nonlocal auto
        if ns not in ns_to_prefix:
            auto += 1
            ns_to_prefix[ns] = f"ns{auto}"
        return ns_to_prefix[ns]

    by_subject: Dict[str, List[Triple]] = {}
    for t in sorted(Triple(*r) for r in rows):
        by_subject.setdefault(t.subject, []).append(t)

    body: List[str] = []
    for subj, ts in by_subject.items():
        if subj.startswith("_:"):
            sattr = f'rdf:nodeID={quoteattr(subj[2:])}'
        else:
            sattr = f'rdf:about={quoteattr(subj)}'
        body.append(f"  <rdf:Description {sattr}>")
        for t in ts:
            ns, local = _split_uri(t.predicate)
            tag = f"{prefix_for(ns)}:{local}"
            if t.object_kind == URI:
                body.append(f"    <{tag} rdf:resource={quoteattr(t.object)}/>")
            elif t.object_kind == BNODE:
                body.append(
                    f"    <{tag} rdf:nodeID={quoteattr(t.object[2:])}/>")
            else:
                attrs = ""
                if t.lang:
                    attrs = f" xml:lang={quoteattr(t.lang)}"
                elif t.datatype and t.datatype != XSD_STRING:
                    attrs = f" rdf:datatype={quoteattr(t.datatype)}"
                body.append(
                    f"    <{tag}{attrs}>{escape(t.object)}</{tag}>")
        body.append("  </rdf:Description>")

    ns_to_prefix.setdefault(RDF, "rdf")
    decls = "".join(
        f'\n    xmlns:{p}={quoteattr(ns)}'
        for ns, p in sorted(ns_to_prefix.items(), key=lambda kv: kv[1]))
    return ('<?xml version="1.0" encoding="utf-8"?>\n'
            f"<rdf:RDF{decls}>\n" + "\n".join(body) + "\n</rdf:RDF>\n")
