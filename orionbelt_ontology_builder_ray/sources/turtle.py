"""Turtle parser / serializer (driver-side, schema-plane).

Recursive-descent parser covering the Turtle surface the reference's
workbench formats exercise (templates.py Turtle, sample ontologies such
as prov-o.ttl): @prefix/@base and SPARQL-style PREFIX/BASE directives,
prefixed names, IRIs, ``a``, predicate lists ``;``, object lists ``,``,
plain/lang-tagged/typed literals (single- and triple-quoted, both quote
styles), comments, blank-node labels ``_:x``, inline blank-node
property lists ``[ ... ]``, collections ``( ... )`` (expanded to
rdf:first/rdf:rest cons cells), and numeric/boolean literal shorthand
(typed as xsd:integer / xsd:decimal / xsd:double / xsd:boolean, the
rdflib semantics the reference relies on).

Big inputs never go through Turtle — the data plane is Parquet and
N-Triples (sources/ntriples.py is fully shardable).  Reference analog:
load_from_string / export_to_string (ontology_manager.py:2014-2024,
2295-2297) and TTL prefix extraction (:178-193).
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

from ..functions.terms import (
    BNODE, LITERAL, RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE,
    STANDARD_PREFIXES, URI, XSD, XSD_STRING, Triple,
)
from .ntriples import escape_literal, unescape_literal

_PREFIX_RE = re.compile(r'@prefix\s+([A-Za-z0-9_-]*):\s*<([^>]*)>\s*\.')
# Turtle 1.1 also allows SPARQL-style directives (case-insensitive, no dot)
_SPARQL_PREFIX_RE = re.compile(
    r'(?im)^[ \t]*PREFIX[ \t]+([A-Za-z0-9_-]*):[ \t]*<([^>]*)>')

# NOTE: bnode MUST precede pname, else '_:label' lexes as pname with
# prefix '_' and parsing fails on every blank-node label; the @prefix/
# @base directives MUST precede langtag, else '@prefix' lexes as a
# language tag.  Directives are TOKENS handled by the parser (never
# regex-stripped from raw text — stripping corrupted directive-shaped
# lines inside triple-quoted literals).
_TOKEN_RE = re.compile(r'''
    (?P<comment>\#[^\n]*)
  | (?P<iri><[^>]*>)
  | (?P<triple_lit>"""(?:[^"\\]|\\.|"(?!""))*""")
  | (?P<triple_lit_sq>\'\'\'(?:[^'\\]|\\.|'(?!''))*\'\'\')
  | (?P<lit>"(?:[^"\\\n]|\\.)*")
  | (?P<lit_sq>'(?:[^'\\\n]|\\.)*')
  | (?P<dtype>\^\^)
  | (?P<bnode>_:[A-Za-z0-9_][A-Za-z0-9_.-]*)
  | (?P<pname>(?:[A-Za-z][A-Za-z0-9_.-]*)?:(?:[A-Za-z0-9_%](?:[A-Za-z0-9_.%-]*[A-Za-z0-9_%-])?)?)
  | (?P<number>[+-]?(?:[0-9]+\.[0-9]+(?:[eE][+-]?[0-9]+)?|\.[0-9]+(?:[eE][+-]?[0-9]+)?|[0-9]+(?:[eE][+-]?[0-9]+)?))
  | (?P<bool>\btrue\b|\bfalse\b)
  | (?P<a>\ba\b)
  | (?P<directive>@prefix\b|@base\b)
  | (?P<sparql_directive>(?i:PREFIX|BASE)(?=\s))
  | (?P<langtag>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
  | (?P<punct>[;,.\[\]()])
  | (?P<ws>\s+)
''', re.VERBOSE)

# Turtle string escapes: ECHAR also covers \' (single-quoted literals)
_TTL_UNESCAPES = {"\\\\": "\\", '\\"': '"', "\\'": "'",
                  "\\n": "\n", "\\r": "\r", "\\t": "\t"}
_TTL_UNESCAPE_RE = re.compile(r"\\[\\\"'nrt]")


def _unescape_turtle(value: str) -> str:
    return _TTL_UNESCAPE_RE.sub(lambda m: _TTL_UNESCAPES[m.group(0)], value)


def extract_prefixes(text: str) -> Dict[str, str]:
    """@prefix / PREFIX declarations (reference
    _extract_prefixes_from_ttl, om:178-193 — regex-based like the
    reference, so a directive-shaped line inside a literal may be
    over-collected here; the PARSER's bindings are token-accurate)."""
    out = {m.group(1): m.group(2) for m in _PREFIX_RE.finditer(text)}
    out.update({m.group(1): m.group(2)
                for m in _SPARQL_PREFIX_RE.finditer(text)})
    return out


def _tokens(text: str):
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise ValueError(f"Turtle parse error at offset {pos}: "
                             f"{text[pos:pos + 40]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        if kind == "triple_lit_sq":
            kind = "triple_lit"
        elif kind == "lit_sq":
            kind = "lit"
        yield kind, m.group(0)


_XSD_INTEGER = XSD + "integer"
_XSD_DECIMAL = XSD + "decimal"
_XSD_DOUBLE = XSD + "double"
_XSD_BOOLEAN = XSD + "boolean"


class _Parser:
    """Recursive-descent Turtle statement parser over a token list."""

    def __init__(self, toks: List[Tuple[str, str]],
                 prefixes: Dict[str, str], base_uri: str):
        self.toks = toks
        self.prefixes = prefixes
        self.base_uri = base_uri
        self.i = 0
        self.triples: List[Triple] = []
        self._gen = 0
        # generated anonymous ids must never collide with the
        # document's explicit labels (merging distinct nodes silently)
        self._used_labels = {tok for kind, tok in toks if kind == "bnode"}

    # -- helpers ----------------------------------------------------------
    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def _expect_punct(self, ch: str) -> None:
        kind, tok = self._peek()
        if kind != "punct" or tok != ch:
            raise ValueError(f"Expected {ch!r}, got {tok!r} "
                             f"(token {self.i})")
        self.i += 1

    def _fresh_bnode(self) -> str:
        while True:
            self._gen += 1
            label = f"_:genid{self._gen}"
            if label not in self._used_labels:
                return label

    def _resolve_pname(self, tok: str) -> str:
        prefix, _, local = tok.partition(":")
        if prefix not in self.prefixes:
            raise ValueError(f"Unknown prefix: {prefix!r} in {tok!r}")
        return self.prefixes[prefix] + local

    def _resolve_iri(self, tok: str) -> str:
        iri = tok[1:-1]
        if iri and "://" not in iri and not iri.startswith("urn:") \
                and self.base_uri:
            iri = self.base_uri + iri
        return iri

    # -- grammar ----------------------------------------------------------
    def parse(self) -> List[Triple]:
        while self.i < len(self.toks):
            self._statement()
        return self.triples

    def _directive(self, sparql: bool) -> None:
        """@prefix/@base (dot-terminated) or SPARQL PREFIX/BASE (bare);
        bindings apply to subsequent statements."""
        kw = self.toks[self.i][1].lower().lstrip("@")
        self.i += 1
        if kw == "prefix":
            kind, tok = self._peek()
            if kind != "pname" or not tok.endswith(":"):
                raise ValueError(f"Bad prefix declaration near {tok!r}")
            prefix = tok[:-1]
            self.i += 1
            kind, tok = self._peek()
            if kind != "iri":
                raise ValueError(f"Bad prefix IRI near {tok!r}")
            self.prefixes[prefix] = self._resolve_iri(tok)
            self.i += 1
        else:  # base
            kind, tok = self._peek()
            if kind != "iri":
                raise ValueError(f"Bad base IRI near {tok!r}")
            self.base_uri = tok[1:-1]
            self.i += 1
        if not sparql:
            self._expect_punct(".")

    def _statement(self) -> None:
        kind, tok = self._peek()
        if kind == "directive":
            self._directive(sparql=False)
            return
        if kind == "sparql_directive":
            self._directive(sparql=True)
            return
        if kind == "punct" and tok == "[":
            # blankNodePropertyList as subject; predicateObjectList optional
            subj = self._bnode_prop_list()
            nkind, ntok = self._peek()
            if not (nkind == "punct" and ntok == "."):
                self._pred_obj_list(subj)
        else:
            subj, s_kind, _, _ = self._subject()
            self._pred_obj_list(subj)
        self._expect_punct(".")

    def _subject(self):
        kind, tok = self._peek()
        if kind == "iri":
            self.i += 1
            return self._resolve_iri(tok), URI, "", ""
        if kind == "bnode":
            self.i += 1
            return tok, BNODE, "", ""
        if kind == "pname":
            self.i += 1
            return self._resolve_pname(tok), URI, "", ""
        if kind == "punct" and tok == "(":
            node, node_kind = self._collection()
            return node, node_kind, "", ""
        raise ValueError(f"Bad subject token {tok!r}")

    def _predicate(self) -> str:
        kind, tok = self._peek()
        if kind == "a":
            self.i += 1
            return RDF_TYPE
        if kind == "iri":
            self.i += 1
            return self._resolve_iri(tok)
        if kind == "pname":
            self.i += 1
            return self._resolve_pname(tok)
        raise ValueError(f"Bad predicate token {tok!r}")

    def _pred_obj_list(self, subj: str) -> None:
        while True:
            pred = self._predicate()
            while True:
                obj, o_kind, lang, dtype = self._object()
                self.triples.append(
                    Triple(subj, pred, obj, o_kind, lang, dtype))
                if self._peek() == ("punct", ","):
                    self.i += 1
                    continue
                break
            if self._peek() == ("punct", ";"):
                self.i += 1
                # allow trailing ';' before '.' / ']'
                nkind, ntok = self._peek()
                if nkind == "punct" and ntok in (".", "]"):
                    break
                continue
            break

    def _object(self):
        kind, tok = self._peek()
        if kind == "iri":
            self.i += 1
            return self._resolve_iri(tok), URI, "", ""
        if kind == "bnode":
            self.i += 1
            return tok, BNODE, "", ""
        if kind == "pname":
            self.i += 1
            return self._resolve_pname(tok), URI, "", ""
        if kind in ("lit", "triple_lit"):
            self.i += 1
            value = tok[3:-3] if kind == "triple_lit" else tok[1:-1]
            value = _unescape_turtle(value)  # ECHAR incl. \' (sq lits)
            lang, dtype = "", ""
            nkind, ntok = self._peek()
            if nkind == "langtag":
                lang = ntok[1:]
                self.i += 1
            elif nkind == "dtype":
                self.i += 1
                dkind, dtok = self._peek()
                if dkind == "iri":
                    dtype = self._resolve_iri(dtok)
                elif dkind == "pname":
                    dtype = self._resolve_pname(dtok)
                else:
                    raise ValueError(f"Bad datatype token {dtok!r}")
                self.i += 1
            if dtype == XSD_STRING:
                dtype = ""  # RDF 1.1: "x"^^xsd:string ≡ plain literal
            return value, LITERAL, lang, dtype
        if kind == "number":
            self.i += 1
            # rdflib semantics: integer / decimal / double by lexical form
            if "e" in tok or "E" in tok:
                dtype = _XSD_DOUBLE
            elif "." in tok:
                dtype = _XSD_DECIMAL
            else:
                dtype = _XSD_INTEGER
            return tok, LITERAL, "", dtype
        if kind == "bool":
            self.i += 1
            return tok, LITERAL, "", _XSD_BOOLEAN
        if kind == "punct" and tok == "[":
            return self._bnode_prop_list(), BNODE, "", ""
        if kind == "punct" and tok == "(":
            node, node_kind = self._collection()
            return node, node_kind, "", ""
        raise ValueError(f"Bad object token {tok!r}")

    def _bnode_prop_list(self) -> str:
        """``[ pred obj ; ... ]`` — fresh bnode, nested triples emitted."""
        self._expect_punct("[")
        node = self._fresh_bnode()
        if self._peek() != ("punct", "]"):
            self._pred_obj_list(node)
        self._expect_punct("]")
        return node

    def _collection(self) -> Tuple[str, str]:
        """``( o1 o2 ... )`` — rdf:first/rdf:rest cons cells; empty list
        is rdf:nil (a URI, not a bnode)."""
        self._expect_punct("(")
        members = []
        while self._peek() != ("punct", ")"):
            if self._peek() == (None, None):
                raise ValueError("Unterminated collection")
            members.append(self._object())
        self._expect_punct(")")
        if not members:
            return RDF_NIL, URI
        cells = [self._fresh_bnode() for _ in members]
        for idx, (obj, o_kind, lang, dtype) in enumerate(members):
            self.triples.append(
                Triple(cells[idx], RDF_FIRST, obj, o_kind, lang, dtype))
            if idx + 1 < len(cells):
                self.triples.append(
                    Triple(cells[idx], RDF_REST, cells[idx + 1], BNODE,
                           "", ""))
            else:
                self.triples.append(
                    Triple(cells[idx], RDF_REST, RDF_NIL, URI, "", ""))
        return cells[0], BNODE


def parse_turtle(text: str, base_uri: str = "") -> List[Triple]:
    """Parse a Turtle document into triple rows.  Directives are
    handled as tokens inside the statement stream (document order), so
    directive-shaped text inside literals stays literal."""
    prefixes = dict(STANDARD_PREFIXES)
    toks = list(_tokens(text))
    return _Parser(toks, prefixes, base_uri).parse()


def _shorten(uri: str, prefixes: Dict[str, str]) -> str:
    best = None
    for prefix, ns in prefixes.items():
        if uri.startswith(ns) and (best is None or len(ns) > len(prefixes[best])):
            local = uri[len(ns):]
            if re.fullmatch(r"[A-Za-z0-9_][A-Za-z0-9_.-]*|", local):
                best = prefix
    if best is None:
        return f"<{uri}>"
    return f"{best}:{uri[len(prefixes[best]):]}"


def _fmt_term(obj: str, kind: str, lang: str, dtype: str,
              prefixes: Dict[str, str]) -> str:
    if kind == URI:
        return _shorten(obj, prefixes)
    if kind == BNODE:
        return obj
    lit = f'"{escape_literal(obj)}"'
    if lang:
        return f"{lit}@{lang}"
    if dtype and dtype != XSD_STRING:
        return f"{lit}^^{_shorten(dtype, prefixes)}"
    return lit


def serialize_turtle(rows, prefixes: Dict[str, str] | None = None) -> str:
    """Serialize triple rows as grouped Turtle (subject blocks with
    ``;``-chained predicates and ``,``-chained objects)."""
    prefixes = {**STANDARD_PREFIXES, **(prefixes or {})}
    lines = [f"@prefix {p}: <{ns}> ." for p, ns in sorted(prefixes.items())
             if p]
    if "" in prefixes:
        lines.append(f"@prefix : <{prefixes['']}> .")
    lines.append("")
    by_subject: Dict[str, Dict[str, list]] = {}
    for t in sorted(Triple(*r) for r in rows):
        by_subject.setdefault(t.subject, {}).setdefault(t.predicate, []) \
            .append(t)
    for subj, preds in by_subject.items():
        s = subj if subj.startswith("_:") else _shorten(subj, prefixes)
        pred_strs = []
        for pred, ts in preds.items():
            p = "a" if pred == RDF_TYPE else _shorten(pred, prefixes)
            objs = ", ".join(_fmt_term(t.object, t.object_kind, t.lang,
                                       t.datatype, prefixes) for t in ts)
            pred_strs.append(f"{p} {objs}")
        lines.append(f"{s} " + " ;\n    ".join(pred_strs) + " .")
        lines.append("")
    return "\n".join(lines)
