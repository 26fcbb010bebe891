"""Minimal Turtle parser / serializer (driver-side, schema-plane).

Covers the subset the reference's workbench formats exercise
(templates.py Turtle, simple ontology files): @prefix/@base
declarations, prefixed names, IRIs, ``a``, predicate lists ``;``,
object lists ``,``, plain/lang-tagged/typed literals (single and
triple-quoted), comments, and anonymous bnode labels.  NOT covered
(documented): collections ``( )``, inline bnode property lists
``[ ]`` beyond empty, numeric/boolean literal shorthand (parsed as
plain literals).

Big inputs never go through Turtle — the data plane is Parquet and
N-Triples (sources/ntriples.py is fully shardable).  Reference analog:
load_from_string / export_to_string (ontology_manager.py:2014-2024,
2295-2297) and TTL prefix extraction (:178-193).
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

from ..functions.terms import (
    BNODE, LITERAL, RDF_TYPE, STANDARD_PREFIXES, URI, XSD_STRING, Triple,
)
from .ntriples import escape_literal, unescape_literal

_PREFIX_RE = re.compile(r'@prefix\s+([A-Za-z0-9_-]*):\s*<([^>]*)>\s*\.')
_BASE_RE = re.compile(r'@base\s+<([^>]*)>\s*\.')

_TOKEN_RE = re.compile(r'''
    (?P<comment>\#[^\n]*)
  | (?P<iri><[^>]*>)
  | (?P<triple_lit>"""(?:[^"\\]|\\.|"(?!""))*""")
  | (?P<lit>"(?:[^"\\]|\\.)*")
  | (?P<langtag>@[A-Za-z0-9-]+)
  | (?P<dtype>\^\^)
  | (?P<punct>[;,.\[\]])
  | (?P<a>\ba\b)
  | (?P<pname>[A-Za-z0-9_][A-Za-z0-9_.-]*)?:(?:[A-Za-z0-9_][A-Za-z0-9_.%-]*)?
  | (?P<bnode>_:[A-Za-z0-9_-]+)
  | (?P<number>[+-]?[0-9]+(?:\.[0-9]+)?)
  | (?P<bool>\btrue\b|\bfalse\b)
  | (?P<ws>\s+)
''', re.VERBOSE)


def extract_prefixes(text: str) -> Dict[str, str]:
    """@prefix declarations (reference _extract_prefixes_from_ttl,
    om:178-193)."""
    return {m.group(1): m.group(2) for m in _PREFIX_RE.finditer(text)}


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
        yield kind, m.group(0)


def parse_turtle(text: str, base_uri: str = "") -> List[Triple]:
    """Parse a Turtle document into triple rows."""
    prefixes = dict(STANDARD_PREFIXES)
    prefixes.update(extract_prefixes(text))
    base_m = _BASE_RE.search(text)
    if base_m:
        base_uri = base_m.group(1)
    # strip directive lines before tokenizing statements
    body = _PREFIX_RE.sub("", _BASE_RE.sub("", text))

    def resolve_pname(tok: str) -> str:
        prefix, _, local = tok.partition(":")
        if prefix not in prefixes:
            raise ValueError(f"Unknown prefix: {prefix!r} in {tok!r}")
        return prefixes[prefix] + local

    triples: List[Triple] = []
    toks = list(_tokens(body))
    i = 0
    n = len(toks)

    def term(j) -> Tuple[Tuple[str, str, str, str], int]:
        kind, tok = toks[j]
        if kind == "iri":
            iri = tok[1:-1]
            if iri and "://" not in iri and base_uri:
                iri = base_uri + iri
            return (iri, URI, "", ""), j + 1
        if kind == "bnode":
            return (tok, BNODE, "", ""), j + 1
        if kind == "a":
            return (RDF_TYPE, URI, "", ""), j + 1
        if kind in ("lit", "triple_lit"):
            value = tok[3:-3] if kind == "triple_lit" else tok[1:-1]
            value = unescape_literal(value)
            lang, dtype = "", ""
            k = j + 1
            if k < n and toks[k][0] == "langtag":
                lang = toks[k][1][1:]
                k += 1
            elif k < n and toks[k][0] == "dtype":
                (dt, _, _, _), k = term(k + 1)
                dtype = dt
            return (value, LITERAL, lang, dtype), k
        if kind in ("number", "bool"):
            return (tok, LITERAL, "", ""), j + 1
        if kind is None or kind == "pname" or (kind not in (
                "punct",) and ":" in tok):
            return (resolve_pname(tok), URI, "", ""), j + 1
        raise ValueError(f"Unexpected token {tok!r}")

    while i < n:
        (subj, s_kind, _, _), i = term(i)
        while True:
            (pred, _, _, _), i = term(i)
            while True:
                (obj, o_kind, lang, dtype), i = term(i)
                triples.append(Triple(subj, pred, obj, o_kind, lang, dtype))
                if i < n and toks[i] == ("punct", ","):
                    i += 1
                    continue
                break
            if i < n and toks[i] == ("punct", ";"):
                i += 1
                # allow trailing ';' before '.'
                if i < n and toks[i] == ("punct", "."):
                    i += 1
                    break
                continue
            if i < n and toks[i] == ("punct", "."):
                i += 1
            break
    return triples


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
