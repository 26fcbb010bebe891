"""N-Triples serialization for triple rows.

NT is line-oriented, so serialization shards perfectly: the distributed
sink is an embarrassingly-parallel ``map_batches`` formatting stage
(see ``write_ntriples_dataset``), mirroring the reference's
``export_to_string`` (ontology_manager.py:2295-2297) for the canonical
line-based format.  Driver-side helpers handle schema-sized graphs and
snapshots.
"""

from __future__ import annotations

import re
from typing import Iterable, List

from ..functions.terms import BNODE, LITERAL, URI, XSD_STRING, Triple

_ESCAPES = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t"}
_ESCAPE_RE = re.compile(r'[\\"\n\r\t]')
_UNESCAPES = {"\\\\": "\\", '\\"': '"', "\\n": "\n", "\\r": "\r", "\\t": "\t"}
_UNESCAPE_RE = re.compile(r'\\[\\"nrt]')


def escape_literal(value: str) -> str:
    return _ESCAPE_RE.sub(lambda m: _ESCAPES[m.group(0)], value)


def unescape_literal(value: str) -> str:
    return _UNESCAPE_RE.sub(lambda m: _UNESCAPES[m.group(0)], value)


def format_term_object(obj: str, kind: str, lang: str, datatype: str) -> str:
    if kind == URI:
        return f"<{obj}>"
    if kind == BNODE:
        return obj
    lit = f'"{escape_literal(obj)}"'
    if lang:
        return f"{lit}@{lang}"
    if datatype and datatype != XSD_STRING:
        return f"{lit}^^<{datatype}>"
    return lit


def format_row(t: Triple) -> str:
    s = t.subject if t.subject.startswith("_:") else f"<{t.subject}>"
    return (f"{s} <{t.predicate}> "
            f"{format_term_object(t.object, t.object_kind, t.lang, t.datatype)} .")


def serialize_rows(rows: Iterable[Triple]) -> str:
    return "\n".join(format_row(t) for t in rows) + "\n"


_LINE_RE = re.compile(
    r'^(?P<s><[^>]*>|_:\S+)\s+<(?P<p>[^>]*)>\s+(?P<o>.+?)\s*\.\s*$')
_LIT_RE = re.compile(
    r'^"(?P<v>(?:[^"\\]|\\.)*)"(?:@(?P<lang>[A-Za-z0-9-]+)|\^\^<(?P<dt>[^>]*)>)?$')


def parse_line(line: str) -> Triple:
    m = _LINE_RE.match(line)
    if not m:
        raise ValueError(f"Bad N-Triples line: {line!r}")
    s = m.group("s")
    subject = s[1:-1] if s.startswith("<") else s
    obj = m.group("o")
    if obj.startswith("<") and obj.endswith(">"):
        return Triple(subject, m.group("p"), obj[1:-1], URI, "", "")
    if obj.startswith("_:"):
        return Triple(subject, m.group("p"), obj, BNODE, "", "")
    lm = _LIT_RE.match(obj)
    if not lm:
        raise ValueError(f"Bad N-Triples object: {obj!r}")
    dt = lm.group("dt") or ""
    if dt == XSD_STRING:
        dt = ""  # RDF 1.1: "x"^^xsd:string ≡ plain literal
    return Triple(subject, m.group("p"), unescape_literal(lm.group("v")),
                  LITERAL, lm.group("lang") or "", dt)


def parse_rows(text: str) -> List[Triple]:
    out = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        out.append(parse_line(line))
    return out


def nt_lines_batch(batch):
    """Vectorized map_batches stage: triples table -> one 'line' column.

    Arrow in / Arrow out (pyarrow.compute kernels, no Python row loop);
    used by the distributed NT sink.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def _join(*parts):
        # binary_join_element_wise: last arg is the separator
        return pc.binary_join_element_wise(*parts, "")

    s = batch.column("subject")
    s_fmt = pc.if_else(pc.starts_with(s, pattern="_:"), s, _join("<", s, ">"))
    p_fmt = _join("<", batch.column("predicate"), ">")

    o = batch.column("object")
    esc = o
    for pat, rep in (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
                     ("\r", "\\r"), ("\t", "\\t")):
        esc = pc.replace_substring(esc, pattern=pat, replacement=rep)
    lang = pc.fill_null(batch.column("lang"), "")
    dt = pc.fill_null(batch.column("datatype"), "")
    lit_core = _join('"', esc, '"')
    lit = pc.if_else(
        pc.not_equal(lang, ""), _join(lit_core, "@", lang),
        pc.if_else(pc.and_(pc.not_equal(dt, ""), pc.not_equal(dt, XSD_STRING)),
                   _join(lit_core, "^^<", dt, ">"), lit_core))
    kind = batch.column("object_kind")
    o_fmt = pc.if_else(pc.equal(kind, URI), _join("<", o, ">"),
                       pc.if_else(pc.equal(kind, BNODE), o, lit))
    line = _join(s_fmt, " ", p_fmt, " ", o_fmt, " .")
    return pa.table({"line": line})


def write_ntriples_dataset(ds, path: str) -> None:
    """Distributed NT sink: per-block formatting then sharded raw-text
    files (one ``.nt`` shard per block, NO csv quoting/header — a CSV
    writer would quote-wrap every literal line and emit a header row,
    producing invalid N-Triples)."""
    from ray.data.datasource import BlockBasedFileDatasink

    class _NTSink(BlockBasedFileDatasink):
        def __init__(self, p):
            super().__init__(p, file_format="nt")

        def write_block_to_file(self, block, file):
            col = block.to_arrow().column("line")
            payload = "\n".join(col.to_pylist())
            if payload:
                payload += "\n"
            file.write(payload.encode("utf-8"))

    ds.map_batches(nt_lines_batch, batch_format="pyarrow") \
        .write_datasink(_NTSink(path))


def parse_lines_batch(batch):
    """Vectorized-ish NT parse stage: 'text' lines -> triple columns."""
    import pyarrow as pa

    rows = [parse_line(ln) for ln in batch.column("text").to_pylist()
            if ln.strip() and not ln.lstrip().startswith("#")]
    return pa.table({
        "subject": [t.subject for t in rows],
        "predicate": [t.predicate for t in rows],
        "object": [t.object for t in rows],
        "object_kind": [t.object_kind for t in rows],
        "lang": [t.lang for t in rows],
        "datatype": [t.datatype for t in rows],
    })


def read_ntriples_dataset(path):
    """Distributed NT source: line-oriented, so reading shards freely."""
    import ray.data as rd

    return rd.read_text(path).map_batches(parse_lines_batch,
                                          batch_format="pyarrow")
