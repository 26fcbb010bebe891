"""Property-based round-trip tests for every format codec (hypothesis):
serialize an arbitrary triple set and re-parse it — the 6-tuple set
must survive exactly.  Mirrors the reference's reliance on rdflib's
round-trip guarantees (tests/test_samples.py round-trip class) but
over adversarial generated content rather than curated samples."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from orionbelt_ontology_builder_ray.functions.terms import Triple
from orionbelt_ontology_builder_ray.sources.rdf_io import (
    parse_string, serialize_string,
)

_URI_CHARS = string.ascii_letters + string.digits + "/#._~-"

uris = st.builds(
    lambda host, path: f"http://{host}.org/{path}",
    st.text(string.ascii_lowercase, min_size=1, max_size=8),
    st.text(_URI_CHARS, min_size=1, max_size=20).filter(
        lambda s: not s.startswith(("/", "#"))),
)
# predicates must end in an XML-name-compatible local part — a URI like
# <http://a.org/0> has NO valid element-name split, and RDF/XML simply
# cannot express it (rdflib raises the same way); keep general URIs for
# subjects/objects, which serialize as attributes
pred_uris = st.builds(
    lambda host, path, leaf: f"http://{host}.org/{path}{leaf}",
    st.text(string.ascii_lowercase, min_size=1, max_size=8),
    st.text(_URI_CHARS, min_size=0, max_size=12).filter(
        lambda s: not s.startswith(("/", "#"))),
    st.text(string.ascii_letters, min_size=1, max_size=6),
)
bnodes = st.builds(lambda s: f"_:b{s}",
                   st.text(string.ascii_lowercase + string.digits,
                           min_size=1, max_size=8))
# XML 1.0 forbids most C0 control chars even escaped; exclude them
# (rdflib's xml serializer has the same limitation)
literal_text = st.text(
    st.characters(blacklist_categories=("Cs", "Cc"),
                  whitelist_characters="\n\t"),
    max_size=40)
langs = st.one_of(st.just(""), st.sampled_from(["en", "de", "pt-br"]))
datatypes = st.one_of(
    st.just(""),
    st.sampled_from(["http://www.w3.org/2001/XMLSchema#integer",
                     "http://www.w3.org/2001/XMLSchema#dateTime"]))


def _literal(value, lang, dtype):
    # lang and datatype are mutually exclusive in RDF
    return ("", dtype) if not lang else (lang, "")


triples = st.builds(
    lambda s, p, o, lang_dtype: Triple(s, p, o[0], o[1],
                                       *_literal(o[0], *lang_dtype)),
    st.one_of(uris, bnodes),
    pred_uris,
    st.one_of(st.tuples(uris, st.just("uri")),
              st.tuples(bnodes, st.just("bnode")),
              st.tuples(literal_text, st.just("literal"))),
    st.tuples(langs, datatypes),
)


def _fix(t: Triple) -> Triple:
    # lang/datatype only apply to literals
    if t.object_kind != "literal":
        return Triple(t.subject, t.predicate, t.object, t.object_kind,
                      "", "")
    return t


@settings(max_examples=60, deadline=None)
@given(st.sets(triples, min_size=1, max_size=12))
def test_turtle_roundtrip_exact(rows):
    rows = {_fix(t) for t in rows}
    out = serialize_string(sorted(rows), "turtle")
    assert set(parse_string(out, "turtle")) == rows


@settings(max_examples=60, deadline=None)
@given(st.sets(triples, min_size=1, max_size=12))
def test_nt_roundtrip_exact(rows):
    rows = {_fix(t) for t in rows}
    out = serialize_string(sorted(rows), "nt")
    assert set(parse_string(out, "nt")) == rows


@settings(max_examples=60, deadline=None)
@given(st.sets(triples, min_size=1, max_size=12))
def test_xml_roundtrip_exact(rows):
    rows = {_fix(t) for t in rows}
    out = serialize_string(sorted(rows), "xml")
    assert set(parse_string(out, "xml")) == rows


@settings(max_examples=60, deadline=None)
@given(st.sets(triples, min_size=1, max_size=12))
def test_jsonld_roundtrip_exact(rows):
    rows = {_fix(t) for t in rows}
    out = serialize_string(sorted(rows), "json-ld")
    assert set(parse_string(out, "json-ld")) == rows
