"""Triple-emission rulebook: pure functions ``args -> list[Triple]``.

This module is the single source of the reference's emission semantics
(SURVEY.md §2.2).  Both the driver-side in-memory store
(``state.graph.TripleStore``) and the distributed extraction stages
(``stages.extract``) call these functions, so parity lives in ONE place.

Each function cites the reference method it reproduces (file:line into
/root/reference/ontology_manager.py).
"""

from __future__ import annotations

from typing import Any, Iterable, Optional, Sequence

from .terms import (
    ANNOTATION_PREDICATES, CLASS_RELATIONS, DCTERMS_CREATOR, DCTERMS_TITLE,
    INDIVIDUAL_RELATIONS, LITERAL, OWL_ALL_DIFFERENT, OWL_ASYMMETRIC, OWL_CLASS,
    OWL_COMPLEMENT_OF, OWL_DATATYPE_PROPERTY, OWL_DISJOINT_UNION_OF,
    OWL_DISTINCT_MEMBERS, OWL_FUNCTIONAL, OWL_HAS_KEY, OWL_IMPORTS,
    OWL_INTERSECTION_OF, OWL_INVERSE_FUNCTIONAL, OWL_INVERSE_OF,
    OWL_IRREFLEXIVE, OWL_NAMED_INDIVIDUAL, OWL_OBJECT_PROPERTY, OWL_ON_CLASS,
    OWL_ONE_OF, OWL_ON_PROPERTY, OWL_PROPERTY_CHAIN_AXIOM, OWL_REFLEXIVE,
    OWL_RESTRICTION, OWL_SYMMETRIC, OWL_TRANSITIVE, OWL_UNION_OF,
    PROPERTY_RELATIONS, RDF_TYPE, RDFS_COMMENT, RDFS_DOMAIN, RDFS_LABEL,
    RDFS_RANGE, RDFS_SUBCLASSOF, RESTRICTION_TYPES, SKOS_BROADER,
    SKOS_CONCEPT, SKOS_CONCEPT_SCHEME, SKOS_DEFINITION, SKOS_IN_SCHEME,
    SKOS_INVERSES, SKOS_NARROWER, SKOS_PREF_LABEL, SKOS_RELATIONS,
    SKOS_SYMMETRIC, URI, XSD_NON_NEGATIVE_INTEGER, Triple, bnode_triple,
    lit_triple, mint_uri, rdf_list_triples, resolve_datatype_range,
    stable_bnode, uri_triple,
)

Triples = list


def add_class(base: str, name: str, parent: Optional[str] = None,
              label: Optional[str] = None, comment: Optional[str] = None) -> Triples:
    """ontology_manager.py:303-318"""
    c = mint_uri(base, name)
    out = [uri_triple(c, RDF_TYPE, OWL_CLASS)]
    if parent:
        out.append(uri_triple(c, RDFS_SUBCLASSOF, mint_uri(base, parent)))
    if label:
        out.append(lit_triple(c, RDFS_LABEL, label))
    if comment:
        out.append(lit_triple(c, RDFS_COMMENT, comment))
    return out


_CHARACTERISTIC_TYPES = (
    ("functional", OWL_FUNCTIONAL),
    ("inverse_functional", OWL_INVERSE_FUNCTIONAL),
    ("transitive", OWL_TRANSITIVE),
    ("symmetric", OWL_SYMMETRIC),
    ("asymmetric", OWL_ASYMMETRIC),
    ("reflexive", OWL_REFLEXIVE),
    ("irreflexive", OWL_IRREFLEXIVE),
)


def add_object_property(base: str, name: str, domain: Optional[str] = None,
                        range_: Optional[str] = None, label: Optional[str] = None,
                        comment: Optional[str] = None, inverse_of: Optional[str] = None,
                        **flags: bool) -> Triples:
    """ontology_manager.py:748-785; one extra rdf:type triple per
    characteristic flag, owl:inverseOf when given."""
    p = mint_uri(base, name)
    out = [uri_triple(p, RDF_TYPE, OWL_OBJECT_PROPERTY)]
    if domain:
        out.append(uri_triple(p, RDFS_DOMAIN, mint_uri(base, domain)))
    if range_:
        out.append(uri_triple(p, RDFS_RANGE, mint_uri(base, range_)))
    if label:
        out.append(lit_triple(p, RDFS_LABEL, label))
    if comment:
        out.append(lit_triple(p, RDFS_COMMENT, comment))
    for flag, type_uri in _CHARACTERISTIC_TYPES:
        if flags.get(flag):
            out.append(uri_triple(p, RDF_TYPE, type_uri))
    if inverse_of:
        out.append(uri_triple(p, OWL_INVERSE_OF, mint_uri(base, inverse_of)))
    return out


def add_data_property(base: str, name: str, domain: Optional[str] = None,
                      range_: str = "string", label: Optional[str] = None,
                      comment: Optional[str] = None, functional: bool = False) -> Triples:
    """ontology_manager.py:787-806; range through XSD_DATATYPES with
    fallback to xsd:string (:797)."""
    p = mint_uri(base, name)
    out = [uri_triple(p, RDF_TYPE, OWL_DATATYPE_PROPERTY)]
    if domain:
        out.append(uri_triple(p, RDFS_DOMAIN, mint_uri(base, domain)))
    out.append(uri_triple(p, RDFS_RANGE, resolve_datatype_range(base, range_)))
    if label:
        out.append(lit_triple(p, RDFS_LABEL, label))
    if comment:
        out.append(lit_triple(p, RDFS_COMMENT, comment))
    if functional:
        out.append(uri_triple(p, RDF_TYPE, OWL_FUNCTIONAL))
    return out


def add_individual(base: str, name: str, class_name: str,
                   label: Optional[str] = None, comment: Optional[str] = None) -> Triples:
    """ontology_manager.py:976-990 — both owl:NamedIndividual and the
    class type edge."""
    i = mint_uri(base, name)
    out = [
        uri_triple(i, RDF_TYPE, OWL_NAMED_INDIVIDUAL),
        uri_triple(i, RDF_TYPE, mint_uri(base, class_name)),
    ]
    if label:
        out.append(lit_triple(i, RDFS_LABEL, label))
    if comment:
        out.append(lit_triple(i, RDFS_COMMENT, comment))
    return out


def add_individual_property(base: str, individual: str, property_name: str,
                            value: Any, is_object_property: bool = True) -> Triples:
    """ontology_manager.py:992-1002"""
    i = mint_uri(base, individual)
    p = mint_uri(base, property_name)
    if is_object_property:
        return [uri_triple(i, p, mint_uri(base, str(value)))]
    return [lit_triple(i, p, value)]


def add_annotation(base: str, subject: str, predicate: str, value: str,
                   lang: Optional[str] = None) -> Triples:
    """ontology_manager.py:1199-1240 — named map, else full-URI
    passthrough, else local mint."""
    s = mint_uri(base, subject)
    if predicate.startswith("http://") or predicate.startswith("https://"):
        p = predicate
    else:
        p = ANNOTATION_PREDICATES.get(predicate, mint_uri(base, predicate))
    return [lit_triple(s, p, value, lang=lang or "")]


def add_concept_scheme(base: str, name: str, label: Optional[str] = None,
                       comment: Optional[str] = None) -> Triples:
    """ontology_manager.py:1385-1394"""
    s = mint_uri(base, name)
    out = [uri_triple(s, RDF_TYPE, SKOS_CONCEPT_SCHEME)]
    if label:
        out.append(lit_triple(s, RDFS_LABEL, label))
    if comment:
        out.append(lit_triple(s, RDFS_COMMENT, comment))
    return out


def add_concept(base: str, name: str, scheme: Optional[str] = None,
                pref_label: Optional[str] = None, definition: Optional[str] = None,
                broader: Optional[str] = None, lang: str = "en") -> Triples:
    """ontology_manager.py:1450-1478 — broader auto-emits the narrower
    inverse (:1473-1476)."""
    c = mint_uri(base, name)
    out = [uri_triple(c, RDF_TYPE, SKOS_CONCEPT)]
    if scheme:
        out.append(uri_triple(c, SKOS_IN_SCHEME, mint_uri(base, scheme)))
    if pref_label:
        out.append(lit_triple(c, SKOS_PREF_LABEL, pref_label, lang=lang))
    if definition:
        out.append(lit_triple(c, SKOS_DEFINITION, definition, lang=lang))
    if broader:
        b = mint_uri(base, broader)
        out.append(uri_triple(c, SKOS_BROADER, b))
        out.append(uri_triple(b, SKOS_NARROWER, c))
    return out


def add_concept_relation(base: str, concept1: str, relation: str, concept2: str) -> Triples:
    """ontology_manager.py:1575-1596 — auto-inverse for broader/narrower,
    auto-mirror for symmetric relations."""
    c1 = mint_uri(base, concept1)
    c2 = mint_uri(base, concept2)
    rel = SKOS_RELATIONS.get(relation)
    if rel is None:
        raise ValueError(f"Unknown SKOS relation: {relation}")
    out = [uri_triple(c1, rel, c2)]
    if rel in SKOS_INVERSES:
        out.append(uri_triple(c2, SKOS_INVERSES[rel], c1))
    elif rel in SKOS_SYMMETRIC:
        out.append(uri_triple(c2, rel, c1))
    return out


def _relation(base: str, maps: dict, e1: str, relation: str, e2: str) -> Triples:
    pred = maps.get(relation)
    if pred is None:
        raise ValueError(f"Unknown relation: {relation}")
    return [uri_triple(mint_uri(base, e1), pred, mint_uri(base, e2))]


def add_class_relation(base: str, c1: str, relation: str, c2: str) -> Triples:
    """ontology_manager.py:1742-1748"""
    return _relation(base, CLASS_RELATIONS, c1, relation, c2)


def add_property_relation(base: str, p1: str, relation: str, p2: str) -> Triples:
    """ontology_manager.py:1774-1780"""
    return _relation(base, PROPERTY_RELATIONS, p1, relation, p2)


def add_individual_relation(base: str, i1: str, relation: str, i2: str) -> Triples:
    """ontology_manager.py:1806-1812"""
    return _relation(base, INDIVIDUAL_RELATIONS, i1, relation, i2)


def add_restriction(base: str, class_name: str, property_name: str,
                    restriction_type: str, value: Any,
                    on_class: Optional[str] = None) -> tuple[str, Triples]:
    """ontology_manager.py:1101-1136.  Returns (bnode_id, triples);
    bnode id is content-hashed for determinism (reference uses a random
    BNode; P/R comparison excludes bnode-rooted triples, om:2427-2430)."""
    c = mint_uri(base, class_name)
    p = mint_uri(base, property_name)
    pred = RESTRICTION_TYPES.get(restriction_type)
    if not pred:
        raise ValueError(f"Unknown restriction type: {restriction_type}")
    r = stable_bnode(c, "restriction", p, restriction_type, value, on_class)
    out = [
        Triple(r, RDF_TYPE, OWL_RESTRICTION, URI, "", ""),
        Triple(r, OWL_ON_PROPERTY, p, URI, "", ""),
    ]
    if restriction_type in ("someValuesFrom", "allValuesFrom"):
        out.append(Triple(r, pred, mint_uri(base, str(value)), URI, "", ""))
    elif restriction_type == "hasValue":
        # http-prefix heuristic (om:1119-1122)
        if isinstance(value, str) and not value.startswith("http"):
            out.append(Triple(r, pred, value, LITERAL, "", ""))
        else:
            out.append(Triple(r, pred, mint_uri(base, str(value)), URI, "", ""))
    else:
        out.append(Triple(r, pred, str(int(value)), LITERAL, "",
                          XSD_NON_NEGATIVE_INTEGER))
        if restriction_type in ("minQualifiedCardinality",
                                "maxQualifiedCardinality",
                                "qualifiedCardinality") and on_class:
            out.append(Triple(r, OWL_ON_CLASS, mint_uri(base, on_class), URI, "", ""))
    out.append(bnode_triple(c, RDFS_SUBCLASSOF, r))
    return r, out


def add_property_chain(base: str, property_name: str, chain: Sequence[str]) -> Triples:
    """ontology_manager.py:1840-1848"""
    p = mint_uri(base, property_name)
    members = [(mint_uri(base, m), URI) for m in chain]
    head, cells = rdf_list_triples(p, "chain", members)
    kind = "bnode" if head != "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil" else URI
    return cells + [Triple(p, OWL_PROPERTY_CHAIN_AXIOM, head, kind, "", "")]


def add_class_expression(base: str, class_name: str, expression_type: str,
                         members: Sequence[str]) -> Triples:
    """ontology_manager.py:1862-1886 — complementOf takes a single URI;
    oneOf/unionOf/intersectionOf take an RDF list."""
    c = mint_uri(base, class_name)
    preds = {
        "complementOf": OWL_COMPLEMENT_OF,
        "oneOf": OWL_ONE_OF,
        "unionOf": OWL_UNION_OF,
        "intersectionOf": OWL_INTERSECTION_OF,
    }
    pred = preds.get(expression_type)
    if pred is None:
        raise ValueError(f"Unknown class expression type: {expression_type}")
    if expression_type == "complementOf":
        return [uri_triple(c, pred, mint_uri(base, members[0]))]
    items = [(mint_uri(base, m), URI) for m in members]
    head, cells = rdf_list_triples(c, expression_type, items)
    kind = "bnode" if cells else URI
    return cells + [Triple(c, pred, head, kind, "", "")]


def add_all_different(base: str, individuals: Sequence[str]) -> tuple[str, Triples]:
    """ontology_manager.py:1924-1932"""
    items = [(mint_uri(base, i), URI) for i in individuals]
    d = stable_bnode("allDifferent", *[v for v, _ in items])
    head, cells = rdf_list_triples(d, "distinctMembers", items)
    out = [Triple(d, RDF_TYPE, OWL_ALL_DIFFERENT, URI, "", "")]
    out += cells
    out.append(Triple(d, OWL_DISTINCT_MEMBERS, head,
                      "bnode" if cells else URI, "", ""))
    return d, out


def add_has_key(base: str, class_name: str, properties: Sequence[str]) -> Triples:
    """ontology_manager.py:1947-1954"""
    c = mint_uri(base, class_name)
    items = [(mint_uri(base, p), URI) for p in properties]
    head, cells = rdf_list_triples(c, "hasKey", items)
    return cells + [Triple(c, OWL_HAS_KEY, head, "bnode" if cells else URI, "", "")]


def add_disjoint_union(base: str, class_name: str, classes: Sequence[str]) -> Triples:
    """ontology_manager.py:1974-1981"""
    c = mint_uri(base, class_name)
    items = [(mint_uri(base, m), URI) for m in classes]
    head, cells = rdf_list_triples(c, "disjointUnionOf", items)
    return cells + [Triple(c, OWL_DISJOINT_UNION_OF, head,
                           "bnode" if cells else URI, "", "")]


def add_import(ontology_uri: str, import_uri: str) -> Triples:
    """ontology_manager.py:104-106"""
    return [uri_triple(ontology_uri, OWL_IMPORTS, import_uri)]
