"""RDF term model and vocabulary for the Ray-Data-native KG engine.

Re-expresses the reference's rdflib term semantics (URIRef / BNode /
Literal identity, namespace vocabulary, datatype whitelist) as plain
Python values suitable for columnar Arrow storage.

Reference parity notes (file:line into /root/reference/):
- URI minting with http(s) passthrough: ontology_manager.py:288-292
- Local-name split on last '#' else last '/': ontology_manager.py:294-299
- XSD datatype whitelist with string fallback: ontology_manager.py:29-42, 797
- Restriction predicate map: ontology_manager.py:45-55
- Annotation name->URI map: ontology_manager.py:1211-1227
- Relation predicate maps: ontology_manager.py:1722-1740
- SKOS inverse/symmetric auto-management: ontology_manager.py:1378-1383
- Structural predicate blacklist: ontology_manager.py:1249-1258

A triple row is a 6-tuple ``(subject, predicate, object, object_kind,
lang, datatype)`` where ``object_kind`` is one of ``uri | bnode |
literal`` and lang/datatype are '' when absent.  The 6-column tuple is
the identity key (rdflib Literal equality includes lang and datatype:
ontology_manager.py:1330-1367).
"""

from __future__ import annotations

import hashlib
from typing import Iterable, NamedTuple

# ---------------------------------------------------------------------------
# Namespaces
# ---------------------------------------------------------------------------

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
OWL = "http://www.w3.org/2002/07/owl#"
XSD = "http://www.w3.org/2001/XMLSchema#"
SKOS = "http://www.w3.org/2004/02/skos/core#"
DC = "http://purl.org/dc/elements/1.1/"
DCTERMS = "http://purl.org/dc/terms/"
SCHEMA = "https://schema.org/"
GIST = "https://w3id.org/semanticarts/ns/ontology/gist/"

RDF_TYPE = RDF + "type"
RDF_FIRST = RDF + "first"
RDF_REST = RDF + "rest"
RDF_NIL = RDF + "nil"

RDFS_LABEL = RDFS + "label"
RDFS_COMMENT = RDFS + "comment"
RDFS_SUBCLASSOF = RDFS + "subClassOf"
RDFS_SUBPROPERTYOF = RDFS + "subPropertyOf"
RDFS_DOMAIN = RDFS + "domain"
RDFS_RANGE = RDFS + "range"
RDFS_SEEALSO = RDFS + "seeAlso"
RDFS_ISDEFINEDBY = RDFS + "isDefinedBy"

OWL_CLASS = OWL + "Class"
OWL_OBJECT_PROPERTY = OWL + "ObjectProperty"
OWL_DATATYPE_PROPERTY = OWL + "DatatypeProperty"
OWL_NAMED_INDIVIDUAL = OWL + "NamedIndividual"
OWL_ONTOLOGY = OWL + "Ontology"
OWL_RESTRICTION = OWL + "Restriction"
OWL_ON_PROPERTY = OWL + "onProperty"
OWL_ON_CLASS = OWL + "onClass"
OWL_THING = OWL + "Thing"
OWL_INVERSE_OF = OWL + "inverseOf"
OWL_EQUIVALENT_CLASS = OWL + "equivalentClass"
OWL_EQUIVALENT_PROPERTY = OWL + "equivalentProperty"
OWL_DISJOINT_WITH = OWL + "disjointWith"
OWL_PROPERTY_DISJOINT_WITH = OWL + "propertyDisjointWith"
OWL_SAME_AS = OWL + "sameAs"
OWL_DIFFERENT_FROM = OWL + "differentFrom"
OWL_IMPORTS = OWL + "imports"
OWL_VERSION_IRI = OWL + "versionIRI"
OWL_DEPRECATED = OWL + "deprecated"
OWL_PROPERTY_CHAIN_AXIOM = OWL + "propertyChainAxiom"
OWL_UNION_OF = OWL + "unionOf"
OWL_INTERSECTION_OF = OWL + "intersectionOf"
OWL_COMPLEMENT_OF = OWL + "complementOf"
OWL_ONE_OF = OWL + "oneOf"
OWL_ALL_DIFFERENT = OWL + "AllDifferent"
OWL_DISTINCT_MEMBERS = OWL + "distinctMembers"
OWL_HAS_KEY = OWL + "hasKey"
OWL_DISJOINT_UNION_OF = OWL + "disjointUnionOf"
OWL_FUNCTIONAL = OWL + "FunctionalProperty"
OWL_INVERSE_FUNCTIONAL = OWL + "InverseFunctionalProperty"
OWL_TRANSITIVE = OWL + "TransitiveProperty"
OWL_SYMMETRIC = OWL + "SymmetricProperty"
OWL_ASYMMETRIC = OWL + "AsymmetricProperty"
OWL_REFLEXIVE = OWL + "ReflexiveProperty"
OWL_IRREFLEXIVE = OWL + "IrreflexiveProperty"

SKOS_CONCEPT = SKOS + "Concept"
SKOS_CONCEPT_SCHEME = SKOS + "ConceptScheme"
SKOS_IN_SCHEME = SKOS + "inScheme"
SKOS_TOP_CONCEPT_OF = SKOS + "topConceptOf"
SKOS_HAS_TOP_CONCEPT = SKOS + "hasTopConcept"
SKOS_PREF_LABEL = SKOS + "prefLabel"
SKOS_ALT_LABEL = SKOS + "altLabel"
SKOS_DEFINITION = SKOS + "definition"
SKOS_EXAMPLE = SKOS + "example"
SKOS_NOTE = SKOS + "note"
SKOS_BROADER = SKOS + "broader"
SKOS_NARROWER = SKOS + "narrower"
SKOS_RELATED = SKOS + "related"
SKOS_CLOSE_MATCH = SKOS + "closeMatch"
SKOS_EXACT_MATCH = SKOS + "exactMatch"
SKOS_RELATED_MATCH = SKOS + "relatedMatch"
SKOS_BROAD_MATCH = SKOS + "broadMatch"
SKOS_NARROW_MATCH = SKOS + "narrowMatch"

DCTERMS_TITLE = DCTERMS + "title"
DCTERMS_DESCRIPTION = DCTERMS + "description"
DCTERMS_CREATOR = DCTERMS + "creator"
DCTERMS_CONTRIBUTOR = DCTERMS + "contributor"
DCTERMS_DATE = DCTERMS + "date"

XSD_STRING = XSD + "string"
XSD_INTEGER = XSD + "integer"
XSD_NON_NEGATIVE_INTEGER = XSD + "nonNegativeInteger"
XSD_DATETIME = XSD + "dateTime"

STANDARD_PREFIXES = {
    "owl": OWL,
    "rdf": RDF,
    "rdfs": RDFS,
    "xsd": XSD,
    "skos": SKOS,
    "dc": DC,
    "dcterms": DCTERMS,
}

# ontology_manager.py:29-42
XSD_DATATYPES = {
    name: XSD + name
    for name in (
        "string", "integer", "float", "double", "boolean", "date",
        "dateTime", "time", "decimal", "anyURI", "nonNegativeInteger",
        "positiveInteger",
    )
}

# ontology_manager.py:45-55 — note exactCardinality maps to owl:cardinality
RESTRICTION_TYPES = {
    "someValuesFrom": OWL + "someValuesFrom",
    "allValuesFrom": OWL + "allValuesFrom",
    "hasValue": OWL + "hasValue",
    "minCardinality": OWL + "minCardinality",
    "maxCardinality": OWL + "maxCardinality",
    "exactCardinality": OWL + "cardinality",
    "minQualifiedCardinality": OWL + "minQualifiedCardinality",
    "maxQualifiedCardinality": OWL + "maxQualifiedCardinality",
    "qualifiedCardinality": OWL + "qualifiedCardinality",
}

# ontology_manager.py:1211-1227
ANNOTATION_PREDICATES = {
    "label": RDFS_LABEL,
    "comment": RDFS_COMMENT,
    "seeAlso": RDFS_SEEALSO,
    "isDefinedBy": RDFS_ISDEFINEDBY,
    "prefLabel": SKOS_PREF_LABEL,
    "altLabel": SKOS_ALT_LABEL,
    "definition": SKOS_DEFINITION,
    "example": SKOS_EXAMPLE,
    "note": SKOS_NOTE,
    "title": DCTERMS_TITLE,
    "description": DCTERMS_DESCRIPTION,
    "creator": DCTERMS_CREATOR,
    "contributor": DCTERMS_CONTRIBUTOR,
    "date": DCTERMS_DATE,
    "deprecated": OWL_DEPRECATED,
}

# ontology_manager.py:1722-1740
CLASS_RELATIONS = {
    "subClassOf": RDFS_SUBCLASSOF,
    "equivalentClass": OWL_EQUIVALENT_CLASS,
    "disjointWith": OWL_DISJOINT_WITH,
}
PROPERTY_RELATIONS = {
    "subPropertyOf": RDFS_SUBPROPERTYOF,
    "equivalentProperty": OWL_EQUIVALENT_PROPERTY,
    "inverseOf": OWL_INVERSE_OF,
    "propertyDisjointWith": OWL_PROPERTY_DISJOINT_WITH,
}
INDIVIDUAL_RELATIONS = {
    "sameAs": OWL_SAME_AS,
    "differentFrom": OWL_DIFFERENT_FROM,
}

# SKOS concept relation vocabulary (add_concept_relation,
# ontology_manager.py:1575-1596)
SKOS_RELATIONS = {
    "broader": SKOS_BROADER,
    "narrower": SKOS_NARROWER,
    "related": SKOS_RELATED,
    "closeMatch": SKOS_CLOSE_MATCH,
    "exactMatch": SKOS_EXACT_MATCH,
    "relatedMatch": SKOS_RELATED_MATCH,
    "broadMatch": SKOS_BROAD_MATCH,
    "narrowMatch": SKOS_NARROW_MATCH,
}
# ontology_manager.py:1378-1383
SKOS_INVERSES = {
    SKOS_BROADER: SKOS_NARROWER,
    SKOS_NARROWER: SKOS_BROADER,
}
SKOS_SYMMETRIC = {SKOS_RELATED, SKOS_CLOSE_MATCH, SKOS_EXACT_MATCH, SKOS_RELATED_MATCH}

# Predicates excluded from annotation listings (ontology_manager.py:1249-1258)
STRUCTURAL_PREDICATES = {
    RDF_TYPE, RDFS_SUBCLASSOF, RDFS_SUBPROPERTYOF, RDFS_DOMAIN, RDFS_RANGE,
    OWL_EQUIVALENT_CLASS, OWL_EQUIVALENT_PROPERTY, OWL_DISJOINT_WITH,
    OWL_INVERSE_OF, OWL_PROPERTY_CHAIN_AXIOM,
    OWL_ON_PROPERTY, OWL + "someValuesFrom", OWL + "allValuesFrom",
    OWL + "hasValue", OWL + "minCardinality", OWL + "maxCardinality",
    OWL + "cardinality", OWL_UNION_OF, OWL_INTERSECTION_OF,
    OWL_COMPLEMENT_OF, OWL_ONE_OF, OWL_IMPORTS,
}

# Merge-overwrite / conflict-detection predicate set
# (ontology_manager.py:2075-2078, 2141-2144)
CONFLICT_PREDICATES = {
    RDFS_LABEL, RDFS_DOMAIN, RDFS_RANGE, RDFS_COMMENT,
    OWL_VERSION_IRI, DCTERMS_CREATOR,
}

# domain/range fallbacks (ontology_manager.py:13-17)
DOMAIN_INCLUDES = (SCHEMA + "domainIncludes", GIST + "domainIncludes")
RANGE_INCLUDES = (SCHEMA + "rangeIncludes", GIST + "rangeIncludes")

URI, BNODE, LITERAL = "uri", "bnode", "literal"


class Triple(NamedTuple):
    """One triple row; the full 6-tuple is the identity/dedup key."""

    subject: str
    predicate: str
    object: str
    object_kind: str = URI
    lang: str = ""
    datatype: str = ""


def uri_triple(s: str, p: str, o: str) -> Triple:
    return Triple(s, p, o, URI, "", "")


def lit_triple(s: str, p: str, value: str, lang: str = "", datatype: str = "") -> Triple:
    return Triple(s, p, str(value), LITERAL, lang or "", datatype or "")


def bnode_triple(s: str, p: str, bnode_id: str) -> Triple:
    return Triple(s, p, bnode_id, BNODE, "", "")


def mint_uri(base_uri: str, name: str) -> str:
    """URI from local name; http(s) strings pass through
    (ontology_manager.py:288-292)."""
    if name.startswith("http://") or name.startswith("https://"):
        return name
    return base_uri + name


def local_name(uri: str) -> str:
    """Split on last '#' else last '/' (ontology_manager.py:294-299)."""
    if "#" in uri:
        return uri.rsplit("#", 1)[-1]
    return uri.rsplit("/", 1)[-1]


def stable_bnode(*parts: object) -> str:
    """Deterministic bnode id from content, so retried/resumed tasks emit
    byte-identical rows (SURVEY.md §1.3; reference BNode() is random)."""
    h = hashlib.sha1("\x1f".join(str(p) for p in parts).encode("utf-8")).hexdigest()
    return "_:" + h[:16]


def is_bnode(term: str) -> bool:
    return term.startswith("_:")


def resolve_datatype_range(base_uri: str, range_: str) -> str:
    """Data-property range resolution with fallback to xsd:string
    (ontology_manager.py:795-797)."""
    return XSD_DATATYPES.get(range_, XSD_STRING)


def rdf_list_triples(head_owner: str, role: str, members: Iterable[tuple[str, str]]):
    """Encode an ordered RDF collection as rdf:first/rdf:rest cons cells.

    ``members`` is a list of (value, kind) pairs.  Returns (head_id,
    triples); head is rdf:nil for an empty list.  Cell bnode ids are
    content-hashed from (owner, role, index, members) for determinism.
    """
    members = list(members)
    if not members:
        return RDF_NIL, []
    triples: list[Triple] = []
    ids = [stable_bnode(head_owner, role, i, *[m[0] for m in members]) for i in range(len(members))]
    for i, (value, kind) in enumerate(members):
        cell = ids[i]
        triples.append(Triple(cell, RDF_FIRST, value, kind, "", ""))
        if i + 1 < len(members):
            triples.append(Triple(cell, RDF_REST, ids[i + 1], BNODE, "", ""))
        else:
            triples.append(Triple(cell, RDF_REST, RDF_NIL, URI, "", ""))
    return ids[0], triples


def walk_rdf_list(head: str, first_map: dict, rest_map: dict) -> list:
    """Decode an rdf:first/rdf:rest chain into a member list.

    ``first_map``/``rest_map`` map cell-id -> (value, kind) / next cell.
    """
    out = []
    node = head
    seen = set()
    while node and node != RDF_NIL and node not in seen:
        seen.add(node)
        if node in first_map:
            out.append(first_map[node])
        node = rest_map.get(node)
    return out


def pool_size(frac: float = 0.25, cap: int = 8, floor: int = 1) -> int:
    """Actor-pool size adapted to the Ray session: a fraction of the
    cluster CPUs, capped, and NEVER the whole node — a pool that
    reserves every CPU starves task operators (read/shuffle/write) and
    the pipeline crawls."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(floor, min(cap, int(cpus * frac), max(1, cpus - 2)))


def pool_spec(frac: float = 0.25, cap: int = 8) -> tuple:
    """AUTOSCALING actor-pool spec ``(1, pool_size())`` for stages
    that run as legs of a multi-pool union DAG.  Fixed pools start
    every actor up front, so K pools in one DAG pin K*pool_size CPUs
    and — on a small session (e.g. the 8-CPU correctness harness) —
    can starve the task operators (ReadParquet, shuffles) of every
    CPU and deadlock the stream.  An autoscaling pool needs only one
    CPU to make progress and grows under demand, so the DAG always
    drains.  Single-pool hot pipelines keep fixed ``pool_size()``
    (no ramp-up)."""
    return (1, pool_size(frac=frac, cap=cap))
