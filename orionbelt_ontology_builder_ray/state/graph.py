"""Driver-side in-memory triple store with reference operator parity.

This is the schema-plane engine: seed ontologies, templates, merge /
diff / validation / reasoning over *schema-sized* graphs (10^2-10^5
triples).  The data plane — 10^12-turn triple extraction — runs on Ray
Data (see ``stages/`` and ``pipelines/``); small graphs built here are
broadcast into those stages via ``ray.put``.

Semantics reproduce /root/reference/ontology_manager.py (cited per
method); the implementation is original (columnar 6-tuple rows, shared
emission rulebook in ``functions.emit``).
"""

from __future__ import annotations

from collections import Counter, defaultdict
from typing import Any, Dict, Iterable, Iterator, List, Optional, Sequence, Set

from ..functions import emit
from ..functions.terms import (
    CONFLICT_PREDICATES, DCTERMS_CREATOR, DOMAIN_INCLUDES, LITERAL,
    OWL_CLASS, OWL_DATATYPE_PROPERTY, OWL_DISJOINT_WITH, OWL_EQUIVALENT_CLASS,
    OWL_EQUIVALENT_PROPERTY, OWL_FUNCTIONAL, OWL_IMPORTS, OWL_INVERSE_OF,
    OWL_NAMED_INDIVIDUAL, OWL_OBJECT_PROPERTY, OWL_ONTOLOGY, OWL_RESTRICTION,
    OWL_ON_CLASS, OWL_ON_PROPERTY, OWL_SAME_AS, OWL_VERSION_IRI,
    RANGE_INCLUDES, RDF_FIRST,
    RDF_NIL, RDF_REST, RDF_TYPE, RDFS_COMMENT, RDFS_DOMAIN, RDFS_LABEL,
    RDFS_RANGE, RDFS_SUBCLASSOF, RDFS_SUBPROPERTYOF, RESTRICTION_TYPES,
    SKOS_ALT_LABEL, SKOS_BROADER, SKOS_CONCEPT, SKOS_CONCEPT_SCHEME,
    SKOS_DEFINITION, SKOS_IN_SCHEME, SKOS_INVERSES, SKOS_NARROWER,
    SKOS_PREF_LABEL, SKOS_RELATED, SKOS_RELATIONS, SKOS_SYMMETRIC,
    SKOS_TOP_CONCEPT_OF, STANDARD_PREFIXES, URI, XSD_DATATYPES, Triple,
    is_bnode, lit_triple, local_name, mint_uri, uri_triple, walk_rdf_list,
)

_UNSET = object()

IMPORT_REPLACE = "replace"
IMPORT_MERGE = "merge"
IMPORT_MERGE_OVERWRITE = "merge_overwrite"

# Characteristic flag -> owl type URI (add_object_property, om:748-785)
_CHARACTERISTICS = {name: uri for name, uri in emit._CHARACTERISTIC_TYPES}

_OWL = "http://www.w3.org/2002/07/owl#"


class TripleStore:
    """A set of 6-tuple triple rows with the reference's operator surface.

    rdflib ``Graph`` set semantics: ``add`` is idempotent; literal
    identity includes lang and datatype (om:1330-1367).
    """

    def __init__(self, base_uri: str = "http://example.org/ontology#"):
        self.rows: Set[Triple] = set()
        self.base_uri = base_uri
        self.prefixes: Dict[str, str] = dict(STANDARD_PREFIXES)
        self.prefixes[""] = base_uri
        self.loaded_prefixes: Dict[str, str] = {}
        # om:74-75 ontology declaration
        self.ontology_uri = base_uri.rstrip("#").rstrip("/")
        self.add(uri_triple(self.ontology_uri, RDF_TYPE, OWL_ONTOLOGY))

    # ------------------------------------------------------------------
    # core set operations
    # ------------------------------------------------------------------

    def add(self, triple: Triple) -> None:
        self.rows.add(triple)

    def add_all(self, triples: Iterable[Triple]) -> None:
        self.rows.update(triples)

    def discard(self, triple: Triple) -> None:
        self.rows.discard(triple)

    def remove_pattern(self, s: Optional[str] = None, p: Optional[str] = None,
                       o: Optional[str] = None) -> int:
        """Remove all rows matching the (s, p, o) wildcard pattern; ``o``
        matches the object column regardless of kind/lang/datatype."""
        victims = [t for t in self.rows
                   if (s is None or t.subject == s)
                   and (p is None or t.predicate == p)
                   and (o is None or t.object == o)]
        for t in victims:
            self.rows.discard(t)
        return len(victims)

    def __len__(self) -> int:
        return len(self.rows)

    def __iter__(self) -> Iterator[Triple]:
        return iter(self.rows)

    def __contains__(self, triple: Triple) -> bool:
        return triple in self.rows

    def has(self, s: str, p: str, o: str) -> bool:
        """URI-object membership probe."""
        return Triple(s, p, o, URI, "", "") in self.rows

    def match(self, s: Optional[str] = None, p: Optional[str] = None,
              o: Optional[str] = None) -> List[Triple]:
        return [t for t in self.rows
                if (s is None or t.subject == s)
                and (p is None or t.predicate == p)
                and (o is None or t.object == o)]

    def subjects(self, p: Optional[str] = None, o: Optional[str] = None) -> List[str]:
        seen, out = set(), []
        for t in self.match(None, p, o):
            if t.subject not in seen:
                seen.add(t.subject)
                out.append(t.subject)
        return out

    def objects(self, s: Optional[str] = None, p: Optional[str] = None) -> List[str]:
        return [t.object for t in self.match(s, p, None)]

    def value(self, s: str, p: str) -> Optional[str]:
        for t in self.rows:
            if t.subject == s and t.predicate == p:
                return t.object
        return None

    def value_row(self, s: str, p: str) -> Optional[Triple]:
        for t in self.rows:
            if t.subject == s and t.predicate == p:
                return t
        return None

    # ------------------------------------------------------------------
    # uri helpers
    # ------------------------------------------------------------------

    def uri(self, name: str) -> str:
        return mint_uri(self.base_uri, name)

    # ------------------------------------------------------------------
    # prefixes (om:117-236)
    # ------------------------------------------------------------------

    def add_prefix(self, prefix: str, namespace: str) -> bool:
        if prefix in STANDARD_PREFIXES:
            return False
        self.prefixes[prefix] = namespace
        return True

    def remove_prefix(self, prefix: str) -> bool:
        """om:164-176 — standard prefixes are protected."""
        if prefix in STANDARD_PREFIXES or prefix not in self.prefixes:
            return False
        del self.prefixes[prefix]
        self.loaded_prefixes.pop(prefix, None)
        return True

    def get_prefixes(self) -> List[Dict[str, str]]:
        """om:119-158 — merged bindings classified by source."""
        out = []
        for prefix, ns in {**self.prefixes, **self.loaded_prefixes}.items():
            source = ("standard" if prefix in STANDARD_PREFIXES
                      else "default" if prefix == "" else "custom")
            out.append({"prefix": prefix, "namespace": ns, "source": source})
        out.sort(key=lambda r: (r["source"] != "standard", r["prefix"]))
        return out

    def prefix_for_uri(self, uri: str) -> Optional[str]:
        """First matching binding (om:1322-1328)."""
        for prefix, ns in {**self.prefixes, **self.loaded_prefixes}.items():
            if uri.startswith(ns):
                return f"{prefix}:{uri[len(ns):]}"
        return None

    def set_base_uri(self, new_base: str) -> None:
        """om:237-286 — rewrite the ontology URI and every URI under the
        old base, in subject and object position (predicates are NOT
        rewritten, matching the reference)."""
        if not new_base:
            return
        if not new_base.endswith("#") and not new_base.endswith("/"):
            new_base += "#"
        old_base = self.base_uri
        if old_base == new_base:
            return
        new_ont = new_base.rstrip("#").rstrip("/")
        rewritten = set()
        for t in self.rows:
            s, o = t.subject, t.object
            if s == self.ontology_uri:
                s = new_ont
            elif s.startswith(old_base):
                s = new_base + s[len(old_base):]
            if t.object_kind == URI:
                if o == self.ontology_uri:
                    o = new_ont
                elif o.startswith(old_base):
                    o = new_base + o[len(old_base):]
            rewritten.add(Triple(s, t.predicate, o, t.object_kind, t.lang, t.datatype))
        self.rows = rewritten
        self.base_uri = new_base
        self.ontology_uri = new_ont
        self.prefixes[""] = new_base

    # ------------------------------------------------------------------
    # ontology metadata (om:77-114)
    # ------------------------------------------------------------------

    def set_ontology_metadata(self, label=_UNSET, comment=_UNSET,
                              creator=_UNSET, version_iri=_UNSET) -> None:
        for value, pred in ((label, RDFS_LABEL), (comment, RDFS_COMMENT),
                            (creator, DCTERMS_CREATOR)):
            if value is _UNSET:
                continue
            self.remove_pattern(self.ontology_uri, pred, None)
            if value:
                self.add(lit_triple(self.ontology_uri, pred, value))
        if version_iri is not _UNSET:
            self.remove_pattern(self.ontology_uri, OWL_VERSION_IRI, None)
            if version_iri:
                self.add(uri_triple(self.ontology_uri, OWL_VERSION_IRI, version_iri))

    def get_ontology_metadata(self) -> Dict[str, str]:
        return {
            "label": self.value(self.ontology_uri, RDFS_LABEL) or "",
            "comment": self.value(self.ontology_uri, RDFS_COMMENT) or "",
            "creator": self.value(self.ontology_uri, DCTERMS_CREATOR) or "",
            "version_iri": self.value(self.ontology_uri, OWL_VERSION_IRI) or "",
        }

    def add_import(self, import_uri: str) -> None:
        self.add_all(emit.add_import(self.ontology_uri, import_uri))

    def remove_import(self, import_uri: str) -> None:
        self.remove_pattern(self.ontology_uri, OWL_IMPORTS, import_uri)

    def get_imports(self) -> List[str]:
        return self.objects(self.ontology_uri, OWL_IMPORTS)

    # ------------------------------------------------------------------
    # add operators — delegate to the shared emission rulebook
    # ------------------------------------------------------------------

    def add_class(self, name, parent=None, label=None, comment=None) -> str:
        self.add_all(emit.add_class(self.base_uri, name, parent, label, comment))
        return self.uri(name)

    def add_object_property(self, name, domain=None, range_=None, label=None,
                            comment=None, inverse_of=None, **flags) -> str:
        self.add_all(emit.add_object_property(
            self.base_uri, name, domain, range_, label, comment, inverse_of, **flags))
        return self.uri(name)

    def add_data_property(self, name, domain=None, range_="string", label=None,
                          comment=None, functional=False) -> str:
        self.add_all(emit.add_data_property(
            self.base_uri, name, domain, range_, label, comment, functional))
        return self.uri(name)

    def add_individual(self, name, class_name, label=None, comment=None) -> str:
        self.add_all(emit.add_individual(self.base_uri, name, class_name, label, comment))
        return self.uri(name)

    def add_individual_property(self, individual, property_name, value,
                                is_object_property=True) -> None:
        self.add_all(emit.add_individual_property(
            self.base_uri, individual, property_name, value, is_object_property))

    def add_annotation(self, subject, predicate, value, lang=None) -> None:
        self.add_all(emit.add_annotation(self.base_uri, subject, predicate, value, lang))

    def add_concept_scheme(self, name, label=None, comment=None) -> str:
        self.add_all(emit.add_concept_scheme(self.base_uri, name, label, comment))
        return self.uri(name)

    def add_concept(self, name, scheme=None, pref_label=None, definition=None,
                    broader=None, lang="en") -> str:
        self.add_all(emit.add_concept(
            self.base_uri, name, scheme, pref_label, definition, broader, lang))
        return self.uri(name)

    def add_concept_relation(self, c1, relation, c2) -> None:
        self.add_all(emit.add_concept_relation(self.base_uri, c1, relation, c2))

    def add_class_relation(self, c1, relation, c2) -> None:
        self.add_all(emit.add_class_relation(self.base_uri, c1, relation, c2))

    def add_property_relation(self, p1, relation, p2) -> None:
        self.add_all(emit.add_property_relation(self.base_uri, p1, relation, p2))

    def add_individual_relation(self, i1, relation, i2) -> None:
        self.add_all(emit.add_individual_relation(self.base_uri, i1, relation, i2))

    def add_restriction(self, class_name, property_name, restriction_type,
                        value, on_class=None) -> str:
        bnode, triples = emit.add_restriction(
            self.base_uri, class_name, property_name, restriction_type, value, on_class)
        self.add_all(triples)
        return bnode

    def add_property_chain(self, property_name, chain) -> None:
        self.add_all(emit.add_property_chain(self.base_uri, property_name, chain))

    def add_class_expression(self, class_name, expression_type, members) -> None:
        self.add_all(emit.add_class_expression(self.base_uri, class_name,
                                               expression_type, members))

    def add_all_different(self, individuals) -> str:
        bnode, triples = emit.add_all_different(self.base_uri, individuals)
        self.add_all(triples)
        return bnode

    def add_has_key(self, class_name, properties) -> None:
        self.add_all(emit.add_has_key(self.base_uri, class_name, properties))

    def add_disjoint_union(self, class_name, classes) -> None:
        self.add_all(emit.add_disjoint_union(self.base_uri, class_name, classes))

    # ------------------------------------------------------------------
    # updates (om:320-339, 808-835, 1004-1023, 1418-1436, 1541-1573)
    # ------------------------------------------------------------------

    def update_class(self, name, new_label=None, new_comment=None,
                     new_parent=None, remove_parent=None) -> None:
        """None=keep, ''=clear, value=replace (remove-all-then-add)."""
        c = self.uri(name)
        if new_label is not None:
            self.remove_pattern(c, RDFS_LABEL, None)
            if new_label:
                self.add(lit_triple(c, RDFS_LABEL, new_label))
        if new_comment is not None:
            self.remove_pattern(c, RDFS_COMMENT, None)
            if new_comment:
                self.add(lit_triple(c, RDFS_COMMENT, new_comment))
        if remove_parent:
            self.remove_pattern(c, RDFS_SUBCLASSOF, self.uri(remove_parent))
        if new_parent:
            self.add(uri_triple(c, RDFS_SUBCLASSOF, self.uri(new_parent)))

    def update_property(self, name, new_label=None, new_comment=None,
                        new_domain=None, new_range=None) -> None:
        """om:808-835 — range dispatches datatype-vs-class through the
        XSD whitelist."""
        p = self.uri(name)
        if new_label is not None:
            self.remove_pattern(p, RDFS_LABEL, None)
            if new_label:
                self.add(lit_triple(p, RDFS_LABEL, new_label))
        if new_comment is not None:
            self.remove_pattern(p, RDFS_COMMENT, None)
            if new_comment:
                self.add(lit_triple(p, RDFS_COMMENT, new_comment))
        if new_domain is not None:
            self.remove_pattern(p, RDFS_DOMAIN, None)
            if new_domain:
                self.add(uri_triple(p, RDFS_DOMAIN, self.uri(new_domain)))
        if new_range is not None:
            self.remove_pattern(p, RDFS_RANGE, None)
            if new_range:
                if new_range in XSD_DATATYPES:
                    self.add(uri_triple(p, RDFS_RANGE, XSD_DATATYPES[new_range]))
                else:
                    self.add(uri_triple(p, RDFS_RANGE, self.uri(new_range)))

    def update_individual(self, name, new_label=None, new_comment=None,
                          add_class=None, remove_class=None) -> None:
        i = self.uri(name)
        if new_label is not None:
            self.remove_pattern(i, RDFS_LABEL, None)
            if new_label:
                self.add(lit_triple(i, RDFS_LABEL, new_label))
        if new_comment is not None:
            self.remove_pattern(i, RDFS_COMMENT, None)
            if new_comment:
                self.add(lit_triple(i, RDFS_COMMENT, new_comment))
        if remove_class:
            self.remove_pattern(i, RDF_TYPE, self.uri(remove_class))
        if add_class:
            self.add(uri_triple(i, RDF_TYPE, self.uri(add_class)))

    def update_concept(self, name, pref_label=_UNSET, definition=_UNSET,
                       broader=_UNSET, lang="en") -> None:
        """om:1541-1573 — _UNSET leaves unchanged; broader change removes
        BOTH directions then re-adds both."""
        c = self.uri(name)
        if pref_label is not _UNSET:
            self.remove_pattern(c, SKOS_PREF_LABEL, None)
            if pref_label:
                self.add(lit_triple(c, SKOS_PREF_LABEL, pref_label, lang=lang))
        if definition is not _UNSET:
            self.remove_pattern(c, SKOS_DEFINITION, None)
            if definition:
                self.add(lit_triple(c, SKOS_DEFINITION, definition, lang=lang))
        if broader is not _UNSET:
            for old in list(self.objects(c, SKOS_BROADER)):
                self.remove_pattern(c, SKOS_BROADER, old)
                self.remove_pattern(old, SKOS_NARROWER, c)
            if broader:
                b = self.uri(broader)
                self.add(uri_triple(c, SKOS_BROADER, b))
                self.add(uri_triple(b, SKOS_NARROWER, c))

    def update_concept_scheme(self, name, label=_UNSET, comment=_UNSET) -> None:
        s = self.uri(name)
        if label is not _UNSET:
            self.remove_pattern(s, RDFS_LABEL, None)
            if label:
                self.add(lit_triple(s, RDFS_LABEL, label))
        if comment is not _UNSET:
            self.remove_pattern(s, RDFS_COMMENT, None)
            if comment:
                self.add(lit_triple(s, RDFS_COMMENT, comment))

    # ------------------------------------------------------------------
    # renames (om:341-369, 837-870, 1025-1053)
    # ------------------------------------------------------------------

    def _rename(self, old_uri: str, new_uri: str, include_predicate: bool) -> None:
        rewritten = set()
        for t in self.rows:
            s = new_uri if t.subject == old_uri else t.subject
            p = new_uri if include_predicate and t.predicate == old_uri else t.predicate
            o = t.object
            if t.object_kind == URI and o == old_uri:
                o = new_uri
            rewritten.add(Triple(s, p, o, t.object_kind, t.lang, t.datatype))
        self.rows = rewritten

    def rename_class(self, old_name: str, new_name: str) -> bool:
        if old_name == new_name:
            return True
        new_uri = self.uri(new_name)
        if self.has(new_uri, RDF_TYPE, OWL_CLASS):
            return False
        self._rename(self.uri(old_name), new_uri, include_predicate=False)
        return True

    def rename_property(self, old_name: str, new_name: str) -> bool:
        """om:837-870 — also rewrites predicate position."""
        if old_name == new_name:
            return True
        new_uri = self.uri(new_name)
        if (self.has(new_uri, RDF_TYPE, OWL_OBJECT_PROPERTY)
                or self.has(new_uri, RDF_TYPE, OWL_DATATYPE_PROPERTY)):
            return False
        self._rename(self.uri(old_name), new_uri, include_predicate=True)
        return True

    def rename_individual(self, old_name: str, new_name: str) -> bool:
        if old_name == new_name:
            return True
        new_uri = self.uri(new_name)
        if self.has(new_uri, RDF_TYPE, OWL_NAMED_INDIVIDUAL):
            return False
        self._rename(self.uri(old_name), new_uri, include_predicate=False)
        return True

    # ------------------------------------------------------------------
    # deletes (om:480-485, 872-877, 1055-1059, 1180-1195, 1330-1367,
    #          1438-1448, 1598-1616, 1750-1820)
    # ------------------------------------------------------------------

    def delete_class(self, name: str) -> None:
        c = self.uri(name)
        self.remove_pattern(c, None, None)
        self.remove_pattern(None, None, c)

    def delete_property(self, name: str) -> None:
        p = self.uri(name)
        self.remove_pattern(p, None, None)
        self.remove_pattern(None, p, None)
        self.remove_pattern(None, None, p)

    def delete_individual(self, name: str) -> None:
        i = self.uri(name)
        self.remove_pattern(i, None, None)
        self.remove_pattern(None, None, i)

    def delete_concept(self, name: str) -> None:
        c = self.uri(name)
        for b in list(self.objects(c, SKOS_BROADER)):
            self.remove_pattern(b, SKOS_NARROWER, c)
        for n in list(self.objects(c, SKOS_NARROWER)):
            self.remove_pattern(n, SKOS_BROADER, c)
        for r in list(self.objects(c, SKOS_RELATED)):
            self.remove_pattern(r, SKOS_RELATED, c)
        self.remove_pattern(c, None, None)
        self.remove_pattern(None, None, c)

    def delete_concept_scheme(self, name: str) -> None:
        """om:1438-1448 — resolve by local-name scan over schemes."""
        target = None
        for s in self.subjects(RDF_TYPE, SKOS_CONCEPT_SCHEME):
            if local_name(s) == name or s == name:
                target = s
                break
        if target is None:
            return
        self.remove_pattern(target, None, None)
        self.remove_pattern(None, SKOS_IN_SCHEME, target)
        self.remove_pattern(None, None, target)

    def delete_restriction(self, class_name: str, property_name: str,
                           restriction_type: str) -> bool:
        """om:1180-1195 — locate the bnode by (onProperty, applied class,
        type), unlink and remove it."""
        c = self.uri(class_name)
        p = self.uri(property_name)
        pred = RESTRICTION_TYPES.get(restriction_type)
        for r in self.subjects(RDF_TYPE, OWL_RESTRICTION):
            if not self.has(r, OWL_ON_PROPERTY, p):
                continue
            if not any(t.subject == c and t.predicate == RDFS_SUBCLASSOF
                       and t.object == r for t in self.rows):
                continue
            if pred and not any(t.subject == r and t.predicate == pred
                                for t in self.rows):
                continue
            self.remove_pattern(c, RDFS_SUBCLASSOF, r)
            self.remove_pattern(r, None, None)
            return True
        return False

    def delete_annotation(self, subject: str, predicate: str,
                          value: Optional[str] = None,
                          lang: Optional[str] = None,
                          datatype: Optional[str] = None) -> int:
        """om:1330-1367 — exact-literal match when lang/datatype given,
        else string-value match; value=None wipes the predicate."""
        s = self.uri(subject)
        if predicate.startswith("http://") or predicate.startswith("https://"):
            p = predicate
        else:
            from ..functions.terms import ANNOTATION_PREDICATES
            p = ANNOTATION_PREDICATES.get(predicate, self.uri(predicate))
        if value is None:
            return self.remove_pattern(s, p, None)
        victims = []
        for t in self.rows:
            if t.subject != s or t.predicate != p or t.object_kind != LITERAL:
                continue
            if lang is not None or datatype is not None:
                if (t.object == value and t.lang == (lang or "")
                        and t.datatype == (datatype or "")):
                    victims.append(t)
            elif t.object == value:
                victims.append(t)
        for t in victims:
            self.rows.discard(t)
        return len(victims)

    def remove_class_relation(self, c1, relation, c2) -> None:
        for t in emit.add_class_relation(self.base_uri, c1, relation, c2):
            self.discard(t)

    def remove_property_relation(self, p1, relation, p2) -> None:
        for t in emit.add_property_relation(self.base_uri, p1, relation, p2):
            self.discard(t)

    def remove_individual_relation(self, i1, relation, i2) -> None:
        for t in emit.add_individual_relation(self.base_uri, i1, relation, i2):
            self.discard(t)

    def remove_concept_relation(self, c1, relation, c2) -> None:
        """Removes the asserted row plus its auto-managed mirror."""
        for t in emit.add_concept_relation(self.base_uri, c1, relation, c2):
            self.discard(t)

    # ------------------------------------------------------------------
    # bulk operations (om:532-744)
    # ------------------------------------------------------------------

    @staticmethod
    def parse_bulk_text(text: str, columns: Sequence[str]) -> List[Dict[str, str]]:
        """om:532-567 — CSV-ish lines, auto-skip a header containing
        'name', pad missing columns, drop empty names."""
        rows = []
        lines = [ln for ln in text.splitlines() if ln.strip()]
        if lines and "name" in lines[0].lower() and "," in lines[0]:
            first_cells = [c.strip().lower() for c in lines[0].split(",")]
            if "name" in first_cells:
                lines = lines[1:]
        for ln in lines:
            cells = [c.strip() for c in ln.split(",")]
            cells += [""] * (len(columns) - len(cells))
            entry = dict(zip(columns, cells))
            if entry.get("name"):
                rows.append(entry)
            elif not entry.get("name") and any(cells):
                rows.append(entry)  # kept so callers can report the error
        return rows

    def bulk_add_classes(self, entries: List[Dict[str, str]]) -> Dict[str, list]:
        """om:569-597 — skip existing, error empty names."""
        existing = {local_name(c) for c in self.subjects(RDF_TYPE, OWL_CLASS)}
        created, errors, skipped = [], [], []
        for e in entries:
            name = (e.get("name") or "").strip()
            if not name:
                errors.append({"entry": e, "error": "Empty name"})
            elif name in existing:
                skipped.append(name)
            else:
                self.add_class(name, e.get("parent") or None,
                               e.get("label") or None, e.get("comment") or None)
                existing.add(name)
                created.append(name)
        return {"created": created, "errors": errors, "skipped": skipped}

    def bulk_add_properties(self, entries: List[Dict[str, str]],
                            property_type: str = "object") -> Dict[str, list]:
        """om:599-634"""
        type_uri = (OWL_OBJECT_PROPERTY if property_type == "object"
                    else OWL_DATATYPE_PROPERTY)
        existing = {local_name(p) for p in self.subjects(RDF_TYPE, type_uri)}
        created, errors, skipped = [], [], []
        for e in entries:
            name = (e.get("name") or "").strip()
            if not name:
                errors.append({"entry": e, "error": "Empty name"})
            elif name in existing:
                skipped.append(name)
            else:
                if property_type == "object":
                    self.add_object_property(name, e.get("domain") or None,
                                             e.get("range") or None,
                                             e.get("label") or None)
                else:
                    self.add_data_property(name, e.get("domain") or None,
                                           e.get("range") or "string",
                                           e.get("label") or None)
                existing.add(name)
                created.append(name)
        return {"created": created, "errors": errors, "skipped": skipped}

    def bulk_add_individuals(self, entries: List[Dict[str, str]]) -> Dict[str, list]:
        """om:636-668 — 'Missing class' error rule (:651-653)."""
        existing = {local_name(i) for i in self.subjects(RDF_TYPE, OWL_NAMED_INDIVIDUAL)}
        created, errors, skipped = [], [], []
        for e in entries:
            name = (e.get("name") or "").strip()
            cls = (e.get("class") or e.get("class_name") or "").strip()
            if not name:
                errors.append({"entry": e, "error": "Empty name"})
            elif not cls:
                errors.append({"entry": e, "error": "Missing class"})
            elif name in existing:
                skipped.append(name)
            else:
                self.add_individual(name, cls, e.get("label") or None)
                existing.add(name)
                created.append(name)
        return {"created": created, "errors": errors, "skipped": skipped}

    def bulk_delete_classes(self, names: Sequence[str]) -> Dict[str, list]:
        deleted, errors = [], []
        for name in names:
            if self.has(self.uri(name), RDF_TYPE, OWL_CLASS):
                self.delete_class(name)
                deleted.append(name)
            else:
                errors.append({"name": name, "error": "Not found"})
        return {"deleted": deleted, "errors": errors}

    def bulk_delete_properties(self, names: Sequence[str]) -> Dict[str, list]:
        """om:682-692 — batch property delete with per-name error
        capture (object OR datatype properties; delete_property also
        clears predicate-position rows)."""
        deleted, errors = [], []
        for name in names:
            uri = self.uri(name)
            if (self.has(uri, RDF_TYPE, OWL_OBJECT_PROPERTY)
                    or self.has(uri, RDF_TYPE, OWL_DATATYPE_PROPERTY)):
                self.delete_property(name)
                deleted.append(name)
            else:
                errors.append({"name": name, "error": "Not found"})
        return {"deleted": deleted, "errors": errors}

    def bulk_delete_individuals(self, names: Sequence[str]) -> Dict[str, list]:
        deleted, errors = [], []
        for name in names:
            if self.has(self.uri(name), RDF_TYPE, OWL_NAMED_INDIVIDUAL):
                self.delete_individual(name)
                deleted.append(name)
            else:
                errors.append({"name": name, "error": "Not found"})
        return {"deleted": deleted, "errors": errors}

    def bulk_update_annotations(self, updates: List[Dict[str, str]]) -> Dict[str, Any]:
        """om:703-744 — add/delete actions with per-row validation."""
        applied, errors = 0, []
        for u in updates:
            action = u.get("action", "add")
            subject, predicate = u.get("subject"), u.get("predicate")
            if not subject or not predicate:
                errors.append({"entry": u, "error": "Missing subject or predicate"})
                continue
            if action == "add":
                if not u.get("value"):
                    errors.append({"entry": u, "error": "Missing value"})
                    continue
                self.add_annotation(subject, predicate, u["value"], u.get("lang"))
                applied += 1
            elif action == "delete":
                self.delete_annotation(subject, predicate, u.get("value"),
                                       u.get("lang"))
                applied += 1
            else:
                errors.append({"entry": u, "error": f"Unknown action: {action}"})
        return {"applied": applied, "errors": errors}

    # ------------------------------------------------------------------
    # listings (om:487-528, 879-972, 1061-1097, 1138-1320, 1396-1539,
    #          1618-1632, 1758-1996)
    # ------------------------------------------------------------------

    def get_classes(self) -> List[Dict[str, Any]]:
        out = []
        for c in self.subjects(RDF_TYPE, OWL_CLASS):
            if is_bnode(c):
                continue
            parents = [local_name(o) for o in self.objects(c, RDFS_SUBCLASSOF)
                       if not is_bnode(o)]
            children = [local_name(s) for s in self.subjects(RDFS_SUBCLASSOF, c)
                        if not is_bnode(s)]
            out.append({
                "uri": c, "name": local_name(c),
                "label": self._lit_value(c, RDFS_LABEL),
                "comment": self._lit_value(c, RDFS_COMMENT),
                "parents": sorted(parents), "children": sorted(children),
            })
        out.sort(key=lambda r: r["name"])
        return out

    def _lit_value(self, s: str, p: str) -> str:
        v = self.value(s, p)
        return v if v is not None else ""

    def get_class_hierarchy(self) -> Dict[str, List[str]]:
        hierarchy: Dict[str, List[str]] = defaultdict(list)
        for t in self.match(None, RDFS_SUBCLASSOF, None):
            if is_bnode(t.subject) or t.object_kind != URI:
                continue
            hierarchy[local_name(t.object)].append(local_name(t.subject))
        return dict(hierarchy)

    def _coalesce(self, s: str, preds: Sequence[str]) -> str:
        for p in preds:
            v = self.value(s, p)
            if v:
                return local_name(v)
        return ""

    def get_object_properties(self) -> List[Dict[str, Any]]:
        """om:879-936 — domain/range COALESCE over rdfs + schema/gist
        Includes fallbacks; 7 characteristic flags; inverse_of."""
        out = []
        for p in self.subjects(RDF_TYPE, OWL_OBJECT_PROPERTY):
            if is_bnode(p):
                continue
            row = {
                "uri": p, "name": local_name(p),
                "label": self._lit_value(p, RDFS_LABEL),
                "comment": self._lit_value(p, RDFS_COMMENT),
                "domain": self._coalesce(p, (RDFS_DOMAIN,) + DOMAIN_INCLUDES),
                "range": self._coalesce(p, (RDFS_RANGE,) + RANGE_INCLUDES),
                "inverse_of": (local_name(self.value(p, OWL_INVERSE_OF))
                               if self.value(p, OWL_INVERSE_OF) else ""),
            }
            types = set(self.objects(p, RDF_TYPE))
            for flag, uri in _CHARACTERISTICS.items():
                row[flag] = uri in types
            out.append(row)
        out.sort(key=lambda r: r["name"])
        return out

    def get_data_properties(self) -> List[Dict[str, Any]]:
        out = []
        for p in self.subjects(RDF_TYPE, OWL_DATATYPE_PROPERTY):
            if is_bnode(p):
                continue
            out.append({
                "uri": p, "name": local_name(p),
                "label": self._lit_value(p, RDFS_LABEL),
                "comment": self._lit_value(p, RDFS_COMMENT),
                "domain": self._coalesce(p, (RDFS_DOMAIN,) + DOMAIN_INCLUDES),
                "range": self._coalesce(p, (RDFS_RANGE,)),
                "functional": _CHARACTERISTICS["functional"] in set(self.objects(p, RDF_TYPE)),
            })
        out.sort(key=lambda r: r["name"])
        return out

    def get_individuals(self) -> List[Dict[str, Any]]:
        """om:1061-1097 — classes minus owl:NamedIndividual; properties =
        all non type/label/comment predicate-objects."""
        out = []
        for i in self.subjects(RDF_TYPE, OWL_NAMED_INDIVIDUAL):
            if is_bnode(i):
                continue
            classes = [local_name(o) for o in self.objects(i, RDF_TYPE)
                       if o != OWL_NAMED_INDIVIDUAL and not is_bnode(o)]
            props = []
            for t in self.match(i, None, None):
                if t.predicate in (RDF_TYPE, RDFS_LABEL, RDFS_COMMENT):
                    continue
                props.append({
                    "property": local_name(t.predicate),
                    "value": (local_name(t.object) if t.object_kind == URI
                              else t.object),
                    "is_uri": t.object_kind == URI,
                })
            out.append({
                "uri": i, "name": local_name(i),
                "label": self._lit_value(i, RDFS_LABEL),
                "comment": self._lit_value(i, RDFS_COMMENT),
                "classes": sorted(classes),
                "properties": sorted(props, key=lambda r: (r["property"], str(r["value"]))),
            })
        out.sort(key=lambda r: r["name"])
        return out

    def get_restrictions(self, class_name: Optional[str] = None) -> List[Dict[str, Any]]:
        """om:1138-1178 — first matching of the 9 restriction predicates."""
        out = []
        for r in self.subjects(RDF_TYPE, OWL_RESTRICTION):
            prop = self.value(r, OWL_ON_PROPERTY)
            rtype, value = "", ""
            for name, pred in RESTRICTION_TYPES.items():
                v = self.value(r, pred)
                if v is not None:
                    rtype = name
                    row = self.value_row(r, pred)
                    value = local_name(v) if row.object_kind == URI else v
                    break
            on_class = self.value(r, OWL_ON_CLASS)
            applied_to = [local_name(s) for s in self.subjects(RDFS_SUBCLASSOF, r)
                          if not is_bnode(s)]
            if class_name and local_name(self.uri(class_name)) not in applied_to:
                continue
            out.append({
                "bnode": r,
                "property": local_name(prop) if prop else "",
                "type": rtype, "value": value,
                "on_class": local_name(on_class) if on_class else "",
                "applied_to": sorted(applied_to),
            })
        out.sort(key=lambda x: (x["applied_to"], x["property"], x["type"]))
        return out

    def get_annotations(self, subject: str) -> List[Dict[str, str]]:
        """om:1242-1285 — structural blacklist, prefixed predicate names."""
        from ..functions.terms import STRUCTURAL_PREDICATES
        s = self.uri(subject)
        out = []
        for t in self.match(s, None, None):
            if t.predicate in STRUCTURAL_PREDICATES:
                continue
            out.append({
                "predicate": self.prefix_for_uri(t.predicate) or t.predicate,
                "predicate_uri": t.predicate,
                "value": t.object,
                "is_literal": t.object_kind == LITERAL,
                "lang": t.lang, "datatype": t.datatype,
            })
        out.sort(key=lambda r: (r["predicate"], str(r["value"])))
        return out

    def get_used_annotation_predicates(self) -> List[str]:
        from ..functions.terms import STRUCTURAL_PREDICATES
        preds = {t.predicate for t in self.rows
                 if t.predicate not in STRUCTURAL_PREDICATES
                 and t.object_kind == LITERAL}
        return sorted(preds)

    def get_concept_schemes(self) -> List[Dict[str, Any]]:
        counts = Counter(t.object for t in self.match(None, SKOS_IN_SCHEME, None))
        out = []
        for s in self.subjects(RDF_TYPE, SKOS_CONCEPT_SCHEME):
            out.append({
                "uri": s, "name": local_name(s),
                "label": self._lit_value(s, RDFS_LABEL),
                "comment": self._lit_value(s, RDFS_COMMENT),
                "concept_count": counts.get(s, 0),
            })
        out.sort(key=lambda r: r["name"])
        return out

    def _resolve_scheme_uri(self, scheme: str) -> Optional[str]:
        """Local-name scan over schemes (om:1485-1490)."""
        for s in self.subjects(RDF_TYPE, SKOS_CONCEPT_SCHEME):
            if local_name(s) == scheme or s == scheme:
                return s
        return None

    def get_concepts(self, scheme: Optional[str] = None) -> List[Dict[str, Any]]:
        scheme_uri = self._resolve_scheme_uri(scheme) if scheme else None
        if scheme and scheme_uri is None:
            return []
        out = []
        for c in self.subjects(RDF_TYPE, SKOS_CONCEPT):
            if is_bnode(c):
                continue
            schemes = [local_name(s) for s in self.objects(c, SKOS_IN_SCHEME)]
            if scheme_uri and scheme_uri not in self.objects(c, SKOS_IN_SCHEME):
                continue
            pref_rows = [t for t in self.match(c, SKOS_PREF_LABEL, None)]
            out.append({
                "uri": c, "name": local_name(c),
                "prefLabel": pref_rows[0].object if pref_rows else "",
                "definition": self._lit_value(c, SKOS_DEFINITION),
                "altLabels": sorted(t.object for t in self.match(c, SKOS_ALT_LABEL, None)),
                "broader": sorted(local_name(o) for o in self.objects(c, SKOS_BROADER)),
                "narrower": sorted(local_name(o) for o in self.objects(c, SKOS_NARROWER)),
                "related": sorted(local_name(o) for o in self.objects(c, SKOS_RELATED)),
                "schemes": sorted(schemes),
            })
        out.sort(key=lambda r: r["name"])
        return out

    def get_concept_hierarchy(self, scheme: Optional[str] = None) -> Dict[str, List[str]]:
        """om:1618-1632 — {concept: narrower[]} including leaf keys."""
        hierarchy: Dict[str, List[str]] = {}
        for c in self.get_concepts(scheme=scheme):
            hierarchy[c["name"]] = c["narrower"]
        return hierarchy

    def _get_relations(self, preds: Dict[str, str],
                       name: Optional[str] = None) -> List[Dict[str, str]]:
        inv = {v: k for k, v in preds.items()}
        out = []
        for t in self.rows:
            if t.predicate not in inv or is_bnode(t.subject) or t.object_kind != URI:
                continue
            s, o = local_name(t.subject), local_name(t.object)
            if name and name not in (s, o):
                continue
            out.append({"subject": s, "relation": inv[t.predicate], "object": o})
        out.sort(key=lambda r: (r["subject"], r["relation"], r["object"]))
        return out

    def get_class_relations(self, name=None):
        from ..functions.terms import CLASS_RELATIONS
        return self._get_relations(CLASS_RELATIONS, name)

    def get_property_relations(self, name=None):
        from ..functions.terms import PROPERTY_RELATIONS
        return self._get_relations(PROPERTY_RELATIONS, name)

    def get_individual_relations(self, name=None):
        from ..functions.terms import INDIVIDUAL_RELATIONS
        return self._get_relations(INDIVIDUAL_RELATIONS, name)

    def _list_members(self, head: str) -> List[str]:
        first_map = {t.subject: t.object for t in self.match(None, RDF_FIRST, None)}
        rest_map = {t.subject: t.object for t in self.match(None, RDF_REST, None)}
        return walk_rdf_list(head, first_map, rest_map)

    def get_property_chains(self) -> List[Dict[str, Any]]:
        from ..functions.terms import OWL_PROPERTY_CHAIN_AXIOM
        out = []
        for t in self.match(None, OWL_PROPERTY_CHAIN_AXIOM, None):
            out.append({"property": local_name(t.subject),
                        "chain": [local_name(m) for m in self._list_members(t.object)]})
        out.sort(key=lambda r: r["property"])
        return out

    def get_class_expressions(self) -> List[Dict[str, Any]]:
        from ..functions.terms import (OWL_COMPLEMENT_OF, OWL_INTERSECTION_OF,
                                       OWL_ONE_OF, OWL_UNION_OF)
        out = []
        for etype, pred in (("unionOf", OWL_UNION_OF),
                            ("intersectionOf", OWL_INTERSECTION_OF),
                            ("oneOf", OWL_ONE_OF),
                            ("complementOf", OWL_COMPLEMENT_OF)):
            for t in self.match(None, pred, None):
                if is_bnode(t.subject):
                    continue
                members = ([local_name(t.object)] if etype == "complementOf"
                           else [local_name(m) for m in self._list_members(t.object)])
                out.append({"class": local_name(t.subject), "type": etype,
                            "members": members})
        out.sort(key=lambda r: (r["class"], r["type"]))
        return out

    def get_all_different(self) -> List[List[str]]:
        from ..functions.terms import OWL_ALL_DIFFERENT, OWL_DISTINCT_MEMBERS
        out = []
        for d in self.subjects(RDF_TYPE, OWL_ALL_DIFFERENT):
            head = self.value(d, OWL_DISTINCT_MEMBERS)
            if head:
                out.append([local_name(m) for m in self._list_members(head)])
        out.sort()
        return out

    def get_has_keys(self) -> List[Dict[str, Any]]:
        from ..functions.terms import OWL_HAS_KEY
        out = []
        for t in self.match(None, OWL_HAS_KEY, None):
            out.append({"class": local_name(t.subject),
                        "properties": [local_name(m) for m in self._list_members(t.object)]})
        out.sort(key=lambda r: r["class"])
        return out

    def get_disjoint_unions(self) -> List[Dict[str, Any]]:
        from ..functions.terms import OWL_DISJOINT_UNION_OF
        out = []
        for t in self.match(None, OWL_DISJOINT_UNION_OF, None):
            out.append({"class": local_name(t.subject),
                        "classes": [local_name(m) for m in self._list_members(t.object)]})
        out.sort(key=lambda r: r["class"])
        return out

    def get_statistics(self) -> Dict[str, int]:
        """om:2868-2901"""
        meta = len(self.match(self.ontology_uri, None, None))
        stats = {
            "classes": len(self.subjects(RDF_TYPE, OWL_CLASS)),
            "object_properties": len(self.subjects(RDF_TYPE, OWL_OBJECT_PROPERTY)),
            "data_properties": len(self.subjects(RDF_TYPE, OWL_DATATYPE_PROPERTY)),
            "individuals": len(self.subjects(RDF_TYPE, OWL_NAMED_INDIVIDUAL)),
            "restrictions": len(self.subjects(RDF_TYPE, OWL_RESTRICTION)),
            "total_triples": len(self.rows),
            "content_triples": len(self.rows) - meta,
            "concept_schemes": len(self.subjects(RDF_TYPE, SKOS_CONCEPT_SCHEME)),
            "concepts": len(self.subjects(RDF_TYPE, SKOS_CONCEPT)),
        }
        return stats

    # ------------------------------------------------------------------
    # search (om:2301-2347)
    # ------------------------------------------------------------------

    def search(self, query: str) -> List[Dict[str, str]]:
        if not query or not query.strip():
            return []
        q = query.strip().lower()
        results, seen = [], set()
        for type_uri, type_label in ((OWL_CLASS, "Class"),
                                     (OWL_OBJECT_PROPERTY, "Object Property"),
                                     (OWL_DATATYPE_PROPERTY, "Data Property"),
                                     (OWL_NAMED_INDIVIDUAL, "Individual")):
            for subj in self.subjects(RDF_TYPE, type_uri):
                if is_bnode(subj) or subj in seen:
                    continue
                seen.add(subj)
                name = local_name(subj)
                label = self._lit_value(subj, RDFS_LABEL)
                comment = self._lit_value(subj, RDFS_COMMENT)
                match_field = None
                if q in name.lower():
                    match_field = "name"
                elif q in label.lower():
                    match_field = "label"
                elif q in comment.lower():
                    match_field = "comment"
                if match_field:
                    results.append({"name": name, "type": type_label,
                                    "label": label, "match_field": match_field})
        results.sort(key=lambda r: (r["match_field"] != "name", r["name"].lower()))
        return results

    # ------------------------------------------------------------------
    # usages / delete impact (om:371-455, 2351-2396)
    # ------------------------------------------------------------------

    def get_resource_usages(self, name: str) -> Dict[str, List[Dict[str, str]]]:
        uri = self.uri(name)
        structural = {RDF_TYPE, RDFS_SUBCLASSOF, RDFS_SUBPROPERTYOF,
                      OWL_EQUIVALENT_CLASS, OWL_DISJOINT_WITH}
        outbound = [{"predicate": local_name(t.predicate),
                     "object": local_name(t.object) if t.object_kind == URI else t.object,
                     "object_type": "uri" if t.object_kind == URI else "literal"}
                    for t in self.match(uri, None, None)
                    if t.predicate not in structural]
        inbound = [{"subject": local_name(t.subject),
                    "predicate": local_name(t.predicate)}
                   for t in self.match(None, None, uri)
                   if not is_bnode(t.subject) and t.object_kind != LITERAL]
        as_predicate = [{"subject": local_name(t.subject),
                         "object": local_name(t.object) if t.object_kind == URI else t.object}
                        for t in self.match(None, uri, None)]
        return {"outbound": outbound, "inbound": inbound,
                "as_predicate": as_predicate}

    def get_delete_impact(self, name: str, resource_type: str = "class") -> Dict[str, Any]:
        uri = self.uri(name)
        impact: Dict[str, Any] = {
            "resource": name, "resource_type": resource_type,
            "direct_triples": 0, "subclasses": [], "instances": [],
            "domain_of": [], "range_of": [], "annotations": 0,
            "relations": [], "property_assertions": [],
        }
        if resource_type == "class":
            impact["subclasses"] = sorted(
                local_name(s) for s in self.subjects(RDFS_SUBCLASSOF, uri)
                if not is_bnode(s))
            impact["instances"] = sorted(
                local_name(s) for s in self.subjects(RDF_TYPE, uri)
                if not is_bnode(s) and self.has(s, RDF_TYPE, OWL_NAMED_INDIVIDUAL))
            impact["domain_of"] = sorted(
                local_name(s) for s in self.subjects(RDFS_DOMAIN, uri)
                if not is_bnode(s))
            impact["range_of"] = sorted(
                local_name(s) for s in self.subjects(RDFS_RANGE, uri)
                if not is_bnode(s))
        elif resource_type == "property":
            impact["property_assertions"] = sorted(
                f"{local_name(t.subject)} -> "
                f"{local_name(t.object) if t.object_kind == URI else t.object}"
                for t in self.match(None, uri, None) if not is_bnode(t.subject))
        elif resource_type in ("individual", "concept"):
            impact["relations"] = sorted(
                f"{local_name(t.subject)} {local_name(t.predicate)}"
                for t in self.match(None, None, uri)
                if not is_bnode(t.subject) and t.predicate != RDF_TYPE
                and t.object_kind != LITERAL)
        direct = self.match(uri, None, None)
        impact["direct_triples"] = len(direct)
        structural = {RDF_TYPE, RDFS_SUBCLASSOF, RDFS_SUBPROPERTYOF, RDFS_DOMAIN,
                      RDFS_RANGE, OWL_EQUIVALENT_CLASS, OWL_DISJOINT_WITH,
                      OWL_INVERSE_OF}
        impact["annotations"] = sum(1 for t in direct
                                    if t.predicate not in structural
                                    and t.object_kind == LITERAL)
        ref_count = len([t for t in self.match(None, None, uri)
                         if t.object_kind != LITERAL])
        pred_count = (len(self.match(None, uri, None))
                      if resource_type == "property" else 0)
        impact["total_triples"] = impact["direct_triples"] + ref_count + pred_count
        return impact

    # ------------------------------------------------------------------
    # merge / conflicts / diff (om:2068-2180, 2412-2486)
    # ------------------------------------------------------------------

    def detect_conflicts(self, other: "TripleStore") -> List[Dict[str, Any]]:
        conflicts, seen = [], set()
        for t in sorted(other.rows):
            if is_bnode(t.subject) or t.predicate not in CONFLICT_PREDICATES:
                continue
            current = [r for r in self.rows
                       if r.subject == t.subject and r.predicate == t.predicate]
            if not current:
                continue
            current_ids = {(r.object, r.object_kind, r.lang, r.datatype) for r in current}
            if (t.object, t.object_kind, t.lang, t.datatype) in current_ids:
                continue
            key = (t.subject, t.predicate)
            if key in seen:
                continue
            seen.add(key)
            conflicts.append({
                "subject": local_name(t.subject),
                "predicate": local_name(t.predicate),
                "current_values": sorted(
                    local_name(r.object) if r.object_kind == URI else r.object
                    for r in current),
                "incoming_value": (local_name(t.object) if t.object_kind == URI
                                   else t.object),
            })
        return conflicts

    def merge_from(self, other: "TripleStore",
                   strategy: str = IMPORT_MERGE) -> Dict[str, Any]:
        before = len(self.rows)
        conflicts_resolved = 0
        if strategy == IMPORT_REPLACE:
            self.rows = set(other.rows)
            self.base_uri = other.base_uri
            self.ontology_uri = other.ontology_uri
            for prefix, ns in other.prefixes.items():
                self.prefixes.setdefault(prefix, ns)
        elif strategy == IMPORT_MERGE:
            self.rows |= other.rows
        elif strategy == IMPORT_MERGE_OVERWRITE:
            for t in sorted(other.rows):
                if not is_bnode(t.subject) and t.predicate in CONFLICT_PREDICATES:
                    current = [r for r in self.rows
                               if r.subject == t.subject and r.predicate == t.predicate]
                    current_ids = {(r.object, r.object_kind, r.lang, r.datatype)
                                   for r in current}
                    if current and (t.object, t.object_kind, t.lang,
                                    t.datatype) not in current_ids:
                        for r in current:
                            self.rows.discard(r)
                        conflicts_resolved += 1
                self.rows.add(t)
        else:
            raise ValueError(f"Unknown merge strategy: {strategy}")
        after = len(self.rows)
        return {
            "triples_before": before, "triples_after": after,
            "triples_added": max(0, after - before),
            "triples_removed": max(0, before - after),
            "conflicts_resolved": conflicts_resolved,
        }

    def compare(self, other: "TripleStore") -> Dict[str, Any]:
        """om:2412-2486 — bnode-rooted triples excluded from named diff,
        counted separately."""
        added_set = other.rows - self.rows
        removed_set = self.rows - other.rows
        bnode_added = {t for t in added_set if is_bnode(t.subject)}
        bnode_removed = {t for t in removed_set if is_bnode(t.subject)}
        named_added = added_set - bnode_added
        named_removed = removed_set - bnode_removed

        def by_subject(rows):
            grouped = defaultdict(list)
            for t in rows:
                grouped[local_name(t.subject)].append(t)
            return grouped

        added_by, removed_by = by_subject(named_added), by_subject(named_removed)
        self_subjects = {local_name(t.subject) for t in self.rows
                         if not is_bnode(t.subject)}
        other_subjects = {local_name(t.subject) for t in other.rows
                          if not is_bnode(t.subject)}
        modified_resources, counts = [], {"added": 0, "removed": 0, "modified": 0}
        for subj in sorted(set(added_by) | set(removed_by)):
            if subj in self_subjects and subj in other_subjects:
                change = "modified"
            elif subj in other_subjects:
                change = "added"
            else:
                change = "removed"
            counts[change] += 1
            modified_resources.append({
                "name": subj, "change_type": change,
                "added_triples": sorted(_display(t) for t in added_by.get(subj, [])),
                "removed_triples": sorted(_display(t) for t in removed_by.get(subj, [])),
            })
        diff = {
            "added_triples": sorted(_display(t) for t in named_added),
            "removed_triples": sorted(_display(t) for t in named_removed),
            "modified_resources": modified_resources,
            "stats": {
                "added": len(named_added), "removed": len(named_removed),
                "bnode_added": len(bnode_added), "bnode_removed": len(bnode_removed),
                "resources_added": counts["added"],
                "resources_removed": counts["removed"],
                "resources_modified": counts["modified"],
                "unchanged": len(self.rows & other.rows),
            },
        }
        diff["summary"] = self._summarize_changes(diff)
        return diff

    _TYPE_LABELS = {
        "Class": "class", "ObjectProperty": "object property",
        "DatatypeProperty": "data property",
        "NamedIndividual": "individual", "Ontology": "ontology",
        "AnnotationProperty": "annotation property",
    }

    def _summarize_changes(self, diff: Dict[str, Any]) -> List[str]:
        """Plain-language change descriptions (om:2520-2582).  Resource
        triples here are ``_display`` tuples (subject, predicate,
        object) with URI terms shortened to local names."""
        summaries: List[str] = []
        for res in diff["modified_resources"]:
            name, change = res["name"], res["change_type"]
            all_triples = res["added_triples"] + res["removed_triples"]
            res_type = next(
                (t[2] for t in all_triples
                 if t[1] == "type" and t[2] in (
                     "Class", "ObjectProperty", "DatatypeProperty",
                     "NamedIndividual", "Ontology", "AnnotationProperty",
                     "Restriction")), "")
            type_label = self._TYPE_LABELS.get(res_type, "resource")
            if change == "added":
                label = next((f' "{t[2]}"' for t in res["added_triples"]
                              if t[1] == "label"), "")
                summaries.append(f"Added {type_label} {name}{label}")
            elif change == "removed":
                summaries.append(f"Removed {type_label} {name}")
            else:
                details = [f"added {t[1]} = {t[2]}"
                           for t in res["added_triples"] if t[1] != "type"]
                details += [f"removed {t[1]} = {t[2]}"
                            for t in res["removed_triples"] if t[1] != "type"]
                detail_str = "; ".join(details[:3])
                if len(details) > 3:
                    detail_str += f" (+{len(details) - 3} more)"
                summaries.append(f"Modified {type_label} {name}: {detail_str}")
        stats = diff["stats"]
        if stats["bnode_added"] + stats["bnode_removed"] > 0:
            summaries.append(
                f"{stats['bnode_added']} anonymous node triples added, "
                f"{stats['bnode_removed']} removed "
                f"(restrictions/expressions)")
        return summaries

    def format_diff_report(self, diff: Dict[str, Any],
                           report_format: str = "markdown") -> str:
        """Human-readable change report (om:2584-2630)."""
        stats = diff["stats"]
        lines: List[str] = []
        if report_format == "markdown":
            lines.append("# Ontology Change Report\n")
            lines.append("## Summary\n")
            lines.append(f"- **Added:** {stats['added']} triples across "
                         f"{stats['resources_added']} resources")
            lines.append(f"- **Removed:** {stats['removed']} triples across "
                         f"{stats['resources_removed']} resources")
            lines.append(f"- **Modified:** {stats['resources_modified']} "
                         "resources")
            lines.append(f"- **Unchanged:** {stats['unchanged']} triples")
            if stats["bnode_added"] or stats["bnode_removed"]:
                lines.append(f"- **Anonymous nodes:** "
                             f"{stats['bnode_added']} added, "
                             f"{stats['bnode_removed']} removed")
            lines.append("")
            for change_type, heading in [("added", "Added Resources"),
                                         ("removed", "Removed Resources"),
                                         ("modified", "Modified Resources")]:
                resources = [r for r in diff["modified_resources"]
                             if r["change_type"] == change_type]
                if resources:
                    lines.append(f"## {heading}\n")
                    for res in resources:
                        lines.append(f"### {res['name']}\n")
                        for t in res["added_triples"]:
                            lines.append(f"- + {t[1]}: {t[2]}")
                        for t in res["removed_triples"]:
                            lines.append(f"- - {t[1]}: {t[2]}")
                        lines.append("")
        else:
            lines.append("Ontology Change Report")
            lines.append("=" * 40)
            lines.append(f"Added: {stats['added']} triples, "
                         f"Removed: {stats['removed']} triples, "
                         f"Modified: {stats['resources_modified']} resources")
            lines.append("")
            for line in diff["summary"]:
                lines.append(f"  {line}")
        return "\n".join(lines)

    def compare_to_string(self, data: str,
                          format: str = "turtle") -> Dict[str, Any]:
        """Parse data into a temporary store and compare (om:2489-2493)."""
        from ..sources.rdf_io import load_store

        return self.compare(load_store(data, format))

    def _detect_prefix_conflicts(self, other: "TripleStore") -> List[Dict[str, str]]:
        """Same prefix bound to different namespaces (om:2181-2194)."""
        current = {**self.prefixes, **self.loaded_prefixes}
        incoming = {**other.prefixes, **other.loaded_prefixes}
        out = []
        for prefix, ns in sorted(incoming.items()):
            if prefix in current and current[prefix] != ns:
                out.append({"prefix": prefix,
                            "current_namespace": current[prefix],
                            "incoming_namespace": ns})
        return out

    def preview_import(self, data: str,
                       format: str = "turtle") -> Dict[str, Any]:
        """Parse import data and report what WOULD change, without
        modifying the store (om:2026-2066): diff + incoming stats/meta
        + value conflicts + prefix conflicts."""
        from ..functions.terms import (
            OWL_CLASS, OWL_DATATYPE_PROPERTY, OWL_NAMED_INDIVIDUAL,
            OWL_OBJECT_PROPERTY, OWL_ONTOLOGY,
        )
        from ..sources.rdf_io import load_store

        temp = load_store(data, format)
        incoming_stats = {
            "classes": len(set(temp.subjects(RDF_TYPE, OWL_CLASS))),
            "object_properties": len(set(temp.subjects(
                RDF_TYPE, OWL_OBJECT_PROPERTY))),
            "data_properties": len(set(temp.subjects(
                RDF_TYPE, OWL_DATATYPE_PROPERTY))),
            "individuals": len(set(temp.subjects(
                RDF_TYPE, OWL_NAMED_INDIVIDUAL))),
            "total_triples": len(temp.rows),
        }
        incoming_meta: Dict[str, str] = {}
        for ont_uri in sorted(set(temp.subjects(RDF_TYPE, OWL_ONTOLOGY))):
            label = next((t.object for t in temp.match(ont_uri, RDFS_LABEL,
                                                       None)), None)
            if label:
                incoming_meta["label"] = label
            incoming_meta["uri"] = ont_uri
            break
        return {
            "diff": self.compare(temp),
            "incoming_stats": incoming_stats,
            "incoming_meta": incoming_meta,
            "conflicts": self.detect_conflicts(temp),
            "prefix_conflicts": self._detect_prefix_conflicts(temp),
        }

    # ------------------------------------------------------------------
    # validation (om:2634-2851) and SKOS validation (om:1634-1717)
    # ------------------------------------------------------------------

    def _expand_superclasses(self, classes: Set[str]) -> Set[str]:
        expanded = set(classes)
        frontier = list(classes)
        while frontier:
            cls = frontier.pop()
            for parent in self.objects(cls, RDFS_SUBCLASSOF):
                if not is_bnode(parent) and parent not in expanded:
                    expanded.add(parent)
                    frontier.append(parent)
        return expanded

    def validate(self, check_missing_domain_range: bool = True) -> List[Dict[str, str]]:
        issues: List[Dict[str, str]] = []

        def issue(severity, type_, subject, message):
            issues.append({"severity": severity, "type": type_,
                           "subject": subject, "message": message})

        classes = [c for c in self.subjects(RDF_TYPE, OWL_CLASS) if not is_bnode(c)]
        obj_props = [p for p in self.subjects(RDF_TYPE, OWL_OBJECT_PROPERTY)
                     if not is_bnode(p)]
        data_props = [p for p in self.subjects(RDF_TYPE, OWL_DATATYPE_PROPERTY)
                      if not is_bnode(p)]

        for c in classes:
            if not self.value(c, RDFS_LABEL) and not self.value(c, SKOS_PREF_LABEL):
                n = local_name(c)
                issue("warning", "missing_label", n,
                      f"Class '{n}' has no label (rdfs:label or skos:prefLabel)")

        def has_any(s, preds):
            return any(self.value(s, p) for p in preds)

        if check_missing_domain_range:
            for p in obj_props:
                n = local_name(p)
                if not has_any(p, (RDFS_DOMAIN,) + DOMAIN_INCLUDES):
                    issue("info", "missing_domain", n,
                          f"Object property '{n}' has no domain")
                if not has_any(p, (RDFS_RANGE,) + RANGE_INCLUDES):
                    issue("info", "missing_range", n,
                          f"Object property '{n}' has no range")
            for p in data_props:
                n = local_name(p)
                if not has_any(p, (RDFS_DOMAIN,) + DOMAIN_INCLUDES):
                    issue("info", "missing_domain", n,
                          f"Data property '{n}' has no domain")

        # orphan classes (om:2692-2758)
        all_classes = set(classes)
        used: Set[str] = set()
        for p in obj_props:
            for pred in (RDFS_DOMAIN,) + DOMAIN_INCLUDES + (RDFS_RANGE,) + RANGE_INCLUDES:
                used.update(o for o in self.objects(p, pred) if not is_bnode(o))
        for p in data_props:
            for pred in (RDFS_DOMAIN,) + DOMAIN_INCLUDES:
                used.update(o for o in self.objects(p, pred) if not is_bnode(o))
        for i in self.subjects(RDF_TYPE, OWL_NAMED_INDIVIDUAL):
            used.update(o for o in self.objects(i, RDF_TYPE) if not is_bnode(o))
        for t in self.match(None, RDFS_SUBCLASSOF, None):
            if not is_bnode(t.subject):
                used.add(t.subject)
            if t.object_kind == URI:
                used.add(t.object)
        for pred in (_OWL + "someValuesFrom", _OWL + "allValuesFrom", _OWL + "hasValue"):
            used.update(t.object for t in self.match(None, pred, None)
                        if t.object_kind == URI)
        for pred in (OWL_EQUIVALENT_CLASS, OWL_DISJOINT_WITH):
            for t in self.match(None, pred, None):
                if not is_bnode(t.subject):
                    used.add(t.subject)
                if t.object_kind == URI:
                    used.add(t.object)
        for c in sorted(all_classes - used):
            n = local_name(c)
            issue("info", "orphan_class", n,
                  f"Class '{n}' is not used in any hierarchy, property "
                  f"domain/range, restriction, or instance typing")

        # untyped individuals (om:2760-2770)
        for i in self.subjects(RDF_TYPE, OWL_NAMED_INDIVIDUAL):
            others = [c for c in self.objects(i, RDF_TYPE) if c != OWL_NAMED_INDIVIDUAL]
            if not others:
                n = local_name(i)
                issue("warning", "untyped_individual", n,
                      f"Individual '{n}' has no class type")

        # domain/range mismatches with superclass expansion (om:2787-2832)
        obj_prop_set, data_prop_set = set(obj_props), set(data_props)
        for i in self.subjects(RDF_TYPE, OWL_NAMED_INDIVIDUAL):
            if is_bnode(i):
                continue
            ind_name = local_name(i)
            direct = {c for c in self.objects(i, RDF_TYPE)
                      if not is_bnode(c) and c != OWL_NAMED_INDIVIDUAL}
            all_types = self._expand_superclasses(direct)
            for t in self.match(i, None, None):
                if t.predicate == RDF_TYPE:
                    continue
                if t.predicate in obj_prop_set:
                    domain = self.value(t.predicate, RDFS_DOMAIN)
                    if domain and not is_bnode(domain) and domain not in all_types:
                        issue("warning", "domain_mismatch", ind_name,
                              f"Individual '{ind_name}' uses property "
                              f"'{local_name(t.predicate)}' but is not typed as "
                              f"'{local_name(domain)}'")
                    range_row = self.value_row(t.predicate, RDFS_RANGE)
                    if (range_row and range_row.object_kind == URI
                            and t.object_kind == URI):
                        obj_direct = {c for c in self.objects(t.object, RDF_TYPE)
                                      if not is_bnode(c) and c != OWL_NAMED_INDIVIDUAL}
                        if range_row.object not in self._expand_superclasses(obj_direct):
                            issue("warning", "range_mismatch", ind_name,
                                  f"Property '{local_name(t.predicate)}' on "
                                  f"'{ind_name}' expects range "
                                  f"'{local_name(range_row.object)}' but "
                                  f"'{local_name(t.object)}' is not typed as such")
                elif t.predicate in data_prop_set:
                    domain = self.value(t.predicate, RDFS_DOMAIN)
                    if domain and not is_bnode(domain) and domain not in all_types:
                        issue("warning", "domain_mismatch", ind_name,
                              f"Individual '{ind_name}' uses data property "
                              f"'{local_name(t.predicate)}' but is not typed as "
                              f"'{local_name(domain)}'")

        # duplicate labels (om:2834-2849)
        label_map: Dict[tuple, List[str]] = defaultdict(list)
        for t in self.match(None, RDFS_LABEL, None):
            if not is_bnode(t.subject) and t.object_kind == LITERAL:
                label_map[t.object].append(local_name(t.subject))
        for label_str, resources in sorted(label_map.items()):
            if len(resources) > 1:
                joined = ", ".join(sorted(resources))
                issue("warning", "duplicate_label", joined,
                      f"Duplicate label '{label_str}' shared by: {joined}")
        return issues

    def validate_skos(self) -> List[Dict[str, str]]:
        issues: List[Dict[str, str]] = []
        concepts = self.get_concepts()
        schemes = self.get_concept_schemes()
        for c in concepts:
            if not c["prefLabel"]:
                issues.append({"severity": "warning", "type": "missing_prefLabel",
                               "subject": c["name"],
                               "message": f"Concept '{c['name']}' has no prefLabel"})
            if not c["schemes"] and schemes:
                issues.append({"severity": "info", "type": "no_scheme",
                               "subject": c["name"],
                               "message": f"Concept '{c['name']}' is not in any ConceptScheme"})
        for scheme in schemes:
            labels_seen: Dict[str, str] = {}
            for c in self.get_concepts(scheme=scheme["name"]):
                lbl = c["prefLabel"]
                if lbl and lbl in labels_seen:
                    issues.append({
                        "severity": "warning", "type": "duplicate_prefLabel",
                        "subject": c["name"],
                        "message": (f"Duplicate prefLabel '{lbl}' in scheme "
                                    f"'{scheme['name']}' (also on '{labels_seen[lbl]}')")})
                elif lbl:
                    labels_seen[lbl] = c["name"]
        # broader cycle: follow first broader pointer with a visited set
        by_name = {c["name"]: c for c in concepts}
        for c in concepts:
            visited: Set[str] = set()
            current, chain, has_cycle = c["name"], [c["name"]], False
            while True:
                broader_list = by_name.get(current, {}).get("broader", [])
                if not broader_list:
                    break
                nxt = broader_list[0]
                if nxt in visited:
                    has_cycle = True
                    break
                if nxt not in by_name:
                    break
                visited.add(current)
                current = nxt
                chain.append(current)
            if has_cycle:
                issues.append({"severity": "error", "type": "broader_cycle",
                               "subject": c["name"],
                               "message": f"Broader/narrower cycle detected: "
                                          f"{' -> '.join(chain)}"})
        return issues

    # ------------------------------------------------------------------
    # reasoning (om:2853-2864) — own RDFS forward chaining; owlrl is not
    # available in this environment, and the reference only ever runs
    # reasoning over workbench-sized graphs (SURVEY.md §7 step 9).
    # ------------------------------------------------------------------

    def apply_reasoning(self, profile: str = "rdfs") -> int:
        """Monotone fixpoint over the core RDFS rules (rdfs2/3/5/7/9/11).
        Any ``owl*`` profile name (matching the reference's
        three-profile surface, om:2853-2864, app.py:2884-2887)
        additionally runs the OWL-RL instance rules: inverseOf,
        symmetric and transitive object properties, property-chain
        closure (prp-spo2), and owl:sameAs symmetric/transitive closure
        with statement replication across the equivalence class
        (prp-eq).  ``owl-rl-ext`` (the reference's "OWL-RL Extended" ->
        owlrl OWLRL_Extension) FURTHER runs prp-key: owl:hasKey
        instance identification emitting owl:sameAs."""
        before = len(self.rows)
        changed = True
        while changed:
            changed = False
            new_rows: Set[Triple] = set()
            sub_class = [(t.subject, t.object) for t in self.match(None, RDFS_SUBCLASSOF, None)
                         if t.object_kind == URI and not is_bnode(t.object)]
            sub_prop = [(t.subject, t.object) for t in self.match(None, RDFS_SUBPROPERTYOF, None)
                        if t.object_kind == URI]
            parents = defaultdict(set)
            for c, d in sub_class:
                parents[c].add(d)
            # rdfs11: subClassOf transitivity
            for c, d in sub_class:
                for e in parents.get(d, ()):
                    new_rows.add(uri_triple(c, RDFS_SUBCLASSOF, e))
            # rdfs9: type inheritance
            for t in self.match(None, RDF_TYPE, None):
                for d in parents.get(t.object, ()):
                    new_rows.add(uri_triple(t.subject, RDF_TYPE, d))
            # rdfs5 + rdfs7
            prop_parents = defaultdict(set)
            for p, q in sub_prop:
                prop_parents[p].add(q)
            for p, q in sub_prop:
                for r in prop_parents.get(q, ()):
                    new_rows.add(uri_triple(p, RDFS_SUBPROPERTYOF, r))
            for t in list(self.rows):
                for q in prop_parents.get(t.predicate, ()):
                    new_rows.add(Triple(t.subject, q, t.object, t.object_kind,
                                        t.lang, t.datatype))
            # rdfs2 / rdfs3: domain and range typing
            domains = {t.subject: t.object for t in self.match(None, RDFS_DOMAIN, None)
                       if t.object_kind == URI}
            ranges = {t.subject: t.object for t in self.match(None, RDFS_RANGE, None)
                      if t.object_kind == URI}
            for t in list(self.rows):
                d = domains.get(t.predicate)
                if d and not is_bnode(t.subject):
                    new_rows.add(uri_triple(t.subject, RDF_TYPE, d))
                r = ranges.get(t.predicate)
                if r and t.object_kind == URI:
                    new_rows.add(uri_triple(t.object, RDF_TYPE, r))
            if profile.startswith("owl"):
                inverses = {}
                for t in self.match(None, OWL_INVERSE_OF, None):
                    inverses[t.subject] = t.object
                    inverses[t.object] = t.subject
                symmetric = set(self.subjects(RDF_TYPE, _CHARACTERISTICS["symmetric"]))
                transitive = set(self.subjects(RDF_TYPE, _CHARACTERISTICS["transitive"]))
                edges = defaultdict(set)
                for t in list(self.rows):
                    if t.object_kind != URI:
                        continue
                    inv = inverses.get(t.predicate)
                    if inv:
                        new_rows.add(uri_triple(t.object, inv, t.subject))
                    if t.predicate in symmetric:
                        new_rows.add(uri_triple(t.object, t.predicate, t.subject))
                    if t.predicate in transitive:
                        edges[t.predicate].add((t.subject, t.object))
                for p, pairs in edges.items():
                    nexts = defaultdict(set)
                    for a, b in pairs:
                        nexts[a].add(b)
                    for a, b in pairs:
                        for c in nexts.get(b, ()):
                            new_rows.add(uri_triple(a, p, c))
                # prp-spo2: property-chain instance closure
                # (owl:propertyChainAxiom q1 ∘ … ∘ qn ⊑ p)
                from ..functions.terms import OWL_PROPERTY_CHAIN_AXIOM

                for t in self.match(None, OWL_PROPERTY_CHAIN_AXIOM, None):
                    chain = self._list_members(t.object)
                    if not chain:
                        continue
                    by_pred = defaultdict(lambda: defaultdict(set))
                    for q in set(chain):
                        for e in self.match(None, q, None):
                            if e.object_kind == URI:
                                by_pred[q][e.subject].add(e.object)
                    paths = {(s, o) for s, os_ in by_pred[chain[0]].items()
                             for o in os_}
                    for q in chain[1:]:
                        step = by_pred[q]
                        paths = {(s, o2) for s, o in paths
                                 for o2 in step.get(o, ())}
                    for s, o in paths:
                        new_rows.add(uri_triple(s, t.subject, o))
                # prp-key (owl-rl-ext ONLY — the reference's third
                # profile, app.py:2887 -> owlrl OWLRL_Extension): for a
                # class with owl:hasKey (p1..pn), two non-bnode
                # instances sharing a value for EVERY key property are
                # owl:sameAs.  Implemented as the standard key-combo
                # join: each instance emits the cartesian product of
                # its per-property value sets; a combo seen on >1
                # instance merges them.  The sameAs facts feed prp-eq
                # below within the same fixpoint.
                if profile == "owl-rl-ext":
                    from itertools import product as _product

                    from ..functions.terms import OWL_HAS_KEY

                    for t in self.match(None, OWL_HAS_KEY, None):
                        key_props = self._list_members(t.object)
                        if not key_props:
                            continue
                        combo_index = defaultdict(set)
                        for x in self.subjects(RDF_TYPE, t.subject):
                            if is_bnode(x):
                                continue
                            value_sets = []
                            for p in key_props:
                                vals = {(e.object, e.object_kind, e.lang,
                                         e.datatype)
                                        for e in self.match(x, p, None)}
                                if not vals:
                                    break
                                value_sets.append(vals)
                            else:
                                for combo in _product(*value_sets):
                                    combo_index[combo].add(x)
                        for xs in combo_index.values():
                            if len(xs) > 1:
                                first, *rest = sorted(xs)
                                for y in rest:
                                    new_rows.add(uri_triple(
                                        first, OWL_SAME_AS, y))
                # prp-eq: owl:sameAs symmetric/transitive closure +
                # statement replication across equivalence members
                same_edges = [(t.subject, t.object)
                              for t in self.match(None, OWL_SAME_AS, None)
                              if t.object_kind == URI]
                if same_edges:
                    parent: Dict[str, str] = {}

                    def find(x):
                        while parent.setdefault(x, x) != x:
                            parent[x] = parent[parent[x]]
                            x = parent[x]
                        return x

                    for a, b in same_edges:
                        ra, rb = find(a), find(b)
                        if ra != rb:
                            parent[max(ra, rb)] = min(ra, rb)
                    members = defaultdict(set)
                    for x in parent:
                        members[find(x)].add(x)
                    alias = {x: members[find(x)] for x in parent
                             if len(members[find(x)]) > 1}
                    for x, group in alias.items():
                        for y in group:
                            if y != x:
                                new_rows.add(uri_triple(x, OWL_SAME_AS, y))
                    for t in list(self.rows):
                        if t.predicate == OWL_SAME_AS:
                            continue
                        subs = alias.get(t.subject, (t.subject,))
                        objs = alias.get(t.object, (t.object,)) \
                            if t.object_kind == URI else (t.object,)
                        for s2 in subs:
                            for o2 in objs:
                                new_rows.add(Triple(s2, t.predicate, o2,
                                                    t.object_kind, t.lang,
                                                    t.datatype))
            fresh = new_rows - self.rows
            if fresh:
                self.rows |= fresh
                changed = True
        return len(self.rows) - before

    # ------------------------------------------------------------------
    # snapshots / interchange
    # ------------------------------------------------------------------

    def copy(self) -> "TripleStore":
        dup = TripleStore.__new__(TripleStore)
        dup.rows = set(self.rows)
        dup.base_uri = self.base_uri
        dup.prefixes = dict(self.prefixes)
        dup.loaded_prefixes = dict(self.loaded_prefixes)
        dup.ontology_uri = self.ontology_uri
        return dup

    def take_snapshot(self) -> bytes:
        """om:2400-2402 — canonical sorted N-Triples-style bytes."""
        from ..sources.ntriples import serialize_rows
        return serialize_rows(sorted(self.rows)).encode("utf-8")

    def restore_snapshot(self, data: bytes) -> None:
        from ..sources.ntriples import parse_rows
        self.rows = set(parse_rows(data.decode("utf-8")))

    def to_rows(self) -> List[Triple]:
        return sorted(self.rows)

    def to_arrow(self):
        import pyarrow as pa
        rows = self.to_rows()
        return pa.table({
            "subject": [t.subject for t in rows],
            "predicate": [t.predicate for t in rows],
            "object": [t.object for t in rows],
            "object_kind": [t.object_kind for t in rows],
            "lang": [t.lang for t in rows],
            "datatype": [t.datatype for t in rows],
        })

    @classmethod
    def from_rows(cls, rows: Iterable[Triple],
                  base_uri: str = "http://example.org/ontology#") -> "TripleStore":
        store = cls(base_uri)
        store.rows = set(Triple(*r) for r in rows)
        return store


def _display(t: Triple) -> tuple:
    return (local_name(t.subject),
            local_name(t.predicate),
            local_name(t.object) if t.object_kind == URI else t.object)
