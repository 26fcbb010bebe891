"""Store operator tests: listings, updates, renames, deletes, bulk,
search, usages, delete impact, statistics (SURVEY.md §2.3-2.5)."""

from orionbelt_ontology_builder_ray.functions.terms import (
    OWL, RDF, RDFS, Triple, uri_triple,
)

B = "http://test.org/ont#"


def test_statistics(populated):
    stats = populated.get_statistics()
    assert stats["classes"] == 3
    assert stats["object_properties"] == 1
    assert stats["data_properties"] == 1
    assert stats["individuals"] == 2
    assert stats["total_triples"] == len(populated.rows)
    # ontology declaration excluded from content triples
    assert stats["content_triples"] == stats["total_triples"] - 1


def test_get_classes(populated):
    classes = populated.get_classes()
    names = [c["name"] for c in classes]
    assert names == ["Employee", "Organization", "Person"]  # name-sorted
    emp = next(c for c in classes if c["name"] == "Employee")
    assert emp["parents"] == ["Person"]
    person = next(c for c in classes if c["name"] == "Person")
    assert person["children"] == ["Employee"]
    assert person["label"] == "Person"


def test_class_hierarchy(populated):
    assert populated.get_class_hierarchy() == {"Person": ["Employee"]}


def test_get_object_properties(populated):
    props = populated.get_object_properties()
    assert len(props) == 1
    p = props[0]
    assert p["name"] == "worksFor"
    assert p["domain"] == "Person" and p["range"] == "Organization"
    assert not p["functional"]


def test_domain_range_includes_fallback(store):
    store.add_object_property("p1")
    store.add(uri_triple(store.uri("p1"), "https://schema.org/domainIncludes",
                         store.uri("Person")))
    props = store.get_object_properties()
    assert props[0]["domain"] == "Person"


def test_get_individuals(populated):
    populated.add_individual_property("alice", "worksFor", "acme")
    populated.add_individual_property("alice", "hasName", "Alice",
                                      is_object_property=False)
    inds = populated.get_individuals()
    assert [i["name"] for i in inds] == ["acme", "alice"]
    alice = next(i for i in inds if i["name"] == "alice")
    assert alice["classes"] == ["Employee"]
    assert {(p["property"], p["value"]) for p in alice["properties"]} == {
        ("worksFor", "acme"), ("hasName", "Alice")}


def test_update_class_replace_and_clear(populated):
    populated.update_class("Person", new_label="Human")
    assert populated.value(B + "Person", RDFS + "label") == "Human"
    populated.update_class("Person", new_label="")  # clear
    assert populated.value(B + "Person", RDFS + "label") is None
    populated.update_class("Employee", new_parent="Organization",
                           remove_parent="Person")
    assert populated.objects(B + "Employee", RDFS + "subClassOf") == [
        B + "Organization"]


def test_update_property_range_dispatch(populated):
    populated.update_property("hasName", new_range="integer")
    assert populated.value(B + "hasName", RDFS + "range") == \
        "http://www.w3.org/2001/XMLSchema#integer"
    populated.update_property("worksFor", new_range="Person")
    assert populated.value(B + "worksFor", RDFS + "range") == B + "Person"


def test_rename_class_rewrites_references(populated):
    assert populated.rename_class("Person", "Human")
    assert populated.has(B + "Human", RDF + "type", OWL + "Class")
    assert not populated.match(B + "Person")
    # subclass edge and domain both rewritten
    assert populated.has(B + "Employee", RDFS + "subClassOf", B + "Human")
    assert populated.value(B + "worksFor", RDFS + "domain") == B + "Human"


def test_rename_class_conflict_aborts(populated):
    assert not populated.rename_class("Person", "Organization")
    assert populated.has(B + "Person", RDF + "type", OWL + "Class")


def test_rename_property_rewrites_predicate(populated):
    populated.add_individual_property("alice", "worksFor", "acme")
    assert populated.rename_property("worksFor", "employedBy")
    assert populated.has(B + "alice", B + "employedBy", B + "acme")
    assert not populated.match(None, B + "worksFor", None)


def test_rename_individual(populated):
    populated.add_individual_property("alice", "worksFor", "acme")
    assert populated.rename_individual("alice", "alicia")
    assert populated.has(B + "alicia", RDF + "type", B + "Employee")
    assert populated.has(B + "alicia", B + "worksFor", B + "acme")


def test_delete_class_wipes_subject_and_object(populated):
    populated.delete_class("Person")
    assert not populated.match(B + "Person")
    assert not populated.match(None, None, "Person")
    # Employee's subClassOf edge is gone, Employee itself remains
    assert populated.objects(B + "Employee", RDFS + "subClassOf") == []
    assert populated.has(B + "Employee", RDF + "type", OWL + "Class")


def test_delete_property_removes_assertions(populated):
    populated.add_individual_property("alice", "worksFor", "acme")
    populated.delete_property("worksFor")
    assert not populated.match(None, B + "worksFor", None)
    assert not populated.match(B + "worksFor", None, None)


def test_delete_annotation_matching_rules(store):
    store.add_class("A")
    store.add_annotation("A", "label", "x")
    store.add_annotation("A", "label", "x", lang="en")
    # string-value match without lang removes BOTH plain and tagged
    assert store.delete_annotation("A", "label", "x") == 2
    store.add_annotation("A", "label", "y")
    store.add_annotation("A", "label", "y", lang="en")
    # exact match with lang removes only the tagged one
    assert store.delete_annotation("A", "label", "y", lang="en") == 1
    assert len(store.match(store.uri("A"), RDFS + "label", None)) == 1


def test_delete_restriction(populated):
    populated.add_restriction("Person", "worksFor", "someValuesFrom",
                              "Organization")
    assert len(populated.get_restrictions()) == 1
    assert populated.delete_restriction("Person", "worksFor", "someValuesFrom")
    assert populated.get_restrictions() == []
    assert not populated.subjects(RDF + "type", OWL + "Restriction")


def test_get_restrictions_listing(populated):
    populated.add_restriction("Person", "worksFor", "minCardinality", 1)
    r = populated.get_restrictions("Person")[0]
    assert r["property"] == "worksFor"
    assert r["type"] == "minCardinality"
    assert r["value"] == "1"
    assert r["applied_to"] == ["Person"]


def test_bulk_add_classes_partitions(populated):
    result = populated.bulk_add_classes([
        {"name": "Robot"}, {"name": "Person"}, {"name": ""},
        {"name": "Android", "parent": "Robot", "label": "Android"},
    ])
    assert result["created"] == ["Robot", "Android"]
    assert result["skipped"] == ["Person"]
    assert len(result["errors"]) == 1


def test_bulk_add_individuals_missing_class(populated):
    result = populated.bulk_add_individuals([
        {"name": "bob", "class": "Person"},
        {"name": "carl", "class": ""},
    ])
    assert result["created"] == ["bob"]
    assert result["errors"][0]["error"] == "Missing class"


def test_parse_bulk_text_header_sniff(store):
    parsed = store.parse_bulk_text(
        "name,parent,label\nDog,Animal,Dog\nCat,,Cat\n",
        ["name", "parent", "label"])
    assert parsed == [
        {"name": "Dog", "parent": "Animal", "label": "Dog"},
        {"name": "Cat", "parent": "", "label": "Cat"},
    ]


def test_bulk_update_annotations(populated):
    result = populated.bulk_update_annotations([
        {"action": "add", "subject": "Person", "predicate": "comment",
         "value": "A human"},
        {"action": "delete", "subject": "Person", "predicate": "label",
         "value": "Person"},
        {"action": "add", "subject": "", "predicate": "label", "value": "x"},
    ])
    assert result["applied"] == 2
    assert len(result["errors"]) == 1
    assert populated.value(B + "Person", RDFS + "comment") == "A human"
    assert populated.value(B + "Person", RDFS + "label") is None


def test_search_priority_and_sort(populated):
    populated.add_class("PersonalItem", label="Stuff")
    results = populated.search("person")
    names = [r["name"] for r in results]
    # name matches first (sorted), then label-matches
    assert names[0] == "Person"
    assert "PersonalItem" in names
    assert all(r["match_field"] == "name" for r in results
               if r["name"] in ("Person", "PersonalItem"))
    label_hit = populated.search("ACME Corp")
    assert label_hit[0]["name"] == "acme"
    assert label_hit[0]["match_field"] == "label"
    assert populated.search("") == []


def test_get_resource_usages(populated):
    populated.add_individual_property("alice", "worksFor", "acme")
    usages = populated.get_resource_usages("acme")
    assert {u["subject"] for u in usages["inbound"]} == {"alice"}
    usages_p = populated.get_resource_usages("worksFor")
    assert usages_p["as_predicate"] == [{"subject": "alice", "object": "acme"}]


def test_get_delete_impact_class(populated):
    impact = populated.get_delete_impact("Person", "class")
    assert impact["subclasses"] == ["Employee"]
    assert impact["domain_of"] == ["hasName", "worksFor"]
    assert impact["direct_triples"] > 0
    assert impact["total_triples"] >= impact["direct_triples"]


def test_get_delete_impact_property(populated):
    populated.add_individual_property("alice", "worksFor", "acme")
    impact = populated.get_delete_impact("worksFor", "property")
    assert impact["property_assertions"] == ["alice -> acme"]


def test_annotations_listing_excludes_structural(populated):
    populated.add_annotation("Person", "seeAlso", "http://x.org/doc")
    anns = populated.get_annotations("Person")
    preds = {a["predicate_uri"] for a in anns}
    assert RDFS + "seeAlso" in preds
    assert RDFS + "label" in preds  # label IS an annotation
    assert RDF + "type" not in preds


def test_used_annotation_predicates(populated):
    preds = populated.get_used_annotation_predicates()
    assert RDFS + "label" in preds


def test_set_base_uri_rewrites_everything(populated):
    populated.add_individual_property("alice", "worksFor", "acme")
    populated.set_base_uri("http://new.org/ont#")
    N = "http://new.org/ont#"
    assert populated.has(N + "alice", RDF + "type", N + "Employee")
    # subjects and objects are rewritten; predicates are NOT (om:270-283)
    assert populated.has(N + "alice", B + "worksFor", N + "acme")
    assert not any(t.subject.startswith(B) for t in populated.rows)


def test_ontology_metadata_set_semantics(store):
    store.set_ontology_metadata(label="My Ont", creator="me")
    assert store.get_ontology_metadata()["label"] == "My Ont"
    store.set_ontology_metadata(label="Renamed")  # replace-single
    meta = store.get_ontology_metadata()
    assert meta["label"] == "Renamed" and meta["creator"] == "me"
    store.set_ontology_metadata(creator="")  # clear
    assert store.get_ontology_metadata()["creator"] == ""


def test_imports(store):
    store.add_import("http://example.org/other")
    assert store.get_imports() == ["http://example.org/other"]
    store.remove_import("http://example.org/other")
    assert store.get_imports() == []


def test_prefixes(store):
    assert store.add_prefix("ex", "http://ex.org/")
    assert not store.add_prefix("owl", "http://bad/")  # protected
    assert store.remove_prefix("ex")
    assert not store.remove_prefix("rdf")
    sources = {p["prefix"]: p["source"] for p in store.get_prefixes()}
    assert sources["owl"] == "standard"
    assert sources[""] == "default"


def test_bulk_delete_properties(populated):
    """Mirror of reference tests/test_bulk.py TestBulkDeleteProperties
    (om:682-692): deletes object AND datatype properties, captures
    per-name errors for unknown names, clears predicate-position rows."""
    populated.add_object_property("likes")
    populated.add_data_property("age", domain="Person", range_="integer")
    populated.add_individual("al", "Person")
    populated.add_individual("bo", "Person")
    populated.add_individual_property("al", "likes", "bo")

    result = populated.bulk_delete_properties(["likes", "age", "ghost"])
    assert result["deleted"] == ["likes", "age"]
    assert result["errors"] == [{"name": "ghost", "error": "Not found"}]
    names = {p["name"] for p in populated.get_object_properties()} \
        | {p["name"] for p in populated.get_data_properties()}
    assert "likes" not in names and "age" not in names
    # predicate-position rows cleared too
    assert populated.value(B + "al", B + "likes") is None

    assert populated.bulk_delete_properties([]) == {
        "deleted": [], "errors": []}
