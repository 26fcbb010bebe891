"""Validation rule tests (reference tests/test_validation.py model;
SURVEY.md §2.12)."""


def issue_set(issues):
    return {(i["type"], i["subject"]) for i in issues}


def test_clean_populated_has_no_warnings_about_labels(populated):
    issues = populated.validate()
    assert ("missing_label", "Person") not in issue_set(issues)


def test_missing_label(store):
    store.add_class("Unlabeled")
    assert ("missing_label", "Unlabeled") in issue_set(store.validate())


def test_preflabel_counts_as_label(store):
    store.add_class("Tagged")
    store.add_annotation("Tagged", "prefLabel", "Tagged")
    assert ("missing_label", "Tagged") not in issue_set(store.validate())


def test_missing_domain_range(store):
    store.add_object_property("bare", label="bare")
    issues = issue_set(store.validate())
    assert ("missing_domain", "bare") in issues
    assert ("missing_range", "bare") in issues
    # toggle off
    issues_off = issue_set(store.validate(check_missing_domain_range=False))
    assert ("missing_domain", "bare") not in issues_off


def test_domain_includes_suppresses_missing_domain(store):
    from orionbelt_ontology_builder_ray.functions.terms import uri_triple
    store.add_object_property("p", label="p")
    store.add(uri_triple(store.uri("p"), "https://schema.org/domainIncludes",
                         store.uri("X")))
    store.add(uri_triple(store.uri("p"), "https://w3id.org/semanticarts/ns/ontology/gist/rangeIncludes",
                         store.uri("Y")))
    issues = issue_set(store.validate())
    assert ("missing_domain", "p") not in issues
    assert ("missing_range", "p") not in issues


def test_orphan_class(store):
    store.add_class("Island", label="Island")
    assert ("orphan_class", "Island") in issue_set(store.validate())


def test_class_in_hierarchy_not_orphan(populated):
    issues = issue_set(populated.validate())
    assert ("orphan_class", "Person") not in issues
    assert ("orphan_class", "Employee") not in issues
    assert ("orphan_class", "Organization") not in issues  # used as range


def test_untyped_individual(store):
    from orionbelt_ontology_builder_ray.functions.terms import (
        OWL_NAMED_INDIVIDUAL, RDF_TYPE, uri_triple)
    store.add(uri_triple(store.uri("ghost"), RDF_TYPE, OWL_NAMED_INDIVIDUAL))
    assert ("untyped_individual", "ghost") in issue_set(store.validate())


def test_domain_mismatch(populated):
    populated.add_individual("acme2", "Organization")
    # worksFor domain=Person; acme2 is an Organization
    populated.add_individual_property("acme2", "worksFor", "acme")
    assert ("domain_mismatch", "acme2") in issue_set(populated.validate())


def test_domain_match_via_superclass(populated):
    # alice is Employee subClassOf Person -> no domain mismatch
    populated.add_individual_property("alice", "worksFor", "acme")
    assert ("domain_mismatch", "alice") not in issue_set(populated.validate())


def test_range_mismatch(populated):
    populated.add_individual("bob", "Person")
    populated.add_individual_property("alice", "worksFor", "bob")
    assert ("range_mismatch", "alice") in issue_set(populated.validate())


def test_duplicate_label(store):
    store.add_class("A", label="Same")
    store.add_class("B1", label="Same")
    issues = [i for i in store.validate() if i["type"] == "duplicate_label"]
    assert len(issues) == 1
    assert issues[0]["subject"] == "A, B1"


def test_reasoning_rdfs_type_inheritance(populated):
    from orionbelt_ontology_builder_ray.functions.terms import RDF_TYPE
    added = populated.apply_reasoning("rdfs")
    assert added > 0
    # alice: Employee subClassOf Person => alice rdf:type Person inferred
    assert populated.has(populated.uri("alice"), RDF_TYPE,
                         populated.uri("Person"))
    # monotone fixpoint: second run adds nothing
    assert populated.apply_reasoning("rdfs") == 0


def test_reasoning_domain_range_typing(populated):
    from orionbelt_ontology_builder_ray.functions.terms import RDF_TYPE
    populated.add_individual_property("alice", "worksFor", "acme")
    populated.apply_reasoning("rdfs")
    assert populated.has(populated.uri("alice"), RDF_TYPE,
                         populated.uri("Person"))
    assert populated.has(populated.uri("acme"), RDF_TYPE,
                         populated.uri("Organization"))


def test_reasoning_owl_inverse_and_symmetric(store):
    from orionbelt_ontology_builder_ray.functions.terms import uri_triple
    store.add_object_property("hasPart", inverse_of="partOf")
    store.add_object_property("adjacentTo", symmetric=True)
    store.add(uri_triple(store.uri("a"), store.uri("hasPart"), store.uri("b")))
    store.add(uri_triple(store.uri("x"), store.uri("adjacentTo"), store.uri("y")))
    store.apply_reasoning("owl-rl")
    assert store.has(store.uri("b"), store.uri("partOf"), store.uri("a"))
    assert store.has(store.uri("y"), store.uri("adjacentTo"), store.uri("x"))


def test_reasoning_transitive(store):
    from orionbelt_ontology_builder_ray.functions.terms import uri_triple
    store.add_object_property("ancestorOf", transitive=True)
    p = store.uri("ancestorOf")
    store.add(uri_triple(store.uri("a"), p, store.uri("b")))
    store.add(uri_triple(store.uri("b"), p, store.uri("c")))
    store.add(uri_triple(store.uri("c"), p, store.uri("d")))
    store.apply_reasoning("owl-rl")
    assert store.has(store.uri("a"), p, store.uri("d"))
