"""SKOS operator tests incl. inverse auto-management and cycle detection
(reference tests/test_skos.py model)."""

from orionbelt_ontology_builder_ray.functions.terms import SKOS

B = "http://test.org/ont#"


def test_concepts_listing(skos):
    concepts = skos.get_concepts()
    assert [c["name"] for c in concepts] == ["Animal", "Cat", "Dog"]
    animal = next(c for c in concepts if c["name"] == "Animal")
    assert sorted(animal["narrower"]) == ["Cat", "Dog"]
    dog = next(c for c in concepts if c["name"] == "Dog")
    assert dog["broader"] == ["Animal"]
    assert dog["prefLabel"] == "Dog"
    assert dog["schemes"] == ["MyScheme"]


def test_scheme_listing_with_counts(skos):
    schemes = skos.get_concept_schemes()
    assert len(schemes) == 1
    assert schemes[0]["name"] == "MyScheme"
    assert schemes[0]["concept_count"] == 3


def test_concept_hierarchy(skos):
    h = skos.get_concept_hierarchy()
    assert sorted(h["Animal"]) == ["Cat", "Dog"]
    assert h["Dog"] == []


def test_scheme_filter(skos):
    skos.add_concept_scheme("Other")
    skos.add_concept("Rock", "Other", pref_label="Rock")
    assert [c["name"] for c in skos.get_concepts(scheme="MyScheme")] == [
        "Animal", "Cat", "Dog"]
    assert [c["name"] for c in skos.get_concepts(scheme="Other")] == ["Rock"]
    assert skos.get_concepts(scheme="Nope") == []


def test_update_concept_broader_removes_both_directions(skos):
    skos.add_concept("Mammal", "MyScheme", pref_label="Mammal", broader="Animal")
    skos.update_concept("Dog", broader="Mammal")
    assert skos.objects(B + "Dog", SKOS + "broader") == [B + "Mammal"]
    assert B + "Dog" not in skos.objects(B + "Animal", SKOS + "narrower")
    assert B + "Dog" in skos.objects(B + "Mammal", SKOS + "narrower")


def test_update_concept_unset_leaves_unchanged(skos):
    skos.update_concept("Dog", pref_label="Hound")
    dog = next(c for c in skos.get_concepts() if c["name"] == "Dog")
    assert dog["prefLabel"] == "Hound"
    assert dog["broader"] == ["Animal"]  # untouched


def test_delete_concept_cleans_inverses(skos):
    skos.delete_concept("Dog")
    assert B + "Dog" not in skos.objects(B + "Animal", SKOS + "narrower")
    assert not skos.match(B + "Dog")
    assert not skos.match(None, None, B + "Dog")


def test_delete_concept_scheme(skos):
    skos.delete_concept_scheme("MyScheme")
    assert skos.get_concept_schemes() == []
    dog = next(c for c in skos.get_concepts() if c["name"] == "Dog")
    assert dog["schemes"] == []


def test_concept_relation_exact_match_mirror(skos):
    skos.add_concept_relation("Dog", "exactMatch", "Cat")
    assert skos.has(B + "Cat", SKOS + "exactMatch", B + "Dog")
    skos.remove_concept_relation("Dog", "exactMatch", "Cat")
    assert not skos.has(B + "Cat", SKOS + "exactMatch", B + "Dog")


def test_validate_skos_clean(skos):
    issues = skos.validate_skos()
    assert issues == []


def test_validate_skos_missing_preflabel_and_no_scheme(skos):
    skos.add_concept("Ghost")
    issues = skos.validate_skos()
    types = {(i["type"], i["subject"]) for i in issues}
    assert ("missing_prefLabel", "Ghost") in types
    assert ("no_scheme", "Ghost") in types


def test_validate_skos_duplicate_preflabel(skos):
    skos.add_concept("Hound", "MyScheme", pref_label="Dog")
    issues = skos.validate_skos()
    assert any(i["type"] == "duplicate_prefLabel" for i in issues)


def test_validate_skos_cycle_detection(skos):
    # Dog -> Animal (exists); close the loop Animal -> Dog
    skos.add_concept_relation("Animal", "broader", "Dog")
    issues = skos.validate_skos()
    cyclic = [i for i in issues if i["type"] == "broader_cycle"]
    assert cyclic and cyclic[0]["severity"] == "error"
