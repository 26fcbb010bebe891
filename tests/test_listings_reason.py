"""Distributed listings + RDFS closure + goldens sanity."""

import pandas as pd

from orionbelt_ontology_builder_ray.state.graph import TripleStore

B = "http://test.org/ont#"


def _store():
    s = TripleStore(B)
    s.add_class("Person", label="Person")
    s.add_class("Employee", parent="Person", label="Employee")
    s.add_class("Organization", label="Organization")
    s.add_object_property("worksFor", domain="Person", range_="Organization")
    s.add_individual("alice", "Employee", label="Alice")
    s.add_individual("acme", "Organization")
    s.add_individual_property("alice", "worksFor", "acme")
    return s


def _ds(ray_session, store):
    import ray.data as rd

    return rd.from_arrow(store.to_arrow())


def test_class_listing_ds(ray_session):
    from orionbelt_ontology_builder_ray.stages.listings import class_listing

    out = class_listing(_ds(ray_session, _store()))
    assert list(out["name"]) == ["Employee", "Organization", "Person"]
    emp = out[out["name"] == "Employee"].iloc[0]
    assert emp["label"] == "Employee"
    assert emp["n_parents"] == 1 and emp["n_children"] == 0
    person = out[out["name"] == "Person"].iloc[0]
    assert person["n_children"] == 1


def test_individuals_by_class_ds(ray_session):
    from orionbelt_ontology_builder_ray.stages.listings import (
        individuals_by_class,
    )

    out = individuals_by_class(_ds(ray_session, _store())).to_pandas()
    counts = dict(zip(out["class_uri"], out["n_individuals"]))
    assert counts[B + "Employee"] == 1
    assert counts[B + "Organization"] == 1


def test_type_counts_ds(ray_session):
    from orionbelt_ontology_builder_ray.stages.listings import type_counts

    out = type_counts(_ds(ray_session, _store())).to_pandas()
    counts = dict(zip(out["type_uri"], out["n"]))
    assert counts["http://www.w3.org/2002/07/owl#Class"] == 3
    assert counts["http://www.w3.org/2002/07/owl#NamedIndividual"] == 2


def test_rdfs_closure_ds(ray_session):
    from orionbelt_ontology_builder_ray.stages.reason import apply_rdfs_closure

    closed = apply_rdfs_closure(_ds(ray_session, _store()), rounds=2)
    df = closed.to_pandas()
    types = set(df[(df.predicate
                    == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type")]
                .apply(lambda r: (r.subject, r.object), axis=1))
    assert (B + "alice", B + "Person") in types       # rdfs9 via Employee
    assert (B + "acme", B + "Organization") in types  # rdfs3 via range
    assert not df.duplicated().any()


def test_goldens_match_hand_written():
    """Our operator output must equal the hand-written expected rows
    (the independent encoding of the reference's rules)."""
    from orionbelt_ontology_builder_ray.pipelines import goldens as g

    assert set(map(tuple, g.q_populated_triples().to_pandas().to_numpy())) \
        == set(g.EXPECTED_POPULATED)
    assert set(map(tuple, g.q_skos_triples().to_pandas().to_numpy())) \
        == set(g.EXPECTED_SKOS)
    assert list(map(tuple, g.q_merge_overwrite_labels().to_pandas()
                    .to_numpy())) == g.EXPECTED_MERGE_OVERWRITE_LABELS
    assert list(map(tuple, g.q_validation_issues().to_pandas().to_numpy())) \
        == g.EXPECTED_VALIDATION
    assert list(map(tuple, g.q_reasoning_types().to_pandas().to_numpy())) \
        == g.EXPECTED_REASONING_TYPES
    assert list(map(tuple, g.q_search().to_pandas().to_numpy())) \
        == g.EXPECTED_SEARCH
    assert list(map(tuple, g.q_diff_stats().to_pandas().to_numpy())) \
        == g.EXPECTED_DIFF_STATS


def test_broader_cycles_pointer_jumping(ray_session):
    """Pointer-jumping cycle detection over a functional broader graph:
    chain -> no cycle; loop -> every concept whose walk enters it."""
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.skos_ops import (
        broader_cycles, skos_issues_ds,
    )
    from orionbelt_ontology_builder_ray.state.graph import TripleStore

    s = TripleStore(B)
    s.add_concept_scheme("S")
    # clean chain: D -> C -> A (terminates)
    s.add_concept("A", "S", pref_label="A")
    s.add_concept("C", "S", pref_label="C", broader="A")
    s.add_concept("D", "S", pref_label="D", broader="C")
    assert broader_cycles(rd.from_arrow(s.to_arrow())) == []

    # close a loop: A -> D (so A, C, D are cyclic)
    s.add_concept_relation("A", "broader", "D")
    # and one branch leading INTO the loop
    s.add_concept("E", "S", pref_label="E", broader="D")
    cyclic = broader_cycles(rd.from_arrow(s.to_arrow()))
    assert set(cyclic) == {s.uri("A"), s.uri("C"), s.uri("D"), s.uri("E")}

    # reference walk agrees on every concept it flags
    ref_flagged = {i["subject"] for i in s.validate_skos()
                   if i["type"] == "broader_cycle"}
    assert ref_flagged == {"A", "C", "D", "E"}

    issues = skos_issues_ds(rd.from_arrow(s.to_arrow()))
    assert ("broader_cycle", s.uri("A")) in set(
        map(tuple, issues.to_numpy()))


def test_deep_chain_no_false_cycle(ray_session):
    """A 200-deep chain terminates — log-round doubling must not flag it."""
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.skos_ops import broader_cycles
    from orionbelt_ontology_builder_ray.state.graph import TripleStore

    s = TripleStore(B)
    s.add_concept("c000", pref_label="c0")
    for i in range(1, 200):
        s.add_concept(f"c{i:03d}", pref_label=f"c{i}",
                      broader=f"c{i - 1:03d}")
    assert broader_cycles(rd.from_arrow(s.to_arrow())) == []


def test_owl_closure_ds_matches_driver(ray_session):
    """Distributed OWL-RL instance rules (inverse/symmetric/transitive)
    reach exactly the driver TripleStore.apply_reasoning('owl-rl')
    fixpoint on the owlrl fixture (>1 block)."""
    from orionbelt_ontology_builder_ray.pipelines.goldens import owlrl_store
    from orionbelt_ontology_builder_ray.stages.reason import apply_owl_closure

    s = owlrl_store()
    ds = _ds(ray_session, s).repartition(3)
    closed = apply_owl_closure(ds).to_pandas()
    got = set(map(tuple, closed.to_numpy()))

    s.apply_reasoning("owl-rl")
    want = {tuple(t) for t in s.rows}
    assert got == want


def test_transitive_closure_long_chain(ray_session):
    """Path of length 6 closes fully (iterative squaring needs 3
    rounds) and only for the transitive property."""
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.reason import (
        collect_owl_schema, transitive_closure_edges,
    )

    s = TripleStore(B)
    s.add_object_property("partOf", transitive=True)
    s.add_object_property("next")
    for i in range(6):
        s.add_individual_property(f"n{i}", "partOf", f"n{i+1}")
        s.add_individual_property(f"m{i}", "next", f"m{i+1}")
    ds = _ds(ray_session, s).repartition(2)
    owl = collect_owl_schema(ds)
    assert owl["transitive"] == {B + "partOf"}
    closed = transitive_closure_edges(ds, owl["transitive"]).to_pandas()
    pairs = {(r.subject, r.object) for r in closed.itertuples()}
    want = {(B + f"n{i}", B + f"n{j}")
            for i in range(7) for j in range(i + 1, 7)}
    assert pairs == want


def test_owl_property_chain_instance_closure():
    """prp-spo2: hasParent ∘ hasParent ⊑ hasGrandparent at the
    instance level (owlrl OWL-RL rule surface, om:2853-2864)."""
    s = TripleStore(B)
    s.add_object_property("hasParent")
    s.add_object_property("hasGrandparent")
    s.add_property_chain("hasGrandparent", ["hasParent", "hasParent"])
    s.add_individual_property("c", "hasParent", "p")
    s.add_individual_property("p", "hasParent", "g")
    s.apply_reasoning("owl-rl")
    assert s.has(B + "c", B + "hasGrandparent", B + "g")
    assert not s.has(B + "c", B + "hasGrandparent", B + "p")


def test_owl_sameas_replication():
    """prp-eq: sameAs closure is symmetric/transitive and statements
    replicate across the equivalence class."""
    from orionbelt_ontology_builder_ray.functions.terms import OWL_SAME_AS

    s = TripleStore(B)
    s.add_class("Person")
    s.add_individual("a1", "Person", label="A")
    s.add_individual("a2", "Person")
    s.add_individual("a3", "Person")
    s.add_individual_relation("a1", "sameAs", "a2")
    s.add_individual_relation("a2", "sameAs", "a3")
    s.add_individual_property("a1", "likes", "a3")
    s.apply_reasoning("owl-rl")
    # symmetric + transitive sameAs
    assert s.has(B + "a3", OWL_SAME_AS, B + "a1")
    # replication of an asserted edge across aliases
    assert s.has(B + "a2", B + "likes", B + "a1")
    assert s.has(B + "a3", B + "likes", B + "a2")
    # literal annotations replicate too
    assert any(t.subject == B + "a3" and t.object == "A"
               for t in s.rows)


def test_owl_closure_ds_with_chains(ray_session):
    """Distributed property-chain closure matches the driver fixpoint
    on a chain-bearing fixture (hasParent ∘ hasParent ⊑ hasGrandparent
    + an inverse that feeds it across rounds)."""
    from orionbelt_ontology_builder_ray.stages.reason import apply_owl_closure

    s = TripleStore(B)
    s.add_object_property("hasParent")
    s.add_object_property("hasChild", inverse_of="hasParent")
    s.add_object_property("hasGrandparent")
    s.add_property_chain("hasGrandparent", ["hasParent", "hasParent"])
    s.add_individual_property("c", "hasParent", "p")
    # the second hop arrives only via the inverse rule: g hasChild p
    s.add_individual_property("g", "hasChild", "p")
    ds = _ds(ray_session, s).repartition(3)
    closed = apply_owl_closure(ds).to_pandas()
    got = set(map(tuple, closed.to_numpy()))

    s.apply_reasoning("owl-rl")
    want = {tuple(t) for t in s.rows}
    assert (B + "c", B + "hasGrandparent", B + "g",
            "uri", "", "") in got
    assert got == want


def test_transitive_cycle_reflexive_parity(ray_session):
    """A cycle under a transitive property entails a P a — driver and
    distributed closures must agree (review r2)."""
    from orionbelt_ontology_builder_ray.stages.reason import apply_owl_closure

    s = TripleStore(B)
    s.add_object_property("partOf", transitive=True)
    s.add_individual_property("a", "partOf", "b")
    s.add_individual_property("b", "partOf", "a")
    ds = _ds(ray_session, s).repartition(2)
    closed = set(map(tuple, apply_owl_closure(ds).to_pandas().to_numpy()))
    s.apply_reasoning("owl-rl")
    assert (B + "a", B + "partOf", B + "a", "uri", "", "") in closed
    assert closed == {tuple(t) for t in s.rows}


def test_owl_closure_ds_ext_haskey_equals_driver(ray_session):
    """Distributed owl-rl-ext (prp-key + prp-eq replication) matches
    the driver's owl-rl-ext fixpoint EXACTLY on the hasKey fixture."""
    from orionbelt_ontology_builder_ray.pipelines.goldens import haskey_store
    from orionbelt_ontology_builder_ray.stages.reason import apply_owl_closure

    s = haskey_store()
    ds = _ds(ray_session, s).repartition(3)
    closed = apply_owl_closure(ds, profile="owl-rl-ext").to_pandas()
    got = set(map(tuple, closed.to_numpy()))
    s.apply_reasoning("owl-rl-ext")
    want = {tuple(t) for t in s.rows}
    assert got == want
    # and the default profile must NOT merge (dispatch distinction)
    s2 = haskey_store()
    ds2 = _ds(ray_session, s2).repartition(3)
    plain = apply_owl_closure(ds2).to_pandas()
    from orionbelt_ontology_builder_ray.functions.terms import OWL_SAME_AS
    assert not (plain["predicate"] == OWL_SAME_AS).any()


def test_replicate_same_as_ds_equals_driver(ray_session):
    """Distributed prp-eq replication option matches the driver
    store's sameAs replication on the asserted-sameAs fixture."""
    from orionbelt_ontology_builder_ray.stages.reason import apply_owl_closure

    s = TripleStore(B)
    s.add_class("Person")
    s.add_individual("a1", "Person", label="A")
    s.add_individual("a2", "Person")
    s.add_individual("a3", "Person")
    s.add_individual_relation("a1", "sameAs", "a2")
    s.add_individual_relation("a2", "sameAs", "a3")
    s.add_individual_property("a1", "likes", "a3")
    ds = _ds(ray_session, s).repartition(2)
    closed = apply_owl_closure(ds, replicate_same_as_stmts=True).to_pandas()
    got = set(map(tuple, closed.to_numpy()))
    s.apply_reasoning("owl-rl")
    want = {tuple(t) for t in s.rows}
    assert got == want
