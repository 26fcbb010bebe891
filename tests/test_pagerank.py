"""Fixed-point PageRank: both distributed paths vs a brute-force
reference of the documented integer contract (stages/pagerank.py)."""

import numpy as np
import pyarrow as pa
import pytest

from orionbelt_ontology_builder_ray.stages.pagerank import (
    _R0, _TELEPORT, entity_edges, pagerank_fixed_point)


def _triples_ds(pairs):
    import ray.data as rd

    src = [s for s, _ in pairs]
    dst = [d for _, d in pairs]
    n = len(pairs)
    return rd.from_arrow(pa.table({
        "subject": src, "predicate": ["p"] * n, "object": dst,
        "object_kind": ["uri"] * n, "lang": [""] * n,
        "datatype": [""] * n}))


def _brute(pairs, n_iter=4):
    edges = sorted({(s, d) for s, d in pairs if s != d})
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    deg = {u: 0 for u in nodes}
    for s, _ in edges:
        deg[s] += 1
    r = {u: _R0 for u in nodes}
    for _ in range(n_iter):
        dang = sum(r[u] for u in nodes if deg[u] == 0)
        share = (85 * dang) // (100 * n)
        new = {u: _TELEPORT + share for u in nodes}
        for s, d in edges:
            new[d] += (85 * r[s]) // (100 * deg[s])
        r = new
    return r


def _random_pairs(seed, n_nodes, n_edges):
    rng = np.random.RandomState(seed)
    # only-dst nodes above n_nodes-10 become dangling
    src = rng.randint(0, n_nodes - 10, n_edges)
    dst = rng.randint(0, n_nodes, n_edges)
    return [(f"u{int(s)}", f"u{int(d)}") for s, d in zip(src, dst)]


@pytest.mark.parametrize("seed", [3, 11])
def test_broadcast_matches_brute(ray_session, seed):
    pairs = _random_pairs(seed, 50, 220)
    got = pagerank_fixed_point(_triples_ds(pairs)).to_pandas()
    got = {u: int(r) for u, r in zip(got["uri"], got["r"])}
    assert got == _brute(pairs)


def test_shuffle_fallback_matches_broadcast(ray_session):
    pairs = _random_pairs(7, 40, 150)
    ds = _triples_ds(pairs)
    broad = pagerank_fixed_point(ds).to_pandas()
    # edge_cap=0 forces the shuffle path (the dedup cap=0 idiom)
    shuf = pagerank_fixed_point(ds, edge_cap=0).to_pandas()
    b = dict(zip(broad["uri"], broad["r"].astype(int)))
    s = dict(zip(shuf["uri"], shuf["r"].astype(int)))
    assert b == s == _brute(pairs)


def test_dangling_mass_redistributed(ray_session):
    # a -> b, b dangles: b's mass must flow back via the dangling share
    pairs = [("a", "b")]
    got = pagerank_fixed_point(_triples_ds(pairs)).to_pandas()
    got = {u: int(r) for u, r in zip(got["uri"], got["r"])}
    assert got == _brute(pairs)
    assert got["b"] > got["a"] > 0


def test_entity_edges_contract(ray_session):
    import ray.data as rd

    from orionbelt_ontology_builder_ray.functions.terms import RDF_TYPE

    t = pa.table({
        "subject": ["a", "a", "a", "a"],
        "predicate": ["p", RDF_TYPE, "p", "p"],
        "object": ["b", "c", "a", "lit"],
        "object_kind": ["uri", "uri", "uri", "literal"],
        "lang": [""] * 4, "datatype": [""] * 4})
    edges = entity_edges(rd.from_arrow(t)).to_pandas()
    # rdf:type, self-loop and literal-object rows are all excluded
    assert list(zip(edges["src"], edges["dst"])) == [("a", "b")]


def test_empty_graph(ray_session):
    import ray.data as rd

    t = pa.table({"subject": ["a"], "predicate": ["p"], "object": ["x"],
                  "object_kind": ["literal"], "lang": [""],
                  "datatype": [""]})
    out = pagerank_fixed_point(rd.from_arrow(t)).to_pandas()
    assert len(out) == 0


# ---------------------------------------------------------------------------
# personalized PageRank (seed_prefix)
# ---------------------------------------------------------------------------


def _brute_ppr(pairs, prefix, n_iter=4):
    edges = sorted({(s, d) for s, d in pairs if s != d})
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    seeds = [u for u in nodes if u.startswith(prefix)]
    ns = len(seeds)
    if ns == 0:
        return {}
    deg = {u: 0 for u in nodes}
    for s, _ in edges:
        deg[s] += 1
    r = {u: _R0 for u in nodes}
    for _ in range(n_iter):
        dang = sum(r[u] for u in nodes if deg[u] == 0)
        base = (15 * n * 1_000_000) // (100 * ns) \
            + (85 * dang) // (100 * ns)
        new = {u: (base if u.startswith(prefix) else 0) for u in nodes}
        for s, d in edges:
            new[d] += (85 * r[s]) // (100 * deg[s])
        r = new
    return r


@pytest.mark.parametrize("seed", [3, 11])
def test_personalized_broadcast_matches_brute(ray_session, seed):
    pairs = _random_pairs(seed, 50, 220)
    got = pagerank_fixed_point(
        _triples_ds(pairs), seed_prefix="u1").to_pandas()
    got = {u: int(r) for u, r in zip(got["uri"], got["r"])}
    assert got == _brute_ppr(pairs, "u1")


def test_personalized_shuffle_matches_broadcast(ray_session):
    pairs = _random_pairs(7, 40, 150)
    ds = _triples_ds(pairs)
    broad = pagerank_fixed_point(ds, seed_prefix="u2").to_pandas()
    shuf = pagerank_fixed_point(ds, seed_prefix="u2",
                                edge_cap=0).to_pandas()
    b = dict(zip(broad["uri"], broad["r"].astype(int)))
    s = dict(zip(shuf["uri"], shuf["r"].astype(int)))
    assert b == s == _brute_ppr(pairs, "u2")


def test_personalized_no_seeds_is_empty(ray_session):
    pairs = [("a", "b"), ("b", "c")]
    ds = _triples_ds(pairs)
    assert len(pagerank_fixed_point(
        ds, seed_prefix="zzz").to_pandas()) == 0
    assert len(pagerank_fixed_point(
        ds, seed_prefix="zzz", edge_cap=0).to_pandas()) == 0


def test_personalized_mass_concentrates_on_seeds(ray_session):
    # star out of the seed: teleport mass lands on s only, flows out
    pairs = [("seed-hub", f"x{i}") for i in range(5)] \
        + [(f"x{i}", "seed-hub") for i in range(5)]
    got = pagerank_fixed_point(
        _triples_ds(pairs), seed_prefix="seed-").to_pandas()
    got = {u: int(r) for u, r in zip(got["uri"], got["r"])}
    assert got == _brute_ppr(pairs, "seed-")
    assert got["seed-hub"] > max(v for k, v in got.items()
                                 if k != "seed-hub")


# ---------------------------------------------------------------------------
# triangle count
# ---------------------------------------------------------------------------


def _brute_triangles(pairs):
    und = {(min(s, d), max(s, d)) for s, d in pairs if s != d}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return sum(1 for a, b in und for _ in adj[a] & adj[b]) // 3


@pytest.mark.parametrize("seed,n_nodes,n_edges",
                         [(3, 30, 150), (7, 15, 80)])
def test_triangles_match_brute(ray_session, seed, n_nodes, n_edges):
    from orionbelt_ontology_builder_ray.stages.pagerank import triangle_count

    rng = np.random.RandomState(seed)
    pairs = [(f"u{int(s)}", f"u{int(d)}")
             for s, d in zip(rng.randint(0, n_nodes, n_edges),
                             rng.randint(0, n_nodes, n_edges))]
    from orionbelt_ontology_builder_ray.stages.pagerank import entity_edges

    edges = entity_edges(_triples_ds(pairs)).materialize()
    assert triangle_count(edges) == _brute_triangles(pairs)


def test_triangles_known_graphs(ray_session):
    from orionbelt_ontology_builder_ray.stages.pagerank import (
        entity_edges, triangle_count)

    # K4 has 4 triangles; direction/duplication must not matter
    k4 = [(a, b) for a in "abcd" for b in "abcd" if a != b]
    edges = entity_edges(_triples_ds(k4)).materialize()
    assert triangle_count(edges) == 4
    # a path graph has none; a hub star has none
    path = [("a", "b"), ("b", "c"), ("c", "d")]
    assert triangle_count(
        entity_edges(_triples_ds(path)).materialize()) == 0
    star = [("h", f"x{i}") for i in range(20)]
    assert triangle_count(
        entity_edges(_triples_ds(star)).materialize()) == 0


# ---------------------------------------------------------------------------
# HITS hubs / authorities (hits_scores)
# ---------------------------------------------------------------------------


def _brute_hits(pairs, n_iter=4):
    edges = sorted({(s, d) for s, d in pairs if s != d})
    nodes = sorted({x for e in edges for x in e})
    h = {v: 10**6 for v in nodes}
    a = {v: 0 for v in nodes}
    for _ in range(n_iter):
        ar = {v: 0 for v in nodes}
        for s, d in edges:
            ar[d] += h[s]
        mx = max(ar.values()) if nodes else 0
        a = {v: (ar[v] * 10**6) // mx if mx else 0 for v in nodes}
        hr = {v: 0 for v in nodes}
        for s, d in edges:
            hr[s] += a[d]
        mx = max(hr.values()) if nodes else 0
        h = {v: (hr[v] * 10**6) // mx if mx else 0 for v in nodes}
    return {v: (h[v], a[v]) for v in nodes}


def _hits_dict(ds):
    df = ds.to_pandas()
    return {u: (int(h), int(a))
            for u, h, a in zip(df["uri"], df["hub"], df["auth"])}


@pytest.mark.parametrize("seed", [3, 11])
def test_hits_broadcast_matches_brute(ray_session, seed):
    from orionbelt_ontology_builder_ray.stages.pagerank import hits_scores

    pairs = _random_pairs(seed, 50, 220)
    assert _hits_dict(hits_scores(_triples_ds(pairs))) \
        == _brute_hits(pairs)


def test_hits_shuffle_matches_broadcast(ray_session):
    from orionbelt_ontology_builder_ray.stages.pagerank import hits_scores

    pairs = _random_pairs(7, 40, 150)
    ds = _triples_ds(pairs)
    broad = _hits_dict(hits_scores(ds))
    shuf = _hits_dict(hits_scores(ds, edge_cap=0))
    assert broad == shuf == _brute_hits(pairs)


def test_hits_star_semantics(ray_session):
    # one hub pointing at 3 sinks: hub gets hub=1e6/auth=0, sinks
    # get hub=0/auth=1e6 (equal in-mass -> max-normalized to 1e6)
    from orionbelt_ontology_builder_ray.stages.pagerank import hits_scores

    pairs = [("hub", f"s{i}") for i in range(3)]
    got = _hits_dict(hits_scores(_triples_ds(pairs)))
    assert got["hub"] == (10**6, 0)
    assert got["s0"] == got["s1"] == got["s2"] == (0, 10**6)


def test_hits_empty(ray_session):
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.pagerank import hits_scores

    t = pa.table({"subject": ["x"], "predicate": ["p"], "object": ["lit"],
                  "object_kind": ["literal"], "lang": [""],
                  "datatype": [""]})
    assert len(hits_scores(rd.from_arrow(t)).to_pandas()) == 0
