"""Fixed-round min-propagation analytics (stages/components.py): both
distributed paths vs brute-force references of the documented
contract (n_rounds of undirected min-label / min-plus propagation)."""

import numpy as np
import pyarrow as pa
import pytest

from orionbelt_ontology_builder_ray.stages.components import (
    bfs_hops, components_fixed_rounds, graph_min_rounds)
from orionbelt_ontology_builder_ray.stages.pagerank import entity_edges


def _triples_ds(pairs):
    import ray.data as rd

    src = [s for s, _ in pairs]
    dst = [d for _, d in pairs]
    n = len(pairs)
    return rd.from_arrow(pa.table({
        "subject": src, "predicate": ["p"] * n, "object": dst,
        "object_kind": ["uri"] * n, "lang": [""] * n,
        "datatype": [""] * n}))


def _und(pairs):
    und = {}
    for s, d in pairs:
        if s == d:
            continue
        und.setdefault(s, set()).add(d)
        und.setdefault(d, set()).add(s)
    return und


def _brute_cc(pairs, n_rounds=6):
    adj = _und(pairs)
    lab = {u: u for u in adj}
    for _ in range(n_rounds):
        lab = {u: min([lab[u]] + [lab[v] for v in adj[u]]) for u in adj}
    sizes = {}
    for v in lab.values():
        sizes[v] = sizes.get(v, 0) + 1
    return {u: sizes[lab[u]] for u in adj}


def _brute_hops(pairs, prefix, n_rounds=6):
    adj = _und(pairs)
    far = 1 << 62
    d = {u: (0 if u.startswith(prefix) else far) for u in adj}
    for _ in range(n_rounds):
        d = {u: min([d[u]] + [d[v] + 1 for v in adj[u]]) for u in adj}
    return {u: x for u, x in d.items() if x < far}


def _random_pairs(seed, n_nodes, n_edges):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n_nodes, n_edges)
    dst = rng.randint(0, n_nodes, n_edges)
    return [(f"u{int(s)}", f"u{int(d)}") for s, d in zip(src, dst)]


def _as_dict(ds):
    df = ds.to_pandas()
    if len(df) == 0:
        return {}
    return {u: int(n) for u, n in zip(df["uri"], df["n"])}


@pytest.mark.parametrize("seed,n_nodes,n_edges",
                         [(3, 60, 70), (11, 40, 200)])
def test_cc_broadcast_matches_brute(ray_session, seed, n_nodes, n_edges):
    pairs = _random_pairs(seed, n_nodes, n_edges)
    got = _as_dict(components_fixed_rounds(_triples_ds(pairs)))
    assert got == _brute_cc(pairs)


def test_cc_shuffle_matches_broadcast(ray_session):
    pairs = _random_pairs(7, 30, 40)
    ds = _triples_ds(pairs)
    broad = _as_dict(components_fixed_rounds(ds))
    shuf = _as_dict(components_fixed_rounds(ds, edge_cap=0))
    assert broad == shuf == _brute_cc(pairs)


def test_cc_fixed_rounds_semantics(ray_session):
    # a 9-node path: diameter 8 > 6 rounds, so propagation is
    # deliberately UNCONVERGED — the brute reference pins exactly that
    pairs = [(f"n{i}", f"n{i + 1}") for i in range(8)]
    got = _as_dict(components_fixed_rounds(_triples_ds(pairs)))
    assert got == _brute_cc(pairs)
    # converged with enough rounds: one component of size 9
    got9 = _as_dict(components_fixed_rounds(_triples_ds(pairs),
                                            n_rounds=8))
    assert set(got9.values()) == {9}


@pytest.mark.parametrize("seed", [3, 11])
def test_hops_broadcast_matches_brute(ray_session, seed):
    pairs = _random_pairs(seed, 50, 120)
    got = _as_dict(bfs_hops(_triples_ds(pairs), seed_prefix="u1"))
    assert got == _brute_hops(pairs, "u1")


def test_hops_shuffle_matches_broadcast(ray_session):
    pairs = _random_pairs(7, 30, 60)
    ds = _triples_ds(pairs)
    broad = _as_dict(bfs_hops(ds, seed_prefix="u2"))
    shuf = _as_dict(bfs_hops(ds, seed_prefix="u2", edge_cap=0))
    assert broad == shuf == _brute_hops(pairs, "u2")


def test_hops_exactness_and_cutoff(ray_session):
    # a path out of the single seed: hop i node gets distance i,
    # nodes beyond n_rounds are absent
    pairs = [("seed", "h1")] + [(f"h{i}", f"h{i + 1}")
                                for i in range(1, 10)]
    got = _as_dict(bfs_hops(_triples_ds(pairs), seed_prefix="seed",
                            n_rounds=4))
    assert got == {"seed": 0, "h1": 1, "h2": 2, "h3": 3, "h4": 4}


def test_hops_no_seeds_empty(ray_session):
    pairs = [("a", "b")]
    ds = _triples_ds(pairs)
    assert len(bfs_hops(ds, seed_prefix="zzz").to_pandas()) == 0
    assert len(bfs_hops(ds, seed_prefix="zzz",
                        edge_cap=0).to_pandas()) == 0


def test_shared_fold_matches_own_fold(ray_session):
    # the fold_vocab hand-off must be a pure refactor: pagerank, ppr
    # and kcore give bit-identical results with and without `folded=`
    from orionbelt_ontology_builder_ray.stages.components import (
        fold_vocab, kcore_fixed_rounds)
    from orionbelt_ontology_builder_ray.stages.pagerank import (
        pagerank_fixed_point)

    pairs = _random_pairs(13, 40, 160)
    ds = _triples_ds(pairs)
    edges = entity_edges(ds).materialize()
    folded = fold_vocab(edges)
    for kw in ({}, {"seed_prefix": "u1"}):
        own = pagerank_fixed_point(None, edges=edges, **kw).to_pandas()
        shared = pagerank_fixed_point(None, edges=edges, folded=folded,
                                      **kw).to_pandas()
        o = dict(zip(own["uri"], own["r"].astype(int)))
        s = dict(zip(shared["uri"], shared["r"].astype(int)))
        assert o == s
    assert _as_dict(kcore_fixed_rounds(None, edges=edges,
                                       folded=folded)) \
        == _as_dict(kcore_fixed_rounds(None, edges=edges))


def test_graph_min_rounds_shares_fold(ray_session):
    pairs = _random_pairs(5, 25, 60)
    ds = _triples_ds(pairs)
    edges = entity_edges(ds).materialize()
    cc, hop = graph_min_rounds(ds, seed_prefix="u1", edges=edges)
    assert _as_dict(cc) == _brute_cc(pairs)
    assert _as_dict(hop) == _brute_hops(pairs, "u1")


def _brute_kcore(pairs, k=3, n_rounds=6):
    und = {(min(s, d), max(s, d)) for s, d in pairs if s != d}
    alive = {x for e in und for x in e}

    def degrees(alive):
        deg = {u: 0 for u in alive}
        for a, b in und:
            if a in alive and b in alive:
                deg[a] += 1
                deg[b] += 1
        return deg

    for _ in range(n_rounds):
        deg = degrees(alive)
        alive = {u for u in alive if deg[u] >= k}
    return {u: d for u, d in degrees(alive).items()}


@pytest.mark.parametrize("seed,n_nodes,n_edges",
                         [(3, 30, 120), (11, 50, 90)])
def test_kcore_broadcast_matches_brute(ray_session, seed, n_nodes,
                                       n_edges):
    from orionbelt_ontology_builder_ray.stages.components import (
        kcore_fixed_rounds)

    pairs = _random_pairs(seed, n_nodes, n_edges)
    got = _as_dict(kcore_fixed_rounds(_triples_ds(pairs)))
    assert got == _brute_kcore(pairs)


def test_kcore_shuffle_matches_broadcast(ray_session):
    from orionbelt_ontology_builder_ray.stages.components import (
        kcore_fixed_rounds)

    pairs = _random_pairs(7, 25, 80)
    ds = _triples_ds(pairs)
    broad = _as_dict(kcore_fixed_rounds(ds))
    shuf = _as_dict(kcore_fixed_rounds(ds, edge_cap=0))
    assert broad == shuf == _brute_kcore(pairs)


def test_kcore_known_graphs(ray_session):
    from orionbelt_ontology_builder_ray.stages.components import (
        kcore_fixed_rounds)

    # K5: every node keeps degree 4 >= 3 forever
    k5 = [(a, b) for a in "abcde" for b in "abcde" if a < b]
    got = _as_dict(kcore_fixed_rounds(_triples_ds(k5)))
    assert got == {c: 4 for c in "abcde"}
    # a path graph peels completely at k=3
    path = [(f"n{i}", f"n{i + 1}") for i in range(10)]
    assert _as_dict(kcore_fixed_rounds(_triples_ds(path))) == {}
    # K4 plus a pendant: pendant peels round 1, K4 survives (deg 3);
    # the K4 member attached to the pendant drops from 4 to 3
    k4p = [(a, b) for a in "abcd" for b in "abcd" if a < b] \
        + [("a", "pend")]
    got = _as_dict(kcore_fixed_rounds(_triples_ds(k4p)))
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}
    assert got == _brute_kcore(k4p)


def _mention_ds(rows):
    import ray.data as rd

    n = len(rows)
    return rd.from_arrow(pa.table({
        "subject": [t for t, _ in rows], "predicate": ["m"] * n,
        "object": [e for _, e in rows], "object_kind": ["uri"] * n,
        "lang": [""] * n, "datatype": [""] * n}))


def test_comention_pairs_matches_brute(ray_session):
    from itertools import combinations

    from orionbelt_ontology_builder_ray.stages.components import (
        comention_pairs)

    rng = np.random.RandomState(5)
    rows = sorted({(f"t{int(t)}", f"e{int(e)}")
                   for t, e in zip(rng.randint(0, 40, 300),
                                   rng.randint(0, 12, 300))})
    by_turn = {}
    for t, e in rows:
        by_turn.setdefault(t, set()).add(e)
    want = {}
    for ents in by_turn.values():
        for a, b in combinations(sorted(ents), 2):
            want[(a, b)] = want.get((a, b), 0) + 1

    got_df = comention_pairs(_mention_ds(rows), "m").to_pandas()
    got = {(a, b): int(n) for a, b, n in
           zip(got_df["a"], got_df["b"], got_df["n"])}
    assert got == want
    # predicate filter: nothing matches an absent predicate
    assert len(comention_pairs(_mention_ds(rows),
                               "nope").to_pandas()) == 0


def test_comention_pmi_matches_brute(ray_session):
    import math
    from itertools import combinations

    from orionbelt_ontology_builder_ray.stages.components import (
        comention_pmi)

    rng = np.random.RandomState(9)
    rows = sorted({(f"t{int(t)}", f"e{int(e)}")
                   for t, e in zip(rng.randint(0, 30, 200),
                                   rng.randint(0, 10, 200))})
    by_turn, per_ent = {}, {}
    for t, e in rows:
        by_turn.setdefault(t, set()).add(e)
        per_ent[e] = per_ent.get(e, 0) + 1
    T = len(by_turn)
    nab = {}
    for ents in by_turn.values():
        for a, b in combinations(sorted(ents), 2):
            nab[(a, b)] = nab.get((a, b), 0) + 1
    want = {p: int(round(math.log(n * T / (per_ent[p[0]]
                                           * per_ent[p[1]])) * 1e6))
            for p, n in nab.items()}

    got_df = comention_pmi(_mention_ds(rows), "m").to_pandas()
    got = {(a, b): int(v) for a, b, v in
           zip(got_df["a"], got_df["b"], got_df["pmi_e6"])}
    assert got == want
    # co-mentions rarer than independence predicts score negative
    assert min(got.values()) < 0 or all(n * T >= per_ent[a] * per_ent[b]
                                        for (a, b), n in nab.items())


def test_empty_graph(ray_session):
    import ray.data as rd

    t = pa.table({"subject": ["a"], "predicate": ["p"], "object": ["x"],
                  "object_kind": ["literal"], "lang": [""],
                  "datatype": [""]})
    cc, hop = graph_min_rounds(rd.from_arrow(t), seed_prefix="a")
    assert len(cc.to_pandas()) == 0 and len(hop.to_pandas()) == 0


# ---------------------------------------------------------------------------
# link prediction (linkpred_scores)
# ---------------------------------------------------------------------------


def _edges_ds(edges):
    import ray.data as rd

    a = [x for x, _ in edges]
    b = [y for _, y in edges]
    return rd.from_arrow(pa.table({
        "a": pa.array(a, pa.string()), "b": pa.array(b, pa.string()),
        "n": pa.array([1] * len(edges), pa.int64())}))


def _brute_linkpred(edges):
    adj = _und(edges)
    deg = {u: len(vs) for u, vs in adj.items()}
    out = {}
    for c, nbrs in adj.items():
        ns = sorted(nbrs)
        if len(ns) < 2:
            continue
        w = int(np.round(1e6 / np.log(deg[c])))
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                k = (ns[i], ns[j])
                cn, aa = out.get(k, (0, 0))
                out[k] = (cn + 1, aa + w)
    rows = {}
    for (x, y), (cn, aa) in out.items():
        den = deg[x] + deg[y] - cn
        jac = (2_000_000 * cn + den) // (2 * den)
        rows[(x, y)] = (cn, jac, aa)
    return rows


def _distinct_und_edges(seed, n_nodes, n_edges):
    seen, out = set(), []
    for s, d in _random_pairs(seed, n_nodes, n_edges):
        if s == d:
            continue
        lo, hi = min(s, d), max(s, d)
        if (lo, hi) not in seen:
            seen.add((lo, hi))
            out.append((lo, hi))
    return out


@pytest.mark.parametrize("seed", [7, 21])
def test_linkpred_brute_parity(ray_session, seed):
    from orionbelt_ontology_builder_ray.stages.components import linkpred_scores

    edges = _distinct_und_edges(seed, 18, 40)
    got = linkpred_scores(_edges_ds(edges), num_buckets=4).to_pandas()
    rows = {(r.a, r.b): (r.cn, r.jac_e6, r.aa_e6)
            for r in got.itertuples(index=False)}
    assert rows == _brute_linkpred(edges)
    assert (got["a"] < got["b"]).all()


def test_linkpred_triangle(ray_session):
    # K3: every pair has exactly one common neighbor; deg = 2
    # everywhere -> jac = round_half_up(1e6 * 1 / 3) = 333333,
    # aa = round(1e6 / ln 2) = 1442695
    from orionbelt_ontology_builder_ray.stages.components import linkpred_scores

    edges = [("a", "b"), ("a", "c"), ("b", "c")]
    got = linkpred_scores(_edges_ds(edges)).to_pandas()
    assert len(got) == 3
    assert set(got["cn"]) == {1}
    assert set(got["jac_e6"]) == {333333}
    assert set(got["aa_e6"]) == {int(np.round(1e6 / np.log(2)))}


def test_linkpred_path_and_empty(ray_session):
    from orionbelt_ontology_builder_ray.stages.components import linkpred_scores

    # path a-b-c: one wedge pair (a, c); cn=1, deg a=c=1, den=1 ->
    # jac = 1e6 exactly; center b has deg 2
    got = linkpred_scores(_edges_ds([("a", "b"), ("b", "c")])).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["a"], r["b"], r["cn"], r["jac_e6"]) == ("a", "c", 1, 1000000)
    # single edge: no wedges at all
    got = linkpred_scores(_edges_ds([("a", "b")])).to_pandas()
    assert len(got) == 0
    # empty input
    got = linkpred_scores(_edges_ds([])).to_pandas()
    assert len(got) == 0


def test_linkpred_deg_cap(ray_session):
    # star center with deg 5 dropped by deg_cap=4 -> no pairs remain
    from orionbelt_ontology_builder_ray.stages.components import linkpred_scores

    edges = [("hub", f"x{i}") for i in range(5)]
    assert len(linkpred_scores(_edges_ds(edges)).to_pandas()) == 10
    assert len(linkpred_scores(_edges_ds(edges),
                               deg_cap=4).to_pandas()) == 0


# ---------------------------------------------------------------------------
# label-propagation communities (lpa_communities)
# ---------------------------------------------------------------------------


def _brute_lpa(pairs, n_rounds=4):
    adj = _und(pairs)
    lab = {u: u for u in adj}
    for _ in range(n_rounds):
        new = {}
        for v, nbrs in adj.items():
            cnt = {}
            for u in nbrs:
                cnt[lab[u]] = cnt.get(lab[u], 0) + 1
            new[v] = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        lab = new
    sizes = {}
    for x in lab.values():
        sizes[x] = sizes.get(x, 0) + 1
    return {u: sizes[lab[u]] for u in adj}


@pytest.mark.parametrize("seed,n_nodes,n_edges",
                         [(3, 60, 70), (11, 40, 200)])
def test_lpa_broadcast_matches_brute(ray_session, seed, n_nodes,
                                     n_edges):
    from orionbelt_ontology_builder_ray.stages.components import lpa_communities

    pairs = _random_pairs(seed, n_nodes, n_edges)
    got = _as_dict(lpa_communities(_triples_ds(pairs)))
    assert got == _brute_lpa(pairs)


def test_lpa_shuffle_matches_broadcast(ray_session):
    from orionbelt_ontology_builder_ray.stages.components import lpa_communities

    pairs = _random_pairs(7, 30, 40)
    ds = _triples_ds(pairs)
    broad = _as_dict(lpa_communities(ds))
    shuf = _as_dict(lpa_communities(ds, edge_cap=0))
    assert broad == shuf == _brute_lpa(pairs)


def test_lpa_two_triangles_bridge(ray_session):
    # two triangles joined by one bridge edge: LPA keeps them as two
    # communities of 3 (each triangle's majority beats the bridge)
    from orionbelt_ontology_builder_ray.stages.components import lpa_communities

    pairs = [("a1", "a2"), ("a1", "a3"), ("a2", "a3"),
             ("b1", "b2"), ("b1", "b3"), ("b2", "b3"), ("a3", "b1")]
    got = _as_dict(lpa_communities(_triples_ds(pairs)))
    assert got == _brute_lpa(pairs)
    assert got["a1"] == got["a2"] == 3 and got["b2"] == got["b3"] == 3


def test_lpa_k3_converges_and_empty(ray_session):
    from orionbelt_ontology_builder_ray.stages.components import lpa_communities

    got = _as_dict(lpa_communities(_triples_ds(
        [("a", "b"), ("a", "c"), ("b", "c")])))
    assert got == {"a": 3, "b": 3, "c": 3}
    t = pa.table({"subject": ["x"], "predicate": ["p"], "object": ["lit"],
                  "object_kind": ["literal"], "lang": [""],
                  "datatype": [""]})
    import ray.data as rd
    assert len(lpa_communities(rd.from_arrow(t)).to_pandas()) == 0


def test_lpa_oscillation_is_deterministic(ray_session):
    # a single edge oscillates under sync LPA; the fixed-round
    # contract pins the (possibly unconverged) state identically in
    # both paths and the brute reference
    from orionbelt_ontology_builder_ray.stages.components import lpa_communities

    pairs = [("a", "b")]
    got = _as_dict(lpa_communities(_triples_ds(pairs)))
    assert got == _brute_lpa(pairs)
    got5 = _as_dict(lpa_communities(_triples_ds(pairs), n_rounds=5))
    assert got5 == _brute_lpa(pairs, n_rounds=5)


# ---------------------------------------------------------------------------
# entity mention time spans (mention_time_spans)
# ---------------------------------------------------------------------------


def _mention_triples(rows):
    # rows: (turn, ent, iso) — one mention + one atTime row per input
    import ray.data as rd

    subj, pred, obj = [], [], []
    seen_ts = set()
    for turn, ent, iso in rows:
        subj.append(turn)
        pred.append("m")
        obj.append(ent)
        if turn not in seen_ts:
            seen_ts.add(turn)
            subj.append(turn)
            pred.append("at")
            obj.append(iso)
    n = len(subj)
    return rd.from_arrow(pa.table({
        "subject": subj, "predicate": pred, "object": obj,
        "object_kind": ["uri"] * n, "lang": [""] * n,
        "datatype": [""] * n}))


def test_mention_time_spans_brute(ray_session):
    import pandas as pd

    from orionbelt_ontology_builder_ray.stages.components import (
        mention_time_spans)

    rows = [("t1", "e1", "2025-01-02T03:04:05.000001"),
            ("t2", "e1", "2025-01-01T00:00:00.500000"),
            ("t2", "e2", "2025-01-01T00:00:00.500000"),
            ("t3", "e2", "2025-06-30T23:59:59.999999"),
            ("t3", "e1", "2025-06-30T23:59:59.999999")]
    got = mention_time_spans(_mention_triples(rows), "m", "at") \
        .to_pandas().set_index("ent")
    us = {iso: int(pd.to_datetime(iso).value // 1000)
          for _, _, iso in rows}
    assert int(got.loc["e1", "first_us"]) \
        == us["2025-01-01T00:00:00.500000"]
    assert int(got.loc["e1", "last_us"]) \
        == us["2025-06-30T23:59:59.999999"]
    assert int(got.loc["e2", "first_us"]) \
        == us["2025-01-01T00:00:00.500000"]
    assert len(got) == 2


def test_mention_time_spans_partition_invariant(ray_session):
    from orionbelt_ontology_builder_ray.stages.components import (
        mention_time_spans)

    rng = np.random.RandomState(13)
    rows = [(f"t{i}", f"e{rng.randint(8)}",
             f"2025-01-{1 + rng.randint(28):02d}T0{rng.randint(9)}"
             ":00:00.000000")
            for i in range(60)]
    ds1 = _mention_triples(rows).repartition(1)
    ds9 = _mention_triples(rows).repartition(9)
    a = mention_time_spans(ds1, "m", "at").to_pandas() \
        .sort_values("ent").reset_index(drop=True)
    b = mention_time_spans(ds9, "m", "at").to_pandas() \
        .sort_values("ent").reset_index(drop=True)
    assert a.equals(b)


def test_mention_time_spans_empty(ray_session):
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.components import (
        mention_time_spans)

    t = pa.table({"subject": ["x"], "predicate": ["p"], "object": ["y"],
                  "object_kind": ["uri"], "lang": [""], "datatype": [""]})
    assert len(mention_time_spans(rd.from_arrow(t), "m", "at")
               .to_pandas()) == 0
