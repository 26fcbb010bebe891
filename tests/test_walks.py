"""Deterministic seeded walks (stages/walks.py): distributed engine
vs a brute-force reference of the md5-argmin contract."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from orionbelt_ontology_builder_ray.stages.walks import seeded_walks


def _triples_ds(pairs, blocks=None):
    import ray.data as rd

    src = [s for s, _ in pairs]
    dst = [d for _, d in pairs]
    n = len(pairs)
    ds = rd.from_arrow(pa.table({
        "subject": src, "predicate": ["p"] * n, "object": dst,
        "object_kind": ["uri"] * n, "lang": [""] * n,
        "datatype": [""] * n}))
    return ds.repartition(blocks) if blocks else ds


def _und(pairs):
    adj = {}
    for s, d in pairs:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    return adj


def _brute_walks(pairs, prefix, n_steps=4):
    adj = _und(pairs)
    rows = []
    for seed in sorted(u for u in adj if u.startswith(prefix)):
        cur = seed
        rows.append((seed, 0, seed))
        for step in range(1, n_steps + 1):
            cur = min(
                adj[cur],
                key=lambda nbr: (hashlib.md5(
                    f"{seed}|{step}|{nbr}".encode()).hexdigest(), nbr))
            rows.append((seed, step, cur))
    return sorted(rows)


def _got(ds):
    df = ds.to_pandas()
    return sorted((w, int(s), n) for w, s, n
                  in zip(df["walk_id"], df["step"], df["node"]))


def _random_pairs(seed, n_nodes, n_edges):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n_nodes, n_edges)
    dst = rng.randint(0, n_nodes, n_edges)
    return [(f"u{int(s)}", f"u{int(d)}") for s, d in zip(src, dst)]


@pytest.mark.parametrize("seed", [3, 11])
def test_walks_match_brute(ray_session, seed):
    pairs = _random_pairs(seed, 40, 150)
    got = _got(seeded_walks(_triples_ds(pairs), seed_prefix="u1"))
    assert got == _brute_walks(pairs, "u1")


def test_walks_partition_invariant(ray_session):
    pairs = _random_pairs(7, 30, 90)
    a = _got(seeded_walks(_triples_ds(pairs, blocks=1), seed_prefix="u"))
    b = _got(seeded_walks(_triples_ds(pairs, blocks=9), seed_prefix="u"))
    assert a == b == _brute_walks(pairs, "u")


def test_walks_backtrack_on_pendant(ray_session):
    # seed's only neighbor is a dead-endish pendant: the walk must
    # oscillate seed -> x -> seed -> x ... (backtracking allowed)
    got = _got(seeded_walks(_triples_ds([("seed", "x")]),
                            seed_prefix="seed"))
    assert got == [("seed", 0, "seed"), ("seed", 1, "x"),
                   ("seed", 2, "seed"), ("seed", 3, "x"),
                   ("seed", 4, "seed")]


def test_walks_no_seeds_and_empty(ray_session):
    got = seeded_walks(_triples_ds([("a", "b")]),
                       seed_prefix="zzz").to_pandas()
    assert len(got) == 0
    import ray.data as rd

    t = pa.table({"subject": ["x"], "predicate": ["p"], "object": ["l"],
                  "object_kind": ["literal"], "lang": [""],
                  "datatype": [""]})
    assert len(seeded_walks(rd.from_arrow(t),
                            seed_prefix="x").to_pandas()) == 0
