"""BGP (basic-graph-pattern) matcher: brute-force join parity,
filters, planning guards (stages/bgp.py)."""

import numpy as np
import pandas as pd
import pytest

from orionbelt_ontology_builder_ray.stages.bgp import (
    bgp_bindings_tagged, match_bgp)

EX = "http://ex.org/"
TYPE = EX + "type"
KNOWS = EX + "knows"
NAME = EX + "name"
PERSON = EX + "Person"


def _triples_df():
    rows = [
        (EX + "a", TYPE, PERSON),
        (EX + "b", TYPE, PERSON),
        (EX + "c", TYPE, EX + "Robot"),
        (EX + "a", KNOWS, EX + "b"),
        (EX + "a", KNOWS, EX + "c"),
        (EX + "b", KNOWS, EX + "a"),
        (EX + "a", NAME, "Alice"),
        (EX + "b", NAME, "Bob"),
        (EX + "c", NAME, "Càrl"),
        (EX + "loop", EX + "self", EX + "loop"),
    ]
    return pd.DataFrame(rows, columns=["subject", "predicate", "object"])


def _ds(ray_session, df, blocks=3):
    import ray.data as rd

    return rd.from_pandas(df).repartition(blocks)


def _brute(df, patterns, select=None, filters=()):
    """Reference evaluator: pandas merges in the given order."""
    acc = None
    for pat in patterns:
        m = df
        names = {}
        for col, t in zip(("subject", "predicate", "object"), pat):
            if t.startswith("?"):
                names[col] = t[1:]
            else:
                m = m[m[col] == t]
        # repeated var inside a pattern
        cols = list(names)
        for a in cols:
            for b in cols:
                if a < b and names[a] == names[b]:
                    m = m[m[a] == m[b]]
        part = m[cols].rename(columns=names)
        part = part.loc[:, ~part.columns.duplicated()]
        if acc is None:
            acc = part
        else:
            on = [c for c in acc.columns if c in part.columns]
            acc = acc.merge(part, on=on, how="inner")
    for a, op, b in filters:
        lhs = acc[a[1:]]
        rhs = acc[b[1:]] if b.startswith("?") else b
        acc = acc[eval(f"lhs {op if op != '=' else '=='} rhs")]
    keep = sorted(acc.columns) if select is None else [v[1:] for v in select]
    return acc[keep].reset_index(drop=True)


def _canon(df):
    df = df[sorted(df.columns)].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("patterns,select,filters", [
    # single pattern, one constant
    ([("?s", TYPE, PERSON)], None, ()),
    # subject-subject join
    ([("?s", TYPE, PERSON), ("?s", NAME, "?n")], None, ()),
    # chain join across subject/object
    ([("?a", KNOWS, "?b"), ("?b", TYPE, PERSON)], None, ()),
    # 3-pattern chain + projection
    ([("?a", KNOWS, "?b"), ("?b", TYPE, PERSON), ("?a", NAME, "?n")],
     ["?n", "?b"], ()),
    # self-join with inequality filter
    ([("?t", KNOWS, "?x"), ("?t", KNOWS, "?y")], ["?x", "?y"],
     [("?x", "<", "?y")]),
    # filter against a constant
    ([("?s", NAME, "?n")], None, [("?n", ">=", "B")]),
])
def test_bgp_matches_brute_force(ray_session, patterns, select, filters):
    df = _triples_df()
    got = match_bgp(_ds(ray_session, df), patterns, select=select,
                    filters=filters, num_buckets=4).to_pandas()
    want = _brute(df, patterns, select=select, filters=filters)
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_repeated_var_in_one_pattern(ray_session):
    df = _triples_df()
    got = match_bgp(_ds(ray_session, df),
                    [("?x", EX + "self", "?x")]).to_pandas()
    assert sorted(got["x"]) == [EX + "loop"]


def test_multiset_semantics(ray_session):
    # projecting ?t away keeps one row per (t, x) solution
    df = _triples_df()
    got = match_bgp(_ds(ray_session, df),
                    [("?t", KNOWS, "?x"), ("?t", TYPE, PERSON)],
                    select=["?t"]).to_pandas()
    assert sorted(got["t"]) == [EX + "a", EX + "a", EX + "b"]


def test_disconnected_bgp_raises(ray_session):
    with pytest.raises(ValueError, match="disconnected"):
        match_bgp(_ds(ray_session, _triples_df()),
                  [("?a", TYPE, PERSON), ("?b", NAME, "?n")])


def test_unbound_select_and_filter_raise(ray_session):
    ds = _ds(ray_session, _triples_df())
    with pytest.raises(ValueError, match="not bound"):
        match_bgp(ds, [("?s", TYPE, PERSON)], select=["?zz"]).to_pandas()
    with pytest.raises(ValueError, match="unbound"):
        match_bgp(ds, [("?s", TYPE, PERSON)],
                  filters=[("?s", "<", "?zz")])


def test_bad_pattern_shape():
    with pytest.raises(ValueError):
        match_bgp(None, [("?s", TYPE)])
    with pytest.raises(ValueError):
        match_bgp(None, [])


def test_tagged_binding_fold(ray_session):
    out = bgp_bindings_tagged(
        _ds(ray_session, _triples_df()), "pn",
        [("?s", TYPE, PERSON), ("?s", NAME, "?n")]).to_pandas()
    assert set(out["q"]) == {"pn"}
    assert f"?n=Alice|?s={EX}a" in set(out["binding"])
    assert len(out) == 2


def test_partition_invariance(ray_session):
    df = _triples_df()
    pats = [("?a", KNOWS, "?b"), ("?b", NAME, "?n")]
    one = match_bgp(_ds(ray_session, df, blocks=1), pats,
                    num_buckets=2).to_pandas()
    many = match_bgp(_ds(ray_session, df, blocks=7), pats,
                     num_buckets=16).to_pandas()
    pd.testing.assert_frame_equal(_canon(one), _canon(many))


def test_optional_left_join(ray_session):
    df = _triples_df()
    # every Person, optionally their knows target: 'a' knows b,c;
    # 'b' knows a; no unmatched person here, so extend with 'd'
    df2 = pd.concat([df, pd.DataFrame(
        [(EX + "d", TYPE, PERSON)],
        columns=["subject", "predicate", "object"])], ignore_index=True)
    got = match_bgp(_ds(ray_session, df2),
                    [("?p", TYPE, PERSON)],
                    optional=[("?p", KNOWS, "?x")]).to_pandas()
    rows = set(zip(got["p"], got["x"].where(got["x"].notna(), "NULL")))
    assert rows == {(EX + "a", EX + "b"), (EX + "a", EX + "c"),
                    (EX + "b", EX + "a"), (EX + "d", "NULL")}


def test_optional_fold_null_sentinel(ray_session):
    df = pd.concat([_triples_df(), pd.DataFrame(
        [(EX + "d", TYPE, PERSON)],
        columns=["subject", "predicate", "object"])], ignore_index=True)
    out = bgp_bindings_tagged(_ds(ray_session, df), "opt",
                              [("?p", TYPE, PERSON)],
                              optional=[("?p", KNOWS, "?x")]).to_pandas()
    assert f"?p={EX}d|?x=NULL" in set(out["binding"])


def test_optional_guards(ray_session):
    ds = _ds(ray_session, _triples_df())
    with pytest.raises(ValueError, match="shares no variable"):
        match_bgp(ds, [("?p", TYPE, PERSON)],
                  optional=[("?z", KNOWS, "?w")])
    with pytest.raises(ValueError, match="nullable optional"):
        match_bgp(ds, [("?p", TYPE, PERSON)],
                  optional=[("?p", KNOWS, "?x"),
                            ("?x", NAME, "?n")])


def _closure_brute(edges):
    """Floyd-Warshall-ish reference closure over string pairs."""
    cur = set(edges)
    while True:
        new = cur | {(s, e2) for (s, e) in cur for (s2, e2) in cur
                     if e == s2}
        if new == cur:
            return cur
        cur = new


def _edges_ds(ray_session, edges, pred=EX + "sub", blocks=3):
    import ray.data as rd

    df = pd.DataFrame([(s, pred, o) for s, o in edges],
                      columns=["subject", "predicate", "object"])
    # noise rows under another predicate must be ignored
    noise = pd.DataFrame([(EX + "x", EX + "other", EX + "y")],
                         columns=df.columns)
    return rd.from_pandas(pd.concat([df, noise], ignore_index=True)) \
        .repartition(blocks)


@pytest.mark.parametrize("edges", [
    # 5-deep chain (needs 3 doubling rounds)
    [(f"{EX}n{i}", f"{EX}n{i+1}") for i in range(5)],
    # branching DAG
    [(EX + "a", EX + "b"), (EX + "a", EX + "c"), (EX + "b", EX + "d"),
     (EX + "c", EX + "d"), (EX + "d", EX + "e")],
    # cycle (closure is finite: every node reaches every node)
    [(EX + "a", EX + "b"), (EX + "b", EX + "c"), (EX + "c", EX + "a")],
])
def test_property_path_closure_brute_force(ray_session, edges):
    from orionbelt_ontology_builder_ray.stages.bgp import (
        property_path_closure)

    got = property_path_closure(_edges_ds(ray_session, edges),
                                EX + "sub", num_buckets=4).to_pandas()
    assert set(zip(got["s"], got["e"])) == _closure_brute(edges)
    assert len(got) == len(_closure_brute(edges))  # distinct


def test_property_path_closure_empty(ray_session):
    from orionbelt_ontology_builder_ray.stages.bgp import (
        property_path_closure)

    got = property_path_closure(
        _edges_ds(ray_session, []), EX + "sub").to_pandas()
    assert len(got) == 0


def test_bgp_group_count(ray_session):
    from orionbelt_ontology_builder_ray.stages.bgp import bgp_group_count

    out = bgp_group_count(
        _ds(ray_session, _triples_df()), "knows_counts",
        [("?p", KNOWS, "?x")], by="?p").to_pandas()
    got = dict(b.split("|?n=") for b in out["binding"])
    assert got == {f"?p={EX}a": "2", f"?p={EX}b": "1"}
    assert set(out["q"]) == {"knows_counts"}


def test_shuffle_path_equals_broadcast(ray_session, monkeypatch):
    """Force the bucket-hash shuffle join (cap=0) and pin equality
    with the default broadcast path."""
    import orionbelt_ontology_builder_ray.stages.bgp as bgp_mod

    df = _triples_df()
    pats = [("?a", KNOWS, "?b"), ("?b", TYPE, PERSON), ("?a", NAME, "?n")]
    want = match_bgp(_ds(ray_session, df), pats).to_pandas()
    monkeypatch.setattr(bgp_mod, "BGP_BROADCAST_ROWS", 0)
    got = match_bgp(_ds(ray_session, df), pats).to_pandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(want))
    # OPTIONAL through the shuffle path too
    opt_want_rows = {f"?p={EX}c|?x=NULL"}
    out = bgp_bindings_tagged(
        _ds(ray_session, df), "o",
        [("?p", TYPE, EX + "Robot")],
        optional=[("?p", KNOWS, "?x")]).to_pandas()
    assert set(out["binding"]) == opt_want_rows


def test_construct_triples(ray_session):
    from orionbelt_ontology_builder_ray.stages.bgp import construct_triples

    out = construct_triples(
        _ds(ray_session, _triples_df()),
        [("?t", KNOWS, "?x")],
        template=("?t", EX + "acquaintedWith", "?x")).to_pandas()
    assert list(out.columns) == ["subject", "predicate", "object",
                                 "object_kind", "lang", "datatype"]
    got = set(zip(out["subject"], out["object"], out["object_kind"]))
    assert got == {(EX + "a", EX + "b", "uri"), (EX + "a", EX + "c", "uri"),
                   (EX + "b", EX + "a", "uri")}
    assert set(out["predicate"]) == {EX + "acquaintedWith"}


def test_construct_distinct_and_literal_kind(ray_session):
    from orionbelt_ontology_builder_ray.stages.bgp import construct_triples

    # names are literals; two turns knowing the same x would emit dup
    # triples -> CONSTRUCT dedups (set semantics)
    df = pd.concat([_triples_df(), _triples_df()], ignore_index=True)
    out = construct_triples(
        _ds(ray_session, df.drop_duplicates()),
        [("?p", NAME, "?n")],
        template=("?p", EX + "label", "?n")).to_pandas()
    assert len(out) == 3
    assert set(out["object_kind"]) == {"literal"}
    # constant subject template
    out2 = construct_triples(
        _ds(ray_session, _triples_df()),
        [("?p", TYPE, PERSON)],
        template=(EX + "group", EX + "hasMember", "?p")).to_pandas()
    assert set(out2["subject"]) == {EX + "group"}
    assert len(out2) == 2


def test_minus_anti_join(ray_session):
    # Persons MINUS {knows anything}: a knows, b knows -> only none;
    # add person d with no knows edge
    df = pd.concat([_triples_df(), pd.DataFrame(
        [(EX + "d", TYPE, PERSON)],
        columns=["subject", "predicate", "object"])], ignore_index=True)
    got = match_bgp(_ds(ray_session, df),
                    [("?p", TYPE, PERSON)],
                    minus=[("?p", KNOWS, "?x")]).to_pandas()
    assert sorted(got["p"]) == [EX + "d"]


def test_minus_shuffle_path(ray_session, monkeypatch):
    import orionbelt_ontology_builder_ray.stages.bgp as bgp_mod

    df = pd.concat([_triples_df(), pd.DataFrame(
        [(EX + "d", TYPE, PERSON)],
        columns=["subject", "predicate", "object"])], ignore_index=True)
    monkeypatch.setattr(bgp_mod, "BGP_BROADCAST_ROWS", 0)
    got = match_bgp(_ds(ray_session, df),
                    [("?p", TYPE, PERSON)],
                    minus=[("?p", KNOWS, "?x")]).to_pandas()
    assert sorted(got["p"]) == [EX + "d"]


def test_minus_guard(ray_session):
    with pytest.raises(ValueError, match="shares no variable"):
        match_bgp(_ds(ray_session, _triples_df()),
                  [("?p", TYPE, PERSON)],
                  minus=[("?z", KNOWS, "?w")])


def test_path_source_pruned_read(ray_session, tmp_path):
    """match_bgp/closure accept a parquet PATH: pattern scans become
    pruned reads (parquet filter + column projection); results equal
    the Dataset-input evaluation."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from orionbelt_ontology_builder_ray.stages.bgp import (
        property_path_closure)

    df = _triples_df()
    store = str(tmp_path / "store")
    import os

    os.makedirs(store)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(store, "part.parquet"))
    pats = [("?a", KNOWS, "?b"), ("?b", TYPE, PERSON)]
    from_ds = match_bgp(_ds(ray_session, df), pats).to_pandas()
    from_path = match_bgp(store, pats).to_pandas()
    pd.testing.assert_frame_equal(_canon(from_path), _canon(from_ds))
    # closure over a path source too
    got = property_path_closure(store, EX + "self").to_pandas()
    assert set(zip(got["s"], got["e"])) == {(EX + "loop", EX + "loop")}


def test_predicate_partitioned_store(ray_session, tmp_path):
    """write_store_by_predicate -> hive layout; BGP over the
    partitioned path equals the flat evaluation (file-level pruning
    is a layout optimization, never a semantic change)."""
    import os

    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.bgp import (
        predicate_partition_key, write_store_by_predicate)

    df = _triples_df()
    out = str(tmp_path / "bystore")
    write_store_by_predicate(rd.from_pandas(df).repartition(3), out)
    # hive dirs per sanitized predicate local name
    dirs = {n for n in os.listdir(out) if n.startswith("pred_part=")}
    assert f"pred_part={predicate_partition_key(KNOWS)}" in dirs
    pats = [("?a", KNOWS, "?b"), ("?b", TYPE, PERSON), ("?a", NAME, "?n")]
    flat = match_bgp(_ds(ray_session, df), pats).to_pandas()
    part = match_bgp(out, pats).to_pandas()
    pd.testing.assert_frame_equal(_canon(part), _canon(flat))


def test_predicate_partition_key():
    from orionbelt_ontology_builder_ray.stages.bgp import (
        predicate_partition_key)

    assert predicate_partition_key("http://a/b#knows") == "knows"
    assert predicate_partition_key("http://a/b/rel") == "rel"
    assert predicate_partition_key("http://a/b#x y:z") == "x_y_z"
    assert predicate_partition_key("") == "_"


def test_ask(ray_session):
    from orionbelt_ontology_builder_ray.stages.bgp import ask

    ds = _ds(ray_session, _triples_df())
    assert ask(ds, [("?s", TYPE, PERSON)]) is True
    assert ask(ds, [("?s", TYPE, EX + "Unicorn")]) is False
    assert ask(ds, [("?s", TYPE, PERSON)],
               minus=[("?s", KNOWS, "?x")]) is False  # all persons know


def test_describe(ray_session, tmp_path):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from orionbelt_ontology_builder_ray.stages.bgp import describe

    df = _triples_df().assign(object_kind=lambda d: d["object"]
                              .str.startswith("http").map(
                                  {True: "uri", False: "literal"}),
                              lang="", datatype="")
    got = describe(_ds(ray_session, df), EX + "b").to_pandas()
    # outbound: b type Person, b knows a, b name Bob; inbound: a knows b
    assert len(got) == 4
    assert (got["subject"] == EX + "a").sum() == 1
    # path source equality
    store = str(tmp_path / "dstore"); os.makedirs(store)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(store, "p.parquet"))
    got2 = describe(store, EX + "b").to_pandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(got2))


def test_bgp_topk(ray_session):
    from orionbelt_ontology_builder_ray.stages.bgp import bgp_topk

    ds = _ds(ray_session, _triples_df(), blocks=5)
    top = bgp_topk(ds, [("?s", NAME, "?n")], order_by="?n", k=2,
                   descending=True).to_pandas()
    assert list(top["n"]) == ["Càrl", "Bob"]
    bottom = bgp_topk(ds, [("?s", NAME, "?n")], order_by="?n",
                      k=1).to_pandas()
    assert list(bottom["n"]) == ["Alice"]


def test_values_and_distinct(ray_session):
    ds = _ds(ray_session, _triples_df())
    # VALUES constrains ?x before the join
    got = match_bgp(ds, [("?t", KNOWS, "?x")],
                    values={"?x": [EX + "b", EX + "c"]}).to_pandas()
    assert set(got["x"]) == {EX + "b", EX + "c"}
    assert len(got) == 2
    # DISTINCT collapses the multiset
    multi = match_bgp(ds, [("?t", KNOWS, "?x"), ("?t", TYPE, PERSON)],
                      select=["?t"]).to_pandas()
    assert len(multi) == 3  # a,a,b
    dist = match_bgp(ds, [("?t", KNOWS, "?x"), ("?t", TYPE, PERSON)],
                     select=["?t"], distinct=True).to_pandas()
    assert sorted(dist["t"]) == [EX + "a", EX + "b"]
    # unbound VALUES var raises
    with pytest.raises(ValueError, match="VALUES"):
        match_bgp(ds, [("?t", KNOWS, "?x")], values={"?zz": ["a"]})
    with pytest.raises(ValueError, match="VALUES key"):
        match_bgp(ds, [("?t", KNOWS, "?x")], values={"x": ["a"]})


def test_hot_key_self_join(ray_session):
    """One subject with 120 objects -> the self-join must emit all
    120*119/2 filtered pairs even though every row lands in ONE
    bucket (quadratic output is the query's semantics; the bucket
    join must not truncate or duplicate it)."""
    import ray.data as rd

    n = 120
    hot = pd.DataFrame({
        "subject": [EX + "hot"] * n,
        "predicate": [KNOWS] * n,
        "object": [f"{EX}o{i:03d}" for i in range(n)]})
    cold = pd.DataFrame({
        "subject": [EX + f"c{i}" for i in range(50)],
        "predicate": [KNOWS] * 50,
        "object": [EX + "x"] * 50})
    ds = rd.from_pandas(pd.concat([hot, cold], ignore_index=True)) \
        .repartition(8)
    got = match_bgp(ds, [("?t", KNOWS, "?a"), ("?t", KNOWS, "?b")],
                    select=["?a", "?b"],
                    filters=[("?a", "<", "?b")], num_buckets=4).to_pandas()
    assert len(got) == n * (n - 1) // 2  # cold rows self-pair to none
    assert got["a"].min() == f"{EX}o000"
