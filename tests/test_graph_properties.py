"""Hypothesis property tests for the round-5 graph / relevance /
sketch contracts: arbitrary small graphs and corpora vs the
brute-force references (these are the cross-engine parity contracts,
so randomized inputs are the right adversary)."""

import hashlib
import math
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from orionbelt_ontology_builder_ray.stages.pagerank import (
    _R0, _TELEPORT, entity_edges, pagerank_fixed_point, triangle_count)
from orionbelt_ontology_builder_ray.stages.textops import _WS

_SPLIT = re.compile(f"[{_WS}]+").split

# small node universe so random graphs are dense enough to be
# interesting (triangles, dangling nodes, hubs all occur)
edge_lists = st.lists(
    st.tuples(st.integers(0, 11), st.integers(0, 11)),
    min_size=1, max_size=60)

_SETTINGS = dict(max_examples=12, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])


def _triples_ds(pairs):
    import ray.data as rd

    src = [f"n{a}" for a, _ in pairs]
    dst = [f"n{b}" for _, b in pairs]
    n = len(pairs)
    return rd.from_arrow(pa.table({
        "subject": src, "predicate": ["p"] * n, "object": dst,
        "object_kind": ["uri"] * n, "lang": [""] * n,
        "datatype": [""] * n}))


def _brute_pagerank(pairs, n_iter=4):
    edges = sorted({(f"n{a}", f"n{b}") for a, b in pairs if a != b})
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    if n == 0:
        return {}
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


def _brute_triangles(pairs):
    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return sum(1 for a, b in und for _ in adj[a] & adj[b]) // 3


@settings(**_SETTINGS)
@given(pairs=edge_lists)
def test_pagerank_fixed_point_property(ray_session, pairs):
    got = pagerank_fixed_point(_triples_ds(pairs)).to_pandas()
    # Ray's to_pandas drops the schema on a 0-row dataset
    got = {} if not len(got) else \
        {u: int(r) for u, r in zip(got["uri"], got["r"])}
    assert got == _brute_pagerank(pairs)


@settings(**_SETTINGS)
@given(pairs=edge_lists)
def test_triangle_count_property(ray_session, pairs):
    edges = entity_edges(_triples_ds(pairs)).materialize()
    assert triangle_count(edges) == _brute_triangles(pairs)


# corpora with adversarial whitespace (tabs/newlines, empty docs)
docs_strategy = st.lists(
    st.text(alphabet="ab \t\n", min_size=0, max_size=20),
    min_size=1, max_size=12)


@settings(**_SETTINGS)
@given(texts=docs_strategy)
def test_hll_registers_property(ray_session, texts):
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.sketch import hll_registers

    ds = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    got = hll_registers(ds)
    toks = set()
    for t in texts:
        toks.update(w for w in _SPLIT(str(t)) if w)
    regs = np.zeros(256, dtype=np.int64)
    for w in toks:
        h = int(hashlib.md5(w.encode()).hexdigest()[:16], 16)
        j, rest = h >> 56, h & ((1 << 56) - 1)
        regs[j] = max(regs[j], 56 - rest.bit_length() + 1)
    assert np.array_equal(got, regs)


@settings(**_SETTINGS)
@given(texts=docs_strategy)
def test_tfidf_property(ray_session, texts):
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.relevance import tfidf_topk

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string())}))
    p = tfidf_topk(ds, k=2).to_pandas()
    if len(p):
        p = p.sort_values(["doc_id", "rank"])
        got = [tuple(x) for x in zip(p["doc_id"].astype(int),
                                     p["rank"].astype(int), p["token"],
                                     p["score_e6"].astype(int))]
    else:  # Ray's to_pandas drops the schema on a 0-row dataset
        got = []
    n = len(texts)
    toks = [[w for w in _SPLIT(str(t)) if w] for t in texts]
    df = Counter()
    for ws in toks:
        df.update(set(ws))
    idf = {w: int(np.round(math.log(n / c) * 1e6))
           for w, c in df.items()}
    exp = []
    for i, ws in enumerate(toks):
        if not ws:
            continue
        scored = sorted(((tf * idf[w], w) for w, tf in
                         Counter(ws).items()),
                        key=lambda x: (-x[0], x[1]))[:2]
        for r, (s, w) in enumerate(scored, 1):
            exp.append((i, r, w, s))
    assert got == exp


@settings(**_SETTINGS)
@given(texts=docs_strategy)
def test_bm25_property(ray_session, texts):
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.relevance import bm25_topk

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string())}))
    terms = ["a", "ab"]
    got = bm25_topk(ds, terms, k=5)
    rows = [tuple(x) for x in zip(got["rank"].astype(int),
                                  got["doc_id"].astype(int),
                                  got["score_e6"].astype(int))]
    toks = [[w for w in _SPLIT(str(t)) if w] for t in texts]
    n_docs = len(texts)
    n_tokens = sum(len(ws) for ws in toks)
    exp = []
    if n_tokens:
        avgdl = n_tokens / n_docs
        idf = {}
        for t in sorted(set(terms)):
            df = sum(1 for ws in toks if t in ws)
            idf[t] = int(np.round(
                math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0) * 1e6))
        scored = []
        for i, ws in enumerate(toks):
            if not ws:
                continue
            dl, c, s = len(ws), Counter(ws), 0
            for t, iv in idf.items():
                tf = c.get(t, 0)
                if tf:
                    frac = (tf * 2.2) / (
                        tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
                    s += int(np.round(iv * frac))
            if s > 0:
                scored.append((i, s))
        scored.sort(key=lambda x: (-x[1], x[0]))
        exp = [(r + 1, i, s) for r, (i, s) in enumerate(scored[:5])]
    assert rows == exp


@settings(**_SETTINGS)
@given(texts=docs_strategy)
def test_cms_property(ray_session, texts):
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.sketch import cms_counters

    ds = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    got = cms_counters(ds)
    ref = np.zeros((4, 1024), dtype=np.int64)
    c = Counter()
    for t in texts:
        c.update(w for w in _SPLIT(str(t)) if w)
    for tok, cnt in c.items():
        h = int(hashlib.md5(tok.encode()).hexdigest()[:16], 16)
        for r in range(4):
            ref[r][((h >> (16 * r)) & 0xFFFF) % 1024] += cnt
    assert np.array_equal(got, ref)
