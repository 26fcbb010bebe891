"""TF-IDF top-k: both distributed paths vs a brute-force reference of
the documented e6 contract (stages/relevance.py)."""

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from orionbelt_ontology_builder_ray.stages.relevance import tfidf_topk
from orionbelt_ontology_builder_ray.stages.textops import _WS

_SPLIT = re.compile(f"[{_WS}]+").split


def _docs_ds(texts):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string())}))


def _brute(texts, k=3):
    n = len(texts)
    toks = [[w for w in _SPLIT(str(t)) if w] for t in texts]
    df = Counter()
    for ws in toks:
        df.update(set(ws))
    idf = {w: int(np.round(math.log(n / c) * 1e6)) for w, c in df.items()}
    rows = []
    for i, ws in enumerate(toks):
        if not ws:
            continue
        scored = sorted(((tf * idf[w], w) for w, tf in
                         Counter(ws).items()), key=lambda x: (-x[0], x[1]))
        for r, (s, w) in enumerate(scored[:k], 1):
            rows.append((i, r, w, s))
    return rows


def _got(ds_out, id_col="doc_id"):
    p = ds_out.to_pandas().sort_values([id_col, "rank"])
    return [tuple(x) for x in zip(p[id_col].astype(int), p["rank"].astype(int),
                                  p["token"], p["score_e6"].astype(int))]


def test_broadcast_matches_brute(ray_session):
    rng = np.random.RandomState(5)
    words = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(words, rng.randint(3, 25)))
             for _ in range(60)]
    got = _got(tfidf_topk(_docs_ds(texts), k=3))
    assert got == _brute(texts, 3)


def test_shuffle_fallback_matches_broadcast(ray_session):
    rng = np.random.RandomState(9)
    words = [f"w{i}" for i in range(20)]
    texts = [" ".join(rng.choice(words, rng.randint(1, 15)))
             for _ in range(40)]
    ds = _docs_ds(texts)
    assert _got(tfidf_topk(ds, k=3, df_cap=0)) == \
        _got(tfidf_topk(ds, k=3)) == _brute(texts, 3)


def test_empty_and_whitespace_docs_emit_nothing(ray_session):
    texts = ["alpha beta", "", " \t\n ", "alpha"]
    got = _got(tfidf_topk(_docs_ds(texts), k=2))
    assert sorted({r[0] for r in got}) == [0, 3]
    assert got == _brute(texts, 2)


def test_tie_breaks_by_token_ascending(ray_session):
    # same tf, same df for 'aa' and 'zz' -> identical scores; rank 1
    # must be 'aa' (token asc), in both paths
    texts = ["aa zz", "aa zz", "other other filler"]
    for cap in (None, 0):
        kw = {} if cap is None else {"df_cap": 0}
        got = _got(tfidf_topk(_docs_ds(texts), k=2, **kw))
        doc0 = [r for r in got if r[0] == 0]
        assert [r[2] for r in doc0] == ["aa", "zz"]
        assert doc0[0][3] == doc0[1][3]


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def _brute_bm25(texts, terms, k=10):
    toks = [[w for w in _SPLIT(str(t)) if w] for t in texts]
    n_docs = len(texts)
    n_tokens = sum(len(ws) for ws in toks)
    avgdl = n_tokens / n_docs
    idf = {}
    for t in sorted(set(terms)):
        df = sum(1 for ws in toks if t in ws)
        idf[t] = int(np.round(
            math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0) * 1e6))
    rows = []
    for i, ws in enumerate(toks):
        if not ws:
            continue
        dl = len(ws)
        c = Counter(ws)
        s = 0
        for t, iv in idf.items():
            tf = c.get(t, 0)
            if tf:
                frac = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
                s += int(np.round(iv * frac))
        if s > 0:
            rows.append((i, s))
    rows.sort(key=lambda x: (-x[1], x[0]))
    return [(r + 1, i, s) for r, (i, s) in enumerate(rows[:k])]


def test_bm25_matches_brute(ray_session):
    from orionbelt_ontology_builder_ray.stages.relevance import bm25_topk

    rng = np.random.RandomState(13)
    words = [f"w{i}" for i in range(25)] + ["hash", "join"]
    texts = [" ".join(rng.choice(words, rng.randint(3, 30)))
             for _ in range(50)]
    got = bm25_topk(_docs_ds(texts), ["hash", "join"], k=10)
    rows = [tuple(x) for x in zip(got["rank"].astype(int),
                                  got["doc_id"].astype(int),
                                  got["score_e6"].astype(int))]
    assert rows == _brute_bm25(texts, ["hash", "join"], 10)


def test_bm25_partition_invariance(ray_session):
    from orionbelt_ontology_builder_ray.stages.relevance import bm25_topk

    rng = np.random.RandomState(17)
    words = [f"w{i}" for i in range(15)] + ["scan"]
    texts = [" ".join(rng.choice(words, rng.randint(2, 20)))
             for _ in range(40)]
    import ray.data as rd
    import pyarrow as _pa

    def mk(blocks):
        ds = rd.from_arrow(_pa.table({
            "doc_id": _pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": _pa.array(texts, _pa.string())}))
        return ds.repartition(blocks)

    a = bm25_topk(mk(1), ["scan"], k=5)
    b = bm25_topk(mk(9), ["scan"], k=5)
    assert a.equals(b)


def test_bm25_absent_term_and_empty(ray_session):
    from orionbelt_ontology_builder_ray.stages.relevance import bm25_topk

    texts = ["alpha beta", "", "gamma alpha"]
    got = bm25_topk(_docs_ds(texts), ["nosuchterm"], k=5)
    assert len(got) == 0
    got2 = bm25_topk(_docs_ds(texts), ["alpha"], k=5)
    assert set(got2["doc_id"].astype(int)) == {0, 2}
