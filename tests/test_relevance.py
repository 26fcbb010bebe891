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
