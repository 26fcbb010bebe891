"""TF-IDF keyword relevance over the documents corpus.

The classic corpus-relevance primitive a training-data pipeline uses
for keyword-based quality filtering, topic tagging and near-duplicate
triage: per-document top-k salient terms scored ``tf * idf``.

Parity contract (the kmeans ROUND(,6) / e6 family):

- tokens: the repo-wide RE2/ASCII whitespace contract
  (``[^ \\t\\n\\r\\f\\v]+`` — textops._WS);
- ``df(token)`` = number of documents containing the token (exact
  integer, any engine);
- ``idf_e6(token) = round(ln(N / df) * 1e6)`` as BIGINT, where N is
  the TOTAL document-row count.  numpy's log and DuckDB's ln disagree
  in the last ulp on ~25% of integer ratios (measured), but the e6
  rounding absorbs it — a ratio sitting within an ulp of a
  half-microunit boundary could round apart, a measure-zero event on
  log values (the documented kmeans-contract trade);
- ``score_e6(doc, token) = tf * idf_e6`` — PURE int64 from here on,
  so ranking and output are bit-identical across engines;
- top-k per doc by ``(score_e6 DESC, token ASC)`` — fully
  deterministic tie-break, mirrored by ``ROW_NUMBER() OVER (... ORDER
  BY s DESC, token)``.

Scale shape: document frequencies build exactly like
``textops.corpus_vocab`` — per-batch DISTINCT-(token, doc) partial
counts (a batch ships its distinct tokens, never the token stream),
ONE token-hash bucket shuffle, per-bucket sums.  The df table is
vocabulary-sized; below ``DF_BROADCAST_CAP`` it folds on the driver
and broadcasts as one dict (``ray.put`` once, built per actor in
``__init__``), and the scoring pass streams the corpus ONCE with
per-doc Counters + top-k heap — zero shuffles touch the text.  Above
the cap, the shuffle fallback routes (doc, token, tf) rows through
the SAME token-hash buckets as the df partials (idf joins inside the
bucket — vocabulary co-location, not an all-to-all on docs), then one
doc-id groupby reassembles per-doc top-k.  Both paths are
pytest-pinned equal at cap=0.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .textops import _WS

# above this many distinct tokens the driver no longer folds the df
# table; ~50M tokens x ~40 B is the same driver-comfort bound as
# dedup._INCR_BROADCAST_MAX / pagerank's edge cap
DF_BROADCAST_CAP = 50_000_000


def _df_partials(ds, text_col: str, num_buckets: int):
    """Per-batch DISTINCT (token, doc) -> (token, df partial, bucket).
    One doc never spans batches (a doc is one row), so per-batch
    distinct-doc counts sum exactly to the global df."""
    split = re.compile(f"[{_WS}]+").split

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c = Counter()
        for t in b[text_col]:
            c.update(set(w for w in split(str(t)) if w))
        if not c:
            return pd.DataFrame({"token": pd.Series([], dtype=object),
                                 "df": pd.Series([], dtype=np.int64)})
        toks = np.fromiter(c.keys(), dtype=object, count=len(c))
        dfs = np.fromiter(c.values(), dtype=np.int64, count=len(c))
        h = pd.util.hash_pandas_object(pd.Series(toks, dtype=object),
                                       index=False)
        return pd.DataFrame({"token": toks, "df": dfs,
                             "_b": (h % num_buckets).astype(np.int32)})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("token", sort=False)["df"].sum().reset_index()
        return s

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby("_b").map_groups(per_bucket, batch_format="pandas")


def _idf_e6(df: np.ndarray, n_docs: int) -> np.ndarray:
    return np.round(np.log(n_docs / df.astype(np.float64)) * 1e6) \
        .astype(np.int64)


class _ScoreTopK:
    """Streaming scoring pass: per-doc token Counter -> tf * idf_e6 ->
    top-k by (score DESC, token ASC).  The idf dict builds ONCE per
    actor from the broadcast (token array, idf array) pair."""

    def __init__(self, idf_ref, k: int, id_col: str, text_col: str):
        import ray

        toks, idfs = ray.get(idf_ref)
        self._idf = dict(zip(toks, idfs.tolist()))
        self._k, self._id, self._text = k, id_col, text_col
        self._split = re.compile(f"[{_WS}]+").split

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        ids, ranks, toks, scores = [], [], [], []
        idf = self._idf
        for doc_id, t in zip(b[self._id], b[self._text]):
            c = Counter(w for w in self._split(str(t)) if w)
            if not c:
                continue
            scored = sorted(((tf * idf[w], w) for w, tf in c.items()),
                            key=lambda x: (-x[0], x[1]))[: self._k]
            for r, (s, w) in enumerate(scored, 1):
                ids.append(doc_id)
                ranks.append(r)
                toks.append(w)
                scores.append(s)
        return pd.DataFrame({
            self._id: pd.Series(ids, dtype=np.int64),
            "rank": pd.Series(ranks, dtype=np.int64),
            "token": pd.Series(toks, dtype=object),
            "score_e6": pd.Series(scores, dtype=np.int64)})


def tfidf_topk(ds, k: int = 3, id_col: str = "doc_id",
               text_col: str = "text", num_buckets: int = 64,
               df_cap: int = DF_BROADCAST_CAP, n_docs: int | None = None):
    """Per-document top-k TF-IDF terms.  Returns a Dataset of
    (id_col, rank 1..k, token, score_e6) — empty docs emit no rows.
    ``n_docs`` (the idf N) defaults to the full row count of ``ds``."""
    import ray

    from ..functions.terms import pool_spec

    work = ds.select_columns([id_col, text_col]).materialize()
    if n_docs is None:
        n_docs = work.count()
    dft = _df_partials(work, text_col, num_buckets).materialize()
    if dft.count() <= df_cap:
        dfp = dft.to_pandas()
        idf_ref = ray.put((dfp["token"].to_numpy(),
                           _idf_e6(dfp["df"].to_numpy(), n_docs)))
        return work.map_batches(
            _ScoreTopK, fn_constructor_kwargs=dict(
                idf_ref=idf_ref, k=k, id_col=id_col, text_col=text_col),
            batch_format="pandas", concurrency=pool_spec())
    return _tfidf_shuffle(work, dft, k, id_col, text_col, num_buckets,
                          n_docs)


def _tfidf_shuffle(work, dft, k, id_col, text_col, num_buckets, n_docs):
    """Above-cap path: (doc, token, tf) rows bucket by the SAME token
    hash as the df table, idf joins inside the bucket (vectorized
    merge), then one doc-id groupby takes the per-doc top-k.  Only
    (doc, token, tf) triples shuffle — distinct tokens per doc, never
    the token stream."""
    split = re.compile(f"[{_WS}]+").split

    def tf_rows(b: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        ids, toks, tfs = [], [], []
        for doc_id, t in zip(b[id_col], b[text_col]):
            for w, tf in Counter(
                    w for w in split(str(t)) if w).items():
                ids.append(doc_id)
                toks.append(w)
                tfs.append(tf)
        out = pd.DataFrame({
            id_col: pd.Series(ids, dtype=np.int64),
            "token": pd.Series(toks, dtype=object),
            "tf": pd.Series(tfs, dtype=np.int64)})
        h = pd.util.hash_pandas_object(out["token"], index=False)
        out["_b"] = (h % num_buckets).astype(np.int32)
        return out

    def df_tagged(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        h = pd.util.hash_pandas_object(out["token"], index=False)
        out["_b"] = (h % num_buckets).astype(np.int32)
        out[id_col] = np.int64(-1)
        out["tf"] = np.int64(-1)
        return out[[id_col, "token", "tf", "_b", "df"]]

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        dfs = g[g["tf"] < 0][["token", "df"]]
        rows = g[g["tf"] >= 0][[id_col, "token", "tf"]]
        if not len(rows):
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "token": pd.Series([], dtype=object),
                                 "score_e6": pd.Series([],
                                                       dtype=np.int64)})
        m = rows.merge(dfs, on="token", how="left")
        m["score_e6"] = m["tf"].to_numpy() * _idf_e6(
            m["df"].to_numpy(), n_docs)
        return m[[id_col, "token", "score_e6"]]

    def tf_with_nulls(b: pd.DataFrame) -> pd.DataFrame:
        out = tf_rows(b)
        out["df"] = np.int64(0)
        return out[[id_col, "token", "tf", "_b", "df"]]

    scored = (work.map_batches(tf_with_nulls, batch_format="pandas")
              .union(dft.map_batches(df_tagged, batch_format="pandas"))
              .groupby("_b").map_groups(join_bucket,
                                        batch_format="pandas"))

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score_e6", "token"], ascending=[False, True],
                          kind="mergesort").head(k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[[id_col, "rank", "token", "score_e6"]]

    return scored.groupby(id_col).map_groups(topk, batch_format="pandas")
