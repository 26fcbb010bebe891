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
    if dft.count() == 0:  # no tokens anywhere: no rows, typed schema
        import pyarrow as pa
        import ray.data as rd

        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "token": pa.array([], pa.string()),
            "score_e6": pa.array([], pa.int64())}))
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


# ---------------------------------------------------------------------------
# BM25 query scoring
# ---------------------------------------------------------------------------
#
# Parity contract (Lucene-style BM25, k1 = 1.2, b = 0.75):
#
# - idf_e6(t) = round(ln((N - df + 0.5) / (df + 0.5) + 1.0) * 1e6)
#   as BIGINT — the one transcendental, absorbed by e6 rounding;
# - per (doc, term):
#       frac = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
#       term_e6 = round(idf_e6 * frac)
#   Every float step here is a single IEEE multiply/divide/add on
#   values both engines hold bit-identically (ints, or exact int
#   ratios like avgdl = S / N), and IEEE basic ops are correctly
#   rounded — so term_e6 matches EXACTLY, no summation involved.
#   The SQL mirror MUST use the same parenthesization (it does);
# - score_e6(doc) = SUM(term_e6) — an INTEGER sum, order-free.
#
# Scale shape: the query is tiny, so df/idf come from one partials
# pass counting ONLY query terms (broadcast term list, per-batch
# membership counts -> tiny driver fold); corpus stats (N, S) fold
# from per-batch (rows, tokens) pairs in the same pass.  Scoring is
# one streaming pass with per-block local top-k and a k x blocks
# driver merge (ann_topk precedent).  Zero shuffles end to end.


class _Bm25Partial:
    """Per-batch (df per query term, n_docs, total_tokens) partials.
    Row kinds are an INTEGER column (0 = term df, 1 = doc count,
    2 = token count), never magic strings: tokens are arbitrary
    non-whitespace bytes so no string sentinel is out-of-band, and
    pandas groupby after an arrow roundtrip hashes object strings as
    C strings — two keys differing only past a NUL byte silently
    merge (measured)."""

    def __init__(self, terms, text_col: str):
        self._terms = list(terms)
        self._tset = set(terms)
        self._text = text_col
        self._split = re.compile(f"[{_WS}]+").split

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        dfc = dict.fromkeys(self._terms, 0)
        n_tok = 0
        for t in b[self._text]:
            ws = [w for w in self._split(str(t)) if w]
            n_tok += len(ws)
            for w in self._tset.intersection(ws):
                dfc[w] += 1
        return pd.DataFrame({
            "kind": np.array([0] * len(self._terms) + [1, 2],
                             dtype=np.int8),
            "term": self._terms + ["", ""],
            "n": np.array([dfc[t] for t in self._terms]
                          + [len(b), n_tok], dtype=np.int64)})


class _Bm25Score:
    """Streaming scoring pass + per-block local top-k."""

    def __init__(self, stats_ref, k: int, id_col: str, text_col: str):
        import ray

        terms, idf_e6, avgdl = ray.get(stats_ref)
        self._terms, self._idf, self._avgdl = terms, idf_e6, avgdl
        self._k, self._id, self._text = k, id_col, text_col
        self._split = re.compile(f"[{_WS}]+").split

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        ids, scores = [], []
        avgdl = self._avgdl
        for doc_id, t in zip(b[self._id], b[self._text]):
            ws = [w for w in self._split(str(t)) if w]
            if not ws:
                continue
            dl = len(ws)
            c = Counter(ws)
            s = 0
            for term, idf in zip(self._terms, self._idf):
                tf = c.get(term, 0)
                if not tf:
                    continue
                frac = (tf * 2.2) / (
                    tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
                s += int(np.round(idf * frac))
            if s > 0:
                ids.append(doc_id)
                scores.append(s)
        out = pd.DataFrame({
            self._id: pd.Series(ids, dtype=np.int64),
            "score_e6": pd.Series(scores, dtype=np.int64)})
        return out.sort_values(
            ["score_e6", self._id], ascending=[False, True],
            kind="mergesort").head(self._k)


def bm25_topk(ds, query_terms, k: int = 10, id_col: str = "doc_id",
              text_col: str = "text"):
    """Top-k documents for a bag of query terms under the e6 BM25
    contract above.  Returns a pandas DataFrame (rank, id_col,
    score_e6) — k x blocks rows merge on the driver, the ann_topk
    shape.  Docs with score 0 (no query term present) emit nothing."""
    import ray

    from ..functions.terms import pool_spec

    terms = sorted(set(query_terms))
    work = ds.select_columns([id_col, text_col]).materialize()
    parts = work.map_batches(
        _Bm25Partial, fn_constructor_kwargs=dict(
            terms=terms, text_col=text_col),
        batch_format="pandas", concurrency=pool_spec()).to_pandas()
    n_docs = int(parts.loc[parts["kind"] == 1, "n"].sum())
    n_tokens = int(parts.loc[parts["kind"] == 2, "n"].sum())
    if n_docs == 0 or n_tokens == 0:
        return pd.DataFrame({"rank": pd.Series([], dtype=np.int64),
                             id_col: pd.Series([], dtype=np.int64),
                             "score_e6": pd.Series([], dtype=np.int64)})
    agg = parts[parts["kind"] == 0].groupby(
        "term", sort=False)["n"].sum()
    avgdl = n_tokens / n_docs
    idf_e6 = [int(np.round(np.log(
        (n_docs - int(agg[t]) + 0.5) / (int(agg[t]) + 0.5) + 1.0) * 1e6))
        for t in terms]
    sref = ray.put((terms, idf_e6, avgdl))
    local = work.map_batches(
        _Bm25Score, fn_constructor_kwargs=dict(
            stats_ref=sref, k=k, id_col=id_col, text_col=text_col),
        batch_format="pandas", concurrency=pool_spec()).to_pandas()
    if not len(local):  # no doc matched any term (schema-less empty)
        return pd.DataFrame({"rank": pd.Series([], dtype=np.int64),
                             id_col: pd.Series([], dtype=np.int64),
                             "score_e6": pd.Series([], dtype=np.int64)})
    out = local.sort_values(["score_e6", id_col],
                            ascending=[False, True],
                            kind="mergesort").head(k).reset_index(drop=True)
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    return out
