"""Distributed BPE tokenizer training (Sennrich et al. 2016) on the
word-frequency plane.

The reference has no tokenizer machinery; this is engine-native
training-data functionality completing the tokenizer-prep family
(corpus_vocab -> corpus_bigram_lm -> bpe_train).

Scale shape
-----------
The CORPUS is scanned exactly once (``word_freqs``: per-batch local
token counters, one token-hash bucket shuffle — the corpus_vocab
machinery without the top-M cut).  Every merge iteration then runs on
the WORD table, which is vocabulary-sized (1e6–1e8 rows at 100 TB),
not corpus-sized:

- pair counting: per-batch Counter over adjacent symbols weighted by
  word freq -> (w1, w2, n) partial rows -> one pair-hash bucket
  groupby -> per-bucket argmax, so only ``num_buckets`` candidate
  rows ever reach the driver per iteration;
- merge application: the winning pair broadcast as ONE string and
  applied with a vectorized contains-prefilter + str.replace.

Symbol representation: a word's symbol sequence is a STRING whose
chars are the symbols — base characters plus one Unicode
private-use sentinel (U+E000+k) per merge k.  Greedy left-to-right
non-overlapping ``str.replace`` is then EXACTLY the BPE merge step,
and DuckDB's ``replace()`` has identical semantics, which is what
makes the SQL oracle's unrolled iterations byte-exact.  Data
contract: corpus tokens must not contain U+E000..U+F8FF (private-use
chars are by definition not natural text).

Pair counts follow classic BPE: every adjacent occurrence counts
(overlaps included — 'aaa' counts (a,a) twice), ties broken
deterministically by (n desc, expanded-left asc, expanded-right asc,
raw pair asc).
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd

_WS = r" \t\n\r\f\v"  # ASCII whitespace, the repo-wide RE2 contract
_SENT_BASE = 0xE000


def word_freqs(ds, text_col: str = "text", num_buckets: int = 64):
    """One corpus pass -> Dataset (word, freq): per-batch local token
    counts, one token-hash bucket shuffle, per-bucket vectorized sum.
    The raw token stream never shuffles; the output is
    vocabulary-sized."""
    split = re.compile(f"[{_WS}]+").split

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        from itertools import chain

        flat = list(chain.from_iterable(
            (w for w in split(str(t)) if w) for t in b[text_col]))
        if not flat:
            return pd.DataFrame({
                "word": pd.Series([], dtype=object),
                "freq": pd.Series([], dtype=np.int64),
                "_b": pd.Series([], dtype=np.int32)})
        c = pd.Series(flat, dtype=object).value_counts(sort=False)
        words = c.index.to_numpy(dtype=object)
        h = pd.util.hash_pandas_object(pd.Series(words, dtype=object),
                                       index=False)
        return pd.DataFrame({"word": words,
                             "freq": c.to_numpy(np.int64),
                             "_b": (h % num_buckets).astype(np.int32)})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("word", sort=False)["freq"].sum().reset_index()
        return s[["word", "freq"]]

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby("_b").map_groups(per_bucket, batch_format="pandas")


def _pair_partials(num_buckets: int):
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for w, f in zip(b["word"], b["freq"]):
            if len(w) >= 2:
                f = int(f)
                for pair in zip(w, w[1:]):
                    c[pair] += f
        w1 = np.array([p[0] for p in c.keys()], dtype=object)
        w2 = np.array([p[1] for p in c.keys()], dtype=object)
        n = np.fromiter(c.values(), dtype=np.int64, count=len(c))
        h = pd.util.hash_pandas_object(
            pd.Series(w1, dtype=object) + pd.Series(w2, dtype=object),
            index=False)
        return pd.DataFrame({"w1": w1, "w2": w2, "n": n,
                             "_b": (h % num_buckets).astype(np.int32)})

    return partial


def _bucket_argmax(expand: dict):
    """Per-bucket: sum the partials, expand sentinels, keep the single
    best (n desc, e1 asc, e2 asc, w1 asc, w2 asc) row — every pair
    lives in exactly one bucket, so bucket winners are disjoint and
    the driver reduce over <= num_buckets rows is exact."""

    def top(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["w1", "w2"], sort=False)["n"].sum().reset_index()
        s["e1"] = [expand.get(x, x) for x in s["w1"]]
        s["e2"] = [expand.get(x, x) for x in s["w2"]]
        s = s.sort_values(["n", "e1", "e2", "w1", "w2"],
                          ascending=[False, True, True, True, True],
                          kind="mergesort")
        return s.head(1)

    return top


def bpe_train(ds=None, num_merges: int = 4, text_col: str = "text",
              num_buckets: int = 64, words=None, with_ops: bool = False):
    """Train ``num_merges`` BPE merges; returns a DataFrame
    (rank, left, right, n) with left/right fully EXPANDED (human-
    readable symbol strings) and n the freq-weighted adjacency count
    that won that iteration.  Pass ``words`` (a (word, freq) Dataset,
    e.g. from ``word_freqs``) to skip the corpus pass.  With
    ``with_ops=True`` additionally returns the raw replace program
    ``[(pattern, sentinel), ...]`` that ``bpe_encode`` applies."""
    if words is None:
        words = word_freqs(ds, text_col=text_col,
                           num_buckets=num_buckets)
    words = words.materialize()
    expand: dict = {}
    out = []
    ops = []
    partial = _pair_partials(num_buckets)
    for k in range(num_merges):
        winners = words.map_batches(partial, batch_format="pandas") \
            .groupby("_b") \
            .map_groups(_bucket_argmax(dict(expand)),
                        batch_format="pandas") \
            .to_pandas()
        if len(winners) == 0:
            break
        winners = winners.sort_values(
            ["n", "e1", "e2", "w1", "w2"],
            ascending=[False, True, True, True, True],
            kind="mergesort")
        w1, w2, n = (winners.iloc[0]["w1"], winners.iloc[0]["w2"],
                     int(winners.iloc[0]["n"]))
        sent = chr(_SENT_BASE + k)
        pat = w1 + w2
        out.append({"rank": k + 1,
                    "left": expand.get(w1, w1),
                    "right": expand.get(w2, w2), "n": n})
        ops.append((pat, sent))
        expand[sent] = expand.get(w1, w1) + expand.get(w2, w2)

        def apply(b: pd.DataFrame, pat=pat, sent=sent) -> pd.DataFrame:
            s = b["word"]
            mask = s.str.contains(pat, regex=False)
            if mask.any():
                b = b.copy()
                b.loc[mask, "word"] = s[mask].str.replace(
                    pat, sent, regex=False)
            return b

        # materialize per iteration: flat lineage, M passes over the
        # VOCAB table (never the corpus)
        words = words.map_batches(apply,
                                  batch_format="pandas").materialize()
    merges = pd.DataFrame(out, columns=["rank", "left", "right", "n"]) \
        .astype({"rank": np.int64, "n": np.int64})
    return (merges, ops) if with_ops else merges


def bpe_encode(ds, ops, id_col: str = "doc_id",
               text_col: str = "text"):
    """Apply a trained BPE merge program to the CORPUS and count each
    doc's resulting symbols -> (doc_id, n_bpe_tokens) — the
    tokenizer-application step (the actual 100-TB workload the
    trainer exists for).

    ``ops`` is ``bpe_train(with_ops=True)``'s replace program: merges
    are applied IN RANK ORDER as plain non-overlapping str.replace
    over the raw text (merge symbols never contain whitespace, so a
    pattern can only match inside one whitespace-delimited word —
    applying to the full text is identical to applying per word).
    After all replaces every symbol is exactly one char, so the
    token count is the number of non-whitespace chars.  The program
    is a handful of strings broadcast in the task closure; the pass
    is pandas-vectorized str.replace chains, one corpus scan."""
    ws_re = f"[{_WS}]"

    def encode(b: pd.DataFrame) -> pd.DataFrame:
        s = b[text_col].astype(str)
        for pat, sent in ops:
            s = s.str.replace(pat, sent, regex=False)
        n = s.str.replace(ws_re, "", regex=True).str.len()
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(np.int64),
            "n_bpe_tokens": n.to_numpy(np.int64)})

    return ds.map_batches(encode, batch_format="pandas")
