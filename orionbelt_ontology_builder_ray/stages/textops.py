"""Text-analysis stages for training-data pipelines.

All stages are callable classes (actor pools) with compiled patterns /
tables built once per actor in ``__init__`` and vectorized ``__call__``
bodies (SURVEY graft requirements: language-ID, quality scoring, token
counting, document fingerprinting).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "en", "por", "que"},
}


# GPT-2-style pretokenizer, lookahead-free so Python re and DuckDB
# RE2 count the IDENTICAL matches (pinned by the doc_token_counts
# oracle): contractions, space-prefixed letter/digit runs,
# space-prefixed punctuation runs, whitespace runs.  Whitespace is the
# EXPLICIT ASCII class, not \s: Python's \s is Unicode-aware while
# RE2's is ASCII-only, so \s would let the two engines disagree on
# non-ASCII whitespace (e.g. U+00A0 inside a punctuation run).
_WS = r" \t\n\r\f\v"
BPE_TOKEN_RE = (r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+"
                rf"| ?[^a-zA-Z0-9{_WS}]+|[{_WS}]+")


class TokenCounter:
    """doc -> (doc_id, n_chars, n_tokens, n_bpe_tokens): whitespace
    tokenization plus a BPE-ish pretokenizer match count — the
    token-budget estimate a training pipeline actually needs (oracle:
    sql_doc_token_counts).

    Arrow-native: ``pc.count_substring_regex`` runs the SAME RE2
    engine DuckDB uses (pandas ``str.count`` is a per-row Python re
    loop over boxed objects), so the counts match the oracle by
    construction and the text column never leaves Arrow buffers."""

    def __init__(self, id_col="doc_id", text_col="text"):
        import pyarrow as pa

        self.id_col, self.text_col = id_col, text_col
        self._ws_run = rf"[^{_WS}]+"
        self._pa = pa

    def __call__(self, t):
        import pyarrow.compute as pc
        pa = self._pa

        text = pc.cast(t[self.text_col], pa.string())
        return pa.table({
            self.id_col: t[self.id_col],
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            "n_tokens": pc.cast(pc.count_substring_regex(
                text, pattern=self._ws_run), pa.int64()),
            "n_bpe_tokens": pc.cast(pc.count_substring_regex(
                text, pattern=BPE_TOKEN_RE), pa.int64()),
        })


class TokenCounterPandas:
    """Pandas reference implementation of :class:`TokenCounter` (kept
    for the interleaved A/B and the parity test; not on any pipeline
    path).  NOTE: ``str.split()`` uses Python's Unicode whitespace, so
    on non-ASCII whitespace this reference can differ from both the
    arrow stage and the DuckDB oracle (which share RE2 semantics)."""

    def __init__(self, id_col="doc_id", text_col="text"):
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[self.text_col].astype(str)
        return pd.DataFrame({
            self.id_col: batch[self.id_col].to_numpy(),
            "n_chars": text.str.len().astype(np.int64),
            "n_tokens": text.str.split().str.len().fillna(0).astype(np.int64),
            "n_bpe_tokens": text.str.count(BPE_TOKEN_RE).astype(np.int64),
        })


class BigramStats:
    """doc -> (doc_id, n_distinct_bigrams) — n-gram fingerprint basis
    (oracle: sql_doc_ngram_stats)."""

    def __init__(self, id_col="doc_id", text_col="text"):
        self.id_col, self.text_col = id_col, text_col
        # ASCII whitespace, not str.split(): same RE2 contract as
        # TokenCounter/RepetitionStats so the oracle matches on
        # non-ASCII whitespace too
        self._split = re.compile(f"[{_WS}]+").split

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, counts = [], []
        for doc_id, text in zip(batch[self.id_col], batch[self.text_col]):
            toks = [w for w in self._split(str(text)) if w]
            if len(toks) < 1:
                continue
            grams = {f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)}
            ids.append(doc_id)
            counts.append(len(grams))
        return pd.DataFrame({self.id_col: np.array(ids, dtype=np.int64),
                             "n_distinct_bigrams": np.array(counts, dtype=np.int64)})


class QualityScorer:
    """Heuristic quality features: length, punctuation ratio, stopword
    ratio, mean token length, distinct-token ratio."""

    def __init__(self, id_col="doc_id", text_col="text"):
        self.id_col, self.text_col = id_col, text_col
        self.punct_re = re.compile(r"[^\w\s]")
        self.stop = _LANG_PROFILES["en"]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[self.text_col].astype(str)
        toks = text.str.lower().str.split()
        n_tok = toks.str.len().fillna(0).astype(np.int64)
        stop_ratio = toks.map(
            lambda ws: sum(w in self.stop for w in ws) / max(1, len(ws)))
        distinct_ratio = toks.map(lambda ws: len(set(ws)) / max(1, len(ws)))
        n_punct = text.str.count(self.punct_re.pattern)
        n_chars = text.str.len().astype(np.int64)
        return pd.DataFrame({
            self.id_col: batch[self.id_col].to_numpy(),
            "n_chars": n_chars,
            "n_tokens": n_tok,
            "punct_ratio": (n_punct / n_chars.clip(lower=1)).astype(np.float64),
            "stopword_ratio": stop_ratio.astype(np.float64),
            "distinct_token_ratio": distinct_ratio.astype(np.float64),
        })


class LangId:
    """Stopword-profile language ID (n-gram heuristic stand-in)."""

    def __init__(self, id_col="doc_id", text_col="text"):
        self.id_col, self.text_col = id_col, text_col
        self.profiles = _LANG_PROFILES

    def classify(self, text: str) -> str:
        toks = set(text.lower().split())
        best, best_score = "unknown", 0
        for lang, stop in sorted(self.profiles.items()):
            score = len(toks & stop)
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            self.id_col: batch[self.id_col].to_numpy(),
            "pred_lang": [self.classify(str(t)) for t in batch[self.text_col]],
        })


def _doc_grams(texts, k: int):
    """All k-token shingle strings of every doc flattened into ONE
    list + per-doc gram counts (for segment ops over the flat
    arrays)."""
    grams, counts = [], np.empty(len(texts), np.int64)
    for i, t in enumerate(texts):
        toks = str(t).split()
        if len(toks) >= k:
            g = [" ".join(toks[j:j + k]) for j in range(len(toks) - k + 1)]
        else:
            g = [" ".join(toks)]
        grams.extend(g)
        counts[i] = len(g)
    return grams, counts


def _fingerprints(texts, k: int, hash_mode: str = "md5") -> np.ndarray:
    """Per-doc min over the 63-bit hashes of all k-token windows.
    ``md5`` = oracle mode (exact DuckDB mirror, per-gram hashlib);
    ``fast`` = ONE vectorized C hashing pass over the flattened gram
    list + ``np.minimum.at`` segment-min (measured 2.1x on the sf0.1
    corpus batch; the residual cost is gram-string building, shared
    by both modes) — same min-sampling semantics, different hash
    family."""
    from .dedup import _hash_strings, _hash_strings_md5

    grams, counts = _doc_grams(texts, k)
    h = ((_hash_strings_md5(grams) if hash_mode == "md5"
          else _hash_strings(grams)) >> np.uint64(1)).astype(np.int64)
    out = np.full(len(texts), np.iinfo(np.int64).max, np.int64)
    np.minimum.at(out, np.repeat(np.arange(len(texts)), counts), h)
    return out


class Fingerprinter:
    """Winnowing-style document fingerprint: the minimum over the
    63-bit hashes of all k-token shingle windows (min-sampling the
    window hashes ~ robust to small edits) -> (doc_id, fingerprint
    int64).  Window hash = leading 64 bits of the md5 digest shifted
    right once, so the operator has an exact DuckDB mirror
    (sql_doc_fingerprints); ``hash_mode="fast"`` swaps in the
    vectorized one-C-pass hash for production corpora."""

    def __init__(self, id_col="doc_id", text_col="text", k=3,
                 hash_mode="md5"):
        self.id_col, self.text_col = id_col, text_col
        self.k = k
        self.hash_mode = hash_mode

    def fingerprint(self, text: str) -> int:
        return int(_fingerprints([text], self.k, self.hash_mode)[0])

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            self.id_col: batch[self.id_col].to_numpy(),
            "fingerprint": _fingerprints(
                batch[self.text_col], self.k, self.hash_mode),
        })


class CorpusCleaner:
    """Fused corpus-cleaning stage: quality features + language ID +
    keep-mask in ONE batch pass (the canonical training-data pipeline
    head: filter before any shuffle so only survivors move).

    Emits (doc_id, text, n_tokens) for docs passing:
      n_tokens >= min_tokens, pred_lang in keep_langs,
      distinct_token_ratio >= min_distinct_ratio.
    Downstream: exact dedup (bucketed text-hash groupby) keeps the min
    doc_id per surviving identical text.
    """

    def __init__(self, id_col="doc_id", text_col="text", min_tokens=20,
                 keep_langs=("en",), min_distinct_ratio=0.2):
        self.id_col, self.text_col = id_col, text_col
        self.min_tokens = min_tokens
        self.keep_langs = set(keep_langs)
        self.min_distinct_ratio = min_distinct_ratio
        self.langid = LangId(id_col, text_col)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[self.text_col].astype(str)
        toks = text.str.lower().str.split()
        n_tok = toks.str.len().fillna(0).astype(np.int64)
        distinct_ratio = toks.map(
            lambda ws: len(set(ws)) / max(1, len(ws)))
        langs = pd.Series([self.langid.classify(t) for t in text],
                          index=batch.index)
        keep = ((n_tok >= self.min_tokens)
                & langs.isin(self.keep_langs)
                & (distinct_ratio >= self.min_distinct_ratio))
        out = batch.loc[keep, [self.id_col, self.text_col]].copy()
        out["n_tokens"] = n_tok[keep]
        return out


class StratifiedSampler:
    """Deterministic hash-based stratified sampling — the data-mixing
    primitive of a training corpus (per-language / per-source keep
    rates): a row survives iff ``(md5_low64(str(key)) >> 1) % DENOM <
    rate(stratum) * DENOM``.  Purely a function of the row key, so the
    sample is reproducible across runs, engines, and partitionings
    (no RNG state, no order dependence) and has an exact DuckDB mirror
    (sql_doc_sample_stratified).  ``hash_mode="fast"`` swaps in the
    vectorized one-C-pass hash for production corpora; rates semantics
    are hash-agnostic, only the oracle needs md5.
    """

    DENOM = 1_000_000

    def __init__(self, rates: dict, default_rate: float = 0.0,
                 id_col: str = "doc_id", strata_col: str = "pred_lang",
                 hash_mode: str = "md5", thresholds: dict = None):
        # ``thresholds``: already-integer keep thresholds (out of
        # DENOM) computed upstream in exact integer arithmetic — the
        # budgeted-mixing path, where rates are data-derived and a
        # float round() contract would be engine-fragile
        if thresholds is not None:
            self.rates = {k: int(v) for k, v in thresholds.items()}
        else:
            self.rates = {k: int(round(v * self.DENOM))
                          for k, v in rates.items()}
        self.default = int(round(default_rate * self.DENOM))
        self.id_col, self.strata_col = id_col, strata_col
        self.hash_mode = hash_mode

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from .dedup import _hash_strings, _hash_strings_md5

        if not len(batch):
            return batch
        keys = batch[self.id_col].astype(str).tolist()
        h = (_hash_strings_md5(keys) if self.hash_mode == "md5"
             else _hash_strings(keys))
        u = ((h >> np.uint64(1)) % np.uint64(self.DENOM)).astype(np.int64)
        thr = batch[self.strata_col].map(self.rates) \
            .fillna(self.default).to_numpy(np.int64)
        return batch[u < thr]


def corpus_split(ds, fractions=(("train", 80), ("val", 10), ("test", 10)),
                 id_col="doc_id", hash_mode="md5"):
    """Deterministic train/val/test corpus split — the assignment is a
    pure function of the row id (``(md5_low64(str(id)) >> 1) %
    denom`` against cumulative INTEGER fraction thresholds), so the
    split is reproducible across runs, engines and partitionings,
    and disjoint + exhaustive BY CONSTRUCTION (every hash residue
    maps to exactly one split — no RNG, no order dependence, no
    doc can leak between splits on a re-run).  Zero shuffles: one
    streaming tag pass.  Fractions are integer parts (denominator =
    their sum), sidestepping any float-rounding contract; the DuckDB
    mirror is the same md5 expression + CASE thresholds
    (oracles.sql_doc_samples, split leg).  ``hash_mode="fast"``
    swaps in the vectorized production hash (minhash precedent)."""
    names = [n for n, _ in fractions]
    cum = np.cumsum([int(p) for _, p in fractions])
    denom = int(cum[-1])
    bounds = cum[:-1]

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        from .dedup import _hash_strings, _hash_strings_md5

        if not len(b):
            return pd.DataFrame({id_col: b.get(id_col, pd.Series([])),
                                 "split": pd.Series([], dtype=object)})
        keys = b[id_col].astype(str).tolist()
        h = (_hash_strings_md5(keys) if hash_mode == "md5"
             else _hash_strings(np.array(keys, dtype=object)))
        u = ((h >> np.uint64(1)) % np.uint64(denom)).astype(np.int64)
        idx = np.searchsorted(bounds, u, side="right")
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(),
            "split": np.asarray(names, dtype=object)[idx]})

    return ds.map_batches(assign, batch_format="pandas")


def clean_corpus(ds, id_col="doc_id", text_col="text", min_tokens=20,
                 keep_langs=("en",), min_distinct_ratio=0.2,
                 num_buckets=64):
    """documents -> cleaned, deduplicated corpus (doc_id, n_tokens):
    filter (fused single pass, pre-shuffle) -> exact text dedup keeping
    min id -> stats columns.  The full composite a 100-TB training-data
    ingest runs, expressed as one streaming Dataset flow."""
    from ..functions.terms import pool_size

    cleaned = ds.map_batches(
        CorpusCleaner, fn_constructor_kwargs=dict(
            id_col=id_col, text_col=text_col, min_tokens=min_tokens,
            keep_langs=keep_langs, min_distinct_ratio=min_distinct_ratio),
        batch_format="pandas", concurrency=pool_size())

    # inline bucketed text dedup that CARRIES the n_tokens the cleaner
    # already computed (re-tokenizing every survivor after
    # exact_dedup_docs would be a second full pass over the corpus)
    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        h = pd.util.hash_pandas_object(batch[text_col], index=False)
        batch["_b"] = (h % num_buckets).astype(np.int32)
        return batch

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        keep = g.sort_values(id_col).drop_duplicates(text_col)
        return keep[[id_col, "n_tokens"]]

    return cleaned.map_batches(add_bucket, batch_format="pandas") \
        .groupby("_b").map_groups(per_bucket, batch_format="pandas")


class TextProfile:
    """Fused per-doc text profile: QualityScorer + LangId +
    Fingerprinter columns in ONE batch pass over the corpus (quality
    features, predicted language, winnowing fingerprint).

    Why fused: all three stages tokenize the same text; at 100 TB each
    separate stage is a full corpus read + tokenize.  The profile is
    the natural "document metadata" head of a training-data pipeline
    (filter / mix / dedup all consume its columns), so computing it in
    one pass per block is the scale-correct shape.  Output is
    column-identical to running the three stages separately (pinned by
    tests/test_scrub.py::test_text_profile_matches_parts and the
    sql_doc_text_profile oracle, which joins the three SQL mirrors).
    """

    def __init__(self, id_col="doc_id", text_col="text", k=3,
                 hash_mode="md5"):
        self.id_col, self.text_col = id_col, text_col
        self.k = k
        self.hash_mode = hash_mode
        self.punct_re = re.compile(r"[^\w\s]")
        self.profiles = sorted(_LANG_PROFILES.items())
        self.stop_en = _LANG_PROFILES["en"]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[self.text_col].astype(str)
        n = len(text)
        n_chars = text.str.len().astype(np.int64)
        n_punct = text.str.count(self.punct_re.pattern)
        n_tokens = np.zeros(n, np.int64)
        stop_ratio = np.zeros(n, np.float64)
        distinct_ratio = np.zeros(n, np.float64)
        langs = []
        for i, t in enumerate(text):
            low = t.lower().split()
            denom = max(1, len(low))
            n_tokens[i] = len(low)
            stop_ratio[i] = sum(w in self.stop_en for w in low) / denom
            tset = set(low)
            distinct_ratio[i] = len(tset) / denom
            best, best_score = "unknown", 0
            for lang, stop in self.profiles:
                score = len(tset & stop)
                if score > best_score:
                    best, best_score = lang, score
            langs.append(best)
        fingerprints = _fingerprints(text, self.k, self.hash_mode)
        return pd.DataFrame({
            self.id_col: batch[self.id_col].to_numpy(),
            "n_chars": n_chars.to_numpy(),
            "n_tokens": n_tokens,
            "punct_ratio": (n_punct.to_numpy(np.float64)
                            / np.maximum(n_chars.to_numpy(), 1)),
            "stopword_ratio": stop_ratio,
            "distinct_token_ratio": distinct_ratio,
            "pred_lang": langs,
            "fingerprint": fingerprints,
        })


class RepetitionStats:
    """Gopher-style repetition signals per doc (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", Table A1 repetition
    filters), re-expressed for the token stream:

      - ``top_token_frac``    = count(most frequent token) / n_tokens
      - ``top_bigram_frac``   = count(most frequent bigram) / n_bigrams
      - ``dup_bigram_frac``   = 1 - distinct_bigrams / n_bigrams
      - ``dup_5gram_frac``    = 1 - distinct_5grams / n_5grams

    (Line/paragraph-based variants degenerate on the sandbox corpus —
    no newlines — so the token-stream forms are the checked surface;
    the formulas are delimiter-agnostic.)  Fractions are exact-int
    divisions, so numpy and DuckDB produce bit-identical doubles and
    the oracle (sql_doc_repetition) hash-matches.

    Per-doc Counter loop: distinct-n-gram counting needs a set per
    doc, and docs are KB-scale — the loop is per-doc, not per-token
    (same trade as BigramStats/TextProfile above; at 100 TB this
    stage is embarrassingly parallel and CPU-light next to the
    tokenize).
    """

    def __init__(self, id_col="doc_id", text_col="text", long_k=5):
        self.id_col, self.text_col = id_col, text_col
        self.long_k = long_k
        # explicit ASCII whitespace, not str.split(): Python's split is
        # Unicode-aware while the oracle's RE2 '\s+' is ASCII-only —
        # same cross-engine contract as BPE_TOKEN_RE above
        self._split = re.compile(f"[{_WS}]+").split

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        n = len(batch)
        top_tok = np.zeros(n, np.float64)
        top_bg = np.zeros(n, np.float64)
        dup_bg = np.zeros(n, np.float64)
        dup_lg = np.zeros(n, np.float64)
        for i, t in enumerate(batch[self.text_col]):
            toks = [w for w in self._split(str(t)) if w]
            if not toks:
                continue
            c = Counter(toks)
            top_tok[i] = max(c.values()) / len(toks)
            if len(toks) >= 2:
                bg = Counter(zip(toks, toks[1:]))
                nb = len(toks) - 1
                top_bg[i] = max(bg.values()) / nb
                dup_bg[i] = 1.0 - len(bg) / nb
            k = self.long_k
            if len(toks) >= k:
                ng = len(toks) - k + 1
                distinct = len({tuple(toks[j:j + k]) for j in range(ng)})
                dup_lg[i] = 1.0 - distinct / ng
        return pd.DataFrame({
            self.id_col: batch[self.id_col].to_numpy(),
            "top_token_frac": top_tok,
            "top_bigram_frac": top_bg,
            "dup_bigram_frac": dup_bg,
            "dup_5gram_frac": dup_lg,
        })


def corpus_vocab(ds, text_col="text", top_m: int = 10000,
                 num_buckets: int = 64):
    """Corpus-wide token frequencies, top-M — tokenizer-training prep
    (vocab selection) and the global-stats primitive behind stopword /
    frequency filters.

    Scale shape: each batch emits its LOCAL (token, n) partial counts
    (a batch with 10M token occurrences but 50k distinct tokens ships
    50k rows), the partials co-locate via one token-hash bucket
    shuffle, each bucket sums vectorized, and the per-bucket top-M
    partials (at most M x buckets rows) reduce to the global top-M on
    the driver.  The raw token stream never shuffles.  Ties at the
    M-th count break by token string ascending (deterministic,
    mirrored by ORDER BY n DESC, token)."""
    from collections import Counter

    from ..functions.terms import pool_size

    split = re.compile(f"[{_WS}]+").split  # ASCII ws, RE2 contract

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c = Counter()
        for t in b[text_col]:
            c.update(w for w in split(str(t)) if w)
        if not c:
            return pd.DataFrame({"token": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64)})
        toks = np.fromiter(c.keys(), dtype=object, count=len(c))
        ns = np.fromiter(c.values(), dtype=np.int64, count=len(c))
        h = pd.util.hash_pandas_object(pd.Series(toks, dtype=object),
                                       index=False)
        return pd.DataFrame({
            "token": toks, "n": ns,
            "_b": (h % num_buckets).astype(np.int32)})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("token", sort=False)["n"].sum().reset_index()
        s = s.sort_values(["n", "token"], ascending=[False, True],
                          kind="mergesort")
        return s.head(top_m)

    parts = ds.map_batches(partial, batch_format="pandas") \
        .groupby("_b").map_groups(per_bucket, batch_format="pandas") \
        .to_pandas()
    out = parts.sort_values(["n", "token"], ascending=[False, True],
                            kind="mergesort").head(top_m)
    return out.reset_index(drop=True)


class OovCounter:
    """doc -> (doc_id, n_oov): tokens NOT in the broadcast vocabulary
    — the OOV-rate signal of applying a trained tokenizer/vocab to a
    corpus.  The vocab (corpus_vocab's top-M tokens) rides ``ray.put``
    once and lands in each actor as ONE frozenset build in
    ``__init__`` (per-actor, not per-batch); per-batch work is set
    lookups over the token stream."""

    def __init__(self, vocab_ref, id_col="doc_id", text_col="text"):
        try:
            import ray

            if isinstance(vocab_ref, ray.ObjectRef):
                vocab_ref = ray.get(vocab_ref)
        except ImportError:
            pass
        self.vocab = frozenset(vocab_ref)
        self.id_col, self.text_col = id_col, text_col
        self._split = re.compile(f"[{_WS}]+").split

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        v = self.vocab
        counts = np.fromiter(
            (sum(w not in v for w in self._split(str(t)) if w)
             for t in batch[self.text_col]),
            dtype=np.int64, count=len(batch))
        return pd.DataFrame({
            self.id_col: batch[self.id_col].to_numpy(),
            "n_oov": counts})


def oov_counts(ds, vocab_top_m: int = 100, id_col="doc_id",
               text_col="text", vocab=None):
    """Two-phase: corpus_vocab's top-M tokens (partial counts + one
    small bucket shuffle) broadcast once, then a streaming per-doc OOV
    count — the vocab never re-ships per batch and the corpus scans
    exactly twice (once to build the vocab, once to apply it).
    Callers that already hold the vocab DataFrame (doc_token_stats
    unions the vocab rows into the same slot) pass it via ``vocab`` so
    the build pass is not repeated (ADVICE r4)."""
    import ray

    from ..functions.terms import pool_spec

    if vocab is None:
        vocab = corpus_vocab(ds, text_col=text_col, top_m=vocab_top_m)
    vref = ray.put(vocab["token"].tolist())
    return ds.map_batches(
        OovCounter, fn_constructor_kwargs=dict(
            vocab_ref=vref, id_col=id_col, text_col=text_col),
        batch_format="pandas", concurrency=pool_spec())


class GopherRepetitionFilter:
    """Apply the Gopher repetition thresholds as an actual corpus
    FILTER (the consumption side of RepetitionStats' signals): keep
    docs with top_token_frac <= t_top, dup_bigram_frac <= t_bigram,
    dup_5gram_frac <= t_5gram; emit (doc_id, n_tokens) for survivors.
    One fused pass — signals and the keep decision per batch, nothing
    shuffles.  Fraction comparisons are exact across engines because
    the fractions themselves are bit-identical int divisions
    (sql_doc_repetition contract)."""

    def __init__(self, id_col="doc_id", text_col="text",
                 t_top=0.10, t_bigram=0.05, t_5gram=0.05, long_k=5):
        self.id_col, self.text_col = id_col, text_col
        self.t_top, self.t_bigram, self.t_5gram = t_top, t_bigram, t_5gram
        self.stats = RepetitionStats(id_col, text_col, long_k=long_k)
        self._split = self.stats._split

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = self.stats(batch)
        keep = ((s["top_token_frac"] <= self.t_top)
                & (s["dup_bigram_frac"] <= self.t_bigram)
                & (s["dup_5gram_frac"] <= self.t_5gram)).to_numpy()
        kept = batch[keep]
        n_tokens = np.fromiter(
            (sum(1 for w in self._split(str(t)) if w)
             for t in kept[self.text_col]),
            dtype=np.int64, count=len(kept))
        return pd.DataFrame({
            self.id_col: kept[self.id_col].to_numpy(np.int64),
            "n_tokens": n_tokens})


def corpus_bigram_lm(ds, text_col="text", min_count=2,
                     num_buckets: int = 64):
    """Corpus-trained add-alpha bigram language model — the model half
    of CCNet-style LM quality filtering (score docs by how "corpus-
    typical" their token transitions are; reference has no analog,
    engine-native training-data functionality).

    Scale shape (same as corpus_vocab): each batch emits its LOCAL
    (w1, w2, n) partial counts — unigrams ride the same stream as
    (kind=0, w1, '') rows — one w1-hash bucket shuffle co-locates each
    head token's unigram with its bigrams, buckets sum vectorized,
    and only the MODEL reaches the driver: the unigram table is
    vocabulary-sized and the bigram table is pruned to ``n >=
    min_count`` (the model-size bound — the singleton bigram long
    tail, the bulk of the distinct-bigram mass on natural text, never
    leaves the bucket).  The raw token stream never shuffles.

    Returns ``(uni, bi, n_vocab)``: uni = DataFrame (w1, n) over ALL
    corpus tokens, bi = DataFrame (w1, w2, n) with n >= min_count,
    n_vocab = len(uni) (the smoothing denominator's V).
    """
    split = re.compile(f"[{_WS}]+").split  # ASCII ws, RE2 contract

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        flat, lens = _flat_tokens(b[text_col], split)
        if flat is None:
            return pd.DataFrame({
                "kind": pd.Series([], dtype=np.int8),
                "w1": pd.Series([], dtype=object),
                "w2": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
                "_b": pd.Series([], dtype=np.int32)})
        # one flat-batch pass: unigram counts over all tokens, bigram
        # counts over within-doc adjacencies (doc-boundary positions
        # masked) — C groupbys, no per-doc Python Counter churn
        uni = pd.Series(flat, dtype=object).value_counts(sort=False)
        w1v, w2v = _adjacent_pairs(flat, lens)
        if len(w1v):
            bi = pd.DataFrame({"w1": w1v, "w2": w2v}) \
                .groupby(["w1", "w2"], sort=False).size()
        else:
            bi = pd.Series([], dtype=np.int64)
        n_u, n_b = len(uni), len(bi)
        w1 = np.empty(n_u + n_b, dtype=object)
        w2 = np.empty(n_u + n_b, dtype=object)
        n = np.empty(n_u + n_b, dtype=np.int64)
        kind = np.empty(n_u + n_b, dtype=np.int8)
        w1[:n_u] = uni.index.to_numpy(dtype=object)
        w2[:n_u] = ""
        n[:n_u] = uni.to_numpy(np.int64)
        kind[:n_u] = 0
        if n_b:
            w1[n_u:] = bi.index.get_level_values(0).to_numpy(dtype=object)
            w2[n_u:] = bi.index.get_level_values(1).to_numpy(dtype=object)
            n[n_u:] = bi.to_numpy(np.int64)
            kind[n_u:] = 1
        h = pd.util.hash_pandas_object(pd.Series(w1, dtype=object),
                                       index=False)
        return pd.DataFrame({
            "kind": kind, "w1": w1, "w2": w2, "n": n,
            "_b": (h % num_buckets).astype(np.int32)})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["kind", "w1", "w2"], sort=False)["n"] \
            .sum().reset_index()
        keep = (s["kind"] == 0) | (s["n"] >= min_count)
        return s[keep]

    model = ds.map_batches(partial, batch_format="pandas") \
        .groupby("_b").map_groups(per_bucket, batch_format="pandas") \
        .to_pandas()
    if "kind" not in model.columns:  # empty corpus
        empty = pd.DataFrame({"w1": pd.Series([], dtype=object),
                              "w2": pd.Series([], dtype=object),
                              "n": pd.Series([], dtype=np.int64)})
        return empty[["w1", "n"]], empty, 0
    uni = model[model["kind"] == 0][["w1", "n"]].reset_index(drop=True)
    bi = model[model["kind"] == 1][["w1", "w2", "n"]] \
        .reset_index(drop=True)
    return uni, bi, len(uni)


def _unwrap_model(model_ref):
    """ObjectRef-or-value -> (uni_merge_tbl, bi_merge_tbl, V) with the
    count columns pre-renamed for collision-free merges."""
    try:
        import ray

        if isinstance(model_ref, ray.ObjectRef):
            model_ref = ray.get(model_ref)
    except ImportError:
        pass
    uni, bi, n_vocab = model_ref
    return (uni.rename(columns={"n": "_n_uni"}),
            bi.rename(columns={"n": "_n_bi"}), int(n_vocab))


def _flat_tokens(texts, split):
    """Batch of texts -> (flat token object array, per-doc lengths) —
    empty docs dropped (their length would make the boundary mask
    degenerate and they contribute no tokens anyway).  Returns
    (None, None) for an all-empty batch."""
    from itertools import chain

    per_doc = [[w for w in split(str(t)) if w] for t in texts]
    lens = np.fromiter((len(x) for x in per_doc), np.int64,
                       len(per_doc))
    if not lens.sum():
        return None, None
    flat = np.array(list(chain.from_iterable(per_doc)), dtype=object)
    return flat, lens


def _adjacent_pairs(flat, lens):
    """Within-doc adjacent (w1, w2) arrays from a flat token array:
    w1 = every token that is not its doc's last, w2 = every token
    that is not its doc's first — doc boundaries masked via the
    cumulative-length positions, no per-doc Python."""
    lens = lens[lens > 0]
    ends = np.cumsum(lens)
    n = int(ends[-1])
    is_last = np.zeros(n, bool)
    is_last[ends - 1] = True
    is_first = np.zeros(n, bool)
    is_first[ends[:-1]] = True
    is_first[0] = True
    return flat[~is_last], flat[~is_first]


def _bigram_pair_frame(batch, id_col, text_col, split):
    """Flatten a batch of docs into one (doc_id, w1, w2) bigram frame
    (docs with < 2 tokens contribute no rows); None if empty.
    Flat-batch vectorized: one boundary-masked slice pair instead of
    per-doc list churn (measured on the 100k-doc probe)."""
    flat, lens = _flat_tokens(batch[text_col], split)
    if flat is None:
        return None
    ids = np.asarray(batch[id_col], dtype=np.int64)[lens > 0]
    lens = lens[lens > 0]
    w1, w2 = _adjacent_pairs(flat, lens)
    if not len(w1):
        return None
    return pd.DataFrame({id_col: np.repeat(ids, lens - 1),
                         "w1": w1, "w2": w2})


def _pair_logp(df, uni, bi, v, alpha):
    """Vectorized add-alpha bigram log-likelihood per pair row:
    ln((c(w1,w2) + a) / (c(w1) + a*V)).  Two C hash-joins, no
    per-token Python.  fillna(0) keeps cross-corpus application
    well-defined (a w1/pair unseen by THIS model counts 0)."""
    m = df.merge(bi, on=["w1", "w2"], how="left") \
        .merge(uni, on="w1", how="left")
    c_bi = m["_n_bi"].fillna(0).to_numpy(np.float64)
    c_uni = m["_n_uni"].fillna(0).to_numpy(np.float64)
    return np.log((c_bi + alpha) / (c_uni + alpha * max(v, 1)))


class LmPerplexityScorer:
    """doc -> (doc_id, n_lm_bigrams, avg_logp): mean add-alpha bigram
    log-likelihood under the broadcast ``corpus_bigram_lm`` model —
    logp(w1 w2) = ln((c(w1,w2) + a) / (c(w1) + a·V)).  Low scores
    flag corpus-atypical docs (the LM leg of a CCNet-style quality
    gate).  Docs with < 2 tokens emit no row (no bigrams to score).

    The model rides ``ray.put`` once and lands in each actor as two
    pandas merge tables built in ``__init__``; per-batch scoring is
    two C hash-joins + one groupby — no per-token Python."""

    def __init__(self, model_ref, alpha: float = 0.5,
                 id_col="doc_id", text_col="text"):
        self.uni, self.bi, self.v = _unwrap_model(model_ref)
        self.alpha = float(alpha)
        self.id_col, self.text_col = id_col, text_col
        self._split = re.compile(f"[{_WS}]+").split

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        df = _bigram_pair_frame(batch, self.id_col, self.text_col,
                                self._split)
        if df is None:
            return pd.DataFrame({
                self.id_col: pd.Series([], dtype=np.int64),
                "n_lm_bigrams": pd.Series([], dtype=np.int64),
                "avg_logp": pd.Series([], dtype=np.float64)})
        logp = _pair_logp(df, self.uni, self.bi, self.v, self.alpha)
        out = pd.DataFrame({self.id_col: df[self.id_col], "_lp": logp}) \
            .groupby(self.id_col, sort=False)["_lp"] \
            .agg(["size", "mean"]).reset_index()
        return pd.DataFrame({
            self.id_col: out[self.id_col].to_numpy(np.int64),
            "n_lm_bigrams": out["size"].to_numpy(np.int64),
            "avg_logp": out["mean"].to_numpy(np.float64)})


def lm_perplexity_scores(ds, alpha: float = 0.5, min_count: int = 2,
                         id_col="doc_id", text_col="text", model=None):
    """Two-phase LM quality scoring: train ``corpus_bigram_lm`` on the
    corpus (one counting pass, one model-sized shuffle), broadcast the
    model once, then stream every doc through ``LmPerplexityScorer``
    — the corpus scans exactly twice and only model-sized state ever
    reaches the driver or the actors."""
    import ray

    from ..functions.terms import pool_spec

    if model is None:
        model = corpus_bigram_lm(ds, text_col=text_col,
                                 min_count=min_count)
    mref = ray.put(model)
    return ds.map_batches(
        LmPerplexityScorer, fn_constructor_kwargs=dict(
            model_ref=mref, alpha=alpha, id_col=id_col,
            text_col=text_col),
        batch_format="pandas", concurrency=pool_spec())


class DsirScorer:
    """doc -> (doc_id, n_lm_bigrams, avg_logratio): DSIR-style data
    selection via importance resampling (Xie et al. 2023) adapted to
    the add-alpha bigram LM — the per-doc importance weight is the
    mean over the doc's bigrams of log p_target(w2|w1) -
    log p_source(w1 w2 under the same formula), i.e. how much more
    target-domain-typical than corpus-typical the doc reads.  Docs
    with high avg_logratio are the ones importance resampling keeps
    when curating a corpus toward the target domain.

    Both models ride ``ray.put`` once; a batch is flattened into ONE
    bigram pair frame and scored under both models with four C
    hash-joins total — the fused pass avoids the per-doc join of two
    separate score Datasets (an exchange at corpus doc counts)."""

    def __init__(self, target_ref, source_ref, alpha: float = 0.5,
                 id_col="doc_id", text_col="text"):
        self.t_uni, self.t_bi, self.t_v = _unwrap_model(target_ref)
        self.s_uni, self.s_bi, self.s_v = _unwrap_model(source_ref)
        self.alpha = float(alpha)
        self.id_col, self.text_col = id_col, text_col
        self._split = re.compile(f"[{_WS}]+").split

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        df = _bigram_pair_frame(batch, self.id_col, self.text_col,
                                self._split)
        if df is None:
            return pd.DataFrame({
                self.id_col: pd.Series([], dtype=np.int64),
                "n_lm_bigrams": pd.Series([], dtype=np.int64),
                "avg_logratio": pd.Series([], dtype=np.float64)})
        lt = _pair_logp(df, self.t_uni, self.t_bi, self.t_v, self.alpha)
        ls = _pair_logp(df, self.s_uni, self.s_bi, self.s_v, self.alpha)
        out = pd.DataFrame({self.id_col: df[self.id_col],
                            "_lr": lt - ls}) \
            .groupby(self.id_col, sort=False)["_lr"] \
            .agg(["size", "mean"]).reset_index()
        return pd.DataFrame({
            self.id_col: out[self.id_col].to_numpy(np.int64),
            "n_lm_bigrams": out["size"].to_numpy(np.int64),
            "avg_logratio": out["mean"].to_numpy(np.float64)})


def dsir_scores(ds, target_ds, alpha: float = 0.5, min_count: int = 2,
                id_col="doc_id", text_col="text", source_model=None,
                target_model=None):
    """DSIR importance weights for every doc in ``ds`` toward the
    domain exemplified by ``target_ds``: train ``corpus_bigram_lm``
    on both (each one counting pass + one model-sized shuffle, and
    the source model can be SHARED with ``lm_perplexity_scores`` via
    ``source_model=``), broadcast both models once, then stream the
    corpus through the fused ``DsirScorer``.  Only model-sized state
    ever reaches the driver or the actors; the corpus itself scans
    once for scoring."""
    import ray

    from ..functions.terms import pool_spec

    if source_model is None:
        source_model = corpus_bigram_lm(ds, text_col=text_col,
                                        min_count=min_count)
    if target_model is None:
        target_model = corpus_bigram_lm(target_ds, text_col=text_col,
                                        min_count=min_count)
    tref, sref = ray.put(target_model), ray.put(source_model)
    return ds.map_batches(
        DsirScorer, fn_constructor_kwargs=dict(
            target_ref=tref, source_ref=sref, alpha=alpha,
            id_col=id_col, text_col=text_col),
        batch_format="pandas", concurrency=pool_spec())


def exact_quantiles(ds, col: str, qs=(0.25, 0.5, 0.75, 0.9, 0.99)):
    """Exact distributed order statistics over an integer column.

    Contract: the q-quantile is the value at 1-indexed rank
    ``ceil(q * n)`` of the sorted column (the discrete / lower
    ``quantile_disc`` convention) — an explicit order statistic both
    engines can compute without interpolation ambiguity.

    Scale shape: each block reduces to its DISTINCT (value, count)
    pairs inside ``map_batches`` (combiner before shuffle), the
    ``groupby(value).sum`` shuffle moves only distinct values, and the
    driver's final cumsum rank scan holds one row per distinct value —
    for bounded-domain integer surfaces (token counts, turn lengths,
    durations) that is thousands of rows at 100 TB.  For genuinely
    unbounded or float domains, quantize to a fixed grid first (the
    same move CCNet's bucket assignment makes) or use the two-phase
    distributed rank in stages/pack.global_rank_buckets.

    Returns {q: value} with Python ints; empty input raises.
    """
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        vals, counts = np.unique(v, return_counts=True)
        return pa.table({"value": pa.array(vals, pa.int64()),
                         "n": pa.array(counts.astype(np.int64))})

    vc = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("value").aggregate(Sum("n", alias_name="n")).to_pandas()
    if not len(vc):
        raise ValueError(f"exact_quantiles over empty column {col!r}")
    vc = vc.sort_values("value").reset_index(drop=True)
    cum = vc["n"].cumsum().to_numpy()
    total = int(cum[-1])
    out = {}
    for q in qs:
        rank = int(np.ceil(q * total))
        rank = max(1, min(rank, total))
        idx = int(np.searchsorted(cum, rank, side="left"))
        out[q] = int(vc["value"].iloc[idx])
    return out


# the quantile grid shared by queries.doc_token_stats and its oracle
QUANTILE_QS = (0.25, 0.5, 0.75, 0.9, 0.99)
