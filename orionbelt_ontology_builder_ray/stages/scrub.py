"""PII scrubbing and n-gram decontamination stages.

Training-data compliance operators the reference repo has no analog
for (graft requirement: first-class LLM-pipeline ops beyond the
reference surface):

- :class:`PiiRedactor` — vectorized regex PII counting + redaction.
  Both the engine (``pyarrow.compute.count_substring_regex`` /
  ``replace_substring_regex``) and the DuckDB oracle run RE2, so the
  counts and the redacted text match byte-for-byte by construction.
- :func:`decontaminate` — benchmark/eval-set n-gram overlap: flag
  training documents sharing a word k-gram with the eval split.
  Scale shape: the eval side of a decontamination pass is SMALL by
  nature (benchmarks are thousands of documents, not billions), so
  its distinct gram-hash set is collected once, broadcast via
  ``ray.put``, and membership-tested per batch — ZERO shuffles over
  the training corpus.
- :func:`dup_ngram_counts` — corpus-wide duplicated-n-gram detector
  (the exact-substring-dedup signal of Lee et al., "Deduplicating
  Training Data Makes Language Models Better", simplified to k-gram
  granularity): for every doc, how many of its distinct word k-grams
  appear in at least one OTHER doc.  Scale shape: distinct
  (gram-hash, doc_id) pairs ride ONE int-bucket shuffle (the same
  inverted-index shape as stages/dedup.py Jaccard), per-bucket
  duplicate marking is vectorized, and the per-doc partials that
  leave each bucket are doc-count-sized, not gram-count-sized.

Text is tokenized on the EXPLICIT ASCII whitespace class (not
Python's Unicode ``\\s`` / ``str.split``) so the DuckDB mirror
(``string_split_regex(text, '[ \\t\\n\\r\\f\\v]+')``) agrees on any
input — the same RE2-vs-Python lesson as stages/textops.BPE_TOKEN_RE.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.terms import pool_spec

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# RE2-compatible (no lookaround, no backrefs) so pyarrow.compute and
# DuckDB regexp_* produce IDENTICAL matches.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\+?[0-9]{1,2}[ -][0-9]{3}-[0-9]{3}-[0-9]{4}", "[PHONE]"),
    ("ip", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "[IP]"),
    ("id", r"\b[0-9]{5,}\b", "[ID]"),
)


def inject_pii(t: pa.Table, id_col: str = "doc_id",
               text_col: str = "text", mod: int = 4) -> pa.Table:
    """Deterministic PII synthesizer for verification corpora.

    The sandbox test tables are PII-free word salads, so a redaction
    oracle over the raw text would only ever verify the identity
    transform.  This helper appends one email + phone + IPv4 + long
    numeric id — all pure functions of ``id_col`` — to every row with
    ``doc_id % mod != 0`` (the rest stay clean so the no-match path is
    exercised too).  The DuckDB oracle performs the IDENTICAL
    concatenation, so the downstream redaction is verified on text
    with real matches.  Not a production stage: real corpora carry
    their own PII.
    """
    import pyarrow.compute as pc

    did = t[id_col].to_numpy()
    text = pc.cast(t[text_col], pa.string())

    def s(v: np.ndarray) -> pa.Array:
        return pa.array(v.astype(str), pa.string())

    def lit(x: str) -> pa.Array:
        return pa.array(np.full(len(did), x), pa.string())

    injected = pc.binary_join_element_wise(
        text, lit(" contact user"), s(did),
        lit("@example.com or +1 555-"), s(did % 900 + 100), lit("-"),
        s((did * 7) % 9000 + 1000), lit(" ip 10."), s(did % 256),
        lit(".0."), s((did * 3) % 256), lit(" ref "),
        s(did * did + 100000), "")
    mixed = pc.if_else(pa.array(did % mod != 0), injected, text)
    return t.set_column(t.column_names.index(text_col), text_col, mixed)


class PiiRedactor:
    """doc -> (doc_id, n_emails, n_phones, n_ips, n_ids,
    text_redacted): per-pattern match counts on the input text plus
    the text with every match replaced, in the fixed PII_PATTERNS
    order (email before phone/id so an address's digits are never
    half-eaten by a later pattern).

    Arrow-native actor stage: patterns are plain RE2 strings handed
    to ``pc.count_substring_regex`` / ``pc.replace_substring_regex``
    (one C pass per pattern, zero boxing); DuckDB's regexp_* kernels
    run the same RE2, so the oracle (sql_doc_pii_redact) matches
    byte-for-byte.  ``inject=True`` prepends the deterministic
    :func:`inject_pii` synthesizer (verification corpora only)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 inject: bool = False):
        self.id_col, self.text_col = id_col, text_col
        self.inject = inject

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if self.inject:
            t = inject_pii(t, self.id_col, self.text_col)
        text = pc.cast(t[self.text_col], pa.string())
        cols = {self.id_col: t[self.id_col]}
        red = text
        for name, pattern, repl in PII_PATTERNS:
            cols[f"n_{name}s"] = pc.cast(
                pc.count_substring_regex(text, pattern=pattern), pa.int64())
            red = pc.replace_substring_regex(red, pattern=pattern,
                                             replacement=repl)
        cols["text_redacted"] = red
        return pa.table(cols)


# ---------------------------------------------------------------------------
# word k-gram machinery (ASCII-exact, DuckDB-mirrorable)
# ---------------------------------------------------------------------------

_ASCII_WS = re.compile(r"[ \t\n\r\f\v]+")


def ascii_tokens(text: str) -> list:
    """Split on the explicit ASCII whitespace class, dropping empties
    — mirrors ``list_filter(string_split_regex(text,
    '[ \\t\\n\\r\\f\\v]+'), t -> t <> '')`` exactly."""
    return [w for w in _ASCII_WS.split(text) if w]


def doc_gram_hashes(text: str, k: int,
                    hash_mode: str = "fast") -> np.ndarray:
    """Distinct word k-gram hashes of one document (uint64).  Docs
    with fewer than k tokens emit NO grams (mirrors the oracle's
    ``generate_series(1, len - k + 1)`` being empty).  ``md5`` mode
    has the exact DuckDB mirror; ``fast`` is the production default
    (same trade as stages/dedup._hash_strings)."""
    from .dedup import _hash_strings, _hash_strings_md5

    toks = ascii_tokens(text)
    if len(toks) < k:
        return np.empty(0, dtype=np.uint64)
    grams = sorted({" ".join(toks[i:i + k])
                    for i in range(len(toks) - k + 1)})
    return (_hash_strings_md5(grams) if hash_mode == "md5"
            else _hash_strings(grams))


class _GramPairs:
    """doc batch -> distinct (gram-hash, doc_id[, bucket]) pairs.
    Tokenization state (compiled splitter via module import) is
    per-actor; the per-doc loop is inherent to variable-length
    shingling (same shape as the Jaccard/MinHash stages)."""

    def __init__(self, id_col="doc_id", text_col="text", k=3,
                 hash_mode="fast", num_buckets=0, id_filter_mod=0):
        self.id_col, self.text_col = id_col, text_col
        self.k, self.hash_mode = k, hash_mode
        self.num_buckets = num_buckets
        self.id_filter_mod = id_filter_mod  # >0: keep doc_id % mod == 0

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, hs = [], []
        for doc_id, text in zip(batch[self.id_col], batch[self.text_col]):
            if self.id_filter_mod and int(doc_id) % self.id_filter_mod:
                continue
            h = doc_gram_hashes(str(text), self.k, self.hash_mode)
            if len(h):
                hs.append(h)
                ids.append(np.full(len(h), doc_id, dtype=np.int64))
        if not hs:
            return pd.DataFrame({"h": np.empty(0, np.uint64),
                                 self.id_col: np.empty(0, np.int64),
                                 **({"_b": np.empty(0, np.int32)}
                                    if self.num_buckets else {})})
        h = np.concatenate(hs)
        out = {"h": h, self.id_col: np.concatenate(ids)}
        if self.num_buckets:
            out["_b"] = (h % np.uint64(self.num_buckets)).astype(np.int32)
        return pd.DataFrame(out)


class _EvalOverlapCounter:
    """Per-batch membership count against the broadcast eval-gram
    set: sorted uint64 array read from the object store ONCE per
    actor (``ray.get`` in ``__init__``), binary-searched per doc."""

    def __init__(self, eval_ref, id_col="doc_id", text_col="text",
                 k=3, hash_mode="fast", eval_mod=97):
        import ray

        self.grams = (ray.get(eval_ref)
                      if isinstance(eval_ref, ray.ObjectRef) else eval_ref)
        self.id_col, self.text_col = id_col, text_col
        self.k, self.hash_mode, self.eval_mod = k, hash_mode, eval_mod

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, ns = [], []
        if not len(self.grams):
            return pd.DataFrame({self.id_col: np.empty(0, np.int64),
                                 "n": np.empty(0, np.int64)})
        for doc_id, text in zip(batch[self.id_col], batch[self.text_col]):
            if int(doc_id) % self.eval_mod == 0:
                continue  # eval docs are not decontamination targets
            h = doc_gram_hashes(str(text), self.k, self.hash_mode)
            if not len(h):
                continue
            idx = np.searchsorted(self.grams, h)
            idx[idx == len(self.grams)] = 0
            n = int(np.count_nonzero(self.grams[idx] == h))
            if n:
                ids.append(int(doc_id))
                ns.append(n)
        return pd.DataFrame({self.id_col: np.array(ids, np.int64),
                             "n": np.array(ns, np.int64)})


# Eval-set distinct-gram budget for the driver collect.  A
# decontamination eval side is benchmark-sized (1e3-1e5 docs); 50M
# uint64 hashes = 400 MB, already far beyond any real benchmark
# suite.  Above it, fail loudly rather than silently degrade — the
# upgrade path at that point is the dup_ngram_counts shuffle shape
# (tag eval grams into the same bucket groupby), not a bigger
# broadcast.
MAX_EVAL_GRAMS = 50_000_000


def decontaminate(ds, id_col="doc_id", text_col="text", k=3,
                  eval_mod=97, hash_mode="fast"):
    """Benchmark decontamination: (doc_id, n) for every training doc
    (``doc_id % eval_mod != 0``) sharing >= 1 distinct word k-gram
    with the eval split (``doc_id % eval_mod == 0``); n = how many of
    the doc's distinct grams are contaminated.

    The eval split is carved deterministically out of the corpus
    itself (no external data in the sandbox); production callers pass
    a real benchmark table through the same two stages.  Oracle:
    sql_doc_ngram_overlap (md5 mode).
    """
    import ray

    eval_pairs = ds.map_batches(
        _GramPairs, fn_constructor_kwargs=dict(
            id_col=id_col, text_col=text_col, k=k, hash_mode=hash_mode,
            id_filter_mod=eval_mod),
        batch_format="pandas", concurrency=pool_spec())
    # streamed driver collect: per-batch unique first, budget enforced
    # DURING accumulation (not after a potentially huge concat)
    parts, total = [], 0
    for b in eval_pairs.select_columns(["h"]).iter_batches(
            batch_size=1 << 20, batch_format="numpy"):
        u = np.unique(b["h"])
        parts.append(u)
        total += len(u)
        if total > 2 * MAX_EVAL_GRAMS:
            raise ValueError(
                f"eval split exceeds the {MAX_EVAL_GRAMS}-gram broadcast "
                "budget; use the bucket-shuffle shape (dup_ngram_counts) "
                "instead of the broadcast")
    grams = (np.unique(np.concatenate(parts)) if parts
             else np.empty(0, np.uint64))
    if len(grams) > MAX_EVAL_GRAMS:
        raise ValueError(
            f"eval split has {len(grams)} distinct grams "
            f"(> {MAX_EVAL_GRAMS}); use the bucket-shuffle shape "
            "(dup_ngram_counts) instead of the broadcast")
    ref = ray.put(grams)
    return ds.map_batches(
        _EvalOverlapCounter, fn_constructor_kwargs=dict(
            eval_ref=ref, id_col=id_col, text_col=text_col, k=k,
            hash_mode=hash_mode, eval_mod=eval_mod),
        batch_format="pandas", concurrency=pool_spec())


def dup_ngram_counts(ds, id_col="doc_id", text_col="text", k=3,
                     num_buckets=64, hash_mode="fast"):
    """Corpus-wide duplicated-k-gram counts: (doc_id, n) where n = the
    doc's distinct word k-grams that appear in >= 1 OTHER doc (docs
    with n = 0 are omitted).  The per-doc dup fraction (n over the
    doc's distinct-gram count) is the Lee-et-al. exact-substring
    dedup signal at k-gram granularity.

    Scale shape: distinct (hash, doc_id) pairs -> ONE int-bucket
    shuffle (equal grams co-locate by construction) -> per-bucket
    vectorized duplicate marking + per-doc partial counts (output is
    docs-per-bucket-sized) -> final doc_id sum over partials (doc-
    count-sized).  The text never moves; nothing is all-pairs.
    """
    pairs = ds.map_batches(
        _GramPairs, fn_constructor_kwargs=dict(
            id_col=id_col, text_col=text_col, k=k, hash_mode=hash_mode,
            num_buckets=num_buckets),
        batch_format="pandas", concurrency=pool_spec())

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # pairs are distinct per doc, so a hash's row count IS its
        # distinct-doc count
        counts = g.groupby("h")["h"].transform("size")
        dup = g[counts > 1]
        part = dup.groupby(id_col, as_index=False).size() \
            .rename(columns={"size": "n"})
        part["n"] = part["n"].astype(np.int64)
        return part[[id_col, "n"]]

    partials = pairs.groupby("_b").map_groups(
        per_bucket, batch_format="pandas")

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t[id_col].cast(pa.int64()),
            "n": t[f"sum(n)"].cast(pa.int64()) if f"sum(n)" in t.column_names
            else t["n"].cast(pa.int64())})

    return partials.groupby(id_col).sum("n") \
        .map_batches(finalize, batch_format="pyarrow")


class _GramOccurrences:
    """doc batch -> ALL (gram-hash, doc_id, start) occurrence rows in
    position order (multiplicity preserved — within-doc repeats emit
    one row each), bucketed by gram hash.  The occurrence plane is
    what exact-substring REMOVAL needs; _GramPairs' distinct plane is
    what counting needs."""

    def __init__(self, id_col="doc_id", text_col="text", k=3,
                 hash_mode="fast", num_buckets=64):
        self.id_col, self.text_col = id_col, text_col
        self.k, self.hash_mode = k, hash_mode
        self.num_buckets = num_buckets

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from itertools import chain

        from .dedup import _hash_strings, _hash_strings_md5

        hasher = (_hash_strings_md5 if self.hash_mode == "md5"
                  else _hash_strings)
        k = self.k
        per_doc = [ascii_tokens(str(t)) for t in batch[self.text_col]]
        lens = np.fromiter((len(x) for x in per_doc), np.int64,
                           len(per_doc))
        ids = np.asarray(batch[self.id_col], dtype=np.int64)
        keep = lens >= k
        empty = pd.DataFrame({"h": np.empty(0, np.uint64),
                              self.id_col: np.empty(0, np.int64),
                              "i": np.empty(0, np.int64),
                              "_b": np.empty(0, np.int32)})
        if not keep.any():
            return empty
        ids, lens = ids[keep], lens[keep]
        flat = np.array(list(chain.from_iterable(
            t for t, kp in zip(per_doc, keep) if kp)), dtype=object)
        # flat-batch k-gram construction: a gram starts at every flat
        # position whose local index is <= doc_len - k; the gram
        # string is the str.cat of k boundary-safe shifted slices —
        # no per-doc Python join loop
        n = len(flat)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        li = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
        valid = li <= np.repeat(lens, lens) - k
        pos = np.nonzero(valid)[0]
        if not len(pos):
            return empty
        g0 = pd.Series(flat[pos], dtype=object)
        grams = g0.str.cat(
            [pd.Series(flat[pos + j], dtype=object) for j in range(1, k)],
            sep=" ")
        h = hasher(grams.tolist())
        return pd.DataFrame({
            "h": h,
            self.id_col: np.repeat(ids, lens - k + 1),
            "i": li[pos],
            "_b": (h % np.uint64(self.num_buckets)).astype(np.int32)})


def strip_dup_spans(ds, id_col="doc_id", text_col="text", k=3,
                    num_buckets=64, hash_mode="fast", min_count=2):
    """Exact-substring dedup REMOVAL (the consumption side of the Lee
    et al. 2022 duplicated-substring signal, word-k-gram granularity):
    a token is DROPPED when any k-gram occurrence covering it appears
    >= ``min_count`` times corpus-wide (occurrence multiplicity —
    within-doc repeats count, like the suffix-array formulation).
    Emits (doc_id, text_clean, n_tokens_kept) for EVERY doc (docs
    shorter than k tokens pass through unchanged).

    Scale shape: pass A streams ALL (gram-hash, doc_id, start) rows
    through ONE gram-hash bucket shuffle; each bucket marks hashes
    whose total multiplicity reaches min_count and emits only the
    covered START rows (dup-occurrence-sized, no text).  Pass B
    co-locates those starts with the doc payload by ONE doc-id bucket
    shuffle and rebuilds each doc from its uncovered tokens
    (vectorized interval marking via a diff array).  The corpus text
    moves exactly once; nothing is all-pairs; no driver collect.
    """
    occ = ds.map_batches(
        _GramOccurrences, fn_constructor_kwargs=dict(
            id_col=id_col, text_col=text_col, k=k, hash_mode=hash_mode,
            num_buckets=num_buckets),
        batch_format="pandas", concurrency=pool_spec())

    def mark(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby("h")["h"].transform("size")
        dup = g[sizes >= min_count]
        out = dup[[id_col, "i"]].copy()
        out["_db"] = (out[id_col] % num_buckets).astype(np.int32)
        out["text"] = ""
        out["_src"] = np.int8(1)
        return out[[id_col, "i", "text", "_src", "_db"]]

    starts = occ.groupby("_b").map_groups(mark, batch_format="pandas")

    def payload(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(np.int64),
            "i": np.full(len(b), -1, np.int64),
            "text": b[text_col].astype(str),
            "_src": np.zeros(len(b), np.int8),
            "_db": (b[id_col].to_numpy(np.int64)
                    % num_buckets).astype(np.int32)})

    docs = ds.map_batches(payload, batch_format="pandas")

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        texts = g[g["_src"] == 0]
        st = g[g["_src"] == 1]
        sby = ({int(d): v["i"].to_numpy(np.int64)
                for d, v in st.groupby(id_col)} if len(st) else {})
        out_id = texts[id_col].to_numpy(np.int64)
        out_text, out_n = [], np.empty(len(texts), np.int64)
        for row, (doc_id, text) in enumerate(
                zip(out_id, texts["text"])):
            toks = ascii_tokens(str(text))
            starts_d = sby.get(int(doc_id))
            if starts_d is None or not len(toks):
                kept = toks
            else:
                n = len(toks)
                d = np.zeros(n + 1, np.int64)
                np.add.at(d, starts_d, 1)
                np.add.at(d, np.minimum(starts_d + k, n), -1)
                cov = np.cumsum(d[:n]) > 0
                kept = [t for t, c in zip(toks, cov) if not c]
            out_text.append(" ".join(kept))
            out_n[row] = len(kept)
        return pd.DataFrame({id_col: out_id, "text_clean": out_text,
                             "n_tokens_kept": out_n})

    return docs.union(starts).groupby("_db").map_groups(
        rebuild, batch_format="pandas")


class _EvalStripRebuild:
    """doc batch -> (doc_id, text_clean, n_tokens_kept) with every
    token covered by an eval-split k-gram stripped: the broadcast
    sorted eval-gram hashes land once per actor; per doc, occurrence
    hashes are membership-tested with one vectorized searchsorted and
    the covered intervals stripped via the diff-array marking."""

    def __init__(self, eval_ref, id_col="doc_id", text_col="text",
                 k=3, hash_mode="fast", eval_mod=97):
        import ray

        self.grams = (ray.get(eval_ref)
                      if isinstance(eval_ref, ray.ObjectRef)
                      else eval_ref)
        self.id_col, self.text_col = id_col, text_col
        self.k, self.hash_mode, self.eval_mod = k, hash_mode, eval_mod

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from .dedup import _hash_strings, _hash_strings_md5

        hasher = (_hash_strings_md5 if self.hash_mode == "md5"
                  else _hash_strings)
        out_id, out_text, out_n = [], [], []
        for doc_id, text in zip(batch[self.id_col],
                                batch[self.text_col]):
            if int(doc_id) % self.eval_mod == 0:
                continue  # eval docs are not decontamination targets
            toks = ascii_tokens(str(text))
            kept = toks
            if len(toks) >= self.k and len(self.grams):
                grams = [" ".join(toks[i:i + self.k])
                         for i in range(len(toks) - self.k + 1)]
                h = hasher(grams)
                idx = np.searchsorted(self.grams, h)
                idx[idx == len(self.grams)] = 0
                starts = np.nonzero(self.grams[idx] == h)[0]
                if len(starts):
                    n = len(toks)
                    d = np.zeros(n + 1, np.int64)
                    np.add.at(d, starts, 1)
                    np.add.at(d, np.minimum(starts + self.k, n), -1)
                    cov = np.cumsum(d[:n]) > 0
                    kept = [t for t, c in zip(toks, cov) if not c]
            out_id.append(int(doc_id))
            out_text.append(" ".join(kept))
            out_n.append(len(kept))
        return pd.DataFrame({
            self.id_col: np.array(out_id, np.int64),
            "text_clean": np.array(out_text, dtype=object),
            "n_tokens_kept": np.array(out_n, np.int64)})


def strip_contaminated_spans(ds, id_col="doc_id", text_col="text",
                             k=3, eval_mod=97, hash_mode="fast"):
    """Benchmark decontamination REMOVAL: rewrite every TRAINING doc
    (``doc_id % eval_mod != 0``) with all tokens covered by an
    eval-split k-gram stripped — the action counterpart of
    ``decontaminate``'s counting.  Same broadcast shape: the eval
    side's distinct gram hashes are collected once under the
    MAX_EVAL_GRAMS budget and ``ray.put`` once; the corpus then
    streams through ONE zero-shuffle rewrite pass.  Eval docs emit no
    row (the output IS the decontaminated training corpus)."""
    import ray

    eval_pairs = ds.map_batches(
        _GramPairs, fn_constructor_kwargs=dict(
            id_col=id_col, text_col=text_col, k=k, hash_mode=hash_mode,
            id_filter_mod=eval_mod),
        batch_format="pandas", concurrency=pool_spec())
    parts, total = [], 0
    for b in eval_pairs.select_columns(["h"]).iter_batches(
            batch_size=1 << 20, batch_format="numpy"):
        u = np.unique(b["h"])
        parts.append(u)
        total += len(u)
        if total > 2 * MAX_EVAL_GRAMS:
            raise ValueError(
                f"eval split exceeds the {MAX_EVAL_GRAMS}-gram "
                "broadcast budget; use the bucket-shuffle shape "
                "(strip_dup_spans machinery) instead")
    grams = (np.unique(np.concatenate(parts)) if parts
             else np.empty(0, np.uint64))
    if len(grams) > MAX_EVAL_GRAMS:
        raise ValueError(
            f"eval split has {len(grams)} distinct grams "
            f"(> {MAX_EVAL_GRAMS}); use the bucket-shuffle shape")
    ref = ray.put(grams)
    return ds.map_batches(
        _EvalStripRebuild, fn_constructor_kwargs=dict(
            eval_ref=ref, id_col=id_col, text_col=text_col, k=k,
            hash_mode=hash_mode, eval_mod=eval_mod),
        batch_format="pandas", concurrency=pool_spec())
