"""Sequence packing: concat-and-chunk document -> training-sequence
assignment via a distributed prefix sum.

The GPT-style packing a pre-training pipeline runs after cleaning:
documents are concatenated in a deterministic global order (doc_id)
into one virtual token stream, which is then chunked into fixed
``seq_len``-token training sequences (documents may cross chunk
boundaries).  The operator emits, per document, its absolute token
offset in the stream and the first/last sequence ids it lands in —
exactly the index a sharded loader needs to materialize any training
sequence by reading only the documents that overlap it.

No reference analog (graft requirement: beyond-reference training-data
ops).  Oracle: sql_doc_pack — ``SUM(n) OVER (ORDER BY doc_id ROWS
UNBOUNDED PRECEDING)`` in DuckDB.

Scale shape (the interesting part — a global ORDERED scan, which Ray
Data has no primitive for):

1. Tokenize -> (doc_id, n_tokens) and DROP the text immediately: the
   sort below shuffles two int64 columns, never the corpus payload.
2. ``ds.sort(id_col)`` -> range-partitioned, globally ordered blocks.
3. Pass A (``batch_size=None`` = exactly one block per batch): each
   block emits (block_min_id, block_token_sum) — a BLOCK-COUNT-sized
   driver collect (thousands of rows at 100 TB, not billions).
4. Driver orders the partials by block_min_id and computes exclusive
   block offsets — the classic two-phase scan.
5. Pass B over the SAME materialized sorted dataset: per-block
   exclusive cumsum + the broadcast block offset (keyed by the
   block's min id; doc_ids are unique so block minima are distinct).

The sorted (doc_id, n_tokens) dataset is materialized between the two
passes so both see identical block structure; at 16 bytes/doc that is
~16 GB per billion documents spread across the cluster object store —
bounded by DOC COUNT, not corpus bytes (the same int-plane budget as
the dedup pair index, stages/dedup.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.terms import pool_size


def _token_counts(ds, id_col: str, text_col: str):
    """(doc_id, n_tokens) on the explicit ASCII whitespace class
    (mirrors ``len(list_filter(string_split_regex(text,
    '[ \\t\\n\\r\\f\\v]+'), t -> t <> ''))`` and TokenCounter's
    n_tokens column)."""

    def count(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = pc.cast(t[text_col], pa.string())
        return pa.table({
            id_col: t[id_col].cast(pa.int64()),
            "n_tokens": pc.cast(pc.count_substring_regex(
                text, pattern=r"[^ \t\n\r\f\v]+"), pa.int64()),
        })

    return ds.map_batches(count, batch_format="pyarrow",
                          concurrency=pool_size())


def pack_sequences(ds, seq_len: int = 2048, id_col: str = "doc_id",
                   text_col: str = "text", precounted: bool = False):
    """documents -> (doc_id, n_tokens, token_offset, seq_id,
    seq_id_last): position of every document in the concat-and-chunk
    packing of the corpus into ``seq_len``-token training sequences.

    ``token_offset`` = exclusive prefix sum of n_tokens in doc_id
    order; ``seq_id`` = token_offset // seq_len; ``seq_id_last`` =
    (token_offset + n_tokens - 1) // seq_len for non-empty docs (empty
    docs occupy no tokens: seq_id_last = seq_id).

    ``precounted=True``: the input already carries an ``n_tokens``
    column (e.g. clean_corpus output) — skip the tokenize pass and
    pack over (id_col, n_tokens) directly.  At 100 TB this is the
    difference between packing a survivor TABLE of two int64 columns
    and re-scanning the text corpus.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    counted = (ds.select_columns([id_col, "n_tokens"]) if precounted
               else _token_counts(ds, id_col, text_col))
    tokens = counted.sort(id_col).materialize()

    def block_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return pa.table({"block_min": pa.array([], pa.int64()),
                             "block_sum": pa.array([], pa.int64())})
        return pa.table({
            "block_min": pa.array([pc.min(t[id_col]).as_py()], pa.int64()),
            "block_sum": pa.array([pc.sum(t["n_tokens"]).as_py() or 0],
                                  pa.int64()),
        })

    # pass A: block-count-sized partials (batch_size=None = one batch
    # per block, so pass B sees the same batch boundaries)
    partials = tokens.map_batches(
        block_partial, batch_format="pyarrow",
        batch_size=None).to_pandas()
    partials = partials.sort_values("block_min")
    offsets = {
        int(m): int(o) for m, o in zip(
            partials["block_min"],
            np.concatenate([[0], partials["block_sum"].to_numpy()[:-1]])
            .cumsum())
    }

    import ray

    offsets_ref = ray.put(offsets)

    class Assign:
        def __init__(self, offsets_ref, seq_len, id_col):
            self.offsets = (ray.get(offsets_ref)
                            if isinstance(offsets_ref, ray.ObjectRef)
                            else offsets_ref)
            self.seq_len, self.id_col = seq_len, id_col

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({
                    self.id_col: pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "token_offset": pa.array([], pa.int64()),
                    "seq_id": pa.array([], pa.int64()),
                    "seq_id_last": pa.array([], pa.int64())})
            ids = t[self.id_col].to_numpy()
            n = t["n_tokens"].to_numpy()
            base = self.offsets[int(ids.min())]
            off = base + np.concatenate([[0], n[:-1]]).cumsum()
            last = off + np.maximum(n - 1, 0)
            return pa.table({
                self.id_col: pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
                "token_offset": pa.array(off, pa.int64()),
                "seq_id": pa.array(off // self.seq_len, pa.int64()),
                "seq_id_last": pa.array(last // self.seq_len, pa.int64()),
            })

    # batch_size=None on BOTH passes: a batch is exactly one block, so
    # each pass-B batch's min id is a pass-A partial key by construction
    return tokens.map_batches(
        Assign, fn_constructor_kwargs=dict(
            offsets_ref=offsets_ref, seq_len=seq_len, id_col=id_col),
        batch_format="pyarrow", batch_size=None, concurrency=pool_size())


def global_rank_buckets(ds, score_col: str, id_col: str = "doc_id",
                        n_buckets: int = 3):
    """(id, score) -> (id, score, rank, bucket): every row's exact
    0-based GLOBAL rank in ascending (score, id) order and its
    equal-count quantile bucket ``rank * n_buckets // total`` — the
    CCNet head/middle/tail assignment when score is an LM
    perplexity/logp surface (and a general exact-quantile primitive).

    Same two-phase distributed prefix scan as ``pack_sequences``,
    generalized from SUM to COUNT: ``ds.sort((score, id))`` range-
    partitions into globally ordered blocks; pass A collects one
    (first_score, first_id, n_rows) partial per block (block-count-
    sized, thousands of rows at 100 TB); the driver computes
    exclusive rank offsets; pass B assigns rank = block offset +
    local position.  Ties on score are broken by id on both engines,
    so the assignment is fully deterministic — with an integer score
    (e.g. the e6-scaled LM logp already driver-hash-pinned) the
    bucket surface is integer math end to end, no float parity risk.

    Oracle shape: ``ROW_NUMBER() OVER (ORDER BY score, id) - 1`` and
    ``(rank * n_buckets) // COUNT(*)``."""
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    s = ds.select_columns([id_col, score_col]) \
        .sort([score_col, id_col]).materialize()

    def block_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"k_score": pa.array([], pa.int64()),
                             "k_id": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        return pa.table({
            "k_score": pa.array([t[score_col][0].as_py()], pa.int64()),
            "k_id": pa.array([t[id_col][0].as_py()], pa.int64()),
            "cnt": pa.array([t.num_rows], pa.int64())})

    partials = s.map_batches(block_partial, batch_format="pyarrow",
                             batch_size=None).to_pandas() \
        .sort_values(["k_score", "k_id"])
    total = int(partials["cnt"].sum())
    offs = np.concatenate([[0], partials["cnt"].to_numpy()[:-1]]) \
        .cumsum()
    offsets = {(int(sc), int(i)): int(o) for sc, i, o in zip(
        partials["k_score"], partials["k_id"], offs)}

    import ray

    offsets_ref = ray.put(offsets)

    class Rank:
        def __init__(self, offsets_ref, total, n_buckets, score_col,
                     id_col):
            self.offsets = (ray.get(offsets_ref)
                            if isinstance(offsets_ref, ray.ObjectRef)
                            else offsets_ref)
            self.total = total
            self.n_buckets, self.score_col = n_buckets, score_col
            self.id_col = id_col

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({
                    self.id_col: pa.array([], pa.int64()),
                    self.score_col: pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64())})
            scores = t[self.score_col].to_numpy()
            ids = t[self.id_col].to_numpy()
            base = self.offsets[(int(scores[0]), int(ids[0]))]
            rank = base + np.arange(t.num_rows, dtype=np.int64)
            return pa.table({
                self.id_col: pa.array(ids, pa.int64()),
                self.score_col: pa.array(scores, pa.int64()),
                "rank": pa.array(rank, pa.int64()),
                "bucket": pa.array(rank * self.n_buckets // self.total,
                                   pa.int64())})

    return s.map_batches(
        Rank, fn_constructor_kwargs=dict(
            offsets_ref=offsets_ref, total=total, n_buckets=n_buckets,
            score_col=score_col, id_col=id_col),
        batch_format="pyarrow", batch_size=None, concurrency=pool_size())
