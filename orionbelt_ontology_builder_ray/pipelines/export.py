"""Resumable partitioned corpus export.

The output layout the 100-TB rule asks for: ONE DIRECTORY PER KEY
RANGE, each written atomically with a ``_SUCCESS`` marker, so a failed
export re-run skips finished partitions instead of rewriting the
corpus:

    <out_dir>/p=<k>/part.parquet
    <out_dir>/p=<k>/_SUCCESS

Resume is a PRE-SHUFFLE prune: the driver lists the (tiny) marker set,
and rows belonging to finished partitions are filtered inside the
first ``map_batches`` — skipped data never enters the partition
shuffle, so a 90%-complete re-run shuffles only the missing 10%.

Each partition is written by ITS OWN task (``groupby(part).
map_groups``): write to ``part.parquet.tmp`` then rename + marker, so
a task that dies mid-write leaves no marker and the partition is
redone on the next run.  At cluster scale ``out_dir`` is shared
storage (the same assumption as every distributed sink); partition
count should track input size (~input_bytes / 256 MiB), not CPU
count.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd


def _done_partitions(out_dir: str) -> set:
    try:
        names = os.listdir(out_dir)
    except FileNotFoundError:
        return set()
    done = set()
    for n in names:
        if n.startswith("p=") and os.path.exists(
                os.path.join(out_dir, n, "_SUCCESS")):
            done.add(int(n[2:]))
    return done


def export_corpus_partitioned(ds, out_dir: str, key_col: str = "doc_id",
                              num_partitions: int = 16) -> dict:
    """Export ``ds`` to ``out_dir`` partitioned by ``key_col % P``;
    returns {"written": [...], "skipped": [...]}.  Idempotent: a
    second run with the same input writes nothing."""
    os.makedirs(out_dir, exist_ok=True)
    done = _done_partitions(out_dir)

    def add_part(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_p"] = (b[key_col].to_numpy(np.int64)
                   % num_partitions).astype(np.int32)
        if done:
            b = b[~b["_p"].isin(done)]
        return b

    def write_one(g: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.parquet as pq

        p = int(g["_p"].iloc[0])
        pdir = os.path.join(out_dir, f"p={p}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, "part.parquet.tmp")
        final = os.path.join(pdir, "part.parquet")
        body = g.drop(columns="_p").sort_values(key_col)
        pq.write_table(pa.Table.from_pandas(body, preserve_index=False),
                       tmp)
        os.replace(tmp, final)
        with open(os.path.join(pdir, "_SUCCESS"), "w") as f:
            f.write(str(len(body)))
        return pd.DataFrame({"partition": [p],
                             "rows": [np.int64(len(body))]})

    report = ds.map_batches(add_part, batch_format="pandas") \
        .groupby("_p").map_groups(write_one, batch_format="pandas") \
        .to_pandas()
    written = sorted(int(p) for p in report["partition"]) \
        if len(report) else []
    return {"written": written,
            "skipped": sorted(done),
            "rows_written": int(report["rows"].sum()) if len(report) else 0}


def read_exported(out_dir: str):
    import ray.data as rd

    return rd.read_parquet(out_dir)


def export_training_corpus(docs_ds, out_dir: str, seq_len: int = 2048,
                           num_partitions: int = 16,
                           min_tokens: int = 20) -> dict:
    """The full training-data endgame as one composition:
    clean (fused pre-shuffle filter + exact dedup) -> sequence-pack
    (distributed prefix sum) -> resumable partitioned export, each
    partition carrying (doc_id, n_tokens, token_offset, seq_id) so a
    trainer can stream any key range independently.  Returns the
    export report ({"written", "skipped", "rows_written"})."""
    from ..stages.pack import pack_sequences
    from ..stages.textops import clean_corpus

    cleaned_ids = clean_corpus(docs_ds, min_tokens=min_tokens)
    keep = set()
    for b in cleaned_ids.iter_batches(batch_size=65536,
                                      batch_format="pandas"):
        keep.update(b["doc_id"].tolist())
    # survivor-id broadcast (8 B/doc) gates the pack input; at store
    # scale swap for the bucket-shuffle semi-join (dedup._semi_join
    # machinery) — same documented bound as incremental_dedup_docs
    import numpy as np
    import pandas as pd

    keep_arr = np.fromiter(keep, dtype=np.int64, count=len(keep))
    keep_arr.sort()

    def gate(b: pd.DataFrame) -> pd.DataFrame:
        if not len(keep_arr):
            return b.iloc[:0]
        ids = b["doc_id"].to_numpy(np.int64)
        pos = np.searchsorted(keep_arr, ids).clip(0, len(keep_arr) - 1)
        return b[keep_arr[pos] == ids]

    survivors = docs_ds.map_batches(gate, batch_format="pandas")
    packed = pack_sequences(survivors, seq_len=seq_len)
    return export_corpus_partitioned(packed, out_dir,
                                     num_partitions=num_partitions)
