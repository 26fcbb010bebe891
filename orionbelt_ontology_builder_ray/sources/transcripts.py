"""Transcript table source (BASELINE.json input_hint shape).

Two entry points:

- ``read_transcripts(path)`` — read a real transcripts Parquet table
  ``(conv_id:string, turn_idx:int32, role:string, text:string,
  tool:string, ts:timestamp[us])``.
- ``derive_transcripts(sf_dir)`` — deterministically derive that shape
  from the driver testdata (``events`` ⋈ ``nation`` ⋈ ``region``), so
  correctness oracles stay SQL-expressible.  ``TRANSCRIPTS_SQL`` is
  the DuckDB mirror of the derivation; the Ray and SQL paths must
  produce byte-identical rows (verified in tests).

Scale notes: the dense per-conversation ``turn_idx`` requires
co-locating a conversation — a ``groupby(conv_key).map_groups`` sort
(conversations are tiny relative to blocks, so per-group pandas is
fine; skewed 500-turn outliers still fit a group).  Everything after
runs vectorized per batch.  The nation/region dimension join is a
broadcast lookup (25 + 5 rows), never a shuffle join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

ROLE_BY_EVENT = {
    "view": "user",
    "click": "user",
    "purchase": "assistant",
    "signup": "system",
    "error": "tool",
}

TRANSCRIPT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])

# DuckDB mirror of derive_transcripts (oracle CTE). Keep in lockstep
# with _finish_batch below.
TRANSCRIPTS_SQL = """
SELECT
  'conv-' || lpad(CAST(e.user_id AS VARCHAR), 6, '0') AS conv_id,
  CAST(row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) - 1
       AS INTEGER) AS turn_idx,
  CASE e.event_type WHEN 'view' THEN 'user' WHEN 'click' THEN 'user'
       WHEN 'purchase' THEN 'assistant' WHEN 'signup' THEN 'system'
       ELSE 'tool' END AS role,
  e.event_type || ' event regarding [' || n.n_name || '] in [' || r.r_name
       || '] with props ' || e.props AS text,
  CASE WHEN e.event_type = 'error'
       THEN 'tool-' || CAST(e.event_id % 7 AS VARCHAR) ELSE '' END AS tool,
  e.ts AS ts
FROM events e
JOIN nation n ON e.user_id % 25 = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
"""


def read_transcripts(path, columns=None, **kwargs):
    import ray.data as rd

    return rd.read_parquet(path, columns=columns, **kwargs)


def _nation_lookup(sf_dir: str):
    """Driver-side broadcast dimension: nationkey -> (n_name, r_name)."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    merged = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    merged = merged.sort_values("n_nationkey")
    return (merged["n_name"].to_numpy(dtype=object),
            merged["r_name"].to_numpy(dtype=object))


def _assign_turn_idx_bucketed(g: pd.DataFrame) -> pd.DataFrame:
    """Dense per-conversation index under stable (ts, event_id) order,
    over a BUCKET of users (one vectorized sort + cumcount per bucket,
    never one Python group per user — the measured Ray sort-groupby
    cliff at millions of users; same shape as stages/windows.py)."""
    g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    g["turn_idx"] = g.groupby("user_id", sort=False).cumcount() \
        .astype(np.int32)
    return g.drop(columns="_bucket")


class _FinishTranscripts:
    """Vectorized column construction (pandas batch kernel)."""

    def __init__(self, sf_dir: str):
        self.n_names, self.r_names = _nation_lookup(sf_dir)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        uid = batch["user_id"].to_numpy()
        nk = uid % 25
        event_type = batch["event_type"].astype(str)
        out = pd.DataFrame({
            "conv_id": "conv-" + batch["user_id"].astype(str).str.zfill(6),
            "turn_idx": batch["turn_idx"].astype(np.int32),
            "role": event_type.map(ROLE_BY_EVENT),
            "text": (event_type + " event regarding ["
                     + pd.Series(self.n_names[nk], index=batch.index)
                     + "] in ["
                     + pd.Series(self.r_names[nk], index=batch.index)
                     + "] with props " + batch["props"].astype(str)),
            "tool": np.where(event_type.to_numpy() == "error",
                             "tool-" + (batch["event_id"] % 7).astype(str), ""),
            "ts": batch["ts"],
        })
        return out


def derive_transcripts(sf_dir: str):
    """events -> transcripts Dataset (Ray mirror of TRANSCRIPTS_SQL)."""
    import ray.data as rd

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"])
    nb = 64

    def bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        h = pd.util.hash_pandas_object(batch["user_id"], index=False)
        batch["_bucket"] = (h % nb).astype("int32")
        return batch

    with_idx = events.map_batches(bucket, batch_format="pandas") \
        .groupby("_bucket").map_groups(_assign_turn_idx_bucketed,
                                       batch_format="pandas")
    return with_idx.map_batches(
        _FinishTranscripts(sf_dir), batch_format="pandas")


def derive_transcripts_table(sf_dir: str) -> pa.Table:
    """Driver-side (no Ray) derivation for tests/small fixtures."""
    events = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    events = (events.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
              .reset_index(drop=True))
    events["turn_idx"] = events.groupby("user_id").cumcount().astype(np.int32)
    out = _FinishTranscripts(sf_dir)(events)
    return pa.Table.from_pandas(out, preserve_index=False).cast(TRANSCRIPT_SCHEMA)
