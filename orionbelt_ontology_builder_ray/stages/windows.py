"""Ordered-log window operators Ray Data lacks natively (SURVEY §2.13
family): as-of join over a keyed event stream.

The reference has no ordered-log operators at all (its unit is an
in-memory graph); these are engine-native additions for the
transcript/event side of the corpus, mirrored by DuckDB's native
``ASOF JOIN`` for the oracle gate.

Partitioning assumption (documented per the custom-operator contract):
rows are co-located by ``hash(by_key) % num_buckets`` before the
per-bucket vectorized ``pd.merge_asof`` — one shuffle of the pruned
event columns, never a per-key groupby (millions of single-user
groups are the measured Ray sort-groupby cliff).  Within a bucket,
``merge_asof(by=...)`` handles every key in one C pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def asof_join_events(ds, left_type: str, right_type: str,
                     num_buckets: int = 64):
    """For each ``left_type`` event, attach the same user's most recent
    ``right_type`` event at-or-before its timestamp (inclusive, DuckDB
    ``ASOF JOIN`` semantics); unmatched left rows are dropped (inner).

    Determinism under timestamp ties: if a user has several
    ``right_type`` rows at the identical timestamp, the one with the
    greatest ``event_id`` wins — both this implementation and the SQL
    mirror pre-dedup the right side on (user_id, ts) keeping max
    event_id, so engines cannot disagree on an arbitrary pick.

    Input needs columns (event_id, ts, user_id, event_type); output is
    (event_id, user_id, ts, prior_event_id, prior_ts), all non-null.
    """
    nb = num_buckets
    out_schema = pa.schema([
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("prior_event_id", pa.int64()),
        ("prior_ts", pa.timestamp("us")),
    ])

    def bucket(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch[batch["event_type"].isin([left_type, right_type])]
        m = m[["event_id", "ts", "user_id", "event_type"]].copy()
        h = pd.util.hash_pandas_object(m["user_id"], index=False)
        m["_bucket"] = (h % nb).astype("int32")
        return m

    def join(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["event_type"] == left_type] \
            .sort_values(["ts", "event_id"], kind="mergesort")
        right = g[g["event_type"] == right_type] \
            .sort_values(["ts", "event_id"], kind="mergesort") \
            .drop_duplicates(["user_id", "ts"], keep="last")
        if not len(left) or not len(right):
            return out_schema.empty_table().to_pandas()
        merged = pd.merge_asof(
            left[["event_id", "ts", "user_id"]],
            right[["event_id", "ts", "user_id"]].rename(
                columns={"event_id": "prior_event_id", "ts": "prior_ts"}),
            left_on="ts", right_on="prior_ts", by="user_id",
            direction="backward", allow_exact_matches=True)
        merged = merged[merged["prior_event_id"].notna()]
        return pd.DataFrame({
            "event_id": merged["event_id"].astype(np.int64),
            "user_id": merged["user_id"].astype(np.int64),
            "ts": merged["ts"],
            "prior_event_id": merged["prior_event_id"].astype(np.int64),
            "prior_ts": merged["prior_ts"],
        })

    pairs = ds.map_batches(bucket, batch_format="pandas")
    return pairs.groupby("_bucket").map_groups(join, batch_format="pandas")
