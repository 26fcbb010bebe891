"""Ordered-log window operators Ray Data lacks natively (SURVEY §2.13
family): as-of join, range (interval) join, and sliding-window
aggregates over a keyed event stream.

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


def _bucket_events(ds, types, num_buckets: int):
    """Shared shuffle stage: prune to (event_id, ts, user_id,
    event_type) for the wanted types and attach a user-hash bucket —
    ONE all-to-all of the pruned columns, shared by every window
    operator below."""
    nb = num_buckets

    def bucket(batch: pd.DataFrame) -> pd.DataFrame:
        if types is None:
            # type-agnostic consumers don't read event_type: don't
            # ship it through the shuffle
            m = batch[["event_id", "ts", "user_id"]].copy()
        else:
            m = batch[batch["event_type"].isin(types)]
            m = m[["event_id", "ts", "user_id", "event_type"]].copy()
        h = pd.util.hash_pandas_object(m["user_id"], index=False)
        m["_bucket"] = (h % nb).astype("int32")
        return m

    return ds.map_batches(bucket, batch_format="pandas")


def _segmented_searchsorted(seg, vals, q_seg, q_vals, side):
    """Vectorized per-segment searchsorted.

    ``vals`` is ascending WITHIN each segment; rows are grouped by
    ``seg`` (dense int ranks, ascending).  Builds the composite key
    ``seg * span + (vals - base)`` — globally sorted because span
    exceeds the value range — and searches it with the query's own
    composite, then clips to the query segment's bounds (clipping
    absorbs queries whose value falls outside [base, base+range], which
    may otherwise land in a neighboring segment's key block).

    Overflow guard: needs n_segments * span < 2**62; at window-operator
    scales (segments = users per bucket, span = event-log time range in
    µs) this holds by orders of magnitude — a ValueError names the
    remedy (more buckets) if ever hit.
    """
    if not len(vals):
        return np.zeros(len(q_vals), dtype=np.int64)
    base = int(vals.min())
    span = int(vals.max()) - base + 2
    nseg = int(seg.max()) + 1
    if nseg * span >= 2 ** 62:
        raise ValueError(
            "segmented searchsorted composite key would overflow int64; "
            "raise num_buckets so fewer users share a bucket")
    key = seg.astype(np.int64) * span + (vals.astype(np.int64) - base)
    q = q_seg.astype(np.int64) * span + (q_vals.astype(np.int64) - base)
    pos = np.searchsorted(key, q, side=side)
    seg_lo = np.searchsorted(seg, q_seg, side="left")
    seg_hi = np.searchsorted(seg, q_seg, side="right")
    return np.clip(pos, seg_lo, seg_hi)


def range_join_events(ds, left_type: str, right_type: str,
                      window_minutes: int = 60, num_buckets: int = 64):
    """Range (interval) join: every ``left_type`` event paired with ALL
    of the same user's ``right_type`` events in the preceding window —
    ``r.ts >= l.ts - window AND r.ts < l.ts`` (strictly earlier, so
    the pair set is deterministic under equal timestamps).  Inner join:
    left rows with no window match are dropped.

    Shape: one shuffle of the pruned columns co-locates each user's
    rows in a hash bucket; inside a bucket both sides are lexsorted by
    (user, ts) and the window bounds come from ONE vectorized
    segmented searchsorted per bound — exact per-user windows with no
    cross-user candidate expansion and no per-user Python groups
    (cf. the asof partitioning note above).  Output size is the true
    pair count; skew lives where the data does (a user with k views
    before each of p purchases emits p*k pairs on any engine).
    """
    delta = np.int64(window_minutes * 60_000_000)  # µs
    out_schema = pa.schema([
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("matched_event_id", pa.int64()),
        ("matched_ts", pa.timestamp("us")),
    ])

    def join(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["event_type"] == left_type]
        right = g[g["event_type"] == right_type]
        if not len(left) or not len(right):
            return out_schema.empty_table().to_pandas()
        users, uniques = pd.factorize(
            pd.concat([right["user_id"], left["user_id"]]), sort=True)
        r_seg = users[:len(right)]
        l_seg = users[len(right):]
        r_ts = right["ts"].to_numpy("datetime64[us]").view(np.int64)
        l_ts = left["ts"].to_numpy("datetime64[us]").view(np.int64)
        order = np.lexsort((right["event_id"].to_numpy(), r_ts, r_seg))
        r_seg, r_ts = r_seg[order], r_ts[order]
        r_eid = right["event_id"].to_numpy()[order]
        lo = _segmented_searchsorted(r_seg, r_ts, l_seg, l_ts - delta,
                                     side="left")
        hi = _segmented_searchsorted(r_seg, r_ts, l_seg, l_ts,
                                     side="left")
        counts = hi - lo
        li = np.repeat(np.arange(len(left)), counts)
        offs = np.repeat(np.cumsum(counts) - counts, counts)
        ri = np.arange(int(counts.sum())) - offs + np.repeat(lo, counts)
        return pd.DataFrame({
            "event_id": left["event_id"].to_numpy()[li],
            "user_id": left["user_id"].to_numpy()[li],
            "ts": left["ts"].to_numpy("datetime64[us]")[li],
            "matched_event_id": r_eid[ri],
            "matched_ts": r_ts[ri].view("datetime64[us]"),
        })

    pairs = _bucket_events(ds, [left_type, right_type], num_buckets)
    return pairs.groupby("_bucket").map_groups(join, batch_format="pandas")


def lag_events(ds, num_buckets: int = 64, direction: str = "prev"):
    """Per-event lag/lead: each event paired with the same user's
    immediately preceding (``direction="prev"``, SQL ``lag()``) or
    following (``"next"``, SQL ``lead()``) event, ordered by
    (ts, event_id).  INNER semantics (boundary events are dropped,
    like the as-of join): nullable outputs stringify differently
    across engines, so the contract stays all-non-null
    int64/timestamp.  Same one-shuffle bucket shape as the other
    window operators; inside a bucket it is one lexsort + one shifted
    same-user comparison, fully vectorized.
    """
    col = "prev" if direction == "prev" else "next"

    def lag(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy("datetime64[us]")
        eid = g["event_id"].to_numpy()
        uid = g["user_id"].to_numpy()
        order = np.lexsort((eid, ts.view(np.int64), uid))
        ts, eid, uid = ts[order], eid[order], uid[order]
        same = np.zeros(len(g), dtype=bool)
        other_eid = np.full(len(g), -1, dtype=np.int64)
        other_ts = np.full(len(g), np.datetime64("NaT", "us"))
        if direction == "prev":
            if len(g) > 1:
                same[1:] = uid[1:] == uid[:-1]
            other_eid[1:][same[1:]] = eid[:-1][same[1:]]
            other_ts[1:][same[1:]] = ts[:-1][same[1:]]
        else:
            if len(g) > 1:
                same[:-1] = uid[:-1] == uid[1:]
            other_eid[:-1][same[:-1]] = eid[1:][same[:-1]]
            other_ts[:-1][same[:-1]] = ts[1:][same[:-1]]
        return pd.DataFrame({
            "event_id": eid[same], "user_id": uid[same], "ts": ts[same],
            f"{col}_event_id": other_eid[same],
            f"{col}_ts": other_ts[same],
        })

    pairs = _bucket_events(ds, None, num_buckets)
    return pairs.groupby("_bucket").map_groups(lag, batch_format="pandas")


def sessionize_events(ds, gap_minutes: int = 30, num_buckets: int = 64):
    """Session windows per user: consecutive events of one user belong
    to the same session while the inter-event gap is <= ``gap_minutes``
    (strictly-greater gap starts a new session — SQL
    ``ts - lag(ts) > INTERVAL`` semantics).  Output is one row per
    (user, session): (user_id, session_id, n_events, start_ts, end_ts),
    session_id numbering from 1 in time order within each user.

    Scale shape: the same ONE user-hash bucket shuffle as every other
    window operator (``_bucket_events`` — a user's rows are co-located
    by construction), then one vectorized pass per bucket: lexsort by
    (user, ts, event_id), boundary mask from a shifted same-user +
    gap comparison, and reduceat-style segment aggregates.  No
    per-user groups anywhere — a million single-user groups is the
    measured Ray sort-groupby cliff this module exists to avoid
    (VERDICT r3 item 2; cf. sliding_window_counts)."""
    gap_us = np.int64(gap_minutes * 60_000_000)

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy("datetime64[us]").view(np.int64)
        eid = g["event_id"].to_numpy()
        uid = g["user_id"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        ts, uid = ts[order], uid[order]
        n = len(g)
        brk = np.ones(n, dtype=bool)
        if n > 1:
            brk[1:] = (uid[1:] != uid[:-1]) | (ts[1:] - ts[:-1] > gap_us)
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], n)
        user = uid[starts]
        ns = len(starts)
        ubrk = np.ones(ns, dtype=bool)
        if ns > 1:
            ubrk[1:] = user[1:] != user[:-1]
        idx = np.arange(ns)
        # index of each session's user's FIRST session (ubrk[0] is True,
        # so the -1 filler never survives the running max)
        first_of_user = np.maximum.accumulate(np.where(ubrk, idx, -1))
        return pd.DataFrame({
            "user_id": user.astype(np.int64),
            "session_id": (idx - first_of_user + 1).astype(np.int64),
            "n_events": (ends - starts).astype(np.int64),
            "start_ts": ts[starts].view("datetime64[us]"),
            "end_ts": ts[ends - 1].view("datetime64[us]"),
        })

    pairs = _bucket_events(ds, None, num_buckets)
    return pairs.groupby("_bucket").map_groups(sessions,
                                               batch_format="pandas")


def sessionize_log(ds, key_col: str, seq_col: str, ts_col: str = "ts",
                   gap_minutes: int = 30, num_buckets: int = 64):
    """``sessionize_events`` generalized to ANY ordered log — string
    or int keys (conv_id on the transcripts plane), arbitrary
    sequence-tiebreak column.  Same scale shape: ONE key-hash bucket
    shuffle of the three pruned columns, then one vectorized pass per
    bucket.  String keys factorize to int codes inside the bucket
    (grouping only: session numbering is within-key and time-ordered,
    so code order never affects the result).  Output is one row per
    (key, session): (key_col, session_id, n, start_ts, end_ts),
    session_id numbering from 1 in time order within each key —
    identical semantics to sessionize_events (pinned by test)."""
    gap_us = np.int64(gap_minutes * 60_000_000)
    nb = num_buckets

    def bucket(b: pd.DataFrame) -> pd.DataFrame:
        m = b[[key_col, seq_col, ts_col]].copy()
        h = pd.util.hash_pandas_object(m[key_col], index=False)
        m["_bucket"] = (h % nb).astype("int32")
        return m

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_col].to_numpy("datetime64[us]").view(np.int64)
        seq = g[seq_col].to_numpy()
        codes, uniq = pd.factorize(g[key_col])
        order = np.lexsort((seq, ts, codes))
        ts, codes = ts[order], codes[order]
        n = len(g)
        brk = np.ones(n, dtype=bool)
        if n > 1:
            brk[1:] = (codes[1:] != codes[:-1]) | (ts[1:] - ts[:-1] > gap_us)
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], n)
        kcode = codes[starts]
        ns = len(starts)
        kbrk = np.ones(ns, dtype=bool)
        if ns > 1:
            kbrk[1:] = kcode[1:] != kcode[:-1]
        idx = np.arange(ns)
        first_of_key = np.maximum.accumulate(np.where(kbrk, idx, -1))
        return pd.DataFrame({
            key_col: np.asarray(uniq)[kcode],
            "session_id": (idx - first_of_key + 1).astype(np.int64),
            "n": (ends - starts).astype(np.int64),
            "start_ts": ts[starts].view("datetime64[us]"),
            "end_ts": ts[ends - 1].view("datetime64[us]"),
        })

    tagged = ds.map_batches(bucket, batch_format="pandas")
    return tagged.groupby("_bucket").map_groups(sessions,
                                                batch_format="pandas")


def log_integrity(ds, key_col: str, seq_col: str, ts_col: str = "ts",
                  attr_col: str = None, text_col: str = None,
                  num_buckets: int = 64):
    """Ordered-log integrity audit — the data-quality gate a
    transcript ingest runs BEFORE building a KG from it: per key
    (conversation) count the structural defects that corrupt
    downstream per-turn semantics.

    Output, one row per key: ``n_rows``; ``max_seq``; ``n_dup_seq``
    (rows whose sequence number repeats an earlier one — k copies
    count k-1); ``n_gaps`` (sequence values missing between the key's
    min and max); ``n_attr_repeats`` (adjacent rows — in
    (seq, ts, attr) order — with the same attr, e.g. two consecutive
    same-role turns); ``n_blank`` (text null or whitespace-only).

    Scale shape: the text column is reduced to ONE boolean per row
    inside the first streaming pass, so the payload never enters the
    single key-hash bucket shuffle; per bucket everything is one
    lexsort + reduceat pass (no per-key groups).  Tie-break contract:
    attr ties sort lexicographically (np.unique rank == SQL ORDER BY
    for ASCII attrs — roles here), and rows equal in (seq, ts, attr)
    are interchangeable, so the audit is partition- and
    order-invariant."""
    nb = num_buckets

    def bucket(b: pd.DataFrame) -> pd.DataFrame:
        m = pd.DataFrame({
            key_col: b[key_col],
            seq_col: b[seq_col].astype(np.int64),
            "_ts": b[ts_col].to_numpy("datetime64[us]").view(np.int64),
        })
        if attr_col is not None:
            m["_attr"] = b[attr_col].astype(str)
        if text_col is not None:
            s = b[text_col]
            m["_blank"] = (s.isna().to_numpy()
                           | s.fillna("").astype(str)
                           .str.fullmatch("[ \t\n\r\f\v]*")
                           .to_numpy().astype(bool))
        h = pd.util.hash_pandas_object(m[key_col], index=False)
        m["_bucket"] = (h % nb).astype("int32")
        return m

    def audit(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                key_col: pd.Series([], dtype=object),
                **{c: pd.Series([], dtype=np.int64)
                   for c in ("n_rows", "max_seq", "n_dup_seq", "n_gaps",
                             "n_attr_repeats", "n_blank")}})
        codes, uniq = pd.factorize(g[key_col])
        seq = g[seq_col].to_numpy(np.int64)
        ts = g["_ts"].to_numpy(np.int64)
        if attr_col is not None:
            _, acodes = np.unique(g["_attr"].to_numpy(), return_inverse=True)
        else:
            acodes = np.zeros(len(g), dtype=np.int64)
        order = np.lexsort((acodes, ts, seq, codes))
        codes, seq, acodes = codes[order], seq[order], acodes[order]
        blank = (g["_blank"].to_numpy()[order] if text_col is not None
                 else np.zeros(len(g), dtype=bool))
        n = len(g)
        newk = np.ones(n, dtype=bool)
        newk[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(newk)
        ends = np.append(starts[1:], n)
        dup = np.zeros(n, dtype=np.int64)
        dup[1:] = (~newk[1:]) & (seq[1:] == seq[:-1])
        rep = np.zeros(n, dtype=np.int64)
        if attr_col is not None:
            rep[1:] = (~newk[1:]) & (acodes[1:] == acodes[:-1])
        n_rows = (ends - starts).astype(np.int64)
        n_dup = np.add.reduceat(dup, starts)
        n_rep = np.add.reduceat(rep, starts)
        n_blank = np.add.reduceat(blank.astype(np.int64), starts)
        n_uniq = n_rows - n_dup
        span = seq[ends - 1] - seq[starts] + 1
        return pd.DataFrame({
            key_col: np.asarray(uniq)[codes[starts]],
            "n_rows": n_rows,
            "max_seq": seq[ends - 1],
            "n_dup_seq": n_dup,
            "n_gaps": (span - n_uniq).astype(np.int64),
            "n_attr_repeats": n_rep,
            "n_blank": n_blank,
        })

    tagged = ds.map_batches(bucket, batch_format="pandas")
    return tagged.groupby("_bucket").map_groups(audit,
                                                batch_format="pandas")


def grouped_topk(ds, key_cols, order_cols, k: int,
                 descending: bool = True, num_buckets: int = 64):
    """Top-k rows per group — the missing Ray Data primitive behind
    "N most recent events per user" / "top mentions per conversation".

    Scale shape: a per-block LOCAL top-k per key first (sort + grouped
    head inside ``map_batches`` — the combiner), so at most
    ``k × blocks`` rows per key enter the one key-hash bucket shuffle;
    a hot key never ships its full history.  Final per-bucket pass
    repeats the same sort + head.  Deterministic iff ``order_cols``
    ends with a tiebreaker unique within each group (the SQL mirror
    uses the identical ORDER BY).
    """
    key_cols = list(key_cols)
    order_cols = list(order_cols)

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(order_cols, ascending=not descending,
                           kind="mergesort")
        return d.groupby(key_cols, sort=False).head(k)

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        # hash_pandas_object over a DataFrame combines the key columns
        # row-wise in one C pass
        h = pd.util.hash_pandas_object(df[key_cols], index=False)
        df["_bucket"] = (h % num_buckets).astype("int32")
        return df

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        return local_topk(g.drop(columns="_bucket"))

    partial = ds.map_batches(local_topk, batch_format="pandas") \
        .map_batches(bucket, batch_format="pandas")
    return partial.groupby("_bucket").map_groups(
        final_topk, batch_format="pandas")


def sliding_window_counts(ds, window_minutes: int = 30,
                          num_buckets: int = 64):
    """Sliding-window aggregate: for EVERY event, the count of the same
    user's events with ``ts`` in ``[ts - window, ts]`` (inclusive both
    ends — SQL ``RANGE BETWEEN <w> PRECEDING AND CURRENT ROW`` frame
    semantics, where equal-timestamp peers are all in-frame, so the
    result is deterministic under ties).

    Same partitioning/vectorization shape as range_join_events; the
    aggregate is just ``hi - lo`` per row, so nothing is expanded.
    """
    delta = np.int64(window_minutes * 60_000_000)  # µs

    def count(g: pd.DataFrame) -> pd.DataFrame:
        seg, _ = pd.factorize(g["user_id"], sort=True)
        ts = g["ts"].to_numpy("datetime64[us]").view(np.int64)
        order = np.lexsort((g["event_id"].to_numpy(), ts, seg))
        seg, ts = seg[order], ts[order]
        lo = _segmented_searchsorted(seg, ts, seg, ts - delta, side="left")
        hi = _segmented_searchsorted(seg, ts, seg, ts, side="right")
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy()[order],
            "user_id": g["user_id"].to_numpy()[order],
            "ts": ts.view("datetime64[us]"),
            "n_window": (hi - lo).astype(np.int64),
        })

    pairs = _bucket_events(ds, None, num_buckets)
    return pairs.groupby("_bucket").map_groups(count, batch_format="pandas")
