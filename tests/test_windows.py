"""Ordered-log window operators (stages/windows.py): as-of join,
range (interval) join, sliding-window counts.

The DuckDB mirrors are the value-level gates (events_asof_join /
events_range_join / events_sliding_counts oracles); these tests pin
the semantics the mirrors rely on — inclusive/exclusive bounds,
equal-timestamp tie rules, per-user isolation across hash buckets, and
behavior on keys/buckets with no match.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from orionbelt_ontology_builder_ray.stages.windows import (
    _segmented_searchsorted,
    asof_join_events,
    grouped_topk,
    lag_events,
    range_join_events,
    sliding_window_counts,
)


def _events(rows):
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type"])
    df["ts"] = pd.to_datetime(df["ts"])
    return rd.from_pandas(df)


def test_asof_inclusive_backward_match(ray_session):
    ds = _events([
        (1, "2024-01-01 10:00:00", 7, "view"),
        (2, "2024-01-01 10:05:00", 7, "purchase"),   # equal-ts view 3 wins
        (3, "2024-01-01 10:05:00", 7, "view"),       #   (inclusive at-or-before)
        (4, "2024-01-01 10:05:00", 7, "purchase"),   # -> view 3 too
        (5, "2024-01-01 09:00:00", 8, "purchase"),   # no prior view: dropped
        (6, "2024-01-01 11:00:00", 9, "view"),       # user with no purchase
        (7, "2024-01-01 10:02:00", 7, "purchase"),   # strictly-prior -> view 1
    ])
    out = asof_join_events(ds, "purchase", "view", num_buckets=4) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    assert list(out["event_id"]) == [2, 4, 7]
    assert list(out["prior_event_id"]) == [3, 3, 1]


def test_asof_tie_rule_max_event_id(ray_session):
    """Two right rows at the identical timestamp: the greater event_id
    wins (the documented determinism rule both engines share)."""
    ds = _events([
        (10, "2024-01-01 10:00:00", 1, "view"),
        (11, "2024-01-01 10:00:00", 1, "view"),
        (12, "2024-01-01 10:30:00", 1, "purchase"),
    ])
    out = asof_join_events(ds, "purchase", "view").to_pandas()
    assert list(out["prior_event_id"]) == [11]


def test_asof_users_isolated_across_buckets(ray_session):
    """A user's matches never leak from another user, whichever bucket
    hashing co-locates them in."""
    rows = []
    eid = 0
    for u in range(20):
        rows.append((eid, "2024-01-01 10:00:00", u, "view")); eid += 1
        rows.append((eid, "2024-01-01 10:10:00", u, "purchase")); eid += 1
    out = asof_join_events(_events(rows), "purchase", "view",
                           num_buckets=3).to_pandas()
    assert len(out) == 20
    # each purchase's prior view is ITS user's view (event ids pair up)
    assert (out["prior_event_id"] == out["event_id"] - 1).all()


def test_asof_empty_and_typed_schema(ray_session):
    ds = _events([(1, "2024-01-01 10:00:00", 1, "error")])
    out = asof_join_events(ds, "purchase", "view")
    df = out.to_pandas()
    assert len(df) == 0


def test_segmented_searchsorted_matches_per_segment_loop():
    """The composite-key vectorized search equals a per-segment
    np.searchsorted loop, including queries whose value falls outside
    the data range (the clip path) and segments absent from the data."""
    rng = np.random.RandomState(5)
    for _ in range(50):
        nseg = rng.randint(1, 6)
        seg = np.sort(rng.randint(0, nseg, size=rng.randint(0, 30)))
        vals = rng.randint(-100, 100, size=len(seg))
        order = np.lexsort((vals, seg))
        seg, vals = seg[order], vals[order]
        q_seg = rng.randint(0, nseg, size=10)
        q_vals = rng.randint(-300, 300, size=10)
        for side in ("left", "right"):
            got = _segmented_searchsorted(seg, vals, q_seg, q_vals, side)
            for qs, qv, g in zip(q_seg, q_vals, got):
                lo = np.searchsorted(seg, qs, side="left")
                hi = np.searchsorted(seg, qs, side="right")
                exp = lo + np.searchsorted(vals[lo:hi], qv, side=side)
                assert g == exp, (seg, vals, qs, qv, side)


def test_range_join_bounds_and_pairs(ray_session):
    """Window is [ts - w, ts): the boundary view exactly w before is
    IN, an equal-timestamp view is OUT, and every qualifying view
    yields its own pair row."""
    ds = _events([
        (1, "2024-01-01 09:00:00", 7, "view"),    # exactly 60m before: in
        (2, "2024-01-01 09:30:00", 7, "view"),    # in
        (3, "2024-01-01 10:00:00", 7, "view"),    # equal ts: out
        (4, "2024-01-01 10:00:00", 7, "purchase"),
        (5, "2024-01-01 08:59:59", 7, "view"),    # 1s too early: out
        (6, "2024-01-01 09:45:00", 8, "view"),    # other user: out
    ])
    out = range_join_events(ds, "purchase", "view", window_minutes=60,
                            num_buckets=4).to_pandas()
    assert sorted(out["matched_event_id"]) == [1, 2]
    assert (out["event_id"] == 4).all()


def test_range_join_users_isolated_across_buckets(ray_session):
    rows = []
    eid = 0
    for u in range(20):
        rows.append((eid, "2024-01-01 10:00:00", u, "view")); eid += 1
        rows.append((eid, "2024-01-01 10:10:00", u, "purchase")); eid += 1
    out = range_join_events(_events(rows), "purchase", "view",
                            window_minutes=60, num_buckets=3).to_pandas()
    assert len(out) == 20
    assert (out["matched_event_id"] == out["event_id"] - 1).all()


def test_sliding_counts_inclusive_range_frame(ray_session):
    """RANGE-frame semantics: the window is [ts - w, ts] and
    equal-timestamp peers count each other (SQL window-function
    parity), while other users never leak in."""
    ds = _events([
        (1, "2024-01-01 10:00:00", 7, "view"),
        (2, "2024-01-01 10:20:00", 7, "view"),    # sees 1 (20m) + self
        (3, "2024-01-01 10:20:00", 7, "view"),    # peer of 2: both count 3
        (4, "2024-01-01 11:00:00", 7, "view"),    # 40m gap: only self
        (5, "2024-01-01 10:20:00", 8, "view"),    # other user: isolated
    ])
    out = sliding_window_counts(ds, window_minutes=30, num_buckets=4) \
        .to_pandas().sort_values("event_id")
    assert list(out["n_window"]) == [1, 3, 3, 1, 1]


def test_grouped_topk_across_blocks(ray_session):
    """A key whose rows are scattered over many blocks still yields
    its GLOBAL top-k: the per-block combiner only prunes, never
    decides.  Groups smaller than k come through whole."""
    rows = []
    # user 1: 50 events across blocks, top-3 = ids 47, 48, 49 (ts asc)
    for i in range(50):
        rows.append((i, f"2024-01-01 10:{i:02d}:00", 1, "view"))
    # user 2: only one event
    rows.append((100, "2024-01-01 09:00:00", 2, "view"))
    ds = _events(rows).repartition(8)
    out = grouped_topk(ds.select_columns(["event_id", "ts", "user_id"]),
                       ["user_id"], ["ts", "event_id"], 3,
                       num_buckets=4).to_pandas()
    got = {u: sorted(g["event_id"]) for u, g in out.groupby("user_id")}
    assert got == {1: [47, 48, 49], 2: [100]}


def test_grouped_topk_tiebreak_deterministic(ray_session):
    """Equal-ts rows: the trailing event_id order column decides, so
    repeated runs and the SQL mirror agree."""
    rows = [(i, "2024-01-01 10:00:00", 7, "view") for i in range(10)]
    ds = _events(rows).repartition(3)
    out = grouped_topk(ds.select_columns(["event_id", "ts", "user_id"]),
                       ["user_id"], ["ts", "event_id"], 4).to_pandas()
    assert sorted(out["event_id"]) == [6, 7, 8, 9]


def test_lag_events_inner_and_tiebreak(ray_session):
    """Each non-first event gets the same user's immediately preceding
    event; equal timestamps break by event_id; first events drop
    (inner); users never leak across buckets."""
    ds = _events([
        (1, "2024-01-01 10:00:00", 7, "view"),
        (2, "2024-01-01 10:00:00", 7, "view"),    # tie: prev is 1
        (3, "2024-01-01 10:05:00", 7, "view"),    # prev is 2
        (4, "2024-01-01 09:00:00", 8, "view"),    # first for 8: dropped
        (5, "2024-01-01 09:30:00", 8, "view"),    # prev is 4
    ])
    out = lag_events(ds, num_buckets=3).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert list(out["event_id"]) == [2, 3, 5]
    assert list(out["prev_event_id"]) == [1, 2, 4]
    assert out["prev_ts"].notna().all()


def test_lead_events_mirror_of_lag(ray_session):
    """lead is lag reversed: every (event, next) pair is exactly a
    (next, prev=event) pair of the lag output."""
    rows = [(i, f"2024-01-01 10:{i % 60:02d}:00", i % 5, "view")
            for i in range(60)]
    lag_out = lag_events(_events(rows), num_buckets=3).to_pandas()
    lead_out = lag_events(_events(rows), num_buckets=3,
                          direction="next").to_pandas()
    lag_pairs = set(zip(lag_out["prev_event_id"].astype(int),
                        lag_out["event_id"].astype(int)))
    lead_pairs = set(zip(lead_out["event_id"].astype(int),
                         lead_out["next_event_id"].astype(int)))
    assert lag_pairs == lead_pairs
    assert len(lead_pairs) == 55  # 60 events, 5 users drop their last


def test_sliding_counts_covers_every_event(ray_session):
    rows = [(i, f"2024-01-01 10:{i % 60:02d}:00", i % 5, "view")
            for i in range(100)]
    out = sliding_window_counts(_events(rows), window_minutes=5,
                                num_buckets=3).to_pandas()
    assert len(out) == 100
    assert (out["n_window"] >= 1).all()


def test_sessionize_equals_per_user_reference(ray_session):
    """Bucket-shuffled vectorized sessionizer == the straightforward
    per-user pandas implementation on random data spanning many users,
    buckets, gap boundaries, and equal timestamps (VERDICT r3 item 2:
    the re-shape must not change a single row)."""
    import random

    from orionbelt_ontology_builder_ray.stages.windows import sessionize_events

    rng = random.Random(7)
    rows = []
    base = pd.Timestamp("2024-01-01")
    eid = 0
    for user in range(40):
        t = base + pd.Timedelta(minutes=rng.randint(0, 600))
        for _ in range(rng.randint(1, 30)):
            # gaps straddle the 30-min boundary incl. exactly-30 ties
            t = t + pd.Timedelta(minutes=rng.choice(
                [0, 1, 5, 29, 30, 31, 90]))
            rows.append((eid, t, user))
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
    ds = rd.from_pandas(df.sample(frac=1, random_state=3)).repartition(5)

    got = sessionize_events(ds, gap_minutes=30, num_buckets=7) \
        .to_pandas().sort_values(["user_id", "session_id"]) \
        .reset_index(drop=True)

    # reference: per-user sort + gap cumsum (the pre-re-shape logic)
    def ref_sessions(g):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        gap = g["ts"].diff() > pd.Timedelta(minutes=30)
        sess = gap.cumsum().astype("int64") + 1
        out = g.assign(session_id=sess).groupby("session_id").agg(
            user_id=("user_id", "first"), n_events=("event_id", "count"),
            start_ts=("ts", "min"), end_ts=("ts", "max")).reset_index()
        return out[["user_id", "session_id", "n_events",
                    "start_ts", "end_ts"]]

    exp = pd.concat([ref_sessions(g) for _, g in df.groupby("user_id")],
                    ignore_index=True) \
        .sort_values(["user_id", "session_id"]).reset_index(drop=True)
    cast = {"user_id": "int64", "session_id": "int64",
            "n_events": "int64", "start_ts": "datetime64[us]",
            "end_ts": "datetime64[us]"}
    exp = exp.astype(cast)
    got = got.astype(cast)
    pd.testing.assert_frame_equal(got, exp)


def test_sessionize_gap_boundary_exact(ray_session):
    """A gap of exactly gap_minutes stays in the SAME session (strict >
    starts a new one) — the SQL mirror's lag() comparison semantics."""
    from orionbelt_ontology_builder_ray.stages.windows import sessionize_events

    df = pd.DataFrame({
        "event_id": [1, 2, 3],
        "ts": pd.to_datetime(["2024-01-01 10:00:00",
                              "2024-01-01 10:30:00",    # exactly 30 min
                              "2024-01-01 11:00:01"]),  # 30 min 1 s
        "user_id": [5, 5, 5]})
    out = sessionize_events(rd.from_pandas(df), gap_minutes=30) \
        .to_pandas().sort_values("session_id").reset_index(drop=True)
    assert list(out["session_id"]) == [1, 2]
    assert list(out["n_events"]) == [2, 1]


def test_sessionize_log_equals_sessionize_events(ray_session):
    """The generic string-capable sessionize_log must reproduce
    sessionize_events row-for-row on the events columns (same gap
    semantics, same numbering), on random data spanning many users,
    buckets, and gap boundaries."""
    import numpy as np

    from orionbelt_ontology_builder_ray.stages.windows import (
        sessionize_events, sessionize_log)

    rng = np.random.RandomState(21)
    n = 600
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, 40, n).astype(np.int64),
        "ts": pd.Timestamp("2026-01-01")
        + pd.to_timedelta(rng.randint(0, 7 * 24 * 60, n), unit="m")})
    a = sessionize_events(rd.from_pandas(df).repartition(5)) \
        .to_pandas().sort_values(["user_id", "session_id"]) \
        .reset_index(drop=True)
    b = sessionize_log(rd.from_pandas(df).repartition(5),
                       "user_id", "event_id", "ts") \
        .to_pandas().sort_values(["user_id", "session_id"]) \
        .reset_index(drop=True)
    b = b.rename(columns={"n": "n_events"})
    pd.testing.assert_frame_equal(a, b[a.columns.tolist()])


def test_sessionize_log_string_keys(ray_session):
    """String keys (the transcripts conv_id plane): hand-computed
    sessions, keys preserved verbatim, numbering per key from 1."""
    from orionbelt_ontology_builder_ray.stages.windows import sessionize_log

    t0 = pd.Timestamp("2026-02-01 10:00:00")
    df = pd.DataFrame({
        "conv_id": ["conv-b", "conv-b", "conv-b", "conv-a", "conv-a"],
        "turn_idx": [0, 1, 2, 0, 1],
        "ts": [t0, t0 + pd.Timedelta(minutes=10),
               t0 + pd.Timedelta(minutes=80),     # >30m -> new session
               t0, t0 + pd.Timedelta(minutes=31)]})  # >30m -> new
    out = sessionize_log(rd.from_pandas(df).repartition(3),
                         "conv_id", "turn_idx", "ts") \
        .to_pandas().sort_values(["conv_id", "session_id"]) \
        .reset_index(drop=True)
    assert out["conv_id"].tolist() == ["conv-a", "conv-a",
                                       "conv-b", "conv-b"]
    assert out["session_id"].tolist() == [1, 2, 1, 2]
    assert out["n"].tolist() == [1, 1, 2, 1]


def test_log_integrity_planted_defects(ray_session):
    """log_integrity counts each planted defect class exactly:
    duplicate seq (k copies -> k-1), gaps inside the span, adjacent
    same-attr repeats in (seq, ts, attr) order, blank/null text."""
    from orionbelt_ontology_builder_ray.stages.windows import log_integrity

    t0 = pd.Timestamp("2026-03-01 09:00:00")
    ts = [t0 + pd.Timedelta(minutes=i) for i in range(12)]
    df = pd.DataFrame({
        # conv-x: clean alternating conversation
        # conv-y: dup turn 1 (x2 extra), gap (skips 3,4), role repeats,
        #         one blank + one null text
        "conv_id": ["conv-x"] * 4 + ["conv-y"] * 8,
        "turn_idx": [0, 1, 2, 3,
                     0, 1, 1, 1, 2, 5, 6, 7],
        "role": ["user", "assistant", "user", "assistant",
                 "user", "user", "assistant", "tool",
                 "assistant", "assistant", "user", "user"],
        "text": ["a", "b", "c", "d",
                 "e", "  \t\n", None, "f", "g", "h", "i", "j"],
        "ts": ts})
    out = log_integrity(rd.from_pandas(df).repartition(4),
                        "conv_id", "turn_idx", ts_col="ts",
                        attr_col="role", text_col="text") \
        .to_pandas().set_index("conv_id").sort_index()
    x, y = out.loc["conv-x"], out.loc["conv-y"]
    assert x.tolist() == [4, 3, 0, 0, 0, 0]
    assert y["n_rows"] == 8 and y["max_seq"] == 7
    assert y["n_dup_seq"] == 2            # turn 1 appears 3x
    # span 0..7 = 8 values, 6 distinct -> 2 missing (3 and 4)
    assert y["n_gaps"] == 2
    # sorted (seq, ts, role): turn0 user | turn1 user,assistant,tool
    # (ts tie-break) | turn2 assistant | turn5 assistant | turn6 user
    # | turn7 user.  Repeats: turn0->turn1 user=user, turn2->turn5
    # assistant=assistant, turn6->turn7 user=user
    assert y["n_attr_repeats"] == 3
    assert y["n_blank"] == 2              # whitespace-only + null


def test_log_integrity_partition_invariance(ray_session):
    """The audit is a pure function of the row SET: 1 block == 9
    blocks, and a clean dense log reports all-zero defects."""
    from orionbelt_ontology_builder_ray.stages.windows import log_integrity

    rng = np.random.RandomState(7)
    rows = []
    t0 = pd.Timestamp("2026-03-02")
    for c in range(25):
        n = int(rng.randint(1, 30))
        for i in range(n):
            rows.append((f"conv-{c:03d}", i,
                         ["user", "assistant"][i % 2], f"txt {c} {i}",
                         t0 + pd.Timedelta(seconds=int(rng.randint(0, 9999)))))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                     "text", "ts"])
    a = log_integrity(rd.from_pandas(df), "conv_id", "turn_idx",
                      attr_col="role", text_col="text") \
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    b = log_integrity(rd.from_pandas(df).repartition(9), "conv_id",
                      "turn_idx", attr_col="role", text_col="text") \
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert (a["n_dup_seq"] == 0).all() and (a["n_gaps"] == 0).all()
    assert (a["n_blank"] == 0).all()
    assert (a["n_rows"] == a["max_seq"] + 1).all()
