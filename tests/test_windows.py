"""Ordered-log window operators (stages/windows.py): as-of join.

The DuckDB ASOF JOIN mirror is the value-level gate (events_asof_join
oracle); these tests pin the semantics the mirror relies on — the
inclusive backward match, the equal-timestamp tie rule, and behavior
on keys/buckets with no match.
"""

import pandas as pd
import pytest
import ray.data as rd

from orionbelt_ontology_builder_ray.stages.windows import asof_join_events


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
