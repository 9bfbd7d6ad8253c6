"""Event-operator semantics: as-of join tie/NULL rules, session
boundary rule."""

import datetime as dt

import pytest

from mxene_coin_cell_data_pipeline_spark.functions.events import (
    asof_join_backward,
    session_stats,
    sessionize,
)


def _t(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_backward_tie_and_null(spark):
    left = spark.createDataFrame(
        [(1, "u", _t(5)), (2, "u", _t(10)), (3, "u", _t(2)), (4, "v", _t(9))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", _t(5), 50.0), ("u", _t(3), 30.0), ("u", _t(8), 80.0)],
        "user_id string, ts timestamp, rv double",
    )
    out = {
        r["event_id"]: r["rv"]
        for r in asof_join_backward(
            left, right, on="ts", by=["user_id"], value_cols=["rv"]
        ).collect()
    }
    assert out[1] == 50.0  # tie at t=5 matches (>= semantics)
    assert out[2] == 80.0  # latest prior
    assert out[3] is None  # nothing at or before t=2
    assert out[4] is None  # other key group


def test_asof_rejects_column_clash(spark):
    df = spark.createDataFrame([(1, "u", _t(1), 2.0)],
                               "event_id long, user_id string, ts timestamp, v double")
    with pytest.raises(ValueError):
        asof_join_backward(df, df, on="ts", by=["user_id"], value_cols=["v"])


def test_sessionize_gap_boundary(spark):
    # gap=10s: 0,5,15 → the 15s event is exactly 10s after 5s → SAME
    # session (rule is strictly greater than gap); 26 starts a new one
    ev = spark.createDataFrame(
        [(i, "u", _t(s)) for i, s in enumerate([0, 5, 15, 26])],
        "event_id long, user_id string, ts timestamp",
    )
    s = sessionize(ev, gap_seconds=10)
    got = {r["event_id"]: r["session_id"] for r in s.collect()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 2}
    stats = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["duration_us"])
        for r in session_stats(s).collect()
    }
    assert stats[("u", 1)] == (3, 15_000_000)
    assert stats[("u", 2)] == (1, 0)
