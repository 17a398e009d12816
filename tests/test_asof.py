"""As-of join (operators/asof.py): tie handling, missing matches,
multi-match determinism — hand-checked against pandas merge_asof
semantics (backward inclusive)."""

from __future__ import annotations

import datetime as dt

from semargl_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_backward_inclusive_and_ties(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (1, 101, _ts(20)), (1, 102, _ts(30)),
         (2, 200, _ts(5))],
        "user_id long, event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        # two refs at the same (user, ts) — higher event_id must win;
        # one ref exactly at a left row's ts — inclusive match
        [(1, 900, _ts(20), 1.0), (1, 901, _ts(20), 2.0),
         (1, 950, _ts(25), 3.0)],
        "user_id long, event_id long, ts timestamp, value double",
    )
    out = asof_join(left, right, on="ts", by="user_id",
                    value_cols=("value",), tiebreak="event_id")
    got = {r["event_id"]: (r["asof_value"],
                           r["asof_ts"] and r["asof_ts"].second)
           for r in out.collect()}
    assert got[100] == (None, None)      # nothing at-or-before 10
    assert got[101] == (2.0, 20)         # same-ts inclusive, tie → id 901
    assert got[102] == (3.0, 25)         # latest prior
    assert got[200] == (None, None)      # other user has no refs


def test_asof_no_right_rows_at_all(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(1))], "user_id long, event_id long, ts timestamp")
    right = spark.createDataFrame(
        [], "user_id long, event_id long, ts timestamp, value double")
    out = asof_join(left, right, on="ts", by="user_id",
                    value_cols=("value",), tiebreak="event_id")
    row = out.collect()[0]
    assert row["asof_value"] is None and row["asof_ts"] is None
    # left schema passes through untouched
    assert {"user_id", "event_id", "ts"} <= set(out.columns)
