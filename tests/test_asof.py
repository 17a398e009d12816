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


def test_interval_join_matches_containment_and_plans_equi(spark):
    from semargl_spark.operators.asof import interval_join

    points = spark.createDataFrame(
        [(1, 1, _ts(5)), (1, 2, _ts(30)), (1, 3, _ts(59)), (2, 4, _ts(30))],
        "user_id long, event_id long, ts timestamp",
    )
    # one 55-second interval for user 1: [4, 59) — catches 5 and 30,
    # excludes 59 (half-open) and user 2's point
    iv = spark.createDataFrame(
        [(1, 10, _ts(4), _ts(59))],
        "user_id long, interval_id long, start_ts timestamp, end_ts timestamp",
    )
    out = interval_join(points, iv, on="ts", by="user_id", bucket_seconds=10)
    assert sorted(r["event_id"] for r in out.collect()) == [1, 2]
    # exactly one row per (point, interval) pair despite the interval
    # covering 6 buckets
    assert out.count() == out.select("event_id", "interval_id").distinct().count()
    # the scale contract: an equi-join, never a nested-loop range join
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_guards_unbounded_intervals(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.sql import functions as F  # noqa: F401
    from semargl_spark.operators.asof import interval_join

    points = spark.createDataFrame(
        [(1, 1, _ts(5))], "user_id long, event_id long, ts timestamp"
    )
    iv = spark.createDataFrame(
        [(1, 10, _ts(0), _ts(59))],
        "user_id long, interval_id long, start_ts timestamp, end_ts timestamp",
    )
    with pytest.raises(Exception) as ei:
        interval_join(
            points, iv, on="ts", by="user_id", bucket_seconds=10, max_buckets=2
        ).collect()
    assert "interval_join" in str(ei.value)


def test_funnel_ordering_horizon_and_strictness(spark):
    from datetime import datetime

    from semargl_spark.queries_events import funnel

    def at(h):
        return datetime.fromtimestamp(
            datetime(2024, 1, 1).timestamp() + h * 3600
        )

    rows = [
        # u1 converts fully in order
        (1, at(0), "view"), (1, at(1), "click"), (1, at(2), "purchase"),
        # u2: click BEFORE first view — not after step 1, no step-2
        (2, at(5), "view"), (2, at(4), "click"),
        # u3: click exactly AT view time — strict >, excluded
        (3, at(0), "view"), (3, at(0), "click"),
        # u4: click beyond the 3h horizon
        (4, at(0), "view"), (4, at(4), "click"),
        # u5: purchase without view — never enters the funnel
        (5, at(0), "purchase"),
    ]
    df = spark.createDataFrame(
        [(u, ts, ty) for u, ts, ty in rows],
        "user_id int, ts timestamp, event_type string",
    )
    out = {(r["step_idx"], r["step"]): r["users"]
           for r in funnel(df, ["view", "click", "purchase"],
                           horizon="3 HOUR").collect()}
    assert out == {(1, "view"): 4, (2, "click"): 1, (3, "purchase"): 1}
    # unbounded horizon picks u4's late click back up
    out2 = {r["step"]: r["users"]
            for r in funnel(df, ["view", "click"]).collect()}
    assert out2 == {"view": 4, "click": 2}

    import pytest
    with pytest.raises(ValueError, match="at least 2"):
        funnel(df, ["view"])


def test_allen_relations_all_thirteen(spark):
    from semargl_spark.operators.asof import ALLEN_RELATIONS, allen_relations

    # one left interval [10, 20] per key, right intervals chosen to hit
    # each of the 13 relations exactly once
    rights = {
        "precedes": (30, 40), "preceded_by": (0, 5), "meets": (20, 30),
        "met_by": (5, 10), "equals": (10, 20), "starts": (10, 15),
        "started_by": (10, 25), "finishes": (15, 20),
        "finished_by": (5, 20), "during": (5, 25), "contains": (12, 18),
        "overlaps": (15, 25), "overlapped_by": (5, 15),
    }
    left = spark.createDataFrame(
        [(k, 10, 20) for k in rights], "user_id string, start long, end long"
    )
    right = spark.createDataFrame(
        [(k, s, e) for k, (s, e) in rights.items()],
        "user_id string, start long, end long",
    )
    got = {r["relation"]: r["n"]
           for r in allen_relations(left, right, on="user_id").collect()}
    # note orientation: rights dict keys name the relation of LEFT wrt RIGHT
    assert got == {k: 1 for k in ALLEN_RELATIONS}


def test_allen_relations_improper_intervals_route_to_invalid(spark):
    from semargl_spark.operators.asof import allen_relations

    left = spark.createDataFrame(
        [("a", 10, 10),      # point interval (vs point right: NOT 'meets')
         ("b", 20, 10),      # inverted
         ("c", None, 20),    # NULL start (vs any right: NOT 'overlapped_by')
         ("d", 10, 20)],     # proper, but right side is improper
        "user_id string, start long, end long",
    )
    right = spark.createDataFrame(
        [("a", 10, 10), ("b", 0, 5), ("c", 0, 5), ("d", 15, None)],
        "user_id string, start long, end long",
    )
    got = {r["relation"]: r["n"]
           for r in allen_relations(left, right, on="user_id").collect()}
    assert got == {"invalid": 4}
