"""Skew-handling tests: salted join/agg correctness on a deliberately
hot-keyed dataset, and hub-graph canonicalization."""

from pyspark.sql import functions as F

from semargl_spark.operators.canon import connected_components
from semargl_spark.operators.skew import salted_agg, salted_join, with_salt


def _skewed_df(spark, n=2000, hot_frac=0.9):
    # 90% of rows share one key
    return spark.range(n).select(
        F.when(F.col("id") < int(n * hot_frac), F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), F.col("id")))
        .alias("k"),
        F.col("id").alias("v"),
    )


def test_salted_agg_matches_plain(spark):
    df = _skewed_df(spark)
    plain = {
        (r["k"], r["n"], r["mx"])
        for r in df.groupBy("k").agg(
            F.count("*").alias("n"), F.max("v").alias("mx")
        ).collect()
    }
    salted = {
        (r["k"], r["n"], r["mx"])
        for r in salted_agg(
            df, ["k"], {"n": F.count("*"), "mx": F.max("v")}
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    df = _skewed_df(spark, n=500)
    dim = spark.createDataFrame(
        [("HOT", "hotlabel"), ("k450", "x450")], ["k", "label"]
    )
    plain = sorted(map(tuple, df.join(dim, "k").select("k", "v", "label").collect()))
    salted = sorted(
        map(tuple, salted_join(df, dim, "k").select("k", "v", "label").collect())
    )
    assert salted == plain


def test_salted_agg_distinct_column_name_ok(spark):
    """A column literally named *distinct_id* must not trip the
    DISTINCT-aggregate guard (token match, not substring)."""
    df = _skewed_df(spark).withColumnRenamed("v", "distinct_id")
    out = salted_agg(df, ["k"], {"mn": F.min("distinct_id")})
    plain = {
        (r["k"], r["mn"])
        for r in df.groupBy("k").agg(F.min("distinct_id").alias("mn")).collect()
    }
    assert {(r["k"], r["mn"]) for r in out.collect()} == plain


def test_salted_agg_rejects_distinct_aggregate(spark):
    import pytest

    df = _skewed_df(spark, n=100)
    with pytest.raises(ValueError, match="decompose"):
        salted_agg(df, ["k"], {"d": F.count_distinct("v")})


def test_salt_is_deterministic(spark):
    df = _skewed_df(spark, n=100)
    a = sorted(map(tuple, with_salt(df).collect()))
    b = sorted(map(tuple, with_salt(df).collect()))
    assert a == b


def test_hub_graph_components(spark):
    """Celebrity-node graph: 500 aliases all pointing at one hub —
    components converge and every alias maps to the hub's minimum."""
    edges = spark.range(1, 500).select(
        F.concat(F.lit("alias"), F.col("id")).alias("src"),
        F.lit("aaa_hub").alias("dst"),
    )
    comp = connected_components(edges)
    labels = {r["component"] for r in comp.collect()}
    assert labels == {"aaa_hub"}
    assert comp.count() == 500
