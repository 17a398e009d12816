"""Explicit skew handling: salting utilities (north_rule: partitioning /
shuffle / skew handled explicitly).

Two layers of defense against hot keys:

1. **AQE skew-join splitting** — on by default in `tuned_session`
   (``spark.sql.adaptive.skewJoin.enabled``): oversized sort-merge join
   partitions are split at runtime. Covers most join skew for free.
2. **Salting** (this module) — for the cases AQE cannot fix:
   * a hot *group* in groupBy (one key holding most rows): two-phase
     salted aggregation — partial agg over (key, salt), final agg over
     key. Each phase's shuffle is uniform.
   * a hot *join* key where the skewed side must meet a small-ish
     other side: replicate the small side across the salt domain so
     the join key becomes (key, salt).

At the KG layer the canonical hot key is a celebrity node in the sameAs
graph — millions of aliases pointing at one IRI. ``connected_components``
absorbs that structurally (the hub's neighbors all adopt its minimum in
one round), and its groupBy-min aggregations do map-side partial
aggregation, so the residual skew lands in the join of labels back to
edges — which is exactly the salted-join case below.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, col_name: str = "_salt") -> DataFrame:
    """Uniform random-ish salt derived from the whole row (deterministic:
    hash of all columns), so retries produce identical assignments."""
    return df.withColumn(
        col_name, F.pmod(F.hash(*df.columns), F.lit(n_salts))
    )


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for hot group keys.

    ``aggs`` maps output-column name → *partial* aggregate expression;
    the final phase re-applies a merge appropriate for sum/count/min/max
    (the caller picks decomposable aggregates). Phase 1 shuffles on
    (key, salt) — uniform even when one key dominates; phase 2 shuffles
    n_salts rows per key.
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*key_cols, "_salt").agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    # merge phase: sums/counts re-sum; mins/maxes re-min/max. The caller
    # communicates the merge via the partial expression's function name.
    merged = []
    for name, expr in aggs.items():
        fn = expr._jc.toString().split("(")[0].lower() if hasattr(expr, "_jc") else ""
        if fn.startswith("count") or fn.startswith("sum"):
            merged.append(F.sum(name).alias(name))
        elif fn.startswith("min"):
            merged.append(F.min(name).alias(name))
        elif fn.startswith("max"):
            merged.append(F.max(name).alias(name))
        else:
            merged.append(F.sum(name).alias(name))
    return partial.groupBy(*key_cols).agg(*merged)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join where ``skewed`` has hot values of ``key``.

    The skewed side gets a row-hash salt; the small side is replicated
    across the full salt domain (explode of a literal range), so the
    join key (key, salt) spreads each hot key over n_salts reducers.
    Prefer ``F.broadcast(small)`` when the small side fits in memory —
    salting is for the in-between sizes.
    """
    left = skewed.withColumn(
        "_salt", F.pmod(F.hash(*skewed.columns), F.lit(n_salts))
    )
    right = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return left.join(right, [key, "_salt"]).drop("_salt")
