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

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, col_name: str = "_salt") -> DataFrame:
    """Uniform random-ish salt derived from the whole row (deterministic:
    hash of all columns), so retries produce identical assignments."""
    return df.withColumn(
        col_name, F.pmod(F.hash(*df.columns), F.lit(n_salts))
    )


_MERGE_FNS = {
    "sum": F.sum,
    "count": F.sum,  # partial counts merge by summing
    "min": F.min,
    "max": F.max,
}


def _describe_agg(name: str, spec: Column) -> tuple[str, bool]:
    """(function_name, is_distinct) for a plain aggregate Column.

    Inspects the column's expression tree structurally
    (``UnresolvedFunction.functionName/isDistinct``) rather than parsing
    ``toString()`` — Spark 4 stringifies ``count(DISTINCT v)`` as plain
    ``count(v)``, so a textual check would silently sum partial distinct
    counts into a wrong total. Falls back to the expression string (with
    a token-level DISTINCT test, so a column *named* distinct_id does
    not false-positive) when the node API is unavailable, and raises
    under Spark Connect where no expression is inspectable at all."""
    if not hasattr(spec, "_jc"):
        raise ValueError(
            f"salted_agg cannot infer a merge for {name!r}: the Column "
            "exposes no inspectable expression (Spark Connect); pass an "
            "explicit (partial_expr, merge_fn) tuple"
        )
    try:
        node = spec._jc.node()
        return node.functionName().lower(), bool(node.isDistinct())
    except Exception:
        full = spec._jc.toString().lower()
        head = full.split("(", 1)[0].strip()
        return head, re.search(r"\bdistinct\b", full) is not None


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, Column | tuple],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for hot group keys.

    ``aggs`` maps output-column name → either a *partial* aggregate
    expression whose merge is unambiguous (plain sum/count/min/max), or
    an explicit ``(partial_expr, merge_fn)`` pair for anything else
    (e.g. avg must be decomposed into sum+count by the caller;
    count_distinct is NOT salt-decomposable at all). Unrecognized
    partials without an explicit merge raise instead of silently
    summing. Phase 1 shuffles on (key, salt) — uniform even when one
    key dominates; phase 2 merges n_salts rows per key.
    """
    partials: dict[str, Column] = {}
    merges: list[Column] = []
    for name, spec in aggs.items():
        if isinstance(spec, tuple):
            expr, merge_fn = spec
            partials[name] = expr
            merges.append(merge_fn(name).alias(name))
            continue
        partials[name] = spec
        head, is_distinct = _describe_agg(name, spec)
        if head not in _MERGE_FNS or is_distinct:
            raise ValueError(
                f"salted_agg cannot infer a merge for {name!r} "
                f"({'DISTINCT ' if is_distinct else ''}{head}): pass "
                "(partial_expr, merge_fn) explicitly; note count_distinct "
                "does not decompose over salts"
            )
        merges.append(_MERGE_FNS[head](name).alias(name))

    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*key_cols, "_salt").agg(
        *[expr.alias(name) for name, expr in partials.items()]
    )
    return partial.groupBy(*key_cols).agg(*merges)


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
