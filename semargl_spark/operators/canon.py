"""Canonicalization: connected components over equivalence edges
(SURVEY.md §2.5 J4, north_star "canon" stage).

Algorithm: min-label propagation with **pointer jumping** — each round
every node takes the minimum label over its neighborhood, then labels
are short-circuited through one indirection step (L(v) ← L(L(v))).
Pointer jumping halves the remaining path length every round, giving
O(log diameter) rounds like the large-star/small-star formulation
(Kiveris et al., SoCC'14) while staying three shuffles per round, all
JVM-side.

Scale notes (10^12-turn corpus):
* labels/edges shuffle on node id — AQE coalesces small partitions and
  splits skewed hubs (skewJoin enabled in spark_util.tuned_session);
  a celebrity sameAs hub converges in one round since all neighbors
  adopt its minimum directly;
* per-round ``localCheckpoint`` truncates lineage so the plan stays flat
  across iterations (no exponential reoptimization);
* convergence is detected with a single-row aggregate fingerprint, one
  extra job per round, O(1) driver memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fingerprint(labels: DataFrame) -> int:
    row = labels.agg(
        F.coalesce(F.sum(F.hash("node", "component")), F.lit(0)).alias("h")
    ).collect()[0]
    return int(row["h"])


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """edges(src, dst) → (node, component), component = min member id.

    Node ids compare lexicographically; the representative is the
    minimum id in the component (deterministic for the DuckDB oracle).
    """
    e = (
        edges.select(F.col("src").cast("string"), F.col("dst").cast("string"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint(eager=True)
    )

    prev = _fingerprint(labels)
    for _round in range(max_iter):
        # 1. neighbor-min: every edge endpoint proposes its label across
        msgs = (
            e.join(labels.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), "component")
            .union(
                e.join(labels.withColumnRenamed("node", "dst"), "dst")
                .select(F.col("src").alias("node"), "component")
            )
        )
        labels = (
            labels.union(msgs)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # 2. pointer jump: follow the label's own label one step
        jump = labels.select(
            F.col("node").alias("jnode"), F.col("component").alias("jcomp")
        )
        labels = (
            labels.join(jump, labels.component == jump.jnode, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("jcomp", "component")
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        cur = _fingerprint(labels)
        if cur == prev:
            break
        prev = cur

    return labels


def canonicalize(equiv_edges: DataFrame) -> DataFrame:
    """Canon stage entry: equivalence edges → canonical node mapping."""
    return connected_components(equiv_edges)
