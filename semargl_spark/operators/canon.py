"""Canonicalization: connected components over equivalence edges
(SURVEY.md §2.5 J4, north_star "canon" stage).

Algorithm: min-label propagation with **pointer jumping** — each round
every node takes the minimum label over its neighborhood (one join over
a pre-materialized *bidirectional* edge list — half the edge-shuffle of
the naive two-join formulation), then labels are short-circuited through
two pointer-jump steps (L(v) ← L(L(v)), twice). Pointer jumping shrinks the
remaining path length geometrically, giving O(log diameter) rounds like
the large-star/small-star formulation (Kiveris et al., SoCC'14), all
JVM-side. Round 0 (label(v) = min(v, neighbors)) is fused into the
label-initialization groupBy, saving one full propagate round.

Scale notes (10^12-turn corpus):
* the dominant shuffle is the edges⋈labels join, shuffled on node id —
  materializing edges bidirectionally once means each round shuffles the
  label side only once; AQE coalesces small partitions and splits skewed
  hubs (skewJoin enabled in spark_util.tuned_session); a celebrity
  sameAs hub converges in one round since all neighbors adopt its
  minimum directly;
* per-round ``localCheckpoint`` truncates lineage so the plan stays flat
  across iterations (no exponential reoptimization);
* convergence is detected with a single-row aggregate fingerprint over
  the already-checkpointed labels, one cheap job per round, O(1) driver
  memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fingerprint(labels: DataFrame) -> int:
    row = labels.agg(
        F.coalesce(F.sum(F.hash("node", "component")), F.lit(0)).alias("h")
    ).collect()[0]
    return int(row["h"])


def _jump(labels: DataFrame) -> DataFrame:
    """One pointer-jump step: L(v) ← min(L(v), L(L(v)))."""
    jump = labels.select(
        F.col("node").alias("jnode"), F.col("component").alias("jcomp")
    )
    return labels.join(jump, labels.component == jump.jnode, "left").select(
        "node",
        F.least(F.col("component"), F.coalesce("jcomp", "component")).alias(
            "component"
        ),
    )


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """edges(src, dst) → (node, component), component = min member id.

    Node ids compare lexicographically; the representative is the
    minimum id in the component (deterministic for the DuckDB oracle).
    """
    # normalize to undirected BEFORE distinct: symmetric inputs (a
    # sameAs feed carrying both (a,b) and (b,a)) would otherwise double
    # every edge in the bidirectional list and with it the dominant
    # per-round join shuffle
    e = (
        edges.select(F.col("src").cast("string"), F.col("dst").cast("string"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
    )
    # materialize once in both directions: every subsequent round does a
    # single equi-join instead of one join per direction
    bidir = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .localCheckpoint(eager=True)
    )
    # fused round 0: label(v) = min(v, min neighbor) straight off the
    # edge list — no join needed for the first propagation. The lazy
    # checkpoint is materialized by the fingerprint action, so each
    # round costs exactly one Spark job.
    labels = (
        bidir.groupBy(F.col("src").alias("node"))
        .agg(F.least(F.min("dst"), F.min("src")).alias("component"))
        .localCheckpoint(eager=False)
    )

    prev = _fingerprint(labels)
    converged = False
    for _round in range(max_iter):
        # 1. neighbor-min: every node proposes its label to its neighbors
        msgs = (
            bidir.join(labels.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), "component")
        )
        labels = (
            labels.union(msgs)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # 2. double pointer jump: follow the label chain two steps —
        # node-sized self-joins, cheap next to the edge join, and each
        # halves the remaining pointer-path length
        labels = _jump(_jump(labels)).localCheckpoint(eager=False)
        cur = _fingerprint(labels)
        if cur == prev:
            converged = True
            break
        prev = cur

    if not converged:
        # pointer jumping covers diameter ~2^max_iter, so hitting the cap
        # means something is structurally wrong — returning partial
        # components would silently merge/split entities downstream
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"(pointer jumping covers diameter ~2^{max_iter}); raise max_iter"
        )
    return labels


def canonicalize(equiv_edges: DataFrame) -> DataFrame:
    """Canon stage entry: equivalence edges → canonical node mapping."""
    return connected_components(equiv_edges)


def cc_incremental(components: DataFrame, new_edges: DataFrame) -> DataFrame:
    """Merge a DELTA of equivalence edges into an existing (node,
    component) assignment without recomputing components from scratch
    → updated (node, component).

    The incremental-maintenance pattern a daily 10^12-node
    canonicalization run needs: each existing component is collapsed to
    its label, the new edges are rewritten through the old assignment
    (two left joins — endpoints not yet known keep themselves), and
    :func:`connected_components` runs over ONLY that contracted delta
    graph — label and fresh nodes, never the corpus. One final join
    maps every old node through its label's new component. Rounds scale
    with the delta's diameter; the full-corpus table is touched exactly
    twice (one rewrite join, one remap join).

    Self-loops after contraction (both endpoints already in the same
    component) vanish inside connected_components' self-loop filter, so
    a delta that changes nothing costs two broadcast-sized joins and an
    empty CC.
    """
    comp = components.select("node", "component")
    e = new_edges.select(
        F.col("src").cast("string"), F.col("dst").cast("string")
    ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    contracted = (
        e.join(comp.withColumnRenamed("node", "src"), "src", "left")
        .withColumn("csrc", F.coalesce("component", "src"))
        .drop("component")
        .join(comp.withColumnRenamed("node", "dst"), "dst", "left")
        .withColumn("cdst", F.coalesce("component", "dst"))
        .select(F.col("csrc").alias("src"), F.col("cdst").alias("dst"))
    )
    delta = connected_components(contracted)
    # old nodes: remap through their label; labels untouched by the
    # delta keep themselves. fresh nodes: appear only in delta.
    remapped = (
        comp.join(
            delta.withColumnRenamed("component", "new_component")
            .withColumnRenamed("node", "component"),
            "component",
            "left",
        )
        .select(
            "node", F.coalesce("new_component", "component").alias("component")
        )
    )
    fresh = delta.join(comp.select("node"), "node", "left_anti")
    return remapped.unionByName(fresh)
