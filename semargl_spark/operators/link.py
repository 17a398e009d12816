"""Entity linking stage (SURVEY.md §2.5 J3, north_star).

Candidate mentions (literal objects of name-like predicates in the
extracted triples) are matched against a *broadcast* entity dictionary —
a broadcast-hash join, never a shuffle of the big side — then scored and
reduced to the best candidate per mention.

Scale notes (100 TB corpus):
* the dictionary is the small side by construction (entity inventories
  are ~10^6-10^8 rows); ``F.broadcast`` pins the plan to
  BroadcastHashJoin so the triples side streams map-side only;
* normalization is pure JVM (lower/trim/regexp) — whole-stage codegen,
  no Python in the hot path;
* the dictionary is argmax-reduced per surface form FIRST (on the
  small side, where a sort-based aggregate costs nothing), so the join
  emits at most one candidate per mention surface and the big-side
  argmax only arbitrates between a node's different name predicates —
  a near-unique-key aggregate. (A fully hash-based big-side argmax is
  impossible here: HashAggregateExec needs fixed-width buffers, and the
  payload is a string, so max(struct)/max_by compile to SortAggregate
  — keeping the sorted volume minimal is the lever that matters.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NAME_PREDICATES = (
    "urn:p:name",
    "http://purl.org/dc/terms/title",
    "http://xmlns.com/foaf/0.1/name",
)


def extract_mentions(triples: DataFrame, predicates=NAME_PREDICATES) -> DataFrame:
    """Literal objects of naming predicates → normalized surface forms."""
    return (
        triples.filter(F.col("obj_kind") == "literal")
        .filter(F.col("pred").isin(*predicates))
        .select(
            "conv_id",
            "turn_idx",
            F.col("subj").alias("mention_node"),
            F.col("obj").alias("mention_text"),
            F.trim(F.lower(F.col("obj"))).alias("surface_norm"),
        )
    )


def link_entities(
    triples: DataFrame,
    dictionary: DataFrame,
    predicates=NAME_PREDICATES,
) -> DataFrame:
    """mentions ⋈ broadcast(dictionary) → best candidate per mention.

    Returns (conv_id, turn_idx, mention_node, canonical_iri, score).
    """
    mentions = extract_mentions(triples, predicates)
    dict_norm = dictionary.select(
        F.trim(F.lower(F.col("surface_form"))).alias("surface_norm"),
        "canonical_iri",
        F.col("weight").cast("double").alias("weight"),
    )
    # argmax-reduce the dictionary per surface form before broadcasting:
    # the join then yields one candidate per mention surface
    dict_best = (
        dict_norm.groupBy("surface_norm")
        .agg(F.max(F.struct("weight", "canonical_iri")).alias("b"))
        .select(
            "surface_norm",
            F.col("b.canonical_iri").alias("canonical_iri"),
            F.col("b.weight").alias("weight"),
        )
    )
    joined = mentions.join(F.broadcast(dict_best), "surface_norm", "inner")
    best = F.max(F.struct("weight", "canonical_iri")).alias("best")
    return (
        joined.groupBy("conv_id", "turn_idx", "mention_node")
        .agg(best)
        .select(
            "conv_id",
            "turn_idx",
            "mention_node",
            F.col("best.canonical_iri").alias("canonical_iri"),
            F.col("best.weight").alias("score"),
        )
    )


def _deletion_variants(col):
    """``s`` plus every single-character deletion of ``s`` — the
    SymSpell/FastSS blocking neighborhood: two strings within
    levenshtein distance 1 always share at least one variant, so an
    equi-join on variants is a complete (superset) candidate generator
    for distance-1 fuzzy matching without any all-pairs comparison."""
    n = F.length(col)
    dels = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat(col.substr(F.lit(1), i - 1), col.substr(i + 1, n)),
    )
    return F.when(n == 0, F.array(col)).otherwise(
        F.array_union(F.array(col), dels)
    )


def fuzzy_link_entities(
    triples: DataFrame,
    dictionary: DataFrame,
    predicates=NAME_PREDICATES,
    surface_col=None,
) -> DataFrame:
    """Distance-1 fuzzy entity linking — the similarity-scored variant
    of :func:`link_entities` for noisy mention surfaces (OCR slips,
    tokenizer damage, trailing junk).

    Candidate generation is SymSpell-style deletion-neighborhood
    blocking: both sides explode to their ≤ len+1 single-deletion
    variants and meet in a broadcast equi-join on the variant string —
    never a similarity cross product, and unlike first-token or n-gram
    blocking it cannot degenerate into one giant block when all
    entities share a common prefix ("entity 1", "entity 2", ...).
    Candidates are then verified with exact ``levenshtein ≤ 1`` (JVM,
    also in every SQL engine, so the whole operator is oracle-able) and
    scored ``1 − lev/max(len)``; the per-mention argmax orders by
    (score, weight, canonical_iri) so ties are deterministic.

    Scale shape: the dictionary side grows ×(avg_len+1) before
    broadcast — budget it (10^7 surfaces × 20 variants × ~30 B ≈ 6 GB:
    at that size pre-partition instead of broadcasting, same plan minus
    the hint). The mention side is a narrow explode; duplicate
    (mention, candidate) pairs from sharing several variants are NOT
    distinct-ed away (that shuffle would cost more than letting the
    final argmax absorb them). ``surface_col`` lets callers feed an
    already-perturbed/normalized surface; default is the trimmed
    lowercased literal.
    """
    mentions = extract_mentions(triples, predicates)
    if surface_col is not None:
        mentions = mentions.withColumn("surface_norm", surface_col)
    m = mentions.select(
        "conv_id",
        "turn_idx",
        "mention_node",
        "surface_norm",
        F.explode(_deletion_variants(F.col("surface_norm"))).alias("variant"),
    )
    d = dictionary.select(
        F.trim(F.lower(F.col("surface_form"))).alias("dict_surface"),
        "canonical_iri",
        F.col("weight").cast("double").alias("weight"),
    ).select(
        "dict_surface",
        "canonical_iri",
        "weight",
        F.explode(_deletion_variants(F.col("dict_surface"))).alias("variant"),
    )
    lev = F.levenshtein(F.col("surface_norm"), F.col("dict_surface"))
    cand = (
        m.join(F.broadcast(d), "variant")
        .withColumn("lev", lev)
        .filter(F.col("lev") <= 1)
        .withColumn(
            "score",
            F.round(
                1
                - F.col("lev")
                / F.greatest(
                    F.length("surface_norm"),
                    F.length("dict_surface"),
                    F.lit(1),
                ),
                6,
            ),
        )
    )
    best = F.max(F.struct("score", "weight", "canonical_iri")).alias("b")
    return (
        cand.groupBy("conv_id", "turn_idx", "mention_node")
        .agg(best)
        .select(
            "conv_id",
            "turn_idx",
            "mention_node",
            F.col("b.canonical_iri").alias("canonical_iri"),
            F.col("b.score").alias("score"),
        )
    )
