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
