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
* the argmax per mention uses a single aggregation keyed by the mention
  key (max_by), not a window sort, so AQE can coalesce partitions.
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
    joined = mentions.join(F.broadcast(dict_norm), "surface_norm", "inner")
    return (
        joined.groupBy("conv_id", "turn_idx", "mention_node")
        .agg(
            F.max_by("canonical_iri", F.struct("weight", "canonical_iri")).alias(
                "canonical_iri"
            ),
            F.max("weight").alias("score"),
        )
    )
