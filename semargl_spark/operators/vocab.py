"""RDFa vocabulary expansion as a broadcast join (SURVEY.md §2.5 J1).

The reference expands every emitted statement against the loaded
vocabulary's closure: owl:equivalentProperty/equivalentClass add
synonyms in both directions, rdfs:subClassOf/subPropertyOf one
direction (Vocabulary.VocabParser, rdfa/.../Vocabulary.java:125-144),
emitting the original plus synonym triples
(RdfaParser.addNonLiteralInternal:1197-1217). The reference fetches
vocabularies over HTTP at parse time (Vocabulary.java:55-108) — on a
cluster the vocabulary is loaded once on the driver and *broadcast*;
executors never fetch.

Spark shape: two broadcast-hash joins (pred-synonyms for all
statements, obj-synonyms for non-literal statements) unioned with the
original — the statements side streams map-side only; no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OWL_EQUIVALENT_PROPERTY = "http://www.w3.org/2002/07/owl#equivalentProperty"
OWL_EQUIVALENT_CLASS = "http://www.w3.org/2002/07/owl#equivalentClass"
RDFS_SUB_CLASS_OF = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
RDFS_SUB_PROPERTY_OF = "http://www.w3.org/2000/01/rdf-schema#subPropertyOf"


def expansion_map(vocab_triples: DataFrame) -> DataFrame:
    """vocab statements → (term, synonym) expansion pairs.

    equivalent* is symmetric, rdfs:sub* points up only — exactly the
    reference's addExpansion calls (Vocabulary.java:128-139). Bnode
    terms are dropped like the reference does."""
    # a vocabulary is small by definition (the reference holds it in one
    # in-memory map, Vocabulary.java:110-123) — collapse to a single
    # partition so the union/distinct/broadcast stages don't schedule
    # dozens of near-empty tasks (createDataFrame spreads even 2 rows
    # over defaultParallelism slices)
    v = vocab_triples.select("subj", "pred", "obj").repartition(1).filter(
        ~F.col("subj").startswith("_:") & ~F.col("obj").startswith("_:")
    )
    equiv = v.filter(
        F.col("pred").isin(OWL_EQUIVALENT_PROPERTY, OWL_EQUIVALENT_CLASS)
    )
    sub = v.filter(F.col("pred").isin(RDFS_SUB_CLASS_OF, RDFS_SUB_PROPERTY_OF))
    pairs = (
        equiv.select(F.col("subj").alias("term"), F.col("obj").alias("synonym"))
        .union(equiv.select(F.col("obj").alias("term"), F.col("subj").alias("synonym")))
        .union(sub.select(F.col("subj").alias("term"), F.col("obj").alias("synonym")))
        .filter(F.col("term") != F.col("synonym"))
        .distinct()
    )
    return pairs


def expand_statements(
    statements: DataFrame, vocab_triples: DataFrame, dedupe: bool = False
) -> DataFrame:
    """statements ∪ pred-synonym rows ∪ obj-synonym rows (non-literal).

    The expansion map is broadcast; both joins are BroadcastHashJoin, so
    with ``dedupe=False`` (default) the whole stage is map-side only —
    no shuffle, exactly like the reference, which emits original +
    synonym triples without set-dedup (RdfaParser.java:1197-1217; model
    set semantics are the downstream sink's job — here
    ``dedup_triples``). ``dedupe=True`` adds a full-output ``distinct``
    shuffle for callers that want model semantics in one call."""
    pairs = expansion_map(vocab_triples)

    pred_syn = (
        statements.join(
            F.broadcast(pairs.withColumnRenamed("term", "pred")), "pred"
        )
        .drop("pred")
        .withColumnRenamed("synonym", "pred")
        .select(*statements.columns)
    )
    obj_syn = (
        statements.filter(F.col("obj_kind") == "iri")
        .join(F.broadcast(pairs.withColumnRenamed("term", "obj")), "obj")
        .drop("obj")
        .withColumnRenamed("synonym", "obj")
        .select(*statements.columns)
    )
    out = statements.unionByName(pred_syn).unionByName(obj_syn)
    return out.distinct() if dedupe else out
