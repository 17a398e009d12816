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


RDFS_DOMAIN = "http://www.w3.org/2000/01/rdf-schema#domain"
RDFS_RANGE = "http://www.w3.org/2000/01/rdf-schema#range"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _transitive(pairs: list[tuple[str, str]]) -> set[tuple[str, str]]:
    """Driver-side transitive closure of a (sub, super) relation — the
    ontology is tiny by definition (same budget argument as
    expansion_map); the DATA-side closure is what must stay distributed."""
    out = set(pairs)
    changed = True
    while changed:
        changed = False
        for a, b in list(out):
            for c, d in list(out):
                if b == c and (a, d) not in out:
                    out.add((a, d))
                    changed = True
    return out


def rdfs_infer(triples: DataFrame, ontology: list[tuple[str, str, str]]) -> DataFrame:
    """RDFS materialization: the NEW triples entailed by ``ontology``
    over ``triples`` (subj, pred, obj, obj_kind) under rules rdfs2
    (domain), rdfs3 (range), rdfs7 (subPropertyOf), rdfs9/11
    (subClassOf transitivity on types) → (subj, pred, obj, obj_kind),
    distinct, minus what was already asserted. Subproperty-entailed
    triples inherit the source triple's obj_kind (a label ⊑ note
    axiom entails literal-object triples); type triples are 'iri'.

    The ontology's sub-class/-property closures and the
    domain/range maps are pre-composed ON THE DRIVER (rdfs7 before
    rdfs2/3, rdfs9 after both — the standard stratification, so one
    relational pass reaches the fixpoint; no iteration over the 10^12-row
    data side). Each rule is then ONE broadcast-hash join against the
    statement stream: map-side only, no shuffle until the final
    distinct. The reference's vocabulary expansion
    (Vocabulary.java:125-144) covers only equivalence/sub synonyms;
    this is the full RDFS entailment a KG-construction pipeline
    materializes before serving.
    """
    spark = triples.sparkSession
    subc = _transitive([(s, o) for s, p, o in ontology if p == RDFS_SUB_CLASS_OF])
    subp = _transitive([(s, o) for s, p, o in ontology if p == RDFS_SUB_PROPERTY_OF])
    dom = [(s, o) for s, p, o in ontology if p == RDFS_DOMAIN]
    rng = [(s, o) for s, p, o in ontology if p == RDFS_RANGE]
    # rdfs7∘rdfs2/3: a subproperty inherits its superproperties' domains
    # and ranges (p ⊑ q, domain(q, C) ⟹ domain(p, C))
    subp_refl = subp | {(p, p) for pair in subp for p in pair} | {
        (p, p) for p, _ in dom + rng
    }
    dom_full = {(p, c) for p, q in subp_refl for q2, c in dom if q == q2}
    rng_full = {(p, c) for p, q in subp_refl for q2, c in rng if q == q2}
    # rdfs9 on inferred domain/range types: close over subclass too
    subc_refl = subc | {(c, c) for pair in subc for c in pair} | {
        (c, c) for _, c in list(dom_full) + list(rng_full)
    }
    dom_closed = {(p, d) for p, c in dom_full for c2, d in subc_refl if c == c2}
    rng_closed = {(p, d) for p, c in rng_full for c2, d in subc_refl if c == c2}

    def _pairs(name_a: str, name_b: str, pairs) -> DataFrame:
        return spark.createDataFrame(
            sorted(pairs), f"{name_a} string, {name_b} string"
        )

    t = triples.select("subj", "pred", "obj", "obj_kind")
    parts = []
    if subp:
        sp = _pairs("pred", "sup", subp)
        parts.append(
            t.join(F.broadcast(sp), "pred").select(
                "subj", F.col("sup").alias("pred"), "obj", "obj_kind"
            )
        )
    if subc:
        sc = _pairs("obj", "sup", subc)
        parts.append(
            t.filter(F.col("pred") == RDF_TYPE)
            .join(F.broadcast(sc), "obj")
            .select("subj", F.lit(RDF_TYPE).alias("pred"),
                    F.col("sup").alias("obj"), F.lit("iri").alias("obj_kind"))
        )
    if dom_closed:
        dm = _pairs("pred", "cls", dom_closed)
        parts.append(
            t.join(F.broadcast(dm), "pred").select(
                "subj", F.lit(RDF_TYPE).alias("pred"),
                F.col("cls").alias("obj"), F.lit("iri").alias("obj_kind")
            )
        )
    if rng_closed:
        rg = _pairs("pred", "cls", rng_closed)
        parts.append(
            t.filter(F.col("obj_kind").isin("iri", "bnode"))
            .join(F.broadcast(rg), "pred")
            .select(
                F.col("obj").alias("subj"),
                F.lit(RDF_TYPE).alias("pred"),
                F.col("cls").alias("obj"),
                F.lit("iri").alias("obj_kind"),
            )
        )
    if not parts:
        raise ValueError("ontology entails nothing (no sub/domain/range axioms)")
    inferred = parts[0]
    for p in parts[1:]:
        inferred = inferred.unionByName(p)
    return inferred.distinct().join(
        t.select("subj", "pred", "obj").distinct(),
        ["subj", "pred", "obj"],
        "left_anti",
    )
