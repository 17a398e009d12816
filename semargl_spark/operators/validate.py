"""SHACL-lite shape validation over an extracted triple set.

Knowledge-graph construction at 10^12 turns needs a data-quality gate
between extraction and materialization: which canonical entities are
missing required properties, carry too many values, or bind a value of
the wrong kind/datatype. This is the useful core of W3C SHACL
(sh:targetClass + sh:path with sh:minCount / sh:maxCount / sh:nodeKind
/ sh:datatype), expressed as three relational steps so Catalyst owns
the whole plan:

1. target selection — rdf:type triples broadcast-joined to the (tiny)
   shape table on the class IRI;
2. value attachment — ONE equi-join of targets to the triple set on
   (focus, path); targets are near-unique keys so the join is uniform;
3. per-(focus, shape) hash aggregation producing value counts and
   bad-kind/bad-datatype counts in a single pass, from which all four
   constraint families emit violation rows.

No per-row Python, no iteration, no driver-side data. Violations — not
conformance rows — are the output: at scale the conforming set is the
overwhelming majority and must never be materialized.

Reference parity: the reference is a parser framework with no shape
validation; this is target-side surface for the constructed KG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_SHAPE_KEYS = {
    "shape_id", "target_class", "path",
    "min_count", "max_count", "node_kind", "datatype",
}


def validate_shapes(triples: DataFrame, shapes: list[dict]) -> DataFrame:
    """Validate ``triples`` (subj, pred, obj, obj_kind, dtype — graph
    set semantics: caller dedups) against SHACL-lite ``shapes``.

    Each shape is a dict with ``shape_id``, ``target_class``, ``path``
    and at least one of ``min_count``, ``max_count`` (ints),
    ``node_kind`` ('iri' | 'literal' | 'bnode'), ``datatype`` (IRI).
    → (focus, shape_id, constraint, expected, got) — one row per
    violated constraint, got = the offending count.
    """
    if not shapes:
        raise ValueError("empty shape list")
    rows = []
    for sh in shapes:
        unknown = set(sh) - _SHAPE_KEYS
        if unknown:
            raise ValueError(f"unknown shape keys {sorted(unknown)}")
        for req in ("shape_id", "target_class", "path"):
            if not sh.get(req):
                raise ValueError(f"shape missing {req!r}: {sh}")
        if not any(
            sh.get(k) is not None
            for k in ("min_count", "max_count", "node_kind", "datatype")
        ):
            raise ValueError(f"shape {sh['shape_id']!r} constrains nothing")
        nk = sh.get("node_kind")
        if nk is not None and nk not in ("iri", "literal", "bnode"):
            raise ValueError(f"bad node_kind {nk!r}")
        rows.append((
            sh["shape_id"], sh["target_class"], sh["path"],
            sh.get("min_count"), sh.get("max_count"), nk, sh.get("datatype"),
        ))
    spark = triples.sparkSession
    shapes_df = spark.createDataFrame(
        rows,
        "shape_id string, target_class string, path string, "
        "min_count int, max_count int, node_kind string, datatype string",
    )

    t = triples.select("subj", "pred", "obj", "obj_kind", "dtype")
    targets = (
        t.filter(F.col("pred") == RDF_TYPE)
        .select(F.col("subj").alias("focus"), F.col("obj").alias("target_class"))
        .distinct()
        .join(F.broadcast(shapes_df), "target_class")
        .select("focus", "shape_id", "path",
                "min_count", "max_count", "node_kind", "datatype")
    )
    vals = t.select(
        F.col("subj").alias("focus"), F.col("pred").alias("path"),
        "obj", "obj_kind", "dtype",
    )
    joined = targets.join(vals, ["focus", "path"], "left")
    bad_kind = F.when(
        F.col("node_kind").isNotNull()
        & F.col("obj").isNotNull()
        & (F.col("obj_kind") != F.col("node_kind")),
        1,
    ).otherwise(0)
    bad_dtype = F.when(
        F.col("datatype").isNotNull()
        & F.col("obj").isNotNull()
        & (F.col("dtype").isNull() | (F.col("dtype") != F.col("datatype"))),
        1,
    ).otherwise(0)
    agg = joined.groupBy(
        "focus", "shape_id",
        "min_count", "max_count", "node_kind", "datatype",
    ).agg(
        F.count("obj").alias("n_vals"),
        F.sum(bad_kind).alias("n_kind_bad"),
        F.sum(bad_dtype).alias("n_dtype_bad"),
    )

    def emit(cond, constraint, expected, got):
        return agg.filter(cond).select(
            "focus", "shape_id",
            F.lit(constraint).alias("constraint"),
            expected.alias("expected"),
            got.cast("long").alias("got"),
        )

    out = emit(
        F.col("min_count").isNotNull() & (F.col("n_vals") < F.col("min_count")),
        "minCount",
        F.concat(F.lit(">="), F.col("min_count").cast("string")),
        F.col("n_vals"),
    )
    out = out.unionByName(emit(
        F.col("max_count").isNotNull() & (F.col("n_vals") > F.col("max_count")),
        "maxCount",
        F.concat(F.lit("<="), F.col("max_count").cast("string")),
        F.col("n_vals"),
    ))
    out = out.unionByName(emit(
        F.col("n_kind_bad") > 0, "nodeKind", F.col("node_kind"),
        F.col("n_kind_bad"),
    ))
    out = out.unionByName(emit(
        F.col("n_dtype_bad") > 0, "datatype", F.col("datatype"),
        F.col("n_dtype_bad"),
    ))
    return out
