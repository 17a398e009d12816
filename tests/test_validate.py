"""SHACL-lite validation, random projection, and response latency."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semargl_spark.operators.validate import RDF_TYPE, validate_shapes


def _g(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_kind string, dtype string"
    )


XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"


def test_validate_min_max_kind_dtype(spark):
    g = _g(spark, [
        ("e1", RDF_TYPE, "C", "iri", None),
        ("e2", RDF_TYPE, "C", "iri", None),
        # e1: two names (max violation), literal knows (kind violation),
        # string-typed age (dtype violation)
        ("e1", "name", "n1", "literal", None),
        ("e1", "name", "n2", "literal", None),
        ("e1", "knows", "oops", "literal", None),
        ("e1", "age", "7", "literal", "xsd:string"),
        # e2: conforms on name/knows/age but has NO name -> min violation
        ("e2", "knows", "e1", "iri", None),
        ("e2", "age", "8", "literal", XSD_INT),
        # untargeted node: never validated
        ("zz", "name", "x", "literal", None),
    ])
    shapes = [
        {"shape_id": "name1", "target_class": "C", "path": "name",
         "min_count": 1, "max_count": 1},
        {"shape_id": "knows_iri", "target_class": "C", "path": "knows",
         "node_kind": "iri"},
        {"shape_id": "age_int", "target_class": "C", "path": "age",
         "datatype": XSD_INT},
    ]
    out = {(r["focus"], r["shape_id"], r["constraint"], r["expected"], r["got"])
           for r in validate_shapes(g, shapes).collect()}
    assert out == {
        ("e1", "name1", "maxCount", "<=1", 2),
        ("e2", "name1", "minCount", ">=1", 0),
        ("e1", "knows_iri", "nodeKind", "iri", 1),
        ("e1", "age_int", "datatype", XSD_INT, 1),
    }


def test_validate_rejects_bad_shapes(spark):
    g = _g(spark, [("e1", RDF_TYPE, "C", "iri", None)])
    with pytest.raises(ValueError):
        validate_shapes(g, [])
    with pytest.raises(ValueError):
        validate_shapes(g, [{"shape_id": "s", "target_class": "C",
                             "path": "p"}])  # constrains nothing
    with pytest.raises(ValueError):
        validate_shapes(g, [{"shape_id": "s", "target_class": "C",
                             "path": "p", "node_kind": "uri"}])
    with pytest.raises(ValueError):
        validate_shapes(g, [{"shape_id": "s", "target_class": "C",
                             "path": "p", "min_count": 1, "bogus": 1}])


def test_validate_partitioning_invariant(spark):
    rows = [(f"e{i}", RDF_TYPE, "C", "iri", None) for i in range(20)]
    rows += [(f"e{i}", "name", f"n{i}_{k}", "literal", None)
             for i in range(20) for k in range(i % 3)]
    g = _g(spark, rows)
    shapes = [{"shape_id": "s", "target_class": "C", "path": "name",
               "min_count": 1, "max_count": 1}]
    a = {tuple(r) for r in validate_shapes(g.repartition(1), shapes).collect()}
    b = {tuple(r) for r in validate_shapes(g.repartition(7), shapes).collect()}
    assert a == b
    # i%3==0 -> 0 names (min), i%3==2 -> 2 names (max)
    assert sum(1 for r in a if r[2] == "minCount") == 7
    assert sum(1 for r in a if r[2] == "maxCount") == 6


def test_random_projection_matches_hand_fold(spark):
    import hashlib

    from semargl_spark.operators.similarity import random_projection

    vecs = [(0, [0.5, -0.25, 0.125]), (1, [1.0, 0.0, -1.0])]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = {(r["vec_id"], r["j"]): r["v"]
           for r in random_projection(df, out_dim=2).collect()}

    def sign(j, i):
        return 1 if hashlib.md5(f"rp|{j}|{i}".encode()).hexdigest()[0] in "02468ace" else -1

    for vid, emb in vecs:
        for j in range(2):
            exp = sum(sign(j, i) * round(x * 1000) for i, x in enumerate(emb))
            assert out[(vid, j)] == exp
    with pytest.raises(ValueError):
        random_projection(df, out_dim=0)
    with pytest.raises(ValueError):
        random_projection(df, scale=0)


def test_response_latency_adjacency_and_empty(spark):
    from semargl_spark.operators.conversation import response_latency

    rows = [
        # conv a: user@0 -> assistant@10 (lat 10), tool, user@100 -> assistant@160
        ("a", 0, "user", 0), ("a", 1, "assistant", 10), ("a", 2, "tool", 50),
        ("a", 3, "user", 100), ("a", 4, "assistant", 160),
        # conv b: assistant first (no preceding user), then user->tool: 0 responses
        ("b", 0, "assistant", 5), ("b", 1, "user", 9), ("b", 2, "tool", 12),
    ]
    df = spark.createDataFrame(
        [(c, i, r, float(e)) for c, i, r, e in rows],
        "conv_id string, turn_idx int, role string, epoch double",
    ).select("conv_id", "turn_idx", "role",
             F.timestamp_seconds(F.col("epoch")).alias("ts"))
    out = {r["conv_id"]: (r["n_responses"], r["sum_latency_s"], r["max_latency_s"])
           for r in response_latency(df).collect()}
    assert out == {"a": (2, 70, 60), "b": (0, 0, None)}


def test_rdfs_infer_rules_and_anti_join(spark):
    from semargl_spark.operators.vocab import (
        RDFS_DOMAIN, RDFS_RANGE, RDFS_SUB_CLASS_OF, RDFS_SUB_PROPERTY_OF,
        RDF_TYPE, rdfs_infer,
    )

    g = spark.createDataFrame([
        ("a", "knows", "b", "iri"),
        ("a", RDF_TYPE, "T", "iri"),
        # literal object: range rule must NOT type it
        ("a", "knows", "oops", "literal"),
        # already-asserted entailment: must not be re-emitted
        ("a", "related", "b", "iri"),
    ], "subj string, pred string, obj string, obj_kind string")
    onto = [
        ("knows", RDFS_SUB_PROPERTY_OF, "related"),
        ("related", RDFS_SUB_PROPERTY_OF, "connected"),
        ("T", RDFS_SUB_CLASS_OF, "U"),
        ("knows", RDFS_DOMAIN, "D"),
        ("knows", RDFS_RANGE, "R"),
        ("R", RDFS_SUB_CLASS_OF, "R2"),
    ]
    out = {(r["subj"], r["pred"], r["obj"], r["obj_kind"])
           for r in rdfs_infer(g, onto).collect()}
    assert out == {
        ("a", "connected", "b", "iri"),      # subproperty, transitive
        ("a", "related", "oops", "literal"), # subproperty keeps obj_kind
        ("a", "connected", "oops", "literal"),
        ("a", RDF_TYPE, "U", "iri"),         # subclass on asserted type
        ("a", RDF_TYPE, "D", "iri"),         # domain
        ("b", RDF_TYPE, "R", "iri"),         # range (iri object only)
        ("b", RDF_TYPE, "R2", "iri"),        # range closed over subclass
    }
    import pytest as _pytest

    with _pytest.raises(ValueError):
        rdfs_infer(g, [("x", "urn:unrelated", "y")])


def test_rdfs_infer_partitioning_invariant(spark):
    from semargl_spark.operators.vocab import (
        RDFS_SUB_PROPERTY_OF, rdfs_infer,
    )

    rows = [(f"e{i}", "knows", f"e{i+1}", "iri") for i in range(30)]
    g = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_kind string")
    onto = [("knows", RDFS_SUB_PROPERTY_OF, "related")]
    a = {tuple(r) for r in rdfs_infer(g.repartition(1), onto).collect()}
    b = {tuple(r) for r in rdfs_infer(g.repartition(9), onto).collect()}
    assert a == b and len(a) == 30
