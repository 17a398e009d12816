"""SPARQL text front-end: parse + compile onto the BGP engine."""
from __future__ import annotations

import pytest

from semargl_spark.operators.sparql import SparqlError, sparql_select


def _edges(spark):
    rows = [
        ("a1", "urn:p:knows", "b1"), ("a2", "urn:p:knows", "b2"),
        ("b1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "urn:t:Thing"),
        ("b1", "urn:p:name", "Bee One"),
        ("b2", "urn:p:name", "Bee Two"),
    ]
    return spark.createDataFrame(rows, "src string, pred string, dst string")


def test_sparql_basic_join_and_prefix(spark):
    q = """
    PREFIX p: <urn:p:>
    SELECT ?x ?n WHERE { ?x p:knows ?y . ?y p:name ?n . }
    """
    out = {(r["x"], r["n"]) for r in sparql_select(_edges(spark), q).collect()}
    assert out == {("a1", "Bee One"), ("a2", "Bee Two")}


def test_sparql_a_keyword_and_star(spark):
    q = """
    PREFIX t: <urn:t:>
    SELECT * WHERE { ?e a t:Thing . }
    """
    out = [dict(r.asDict()) for r in sparql_select(_edges(spark), q).collect()]
    assert out == [{"e": "b1"}]


def test_sparql_filter_regex_and_logic(spark):
    q = """
    PREFIX p: <urn:p:>
    SELECT ?y WHERE { ?x p:knows ?y . ?y p:name ?n .
                      FILTER(regex(?n, "Two$") || ?y = "b1") }
    """
    out = {r["y"] for r in sparql_select(_edges(spark), q).collect()}
    assert out == {"b1", "b2"}


def test_sparql_optional_null_padding(spark):
    q = """
    PREFIX p: <urn:p:>
    PREFIX t: <urn:t:>
    SELECT ?y ?t WHERE { ?x p:knows ?y . OPTIONAL { ?y a ?t . } }
    """
    out = {(r["y"], r["t"]) for r in sparql_select(_edges(spark), q).collect()}
    assert out == {("b1", "urn:t:Thing"), ("b2", None)}


def test_sparql_minus(spark):
    q = """
    PREFIX p: <urn:p:>
    PREFIX t: <urn:t:>
    SELECT ?y WHERE { ?x p:knows ?y . MINUS { ?y a t:Thing . } }
    """
    out = {r["y"] for r in sparql_select(_edges(spark), q).collect()}
    assert out == {"b2"}


def test_sparql_order_limit(spark):
    q = """
    PREFIX p: <urn:p:>
    SELECT ?x WHERE { ?x p:knows ?y . } ORDER BY DESC(?x) LIMIT 1
    """
    out = [r["x"] for r in sparql_select(_edges(spark), q).collect()]
    assert out == ["a2"]


def test_sparql_literal_with_space(spark):
    q = """
    PREFIX p: <urn:p:>
    SELECT ?y WHERE { ?y p:name "Bee One" . }
    """
    out = {r["y"] for r in sparql_select(_edges(spark), q).collect()}
    assert out == {"b1"}


def test_sparql_errors(spark):
    e = _edges(spark)
    with pytest.raises(SparqlError):
        sparql_select(e, "SELECT ?x WHERE { ?x unknown:p ?y . }")
    with pytest.raises(SparqlError):
        sparql_select(e, "no select here")
    with pytest.raises(SparqlError):
        sparql_select(e, "SELECT ?z WHERE { ?x <urn:p:knows> ?y . }")
    with pytest.raises(SparqlError):
        sparql_select(
            e, "SELECT ?x WHERE { ?x <urn:p:knows> ?y . { ?y <urn:q> ?z . } }"
        )


def test_sparql_union(spark):
    q = """
    PREFIX p: <urn:p:>
    PREFIX t: <urn:t:>
    SELECT ?x ?t WHERE { { ?x p:knows ?y . } UNION { ?x a ?t . } }
    """
    out = {(r["x"], r["t"]) for r in sparql_select(_edges(spark), q).collect()}
    assert out == {("a1", None), ("a2", None), ("b1", "urn:t:Thing")}


def test_sparql_group_by_count(spark):
    q = """
    PREFIX p: <urn:p:>
    SELECT ?p (COUNT(*) AS ?n) WHERE { ?x ?p ?y . } GROUP BY ?p
    """
    out = {(r["p"], r["n"]) for r in sparql_select(_edges(spark), q).collect()}
    assert out == {
        ("urn:p:knows", 2), ("urn:p:name", 2),
        ("http://www.w3.org/1999/02/22-rdf-syntax-ns#type", 1),
    }
    with pytest.raises(SparqlError):
        sparql_select(_edges(spark),
                      "SELECT ?x (COUNT(*) AS ?n) WHERE { ?x ?p ?y . } GROUP BY ?p")
    with pytest.raises(SparqlError):
        sparql_select(_edges(spark),
                      "SELECT (MEDIAN(?x) AS ?n) WHERE { ?x ?p ?y . }")


def test_sparql_count_distinct(spark):
    q = """
    SELECT (COUNT(DISTINCT ?y) AS ?n) WHERE { ?x <urn:p:knows> ?y . }
    """
    assert sparql_select(_edges(spark), q).collect()[0]["n"] == 2


def test_sparql_ask(spark):
    from semargl_spark.operators.sparql import sparql_ask

    e = _edges(spark)
    assert sparql_ask(e, 'ASK { ?x <urn:p:name> "Bee One" . }') is True
    assert sparql_ask(e, 'ASK WHERE { ?x <urn:p:name> "Nobody" . }') is False
    assert sparql_ask(
        e, 'PREFIX p: <urn:p:> ASK { ?x p:knows ?y . FILTER(?y = "b2") }'
    ) is True
    with pytest.raises(SparqlError):
        sparql_ask(e, "ASK { }")
