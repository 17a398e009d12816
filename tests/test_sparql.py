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


def test_sparql_having_and_order_on_aggregates(spark):
    q = """
    SELECT ?p (COUNT(*) AS ?n) WHERE { ?x ?p ?y . }
    GROUP BY ?p HAVING(?n >= 2) ORDER BY ?p LIMIT 10
    """
    out = [(r["p"], r["n"]) for r in sparql_select(_edges(spark), q).collect()]
    assert out == [("urn:p:knows", 2), ("urn:p:name", 2)]
    with pytest.raises(SparqlError):
        sparql_select(_edges(spark), """
        SELECT ?p (COUNT(*) AS ?n) WHERE { ?x ?p ?y . }
        GROUP BY ?p HAVING(?typo >= 2)""")


def test_sparql_count_distinct(spark):
    q = """
    SELECT (COUNT(DISTINCT ?y) AS ?n) WHERE { ?x <urn:p:knows> ?y . }
    """
    assert sparql_select(_edges(spark), q).collect()[0]["n"] == 2


def test_sparql_dotted_iris_and_literals(spark):
    # dots inside <...> IRIs and quoted literals are NOT statement
    # separators (a naive body.split('.') breaks http://ex.org/...)
    rows = [
        ("a1", "http://ex.org/v1.0/knows", "b1"),
        ("b1", "http://ex.org/v1.0/name", "Bee 1.5"),
    ]
    e = spark.createDataFrame(rows, "src string, pred string, dst string")
    q = """
    SELECT ?x WHERE { ?x <http://ex.org/v1.0/knows> ?y .
                      ?y <http://ex.org/v1.0/name> "Bee 1.5" . }
    """
    assert [r["x"] for r in sparql_select(e, q).collect()] == ["a1"]
    # dot attached directly before the next ?var still separates
    q2 = 'SELECT ?y WHERE { ?x <http://ex.org/v1.0/knows> ?y .?y <http://ex.org/v1.0/name> ?n . }'
    assert [r["y"] for r in sparql_select(e, q2).collect()] == ["b1"]


def test_sparql_values_single_and_tuple(spark):
    q = """
    PREFIX p: <urn:p:>
    SELECT ?y ?n WHERE { ?x p:knows ?y . ?y p:name ?n .
                         VALUES ?n { "Bee One" "Nobody" } }
    """
    out = {(r["y"], r["n"]) for r in sparql_select(_edges(spark), q).collect()}
    assert out == {("b1", "Bee One")}

    q2 = """
    PREFIX p: <urn:p:>
    SELECT ?y ?n WHERE { ?x p:knows ?y . ?y p:name ?n .
                         VALUES (?y ?n) { ("b2" "Bee Two") ("b1" "Nope") } }
    """
    out2 = {(r["y"], r["n"]) for r in sparql_select(_edges(spark), q2).collect()}
    assert out2 == {("b2", "Bee Two")}

    with pytest.raises(SparqlError):
        sparql_select(_edges(spark), """
        SELECT ?y WHERE { ?x <urn:p:knows> ?y . VALUES ?z { "a" } }""")
    with pytest.raises(SparqlError):
        sparql_select(_edges(spark), """
        SELECT ?y WHERE { ?x <urn:p:knows> ?y . VALUES ?y { UNDEF } }""")


def test_sparql_construct(spark):
    from semargl_spark.operators.sparql import sparql_construct

    q = """
    PREFIX p: <urn:p:>
    CONSTRUCT { ?y <urn:d:knownBy> ?x . ?y a <urn:d:Known> . }
    WHERE { ?x p:knows ?y . FILTER(?y = "b1") }
    """
    out = {tuple(r) for r in sparql_construct(_edges(spark), q).collect()}
    assert out == {
        ("b1", "urn:d:knownBy", "a1"),
        ("b1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "urn:d:Known"),
    }
    with pytest.raises(SparqlError):
        sparql_construct(_edges(spark), "CONSTRUCT { } WHERE { ?x ?p ?y . }")


def test_bgp_greedy_connected_order_avoids_cartesian(spark):
    # declaration order [(?a,k,?b), (?c,k,?d), (?b,k,?c)] is connected
    # overall but the middle pattern is disconnected *at that point* —
    # the greedy-connected ordering must produce a plan with no
    # CartesianProduct / BroadcastNestedLoopJoin
    from semargl_spark.operators.bgp import match_bgp

    rows = [("a", "k", "b"), ("b", "k", "c"), ("c", "k", "d")]
    e = spark.createDataFrame(rows, "src string, pred string, dst string")
    pats = [("?a", "k", "?b"), ("?c", "k", "?d"), ("?b", "k", "?c")]
    out = match_bgp(e, pats)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    assert [tuple(r) for r in out.collect()] == [("a", "b", "c", "d")]


def test_sparql_property_path(spark):
    rows = [
        ("a", "urn:p:knows", "b"), ("b", "urn:p:knows", "c"),
        ("c", "urn:p:knows", "d"), ("x", "urn:p:rel", "a"),
    ]
    e = spark.createDataFrame(rows, "src string, pred string, dst string")
    q = """
    PREFIX p: <urn:p:>
    SELECT ?x ?y ?hops WHERE { ?x p:knows{1,2} ?y . }
    """
    out = {(r["x"], r["y"], r["hops"]) for r in sparql_select(e, q).collect()}
    assert out == {
        ("a", "b", 1), ("b", "c", 1), ("c", "d", 1),
        ("a", "c", 2), ("b", "d", 2),
    }
    # + is bounded by max_hops; constant subject filters post-closure
    q2 = 'PREFIX p: <urn:p:> SELECT ?y WHERE { <a> p:knows+ ?y . }'
    got = {r["y"] for r in sparql_select(e, q2, max_hops=2).collect()}
    assert got == {"b", "c"}
    # alternation + inverse with FILTER
    q3 = """
    PREFIX p: <urn:p:>
    SELECT ?x ?y WHERE { ?x (p:knows|^p:rel){1,2} ?y . FILTER(?y = "x") }
    """
    got3 = {(r["x"], r["y"]) for r in sparql_select(e, q3).collect()}
    assert got3 == {("a", "x")}  # 1-hop inverse of (x, rel, a); nothing reaches 'a'
    # a path among multiple patterns must raise, not match the IRI 'knows+'
    with pytest.raises(SparqlError):
        sparql_select(e, """
        PREFIX p: <urn:p:>
        SELECT ?x WHERE { ?x p:knows+ ?y . ?y p:knows ?z . }""")


def test_sparql_describe(spark):
    from semargl_spark.operators.sparql import sparql_describe

    e = _edges(spark)
    out = {tuple(r) for r in sparql_describe(
        e, "PREFIX p: <urn:p:> DESCRIBE <b1>").collect()}
    assert out == {
        ("a1", "urn:p:knows", "b1"),
        ("b1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "urn:t:Thing"),
        ("b1", "urn:p:name", "Bee One"),
    }
    with pytest.raises(SparqlError):
        sparql_describe(e, "DESCRIBE ?x")
    with pytest.raises(SparqlError):
        sparql_describe(e, "SELECT ?x WHERE { ?x ?p ?o . }")


def test_sparql_graph_clause(spark):
    rows = [
        ("s1", "urn:p:name", "A", "urn:g:1"),
        ("s2", "urn:p:name", "B", "urn:g:2"),
        ("s3", "urn:p:name", "C", None),  # default graph: never binds ?g
        ("s1", "urn:p:age", "9", "urn:g:1"),
    ]
    e = spark.createDataFrame(
        rows, "src string, pred string, dst string, graph string"
    )
    q = "SELECT ?g ?s WHERE { GRAPH ?g { ?s <urn:p:name> ?o . } }"
    out = {(r["g"], r["s"]) for r in sparql_select(e, q).collect()}
    assert out == {("urn:g:1", "s1"), ("urn:g:2", "s2")}
    # constant graph term + join inside the named graph
    q2 = """
    SELECT ?s ?a WHERE { GRAPH <urn:g:1> {
        ?s <urn:p:name> ?o . ?s <urn:p:age> ?a . } }
    """
    out2 = {(r["s"], r["a"]) for r in sparql_select(e, q2).collect()}
    assert out2 == {("s1", "9")}
    # a triple-only table must refuse GRAPH loudly
    with pytest.raises(SparqlError):
        sparql_select(
            e.drop("graph"), "SELECT ?s WHERE { GRAPH ?g { ?s ?p ?o . } }"
        )


def test_bgp_join_order_cost_model():
    from semargl_spark.operators.bgp import join_order

    TYPE = "urn:rdf:type"
    pats = [("?s", TYPE, "?c"), ("?s", "urn:p:rare", "?o")]
    # without stats: equal constant counts → declaration order
    assert join_order(pats) == [0, 1]
    # with stats: the rare predicate scans 10 rows, rdf:type 10^6 →
    # start from the rare pattern
    assert join_order(pats, {TYPE: 1_000_000, "urn:p:rare": 10}) == [1, 0]
    # an absent predicate estimates an empty scan and goes first
    assert join_order(pats, {TYPE: 5}) == [1, 0]
    # connectivity still dominates: the cheap-but-disconnected pattern
    # is deferred until a shared variable exists
    pats2 = [("?a", "urn:p:big", "?b"), ("?c", "urn:p:tiny", "?d"),
             ("?b", "urn:p:mid", "?c")]
    stats = {"urn:p:big": 1000, "urn:p:tiny": 1, "urn:p:mid": 100}
    assert join_order(pats2, stats) == [1, 2, 0]


def test_bgp_pred_stats_same_result(spark):
    from semargl_spark.operators.bgp import match_bgp, predicate_counts

    e = _edges(spark)
    pats = [("?x", "urn:p:knows", "?y"), ("?y", "urn:p:name", "?n")]
    stats = predicate_counts(e)
    assert stats["urn:p:knows"] == 2
    a = {tuple(r) for r in match_bgp(e, pats).collect()}
    b = {tuple(r) for r in match_bgp(e, pats, pred_stats=stats).collect()}
    assert a == b and len(a) == 2


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
    # ASK shares the SELECT body surface: property paths and GRAPH
    assert sparql_ask(
        e, 'PREFIX p: <urn:p:> ASK { <a1> p:knows{1,2} ?y . }'
    ) is True
    quads = spark.createDataFrame(
        [("s1", "urn:p:name", "A", "urn:g:1")],
        "src string, pred string, dst string, graph string",
    )
    assert sparql_ask(
        quads, "ASK { GRAPH <urn:g:1> { ?s ?p ?o . } }"
    ) is True
    assert sparql_ask(
        quads, "ASK { GRAPH <urn:g:2> { ?s ?p ?o . } }"
    ) is False


def test_sparql_filter_exists(spark):
    q = """
    PREFIX p: <urn:p:>
    PREFIX t: <urn:t:>
    SELECT ?y WHERE { ?x p:knows ?y . FILTER EXISTS { ?y a t:Thing . } }
    """
    out = {r["y"] for r in sparql_select(_edges(spark), q).collect()}
    assert out == {"b1"}


def test_sparql_filter_not_exists(spark):
    q = """
    PREFIX p: <urn:p:>
    PREFIX t: <urn:t:>
    SELECT ?y WHERE { ?x p:knows ?y . FILTER NOT EXISTS { ?y a t:Thing . } }
    """
    out = {r["y"] for r in sparql_select(_edges(spark), q).collect()}
    assert out == {"b2"}


def test_sparql_exists_composes_with_filter_and_bind(spark):
    q = """
    PREFIX p: <urn:p:>
    SELECT ?y ?tag WHERE {
        ?x p:knows ?y . ?y p:name ?n .
        FILTER EXISTS { ?y p:name ?any . }
        BIND(CONCAT(?y, "/", ?n) AS ?tag)
        FILTER(strstarts(?tag, "b2"))
    }
    """
    out = {(r["y"], r["tag"]) for r in sparql_select(_edges(spark), q).collect()}
    assert out == {("b2", "b2/Bee Two")}


def test_sparql_exists_disconnected_raises(spark):
    q = """
    PREFIX p: <urn:p:>
    SELECT ?x WHERE { ?x p:knows ?y . FILTER EXISTS { ?u p:name ?v . } }
    """
    with pytest.raises(ValueError, match="shares no variables"):
        sparql_select(_edges(spark), q).collect()


def test_sparql_bind_expression_and_errors(spark):
    q = """
    PREFIX p: <urn:p:>
    SELECT ?x ?len WHERE { ?x p:name ?n . BIND(LENGTH(?n) AS ?len) }
    """
    out = {(r["x"], r["len"]) for r in sparql_select(_edges(spark), q).collect()}
    assert out == {("b1", 7), ("b2", 7)}
    with pytest.raises(SparqlError, match="reassigns"):
        sparql_select(
            _edges(spark),
            "SELECT ?x WHERE { ?x <urn:p:name> ?n . BIND(?n AS ?x) }",
        )
    with pytest.raises(SparqlError, match="unbound"):
        sparql_select(
            _edges(spark),
            "SELECT ?x WHERE { ?x <urn:p:name> ?n . BIND(LENGTH(?zzz) AS ?l) }",
        )
    with pytest.raises(SparqlError, match="BIND"):
        sparql_select(
            _edges(spark),
            "SELECT ?x WHERE { ?x <urn:p:name> ?n . BIND(?n) }",
        )


def test_sparql_select_distinct(spark):
    # two knows-edges land on the same predicate — DISTINCT collapses them
    q = """
    PREFIX p: <urn:p:>
    SELECT DISTINCT ?p WHERE { ?x p:knows ?y . ?y ?p ?z . }
    """
    rows = sparql_select(_edges(spark), q).collect()
    assert sorted(r["p"] for r in rows) == [
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "urn:p:name",
    ]
    # without DISTINCT the bag keeps duplicates
    q_bag = q.replace("DISTINCT ", "")
    assert len(sparql_select(_edges(spark), q_bag).collect()) == 3


def test_sparql_ask_supports_exists(spark):
    from semargl_spark.operators.sparql import sparql_ask

    assert sparql_ask(_edges(spark), """
        PREFIX p: <urn:p:>
        ASK { ?x p:knows ?y . FILTER NOT EXISTS { ?y a <urn:t:Thing> . } }
    """) is True


def test_sparql_subquery_aggregated(spark):
    # per-?y outgoing-edge count computed in a subquery, joined to the
    # outer knows-pattern on the shared projected variable ?y
    q = """
    PREFIX p: <urn:p:>
    SELECT ?x ?y ?n WHERE {
        ?x p:knows ?y .
        { SELECT ?y (COUNT(*) AS ?n) WHERE { ?y ?q ?z . } GROUP BY ?y }
    }
    """
    out = {(r["x"], r["y"], r["n"]) for r in sparql_select(_edges(spark), q).collect()}
    assert out == {("a1", "b1", 2), ("a2", "b2", 1)}


def test_sparql_subquery_with_modifiers_and_filter(spark):
    # subquery carries its own ORDER BY/LIMIT; outer FILTER still applies
    q = """
    PREFIX p: <urn:p:>
    SELECT ?x ?y WHERE {
        ?x p:knows ?y .
        { SELECT ?y WHERE { ?y p:name ?n . } ORDER BY ?y LIMIT 1 }
        FILTER(?x != "zzz")
    }
    """
    out = {(r["x"], r["y"]) for r in sparql_select(_edges(spark), q).collect()}
    assert out == {("a1", "b1")}


def test_sparql_subquery_disconnected_raises(spark):
    q = """
    PREFIX p: <urn:p:>
    SELECT ?x WHERE {
        ?x p:knows ?y .
        { SELECT ?u WHERE { ?u p:name ?v . } }
    }
    """
    with pytest.raises(SparqlError, match="shares no variables"):
        sparql_select(_edges(spark), q)


def test_sparql_subquery_inside_optional_raises(spark):
    q = """
    PREFIX p: <urn:p:>
    SELECT ?x WHERE {
        ?x p:knows ?y .
        OPTIONAL { { SELECT ?y WHERE { ?y p:name ?n . } } }
    }
    """
    with pytest.raises(SparqlError):
        sparql_select(_edges(spark), q)


def test_sparql_filter_with_aggregates(spark):
    q = """
    PREFIX p: <urn:p:>
    SELECT ?p (COUNT(*) AS ?n) WHERE {
        ?x ?p ?y . FILTER(strstarts(?y, "Bee"))
    } GROUP BY ?p
    """
    out = {(r["p"], r["n"]) for r in sparql_select(_edges(spark), q).collect()}
    assert out == {("urn:p:name", 2)}


def test_sparql_group_concat_and_sample(spark):
    q = """
    PREFIX p: <urn:p:>
    SELECT ?x (GROUP_CONCAT(?n; SEPARATOR=",") AS ?names)
              (SAMPLE(?n) AS ?one)
    WHERE { ?x p:knows ?y . ?y p:name ?n . } GROUP BY ?x
    """
    out = {(r["x"], r["names"], r["one"])
           for r in sparql_select(_edges(spark), q).collect()}
    assert out == {("a1", "Bee One", "Bee One"), ("a2", "Bee Two", "Bee Two")}
    # DISTINCT + default separator
    q2 = """
    PREFIX p: <urn:p:>
    SELECT (GROUP_CONCAT(DISTINCT ?n) AS ?all) WHERE { ?y p:name ?n . }
    """
    rows = sparql_select(_edges(spark), q2).collect()
    assert rows[0]["all"] == "Bee One Bee Two"


def test_sparql_describe_where(spark):
    from semargl_spark.operators.sparql import sparql_describe

    out = sparql_describe(_edges(spark), """
        PREFIX p: <urn:p:>
        DESCRIBE ?y WHERE { ?x p:knows ?y . ?y a <urn:t:Thing> . }
    """)
    got = {(r["src"], r["pred"], r["dst"]) for r in out.collect()}
    assert got == {
        ("a1", "urn:p:knows", "b1"),
        ("b1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "urn:t:Thing"),
        ("b1", "urn:p:name", "Bee One"),
    }


def test_sparql_update_insert_delete_data(spark):
    from semargl_spark.operators.sparql import sparql_update

    out = sparql_update(_edges(spark), """
        PREFIX p: <urn:p:>
        INSERT DATA { <a3> p:knows <b3> . <a3> p:knows <b3> } ;
        DELETE DATA { <a1> p:knows <b1> }
    """)
    got = {(r["src"], r["pred"], r["dst"]) for r in out.collect()}
    assert ("a3", "urn:p:knows", "b3") in got
    assert ("a1", "urn:p:knows", "b1") not in got
    # set semantics: the duplicated INSERT DATA triple lands once
    assert len(got) == 5


def test_sparql_update_modify_sees_pre_state(spark):
    from semargl_spark.operators.sparql import sparql_update

    # edge reversal: DELETE and INSERT templates both instantiate
    # against the PRE-update state, so a1→b1 becomes b1→a1 (not both
    # deleted, not re-reversed)
    out = sparql_update(_edges(spark), """
        PREFIX p: <urn:p:>
        DELETE { ?a p:knows ?b } INSERT { ?b p:knows ?a }
        WHERE { ?a p:knows ?b }
    """)
    got = {(r["src"], r["pred"], r["dst"]) for r in out.collect()}
    assert ("b1", "urn:p:knows", "a1") in got
    assert ("b2", "urn:p:knows", "a2") in got
    assert ("a1", "urn:p:knows", "b1") not in got
    assert len(got) == 5


def test_sparql_update_delete_where_and_filter(spark):
    from semargl_spark.operators.sparql import sparql_update

    out = sparql_update(_edges(spark), """
        PREFIX p: <urn:p:>
        DELETE WHERE { ?a p:knows ?b . ?b a <urn:t:Thing> . }
    """)
    got = {(r["src"], r["pred"], r["dst"]) for r in out.collect()}
    # only the a1→b1 knows edge matched (b1 is typed); the type and
    # name edges stay — DELETE WHERE deletes the instantiated
    # template triples, not the whole solution's bindings
    assert ("a1", "urn:p:knows", "b1") not in got
    assert ("b1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "urn:t:Thing") not in got
    assert ("a2", "urn:p:knows", "b2") in got
    f = sparql_update(_edges(spark), """
        PREFIX p: <urn:p:>
        INSERT { ?a p:greets ?n } WHERE {
            ?a p:knows ?b . ?b p:name ?n . FILTER(regex(?n, "One$"))
        }
    """)
    gf = {(r["src"], r["pred"], r["dst"]) for r in f.collect()}
    assert ("a1", "urn:p:greets", "Bee One") in gf
    assert ("a2", "urn:p:greets", "Bee Two") not in gf


def test_sparql_update_errors_and_plan_shape(spark):
    import pytest as _pytest

    from semargl_spark.operators.sparql import SparqlError, sparql_update

    e = _edges(spark)
    with _pytest.raises(SparqlError):
        sparql_update(e, "INSERT DATA { ?v <urn:p:x> <urn:o> }")
    with _pytest.raises(SparqlError):
        sparql_update(e, "DROP GRAPH <urn:g>")
    with _pytest.raises(SparqlError):
        sparql_update(e, "INSERT DATA { }")
    out = sparql_update(e, """
        PREFIX p: <urn:p:>
        DELETE { ?a p:knows ?b } INSERT { ?b p:knows ?a }
        WHERE { ?a p:knows ?b } ;
        DELETE DATA { <a9> p:x <b9> }
    """)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan, plan


def test_sparql_update_differential_vs_set_mirror(spark):
    """Seeded random graphs: sparql_update's Modify must equal the
    plain Python set-semantics mirror (delete ∖, insert ∪, both
    instantiated against the pre-state), at any partitioning."""
    import random

    from semargl_spark.operators.sparql import sparql_update

    rng = random.Random(42)
    nodes = [f"n{i}" for i in range(8)]
    preds = ["urn:p:knows", "urn:p:likes"]
    q = """
        PREFIX p: <urn:p:>
        DELETE { ?a p:knows ?b } INSERT { ?b p:likes ?a }
        WHERE { ?a p:knows ?b }
    """
    for trial in range(4):
        edges = {
            (rng.choice(nodes), rng.choice(preds), rng.choice(nodes))
            for _ in range(rng.randint(0, 25))
        }
        sol = {(s, o) for (s, p, o) in edges if p == "urn:p:knows"}
        expect = (edges - {(a, "urn:p:knows", b) for a, b in sol}) | {
            (b, "urn:p:likes", a) for a, b in sol
        }
        df = spark.createDataFrame(
            sorted(edges) or [("x", "y", "z")][:0],
            "src string, pred string, dst string",
        ) if edges else spark.createDataFrame(
            [], "src string, pred string, dst string"
        )
        got = {
            (r["src"], r["pred"], r["dst"])
            for r in sparql_update(df.repartition(5), q).collect()
        }
        assert got == expect, f"trial {trial}"


# --- path sugar: sequences, negated property sets, zero-length ---


def _chain_edges(spark):
    rows = [
        ("a", "urn:p:knows", "b"), ("b", "urn:p:knows", "c"),
        ("b", "urn:r", "x"), ("c", "urn:r", "y"), ("x", "urn:t", "z"),
    ]
    return spark.createDataFrame(rows, "src string, pred string, dst string")


def test_sparql_sequence_path(spark):
    q = """
    PREFIX u: <urn:>
    SELECT ?s ?o WHERE { ?s u:p:knows/u:r ?o . }
    """
    out = {(r["s"], r["o"]) for r in
           sparql_select(_chain_edges(spark), q).collect()}
    assert out == {("a", "x"), ("b", "y")}


def test_sparql_sequence_inverse_step_and_star_projection(spark):
    # r then inverse-r: every node with an r edge maps back to itself
    q = "SELECT ?s ?o WHERE { ?s <urn:r>/^<urn:r> ?o . }"
    out = {(r["s"], r["o"]) for r in
           sparql_select(_chain_edges(spark), q).collect()}
    assert out == {("b", "b"), ("c", "c")}
    # SELECT * never leaks the internal __seq helper variables
    cols = sparql_select(
        _chain_edges(spark),
        "SELECT * WHERE { ?s <urn:p:knows>/<urn:r> ?o . }",
    ).columns
    assert sorted(cols) == ["o", "s"]


def test_sparql_sequence_composes_with_bgp_and_filter(spark):
    q = """
    SELECT ?s ?o WHERE {
        ?s <urn:p:knows>/<urn:r> ?o . ?o <urn:t> ?z .
        FILTER(?s != "b")
    }
    """
    out = {(r["s"], r["o"]) for r in
           sparql_select(_chain_edges(spark), q).collect()}
    assert out == {("a", "x")}


def test_sparql_negated_property_set(spark):
    q = "SELECT ?s ?o WHERE { ?s !(<urn:p:knows>|<urn:r>) ?o . }"
    out = {(r["s"], r["o"]) for r in
           sparql_select(_chain_edges(spark), q).collect()}
    assert out == {("x", "z")}
    # single-member form
    q1 = "SELECT ?s ?o WHERE { ?s !<urn:p:knows> ?o . }"
    out1 = {(r["s"], r["o"]) for r in
            sparql_select(_chain_edges(spark), q1).collect()}
    assert out1 == {("b", "x"), ("c", "y"), ("x", "z")}


def test_sparql_path_star_and_opt_zero_length(spark):
    star = sparql_select(
        _chain_edges(spark),
        "SELECT ?x ?y ?hops WHERE { ?x <urn:p:knows>* ?y . }",
    )
    rows = {(r["x"], r["y"], r["hops"]) for r in star.collect()}
    # zero-length pairs cover EVERY term of the graph, not just the
    # predicate subgraph (SPARQL 1.1 zero-length path semantics)
    assert ("z", "z", 0) in rows and ("y", "y", 0) in rows
    assert ("a", "c", 2) in rows and ("a", "b", 1) in rows
    opt = sparql_select(
        _chain_edges(spark),
        "SELECT ?x ?y ?hops WHERE { ?x <urn:p:knows>? ?y . }",
    )
    orows = {(r["x"], r["y"], r["hops"]) for r in opt.collect()}
    assert ("a", "b", 1) in orows and ("a", "c", 2) not in orows
    assert ("z", "z", 0) in orows


def test_sparql_path_zero_k_constant_subject(spark):
    out = sparql_select(
        _chain_edges(spark),
        'SELECT ?y ?hops WHERE { <a> <urn:p:knows>{0,2} ?y . }',
    )
    rows = {(r["y"], r["hops"]) for r in out.collect()}
    # the constant end contributes exactly its own zero-length pair
    assert rows == {("a", 0), ("b", 1), ("c", 2)}


def test_sparql_path_sugar_errors(spark):
    e = _chain_edges(spark)
    with pytest.raises(SparqlError, match="inverse members"):
        sparql_select(e, "SELECT ?s ?o WHERE { ?s !(^<urn:r>) ?o . }")
    with pytest.raises(SparqlError, match="closure or negation"):
        sparql_select(e, "SELECT ?s ?o WHERE { ?s <urn:r>/<urn:t>+ ?o . }")
    with pytest.raises(SparqlError, match="main WHERE group"):
        sparql_select(
            e,
            "SELECT ?s ?o WHERE { OPTIONAL { ?s <urn:a>/<urn:b> ?o } "
            "?s <urn:r> ?o . }",
        )


def test_sparql_offset_pagination(spark):
    rows = [(f"s{i:02d}", "urn:p", f"o{i:02d}") for i in range(10)]
    e = spark.createDataFrame(rows, "src string, pred string, dst string")
    out = sparql_select(
        e, "SELECT ?a ?b WHERE { ?a <urn:p> ?b . } ORDER BY ?a LIMIT 3 OFFSET 4"
    ).collect()
    assert [(r["a"], r["b"]) for r in out] == [
        ("s04", "o04"), ("s05", "o05"), ("s06", "o06")
    ]
    # OFFSET 0 is a no-op; OFFSET without ORDER BY raises
    assert len(sparql_select(
        e, "SELECT ?a WHERE { ?a <urn:p> ?b . } ORDER BY ?a LIMIT 2 OFFSET 0"
    ).collect()) == 2
    with pytest.raises(SparqlError, match="OFFSET requires ORDER BY"):
        sparql_select(e, "SELECT ?a WHERE { ?a <urn:p> ?b . } OFFSET 2")


def test_sparql_filter_inside_optional_leftjoin_semantics(spark):
    e = spark.createDataFrame(
        [("a1", "urn:p:knows", "b1"), ("a2", "urn:p:knows", "b2"),
         ("b1", "urn:p:score", "9"), ("b2", "urn:p:score", "3")],
        "src string, pred string, dst string")
    out = {(r["y"], r["s"]) for r in sparql_select(e, """
        PREFIX p: <urn:p:>
        SELECT ?y ?s WHERE {
            ?x p:knows ?y .
            OPTIONAL { ?y p:score ?s . FILTER(?s > "5") }
        }
    """).collect()}
    # b2's score fails the filter → the row SURVIVES with NULL (a post
    # join WHERE would drop it)
    assert out == {("b1", "9"), ("b2", None)}
    # a filter over a variable the group does not bind raises
    with pytest.raises(ValueError, match="does not bind"):
        sparql_select(e, """
            PREFIX p: <urn:p:>
            SELECT ?y ?s WHERE {
                ?x p:knows ?y .
                OPTIONAL { ?y p:score ?s . FILTER(?x != "a1") }
            }
        """).collect()
    # FILTER inside MINUS still raises cleanly
    with pytest.raises(SparqlError, match="FILTER inside MINUS"):
        sparql_select(e, """
            PREFIX p: <urn:p:>
            SELECT ?x WHERE {
                ?x p:knows ?y .
                MINUS { ?y p:score ?s . FILTER(?s > "5") }
            }
        """)


def test_sparql_negation_by_failure_and_bound(spark):
    e = spark.createDataFrame(
        [("a1", "urn:p:knows", "b1"), ("a2", "urn:p:knows", "b2"),
         ("b1", "urn:p:score", "9")],
        "src string, pred string, dst string")
    # !bound: pairs whose target lacks a score
    out = {r["y"] for r in sparql_select(e, """
        PREFIX p: <urn:p:>
        SELECT ?y WHERE {
            ?x p:knows ?y . OPTIONAL { ?y p:score ?s . }
            FILTER(!bound(?s))
        }
    """).collect()}
    assert out == {"b2"}
    # bound: the complement
    out2 = {r["y"] for r in sparql_select(e, """
        PREFIX p: <urn:p:>
        SELECT ?y WHERE {
            ?x p:knows ?y . OPTIONAL { ?y p:score ?s . }
            FILTER(bound(?s))
        }
    """).collect()}
    assert out2 == {"b1"}
    # a non-bound outer filter over a NULL-padded optional var drops
    # the row (SPARQL error -> false)
    out3 = {r["y"] for r in sparql_select(e, """
        PREFIX p: <urn:p:>
        SELECT ?y WHERE {
            ?x p:knows ?y . OPTIONAL { ?y p:score ?s . }
            FILTER(?s > "5")
        }
    """).collect()}
    assert out3 == {"b1"}


def test_sparql_aggregate_over_optional_counts_nulls_as_zero(spark):
    e = spark.createDataFrame(
        [("a1", "urn:p:knows", "b1"), ("a1", "urn:p:knows", "b2"),
         ("a2", "urn:p:knows", "b3"),
         ("b1", "urn:p:score", "9"), ("b1", "urn:p:score", "7")],
        "src string, pred string, dst string")
    out = {r["x"]: r["n"] for r in sparql_select(e, """
        PREFIX p: <urn:p:>
        SELECT ?x (COUNT(?s) AS ?n) WHERE {
            ?x p:knows ?y . OPTIONAL { ?y p:score ?s . }
        } GROUP BY ?x
    """).collect()}
    # a1: b1 matches twice + b2 pads NULL -> 2; a2: only NULL -> 0
    assert out == {"a1": 2, "a2": 0}
    # aggregates over MINUS still raise
    with pytest.raises(SparqlError, match="MINUS"):
        sparql_select(e, """
            PREFIX p: <urn:p:>
            SELECT ?x (COUNT(?y) AS ?n) WHERE {
                ?x p:knows ?y . MINUS { ?y p:score ?s . }
            } GROUP BY ?x
        """)


def test_sparql_path_min_hop_window(spark):
    # chain a->b->c->d: {2,3} keeps only pairs at shortest distance 2..3
    e = spark.createDataFrame(
        [("a", "urn:k", "b"), ("b", "urn:k", "c"), ("c", "urn:k", "d")],
        "src string, pred string, dst string")
    out = {(r["x"], r["y"], r["hops"]) for r in sparql_select(
        e, "SELECT ?x ?y ?hops WHERE { ?x <urn:k>{2,3} ?y . }").collect()}
    assert out == {("a", "c", 2), ("b", "d", 2), ("a", "d", 3)}
    with pytest.raises(SparqlError, match="empty path bound"):
        sparql_select(e, "SELECT ?x ?y WHERE { ?x <urn:k>{3,2} ?y . }")
    # NPS with a closure suffix raises instead of matching everything
    with pytest.raises(SparqlError, match="closure suffix"):
        sparql_select(e, "SELECT ?s ?o WHERE { ?s !<urn:k>+ ?o . }")


def test_select_count_distinct_aggregate(spark):
    edges = spark.createDataFrame(
        [("a", "p", "x"), ("a", "p", "y"), ("b", "p", "x"), ("a", "q", "x")],
        "src string, pred string, dst string",
    )
    rows = sparql_select(edges, """
        SELECT ?p (COUNT(DISTINCT ?a) AS ?nsrc) (COUNT(*) AS ?n)
        WHERE { ?a ?p ?b . } GROUP BY ?p ORDER BY ?p
    """).collect()
    assert [(r["p"], r["nsrc"], r["n"]) for r in rows] == [("p", 2, 3), ("q", 1, 1)]


def test_cbd_bnode_closure_depth_and_cycle(spark):
    from semargl_spark.operators.sparql import concise_bounded_description

    rows = [
        # e1 → b1 → b2 chain, plus a literal at each level
        ("urn:e:1", "urn:p:addr", "_:b1", "bnode"),
        ("urn:e:1", "urn:p:name", "one", "literal"),
        ("_:b1", "urn:p:city", "c", "literal"),
        ("_:b1", "urn:p:geo", "_:b2", "bnode"),
        ("_:b2", "urn:p:lat", "9", "literal"),
        # bnode cycle hanging off e2: must terminate
        ("urn:e:2", "urn:p:x", "_:c1", "bnode"),
        ("_:c1", "urn:p:y", "_:c2", "bnode"),
        ("_:c2", "urn:p:z", "_:c1", "bnode"),
        # unrelated resource: excluded
        ("urn:e:3", "urn:p:name", "three", "literal"),
        # IRI object: NOT followed (CBD follows bnodes only)
        ("urn:e:1", "urn:p:knows", "urn:e:3", "iri"),
    ]
    st = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_kind string"
    )
    got = {(r["subj"], r["pred"], r["obj"])
           for r in concise_bounded_description(st, ["urn:e:1"]).collect()}
    assert got == {
        ("urn:e:1", "urn:p:addr", "_:b1"),
        ("urn:e:1", "urn:p:name", "one"),
        ("urn:e:1", "urn:p:knows", "urn:e:3"),
        ("_:b1", "urn:p:city", "c"),
        ("_:b1", "urn:p:geo", "_:b2"),
        ("_:b2", "urn:p:lat", "9"),
    }
    both = concise_bounded_description(st, ["urn:e:1", "urn:e:2"])
    assert both.count() == 9  # + e2's edge and the 2-cycle, once each

    import pytest
    with pytest.raises(RuntimeError, match="max_depth"):
        concise_bounded_description(st, ["urn:e:1"], max_depth=1)
