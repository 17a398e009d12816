"""Property-based robustness for the SPARQL front-end's pure parsing
helpers: any input either parses or raises SparqlError — never a
foreign exception (IndexError/TypeError/RecursionError) and never a
hang. No Spark needed; these run the driver-side parsing layer only.
"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from semargl_spark.operators.sparql import (
    SparqlError,
    _filter_to_sql,
    _parse_path,
    _parse_values,
    _patterns,
    _split_filter,
    _split_statements,
    _term,
    _tokenize_triple,
)

PREFIXES = {"p": "urn:p:", "dc": "http://purl.org/dc/terms/"}

# printable text with the delimiters the tokenizers care about
_delims = st.text(
    alphabet=string.ascii_letters + string.digits + ' .?:<>"\\{}()|^+-',
    max_size=80,
)


def _only_sparql_errors(fn, *args):
    try:
        fn(*args)
    except SparqlError:
        pass  # the contract: malformed input raises THIS type
    # any other exception type propagates and fails the test


@given(_delims)
@settings(max_examples=300, deadline=None)
def test_split_statements_total(body):
    # must terminate and preserve every non-delimiter character
    parts = _split_statements(body)
    assert isinstance(parts, list)


@given(_delims)
@settings(max_examples=300, deadline=None)
def test_patterns_raise_only_sparql_errors(body):
    _only_sparql_errors(_patterns, body, PREFIXES)


@given(_delims)
@settings(max_examples=300, deadline=None)
def test_tokenize_raise_only_sparql_errors(stmt):
    _only_sparql_errors(_tokenize_triple, stmt)


@given(_delims)
@settings(max_examples=300, deadline=None)
def test_split_filter_total(body):
    _only_sparql_errors(_split_filter, body)


@given(_delims)
@settings(max_examples=300, deadline=None)
def test_term_and_path_raise_only_sparql_errors(tok):
    _only_sparql_errors(_term, tok, PREFIXES)
    _only_sparql_errors(_parse_path, tok, PREFIXES)


@given(_delims, _delims)
@settings(max_examples=200, deadline=None)
def test_parse_values_raise_only_sparql_errors(vars_tok, data):
    _only_sparql_errors(_parse_values, vars_tok, data, PREFIXES)


@given(_delims)
@settings(max_examples=200, deadline=None)
def test_filter_to_sql_total(expr):
    # pure rewriting — must terminate on anything
    assert isinstance(_filter_to_sql(expr), str)


def test_patterns_roundtrip_well_formed():
    # well-formed bodies parse to exactly their triples
    body = """
        ?s p:knows ?o . ?o <http://ex.org/v1.0/p> "lit with . dot" .
        ?o dc:relation ?x .
    """
    pats = _patterns(body, PREFIXES)
    assert pats == [
        ("?s", "urn:p:knows", "?o"),
        ("?o", "http://ex.org/v1.0/p", "lit with . dot"),
        ("?o", "http://purl.org/dc/terms/relation", "?x"),
    ]


@given(_delims)
@settings(max_examples=300, deadline=None)
def test_split_ops_total_and_balanced(q):
    from semargl_spark.operators.sparql import _split_ops

    ops = _split_ops(q)
    assert isinstance(ops, list)
    # no op loses brace-balanced content: rejoining covers the input
    # minus only top-level semicolons and whitespace
    assert sum(len(o) for o in ops) <= len(q)


@given(_delims)
@settings(max_examples=200, deadline=None)
def test_const_triples_raise_only_sparql_errors(body):
    from semargl_spark.operators.sparql import _const_triples

    _only_sparql_errors(_const_triples, body, PREFIXES)


@given(_delims)
@settings(max_examples=300, deadline=None)
def test_rewrite_sugar_raise_only_sparql_errors(body):
    from semargl_spark.operators.sparql import _rewrite_sugar

    _only_sparql_errors(_rewrite_sugar, body, PREFIXES)


@given(_delims)
@settings(max_examples=300, deadline=None)
def test_split_seq_total(tok):
    from semargl_spark.operators.sparql import _split_seq

    # pure splitter: never raises, preserves non-separator content
    out = _split_seq(tok + "/x")
    assert out is None or all(isinstance(s, str) for s in out)


# slash/bang-heavy alphabet aimed at the sugar grammar specifically
_sugar = st.text(
    alphabet=string.ascii_letters + ':<>/!|^?*+(){}0123456789 ',
    max_size=60,
)


@given(_sugar)
@settings(max_examples=400, deadline=None)
def test_sugar_alphabet_raise_only_sparql_errors(body):
    from semargl_spark.operators.sparql import _parse_path, _rewrite_sugar

    _only_sparql_errors(_rewrite_sugar, body, PREFIXES)
    _only_sparql_errors(_parse_path, body, PREFIXES)


def test_rewrite_sugar_roundtrip_well_formed():
    from semargl_spark.operators.sparql import _patterns, _rewrite_sugar

    body, fs, sugared = _rewrite_sugar(
        "?s p:a/p:b ?o . ?s !(p:a|dc:x) ?z . ?s p:a ?w", PREFIXES
    )
    assert sugared and len(fs) == 2
    pats = _patterns(body, PREFIXES)
    # 2 chained + 1 nps + 1 plain = 4 patterns
    assert len(pats) == 4
    # helper variables are fresh and internal: the sequence's chain var
    # and the NPS predicate var never collide
    helper_vars = [p for pat in pats for p in pat if p.startswith("?__")]
    seq_vars = {v for v in helper_vars if v.startswith("?__seq")}
    nps_vars = {v for v in helper_vars if v.startswith("?__nps")}
    assert seq_vars and nps_vars and not (seq_vars & nps_vars)
    # two NPS statements in one body get DISTINCT predicate variables —
    # a collision would conflate their bindings through an unintended
    # equi-join
    body2, fs2, _ = _rewrite_sugar(
        "?s !(p:a) ?o . ?o !(dc:x) ?z", PREFIXES
    )
    nps2 = {tok for stmt in body2.split(" . ")
            for tok in stmt.split() if tok.startswith("?__nps")}
    assert len(nps2) == 2, (body2, fs2)
