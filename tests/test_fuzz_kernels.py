"""Fuzz tests (hypothesis): with recover=True the parser kernels must
NEVER raise on arbitrary input (reference error-recovery contract E10,
NTriplesParser.java:92-103), and every emitted statement field must be
str-or-None — a non-string leaking into a Triple would crash Arrow
serialization task-side in mapInArrow (the failure class fixed for
non-scalar JSON-LD @value)."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from semargl_spark.kernels import jsonld, ntriples, rdfa, rdfxml
from semargl_spark.kernels.model import Triple

_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300
)
# structure-shaped fragments raise the odds of reaching deep parser paths
_spiced = st.one_of(
    _text,
    st.sampled_from(
        [
            '<a> <b> "x"@',
            '<urn:a> <urn:b> "x"^^<urn:t> . garbage',
            '{"@context": {"p": null}, "@id": 5, "p": [{"@value": {}}]}',
            '{"@context": [null, {"@language": 7}], "@graph": [{"@list": 1}]}',
            '<div xmlns="http://www.w3.org/1999/xhtml" prefix="x:">< /div>',
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
            '<rdf:li rdf:about="x"><rdf:RDF/></rdf:li>',
            '<svg><metadata><rdf:RDF></metadata>',
            "﻿<?xml version='1.0'?><rdf:RDF",
        ]
    ),
    st.dictionaries(
        st.sampled_from(["@id", "@context", "@value", "@list", "@graph", "p"]),
        st.recursive(
            st.one_of(st.none(), st.booleans(), st.integers(), st.floats(allow_nan=False), _text),
            lambda c: st.lists(c, max_size=3) | st.dictionaries(st.sampled_from(["@id", "@type", "@value", "q"]), c, max_size=3),
            max_leaves=8,
        ),
        max_size=4,
    ).map(json.dumps),
)


def _assert_clean(stmts, errs):
    assert isinstance(stmts, list) and isinstance(errs, list)
    for t in stmts:
        assert isinstance(t, Triple)
        for field in t:
            assert field is None or isinstance(field, str), t
    for e in errs:
        assert isinstance(e, str)


@settings(max_examples=400, deadline=None)
@given(_spiced)
def test_ntriples_never_raises(text):
    _assert_clean(*ntriples.parse(text, doc_key="f"))
    _assert_clean(*ntriples.parse_nquads(text, doc_key="f"))


@settings(max_examples=400, deadline=None)
@given(_spiced)
def test_jsonld_never_raises(text):
    _assert_clean(*jsonld.parse(text, base_uri="urn:d:1", doc_key="f"))


@settings(max_examples=300, deadline=None)
@given(_spiced)
def test_rdfa_never_raises(text):
    _assert_clean(*rdfa.parse(text, base_uri="urn:d:1", doc_key="f"))


@settings(max_examples=300, deadline=None)
@given(_spiced)
def test_rdfxml_never_raises(text):
    _assert_clean(*rdfxml.parse(text, base_uri="urn:d:1", doc_key="f"))


# --------------------------------------------------------------- fuzzy link


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _del_variants_py(s: str) -> set:
    return {s} | {s[:i] + s[i + 1:] for i in range(len(s))}


@given(st.text(min_size=0, max_size=12), st.text(min_size=0, max_size=12))
@settings(max_examples=300, deadline=None)
def test_deletion_blocking_is_complete_for_distance_1(a, b):
    """The SymSpell candidate generator in operators/link.py must never
    MISS a true distance-1 pair: lev(a,b) <= 1 implies the deletion
    neighborhoods intersect (the converse is filtered by the exact
    levenshtein verify, so over-generation is harmless)."""
    if _lev(a, b) <= 1:
        assert _del_variants_py(a) & _del_variants_py(b)


_TRIG_SPICE = st.sampled_from(
    [
        "@prefix ex: <urn:ex:> . GRAPH ex:g { ex:a ex:p ",
        "GRAPH { oops }",
        "ex:g { ex:a ex:p 1 ",
        "{ [ <urn:p> ( 1 2 ] ) }",
        "[] { _:x <urn:p> '''a''' @en ",
        "GRAPH [ <urn:a> <urn:b> { } . }",
        "<urn:g> { <urn:a> <urn:b> 1.5e }",
        "@prefix : <u> . :a :b :c } { .",
    ]
)


@settings(max_examples=300, deadline=None)
@given(st.one_of(_spiced, _TRIG_SPICE))
def test_turtle_and_trig_never_raise(text):
    from semargl_spark.kernels import turtle_read

    _assert_clean(*turtle_read.parse(text, doc_key="f"))
    _assert_clean(*turtle_read.parse_trig(text, doc_key="f"))
