"""NTriples/NQuads kernel unit tests.

Modeled on the reference's conformance strategy (SURVEY.md §5): parse →
compare statement sets; error cases recover without aborting
(NTriplesParser.java:92-103)."""

from semargl_spark.kernels import ntriples as nt
from semargl_spark.kernels.model import Triple
from semargl_spark.kernels.serialize import render_ntriple, render_nquad


def test_basic_triples():
    doc = (
        "<urn:s:1> <urn:p:a> <urn:o:1> .\n"
        '<urn:s:1> <urn:p:b> "plain" .\n'
        '<urn:s:1> <urn:p:c> "tagged"@en-US .\n'
        '<urn:s:1> <urn:p:d> "5"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
    )
    ts, errs = nt.parse(doc)
    assert errs == []
    assert [t.obj_kind for t in ts] == ["iri", "literal", "literal", "literal"]
    assert ts[2].lang == "en-US"
    assert ts[3].dtype == "http://www.w3.org/2001/XMLSchema#integer"


def test_comments_and_whitespace():
    doc = "# header\n\t <urn:s> <urn:p> <urn:o> . # not-a-comment-midline\n"
    ts, errs = nt.parse(doc)
    # midline '#' after '.' starts a comment per the outside-state FSM
    assert len(ts) == 1 and errs == []


def test_unescaping():
    doc = '<urn:s> <urn:p> "a\\tb\\n\\"q\\"\\u00e9\\U0001F600" .'
    ts, errs = nt.parse(doc)
    assert errs == []
    assert ts[0].obj == 'a\tb\n"q"é\U0001F600'


def test_bnode_relabeling_deterministic():
    doc = "_:x <urn:p:a> _:y .\n_:y <urn:p:b> _:x ."
    ts1, _ = nt.parse(doc, doc_key="c1_0")
    ts2, _ = nt.parse(doc, doc_key="c1_0")
    assert ts1 == ts2
    assert ts1[0].subj == "_:bc1_0_n0"
    assert ts1[0].obj == "_:bc1_0_n1"
    assert ts1[1].subj == "_:bc1_0_n1" and ts1[1].obj == "_:bc1_0_n0"


def test_error_recovery_skips_to_next_dot():
    doc = '<urn:a> <urn:b> bad token . <urn:a> <urn:b> <urn:c> .'
    ts, errs = nt.parse(doc)
    assert len(errs) == 1
    assert len(ts) == 1 and ts[0].obj == "urn:c"


def test_malformed_never_raises_with_recovery():
    ts, errs = nt.parse('<urn:broken "oops')
    assert ts == [] and len(errs) == 1


def test_no_recovery_raises():
    import pytest

    with pytest.raises(nt.ParseError):
        nt.parse("garbage", recover=False)


def test_nquads_graph_term():
    doc = (
        '<urn:s> <urn:p> "lit"@en <urn:g> .\n'
        "<urn:s> <urn:p> <urn:o> .\n"
        "_:b <urn:p> <urn:o> _:g .\n"
    )
    ts, errs = nt.parse_nquads(doc, doc_key="k")
    assert errs == []
    assert ts[0].graph == "urn:g"
    assert ts[1].graph is None
    assert ts[2].graph == "_:bk_n1"


def test_literal_not_graph_label():
    ts, errs = nt.parse_nquads('<urn:s> <urn:p> <urn:o> "g" .')
    assert ts == [] and len(errs) == 1


def test_serializer_roundtrip():
    doc = '<urn:s> <urn:p> "caf\\u00e9\\n"@fr .\n_:b <urn:p> <urn:o> <urn:g> .'
    ts, _ = nt.parse_nquads(doc, doc_key="k")
    rendered = "\n".join(render_nquad(t) for t in ts)
    ts2, errs = nt.parse_nquads(rendered, doc_key="k")
    assert errs == []
    assert ts2 == ts


def test_emit_before_missing_dot_matches_reference():
    # the reference emits at the 3rd term and reports the missing '.' at
    # endStream (NTriplesParser.java:243-255,328-333)
    ts, errs = nt.parse("<urn:s> <urn:p> <urn:o>")
    assert len(ts) == 1 and errs == ["Unexpected end of stream"]
