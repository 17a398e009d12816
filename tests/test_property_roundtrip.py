"""Property-based round-trip tests (hypothesis): serialize → parse must
be the identity on the statement model, for arbitrary content including
escapes, unicode, and bnode labels."""

from hypothesis import given, settings
from hypothesis import strategies as st

from semargl_spark.kernels import ntriples
from semargl_spark.kernels.model import Triple
from semargl_spark.kernels.serialize import render_nquad, render_ntriple

_iri = st.from_regex(r"urn:[a-z]{1,8}:[A-Za-z0-9/._\-]{1,20}", fullmatch=True)
_bnode = st.from_regex(r"_:[A-Za-z][A-Za-z0-9]{0,10}", fullmatch=True)
_lang = st.from_regex(r"[a-z]{2}(-[A-Za-z0-9]{1,8})?", fullmatch=True)
# any unicode except surrogates; escaping must make it safe
_content = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
)


@st.composite
def _triples(draw):
    subj = draw(st.one_of(_iri, _bnode))
    pred = draw(_iri)
    kind = draw(st.sampled_from(["iri", "bnode", "literal"]))
    if kind == "iri":
        return Triple(subj, pred, draw(_iri), "iri", None, None, None)
    if kind == "bnode":
        return Triple(subj, pred, draw(_bnode), "bnode", None, None, None)
    content = draw(_content)
    flavor = draw(st.sampled_from(["plain", "lang", "typed"]))
    if flavor == "lang":
        return Triple(subj, pred, content, "literal", draw(_lang), None, None)
    if flavor == "typed":
        return Triple(subj, pred, content, "literal", None, draw(_iri), None)
    return Triple(subj, pred, content, "literal", None, None, None)


@settings(max_examples=300, deadline=None)
@given(st.lists(_triples(), min_size=1, max_size=8))
def test_ntriples_roundtrip(ts):
    doc = "\n".join(render_ntriple(t) for t in ts)
    parsed, errs = ntriples.parse(doc)
    assert errs == []
    # bnode labels are renamed on parse; compare modulo per-side
    # first-appearance canonicalization
    def norm(items):
        rename: dict[str, str] = {}

        def canon(label):
            return rename.setdefault(label, f"_:x{len(rename)}")

        out = []
        for t in items:
            s = canon(t.subj) if t.subj.startswith("_:") else t.subj
            o = canon(t.obj) if t.obj_kind == "bnode" else t.obj
            out.append((s, t.pred, o, t.obj_kind, t.lang, t.dtype))
        return out

    assert norm(ts) == norm(parsed)


@settings(max_examples=200, deadline=None)
@given(st.lists(_triples(), min_size=1, max_size=6), st.one_of(st.none(), _iri))
def test_nquads_roundtrip(ts, graph):
    ts = [t._replace(graph=graph) for t in ts]
    doc = "\n".join(render_nquad(t) for t in ts)
    parsed, errs = ntriples.parse_nquads(doc)
    assert errs == []
    assert [(t.obj_kind, t.lang, t.dtype, t.graph) for t in parsed] == [
        (t.obj_kind, t.lang, t.dtype, t.graph) for t in ts
    ]
    assert [t.obj for t in parsed if t.obj_kind == "literal"] == [
        t.obj for t in ts if t.obj_kind == "literal"
    ]


@settings(max_examples=200, deadline=None)
@given(st.lists(_triples(), min_size=1, max_size=8))
def test_turtle_never_emits_bare_quad_quotes(ts):
    """Multiline literals escape every inner quote (reference
    addContent), so four adjacent quotes — invalid Turtle — can never
    appear."""
    from semargl_spark.kernels import turtle

    doc = turtle.serialize(ts)
    assert '""""' not in doc
    # long-string bodies never contain an unescaped triple-quote
    for chunk in doc.split('"""')[1:-1:2]:
        assert not chunk.endswith("\\")


@settings(max_examples=150, deadline=None)
@given(st.lists(_triples(), min_size=1, max_size=6))
def test_isomorphic_invariances(ts):
    """Model isomorphism: invariant under bnode relabeling, broken by
    dropping a statement (set semantics)."""
    from semargl_spark.functions.graph_compare import isomorphic

    def relabel(t):
        s = "_:R" + t.subj[2:] if t.subj.startswith("_:") else t.subj
        o = "_:R" + t.obj[2:] if t.obj_kind == "bnode" else t.obj
        return t._replace(subj=s, obj=o)

    assert isomorphic(ts, [relabel(t) for t in ts])

    # drop one GROUND statement (bnode-free): strict subset of the set
    # semantics must not be isomorphic
    uniq = {(t.subj, t.pred, t.obj, t.obj_kind, t.lang, t.dtype): t for t in ts}
    ground = [
        t for t in uniq.values()
        if not t.subj.startswith("_:") and t.obj_kind != "bnode"
    ]
    if ground and len(uniq) > 1:
        dropped = [t for t in uniq.values() if t is not ground[0]]
        assert not isomorphic(list(uniq.values()), dropped)


_named_bnode = _bnode.filter(lambda b: not b.endswith("sbl"))
_simple_obj = st.one_of(
    _iri.map(lambda i: ("iri", i, None, None)),
    _content.map(lambda c: ("literal", c, None, None)),
    st.tuples(_content, _lang).map(lambda t: ("literal", t[0], t[1], None)),
    st.tuples(_content, _iri).map(lambda t: ("literal", t[0], None, t[1])),
)


@st.composite
def _turtle_stream(draw):
    """Triple streams honoring the serializer's shortenable-bnode
    contract (reference DocumentContext.createBnode(true)): an ``sbl``
    bnode is generated-and-never-referenced-again — it appears either as
    one contiguous subject group, or as one object mention immediately
    followed by its own property triples. Everything else is ground or
    named-bnode structure."""
    triples = []
    sbl_i = 0
    for _ in range(draw(st.integers(1, 5))):
        kind = draw(st.sampled_from(["ground", "sbl_subject", "sbl_object"]))
        if kind == "ground":
            subj = draw(st.one_of(_iri, _named_bnode))
            for _ in range(draw(st.integers(1, 3))):
                ok, ov, lang, dt = draw(
                    st.one_of(
                        _simple_obj,
                        _named_bnode.map(lambda b: ("bnode", b, None, None)),
                    )
                )
                triples.append(Triple(subj, draw(_iri), ov, ok, lang, dt, None))
        else:
            label = f"_:g{sbl_i}sbl"
            sbl_i += 1
            if kind == "sbl_object":
                triples.append(
                    Triple(draw(_iri), draw(_iri), label, "bnode", None, None, None)
                )
            n_props = draw(st.integers(1 if kind == "sbl_subject" else 0, 3))
            for _ in range(n_props):
                ok, ov, lang, dt = draw(_simple_obj)
                triples.append(Triple(label, draw(_iri), ov, ok, lang, dt, None))
    return triples


@settings(max_examples=300, deadline=None)
@given(_turtle_stream())
def test_turtle_inlining_roundtrip(ts):
    """Serialized Turtle — shortenable-bnode [...] inlining included —
    must re-parse (independent reader) to an isomorphic graph."""
    from semargl_spark.functions.graph_compare import isomorphic
    from semargl_spark.kernels import turtle

    from turtle_reader import read_turtle

    doc = turtle.serialize(ts)
    back = read_turtle(doc)
    assert isomorphic(ts, back), f"not isomorphic:\n{doc}\n{ts}\n{back}"


# ---- transitive round-trips through the markup kernels (reference
# model: multi-sink transitive testing, NTriplesParserTest.java:62-87):
# generated document → markup kernel → NT serializer → NT parser must
# land on an isomorphic graph.

from xml.sax.saxutils import escape as _xesc

_xml_text = st.text(
    alphabet=st.characters(
        min_codepoint=0x20,
        blacklist_categories=("Cs",),
        blacklist_characters="￾￿",
    ),
    max_size=20,
)


@st.composite
def _rdfa_docs(draw):
    parts = []
    for _ in range(draw(st.integers(1, 3))):
        about = f"urn:e:{draw(st.integers(0, 3))}"
        inner = []
        for _ in range(draw(st.integers(1, 3))):
            kind = draw(st.sampled_from(["prop", "rel", "role", "typeof"]))
            if kind == "prop":
                txt = _xesc(draw(_xml_text))
                inner.append(
                    f'<span property="urn:p:v{draw(st.integers(0, 2))}">{txt}</span>'
                )
            elif kind == "rel":
                inner.append(
                    f'<a rel="urn:p:r{draw(st.integers(0, 2))}" '
                    f'href="urn:e:{draw(st.integers(0, 5))}">x</a>'
                )
            elif kind == "role":
                inner.append('<span role="note">x</span>')
            else:
                txt = _xesc(draw(_xml_text))
                inner.append(
                    f'<div typeof="urn:t:T{draw(st.integers(0, 2))}">'
                    f'<span property="urn:p:q">{txt}</span></div>'
                )
        parts.append(f'<div about="{about}">{"".join(inner)}</div>')
    return (
        '<div xmlns="http://www.w3.org/1999/xhtml">' + "".join(parts) + "</div>"
    )


@settings(max_examples=150, deadline=None)
@given(_rdfa_docs())
def test_rdfa_to_ntriples_transitive_roundtrip(doc):
    from semargl_spark.functions.graph_compare import isomorphic
    from semargl_spark.kernels import rdfa

    ts, errs = rdfa.parse(doc, base_uri="urn:doc:x", doc_key="k")
    assert errs == []
    nt = "\n".join(render_ntriple(t) for t in ts)
    back, nt_errs = ntriples.parse(nt, doc_key="rt")
    assert nt_errs == []
    assert isomorphic(ts, back), f"not isomorphic:\n{doc}\n{nt}"


@st.composite
def _rdfxml_docs(draw):
    descs = []
    for i in range(draw(st.integers(1, 3))):
        if draw(st.booleans()):
            subj_attr = f'rdf:about="urn:e:{draw(st.integers(0, 3))}"'
        else:
            subj_attr = f'rdf:nodeID="n{draw(st.integers(0, 2))}"'
        props = []
        for _ in range(draw(st.integers(1, 3))):
            kind = draw(st.sampled_from(["lit", "res", "lang", "nested"]))
            p = f"ex:p{draw(st.integers(0, 2))}"
            if kind == "lit":
                props.append(f"<{p}>{_xesc(draw(_xml_text))}</{p}>")
            elif kind == "lang":
                props.append(
                    f'<{p} xml:lang="en">{_xesc(draw(_xml_text))}</{p}>'
                )
            elif kind == "res":
                props.append(
                    f'<{p} rdf:resource="urn:e:{draw(st.integers(0, 5))}"/>'
                )
            else:
                props.append(
                    f'<{p} rdf:parseType="Resource">'
                    f"<ex:q>{_xesc(draw(_xml_text))}</ex:q></{p}>"
                )
        descs.append(
            f"<rdf:Description {subj_attr}>{''.join(props)}</rdf:Description>"
        )
    return (
        '<?xml version="1.0"?>\n'
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:ex="http://ex.org/">' + "".join(descs) + "</rdf:RDF>"
    )


@settings(max_examples=150, deadline=None)
@given(_rdfxml_docs())
def test_rdfxml_to_ntriples_transitive_roundtrip(doc):
    from semargl_spark.functions.graph_compare import isomorphic
    from semargl_spark.kernels import rdfxml

    ts, errs = rdfxml.parse(doc, base_uri="http://ex.org/doc", doc_key="k")
    assert errs == []
    nt = "\n".join(render_ntriple(t) for t in ts)
    back, nt_errs = ntriples.parse(nt, doc_key="rt")
    assert nt_errs == []
    assert isomorphic(ts, back), f"not isomorphic:\n{doc}\n{nt}"


_graph = st.one_of(st.none(), st.sampled_from(["urn:g:1", "urn:g:2", "_:g"]))


@st.composite
def _ground_quads(draw):
    """Ground quads (no bnode subj/obj): the TriG round-trip property
    targets the grammar/escaping surface; bnode bijection is covered by
    the unit tests and the per-triple properties above."""
    subj = draw(_iri)
    pred = draw(_iri)
    g = draw(_graph)
    if draw(st.booleans()):
        return Triple(subj, pred, draw(_iri), "iri", None, None, g)
    content = draw(_content)
    flavor = draw(st.sampled_from(["plain", "lang", "typed"]))
    if flavor == "lang":
        return Triple(subj, pred, content, "literal", draw(_lang), None, g)
    if flavor == "typed":
        return Triple(subj, pred, content, "literal", None, draw(_iri), g)
    return Triple(subj, pred, content, "literal", None, None, g)


@settings(max_examples=200, deadline=None)
@given(st.lists(_ground_quads(), min_size=1, max_size=8))
def test_trig_roundtrip_ground(quads):
    """serialize_trig → parse_trig is the identity on ground datasets —
    arbitrary unicode literals (multiline → ``\"\"\"`` quoting), langs,
    datatypes, default + named + bnode-labeled graphs."""
    from semargl_spark.kernels.turtle import serialize_trig
    from semargl_spark.kernels.turtle_read import parse_trig

    doc = serialize_trig(quads)
    parsed, errs = parse_trig(doc, base_uri="urn:base", doc_key="rt")
    assert errs == []

    def g(t):  # the reader relabels bnode GRAPH labels (doc-scoped)
        return "_:G" if (t.graph or "").startswith("_:") else t.graph

    want = {(t.subj, t.pred, t.obj, t.obj_kind, t.lang, t.dtype, g(t))
            for t in quads}
    got = {(t.subj, t.pred, t.obj, t.obj_kind, t.lang, t.dtype, g(t))
           for t in parsed}
    assert got == want
