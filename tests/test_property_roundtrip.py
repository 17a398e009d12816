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
