"""render_jsonld: flat expanded-form JSON-LD writer — differential vs a
pure-Python mirror, and a kernel round-trip property test (rendered
output re-parses to the same triple set)."""
from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from semargl_spark.kernels import jsonld
from semargl_spark.kernels.model import Triple

_iri = st.from_regex(r"urn:[a-z]{1,8}:[A-Za-z0-9/._\-]{1,20}", fullmatch=True)
_bnode = st.from_regex(r"_:[A-Za-z][A-Za-z0-9]{0,10}", fullmatch=True)
_lang = st.from_regex(r"[a-z]{2}(-[A-Za-z0-9]{1,8})?", fullmatch=True)
_content = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
)

_ESC = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r",
        "\t": "\\t", "\b": "\\b", "\f": "\\f"}


def _esc(s: str) -> str:
    for k, v in _ESC.items():
        s = s.replace(k, v)
    for c in range(0x20):
        ch = chr(c)
        if ch not in "\n\r\t\b\f":
            s = s.replace(ch, f"\\u{c:04x}")
    return s


def py_render_jsonld(ts: list[Triple]) -> dict[str, str]:
    """Pure-Python mirror of operators/serialize_ops.render_jsonld —
    same sort orders, same escape set, same string shapes."""
    by_subj: dict[str, dict[str, set[str]]] = {}
    for t in ts:
        if t.obj_kind == "literal":
            tail = (f',"@language":"{t.lang}"' if t.lang is not None
                    else (f',"@type":"{t.dtype}"' if t.dtype is not None else ""))
            o = f'{{"@value":"{_esc(t.obj)}"{tail}}}'
        else:
            o = f'{{"@id":"{t.obj}"}}'
        by_subj.setdefault(t.subj, {}).setdefault(t.pred, set()).add(o)
    out = {}
    for subj, preds in by_subj.items():
        pairs = sorted(
            f'"{p}":[{",".join(sorted(vals))}]' for p, vals in preds.items()
        )
        out[subj] = f'{{"@id":"{subj}",{",".join(pairs)}}}'
    return out


@st.composite
def _triples(draw):
    subj = draw(st.one_of(_iri, _bnode))
    pred = draw(_iri)
    kind = draw(st.sampled_from(["iri", "bnode", "literal"]))
    if kind == "iri":
        return Triple(subj, pred, draw(_iri), "iri", None, None, None)
    if kind == "bnode":
        return Triple(subj, pred, draw(_bnode), "bnode", None, None, None)
    flavor = draw(st.sampled_from(["plain", "lang", "typed"]))
    content = draw(_content)
    if flavor == "lang":
        return Triple(subj, pred, content, "literal", draw(_lang), None, None)
    if flavor == "typed":
        return Triple(subj, pred, content, "literal", None, draw(_iri), None)
    return Triple(subj, pred, content, "literal", None, None, None)


@settings(max_examples=200, deadline=None)
@given(st.lists(_triples(), min_size=1, max_size=10))
def test_rendered_jsonld_reparses_to_same_triples(ts):
    from semargl_spark.functions.graph_compare import isomorphic

    ts = list({(t.subj, t.pred, t.obj, t.obj_kind, t.lang, t.dtype): t
               for t in ts}.values())  # writer has set semantics
    rendered = py_render_jsonld(ts)
    doc = "[" + ",".join(rendered[s] for s in sorted(rendered)) + "]"
    back, errs = jsonld.parse(doc, doc_key="rt")
    assert errs == []
    assert isomorphic(ts, back), doc


def test_spark_render_matches_python_mirror(spark):
    from semargl_spark.operators.serialize_ops import render_jsonld

    ts = [
        Triple("urn:e:1", "urn:p:name", 'A "q"\n\tz\\', "literal", None, None, None),
        Triple("urn:e:1", "urn:p:name", "dup", "literal", None, None, None),
        Triple("urn:e:1", "urn:p:name", "dup", "literal", None, None, None),
        Triple("urn:e:1", "urn:p:knows", "urn:e:2", "iri", None, None, None),
        Triple("urn:e:1", "urn:p:alias", "_:b7", "bnode", None, None, None),
        Triple("urn:e:1", "urn:p:score", "5.5", "literal", None,
               "http://www.w3.org/2001/XMLSchema#decimal", None),
        Triple("_:b7", "urn:p:label", "turn", "literal", "en", None, None),
        Triple("urn:e:2", "urn:p:tag", "b", "literal", None, None, None),
        Triple("urn:e:2", "urn:p:tag", "a", "literal", None, None, None),
    ]
    rows = [("c", 0, t.subj, t.pred, t.obj, t.obj_kind, t.lang, t.dtype, None)
            for t in ts]
    st_df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, subj string, pred string, obj string,"
        " obj_kind string, lang string, dtype string, graph string",
    )
    got = {r["subj"]: r["json"] for r in render_jsonld(st_df).collect()}
    assert got == py_render_jsonld(ts)
