"""RDFa kernel unit tests (processing sequence of rdfa/.../RdfaParser.java)."""

import re

from semargl_spark.kernels import rdfa
from semargl_spark.kernels.model import RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE

DC = "http://purl.org/dc/terms/"
XSD = "http://www.w3.org/2001/XMLSchema#"


def p(doc, **kw):
    kw.setdefault("base_uri", "http://ex.org/doc")
    kw.setdefault("doc_key", "k")
    return rdfa.parse(doc, **kw)


def tset(ts):
    return {(t.subj, t.pred, t.obj, t.obj_kind, t.lang, t.dtype) for t in ts}


def test_about_property_literal():
    ts, errs = p('<div about="http://ex.org/a"><span property="dc:title">T</span></div>')
    assert errs == []
    assert tset(ts) == {("http://ex.org/a", DC + "title", "T", "literal", None, None)}


def test_rel_href():
    ts, _ = p('<div about="http://ex.org/a"><a rel="dc:relation" href="b">x</a></div>')
    assert tset(ts) == {("http://ex.org/a", DC + "relation", "http://ex.org/b", "iri", None, None)}


def test_rev():
    ts, _ = p('<div about="http://ex.org/a"><a rev="dc:relation" href="b">x</a></div>')
    assert tset(ts) == {("http://ex.org/b", DC + "relation", "http://ex.org/a", "iri", None, None)}


def test_typeof_creates_type_triple():
    ts, _ = p('<div about="http://ex.org/a" typeof="schema:Person dc:Agent"></div>')
    objs = {t.obj for t in ts}
    assert objs == {"http://schema.org/Person", DC + "Agent"}
    assert all(t.pred == RDF_TYPE for t in ts)


def test_content_overrides_text():
    ts, _ = p('<div about="http://ex.org/a"><span property="dc:title" content="C">text</span></div>')
    assert ts[0].obj == "C"


def test_datatype():
    ts, _ = p(
        '<div about="http://ex.org/a"><span property="dc:extent" datatype="xsd:integer">33</span></div>'
    )
    assert ts[0].dtype == XSD + "integer"


def test_lang_inheritance():
    ts, _ = p(
        '<div about="http://ex.org/a" xml:lang="de"><span property="dc:title">T</span></div>'
    )
    assert ts[0].lang == "de"


def test_prefix_attr():
    ts, _ = p(
        '<div prefix="my: http://my.org/ns#" about="http://ex.org/a">'
        '<span property="my:p">v</span></div>'
    )
    assert ts[0].pred == "http://my.org/ns#p"


def test_vocab_term_and_uses_vocabulary():
    ts, _ = p(
        '<div vocab="http://v.org/" about="http://ex.org/a"><span property="name">v</span></div>'
    )
    s = tset(ts)
    assert ("http://ex.org/doc", rdfa.RDFA_USES_VOCABULARY, "http://v.org/", "iri", None, None) in s
    assert ("http://ex.org/a", "http://v.org/name", "v", "literal", None, None) in s


def test_incomplete_triples():
    ts, _ = p(
        '<div about="http://ex.org/a"><span rel="dc:relation">'
        '<span about="http://ex.org/b">x</span></span></div>'
    )
    assert ("http://ex.org/a", DC + "relation", "http://ex.org/b", "iri", None, None) in tset(ts)


def test_typeof_without_about_makes_bnode():
    # non-root element: typeof with no about/resource mints a bnode
    # (on the root element the subject falls back to base instead —
    # BASE_IF_ROOT_NODE precedes BNODE_IF_TYPEOF, RdfaParser.java:394-396)
    ts, _ = p('<div><div typeof="schema:Person"><span property="dc:title">T</span></div></div>')
    type_t = [t for t in ts if t.pred == RDF_TYPE][0]
    assert type_t.subj.startswith("_:bk_")
    lit_t = [t for t in ts if t.obj_kind == "literal"][0]
    assert lit_t.subj == type_t.subj


def test_inlist_collection():
    ts, _ = p(
        '<div about="http://ex.org/a">'
        '<span property="dc:creator" inlist="" content="A"></span>'
        '<span property="dc:creator" inlist="" content="B"></span></div>'
    )
    firsts = [t.obj for t in ts if t.pred == RDF_FIRST]
    assert firsts == ["A", "B"]
    assert any(t.pred == RDF_REST and t.obj == RDF_NIL for t in ts)
    attach = [t for t in ts if t.pred == DC + "creator"]
    assert len(attach) == 1 and attach[0].obj_kind == "bnode"


def test_safe_curie_and_bnode():
    ts, _ = p('<div about="[_:x]"><span property="dc:title">T</span></div>')
    assert ts[0].subj.startswith("_:bk_")


def test_xml_literal():
    ts, _ = p(
        '<div about="http://ex.org/a" xmlns="http://www.w3.org/1999/xhtml">'
        '<span property="dc:title" datatype="rdf:XMLLiteral">a <b>bold</b> move</span></div>'
    )
    t = ts[0]
    assert t.dtype == "http://www.w3.org/1999/02/22-rdf-syntax-ns#XMLLiteral"
    # open tags carry the in-scope xmlns declarations
    # (serializeOpenTag with all iriMappings, RdfaParser.java:249)
    assert re.search(r"<b[^>]*>bold</b>", t.obj)
    assert 'xmlns="http://www.w3.org/1999/xhtml"' in t.obj


def test_html5_datetime_autodetect():
    doc = '<!DOCTYPE html><html><body><div about="#e"><time property="dc:date" datetime="2024-01-15T10:00:00">x</time></div></body></html>'
    ts, _ = p(doc)
    assert ts[0].dtype == XSD + "dateTime"


def test_role_attribute():
    ts, _ = p('<div id="x" role="banner">c</div>')
    assert tset(ts) == {
        (
            "http://ex.org/doc#x",
            rdfa.XHTML_VOCAB + "role",
            rdfa.XHTML_VOCAB + "banner",
            "iri", None, None,
        )
    }


def test_pattern_copy_deferred():
    # copy before pattern definition → deferred pair; pattern is consumed
    # and leaves no rdfa:Pattern triples (endDocument:192-208)
    doc = (
        '<div>'
        '<div resource="#x" typeof="schema:Person"><link property="rdfa:copy" href="#p"/></div>'
        '<div resource="#p" typeof="rdfa:Pattern"><span property="dc:title">T</span></div>'
        "</div>"
    )
    ts, _ = p(doc)
    s = tset(ts)
    assert ("http://ex.org/doc#x", DC + "title", "T", "literal", None, None) in s
    assert not any(t.obj == rdfa.RDFA_PATTERN for t in ts)


def test_pattern_copy_immediate():
    # pattern before copy → immediate copy; the reference leaves the
    # pattern in patternProps and re-emits it at endDocument
    # (addNonLiteral:1179-1186 + endDocument:209-213) — we replicate that
    doc = (
        '<div>'
        '<div resource="#p" typeof="rdfa:Pattern"><span property="dc:title">T</span></div>'
        '<div resource="#x" typeof="schema:Person"><link property="rdfa:copy" href="#p"/></div>'
        "</div>"
    )
    ts, _ = p(doc)
    s = tset(ts)
    assert ("http://ex.org/doc#x", DC + "title", "T", "literal", None, None) in s
    assert ("http://ex.org/doc#p", DC + "title", "T", "literal", None, None) in s


def test_rdfa10_version_detection():
    doc = '<html version="XHTML+RDFa 1.0"><body><div about="http://ex.org/a"><span property="dc:title">T</span></div></body></html>'
    ts, _ = p(doc)
    # dc: still resolves in 1.0? no initial context in 1.0 → unresolvable CURIE passes as IRI
    assert ts[0].pred in (DC + "title", "dc:title")


def test_tag_soup_html():
    doc = '<!DOCTYPE html><html><body><p about="http://ex.org/a"><span property="dc:title">T</body></html>'
    ts, errs = p(doc)
    assert ("http://ex.org/a", DC + "title", "T", "literal", None, None) in tset(ts)
