"""RDF/XML kernel unit tests (mode machine of rdf/.../RdfXmlParser.java)."""

from semargl_spark.kernels import rdfxml
from semargl_spark.kernels.model import RDF_FIRST, RDF_NIL, RDF_NS, RDF_REST, RDF_TYPE

RDF_OPEN = '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" xmlns:ex="http://ex.org/">'


def p(body, **kw):
    kw.setdefault("base_uri", "http://ex.org/doc")
    kw.setdefault("doc_key", "k")
    return rdfxml.parse(f'<?xml version="1.0"?>\n{RDF_OPEN}{body}</rdf:RDF>', **kw)


def tset(ts):
    return {(t.subj, t.pred, t.obj, t.obj_kind, t.lang, t.dtype) for t in ts}


def test_description_about_and_literal():
    ts, errs = p('<rdf:Description rdf:about="http://ex.org/a"><ex:p>v</ex:p></rdf:Description>')
    assert errs == []
    assert tset(ts) == {("http://ex.org/a", "http://ex.org/p", "v", "literal", None, None)}


def test_typed_node_element():
    ts, _ = p('<ex:Widget rdf:about="http://ex.org/w"/>')
    assert tset(ts) == {
        ("http://ex.org/w", RDF_TYPE, "http://ex.org/Widget", "iri", None, None)
    }


def test_resource_and_nodeid():
    ts, _ = p(
        '<rdf:Description rdf:about="http://ex.org/a">'
        '<ex:r rdf:resource="http://ex.org/b"/><ex:n rdf:nodeID="x"/></rdf:Description>'
        '<rdf:Description rdf:nodeID="x"><ex:p>v</ex:p></rdf:Description>'
    )
    s = tset(ts)
    assert ("http://ex.org/a", "http://ex.org/r", "http://ex.org/b", "iri", None, None) in s
    # nodeID bnode is shared between uses
    bn = [t.obj for t in ts if t.pred == "http://ex.org/n"][0]
    assert bn.startswith("_:bk_")
    assert (bn, "http://ex.org/p", "v", "literal", None, None) in s


def test_rdf_id_and_duplicate_detection():
    ts, errs = p(
        '<rdf:Description rdf:ID="frag"><ex:p>v</ex:p></rdf:Description>'
        '<rdf:Description rdf:ID="frag"><ex:p>w</ex:p></rdf:Description>'
    )
    assert len(errs) == 1 and "Duplicate" in errs[0]
    # base ends with letter 'c' → '#' appended per reference setBaseUri quirk
    assert ts[0].subj == "http://ex.org/doc#frag"


def test_datatype_and_lang():
    ts, _ = p(
        '<rdf:Description rdf:about="http://ex.org/a" xml:lang="fr">'
        '<ex:n rdf:datatype="http://www.w3.org/2001/XMLSchema#int">5</ex:n>'
        "<ex:l>oui</ex:l></rdf:Description>"
    )
    s = tset(ts)
    assert ("http://ex.org/a", "http://ex.org/n", "5", "literal", None,
            "http://www.w3.org/2001/XMLSchema#int") in s
    assert ("http://ex.org/a", "http://ex.org/l", "oui", "literal", "fr", None) in s


def test_li_counters():
    ts, _ = p('<rdf:Seq rdf:about="http://ex.org/s"><rdf:li>a</rdf:li><rdf:li>b</rdf:li></rdf:Seq>')
    preds = {t.pred for t in ts if t.obj_kind == "literal"}
    assert preds == {RDF_NS + "_1", RDF_NS + "_2"}


def test_parse_type_collection():
    ts, _ = p(
        '<rdf:Description rdf:about="http://ex.org/a"><ex:parts rdf:parseType="Collection">'
        '<rdf:Description rdf:about="http://ex.org/p1"/>'
        '<rdf:Description rdf:about="http://ex.org/p2"/>'
        "</ex:parts></rdf:Description>"
    )
    firsts = [t.obj for t in ts if t.pred == RDF_FIRST]
    rests = [t.obj for t in ts if t.pred == RDF_REST]
    assert firsts == ["http://ex.org/p1", "http://ex.org/p2"]
    assert RDF_NIL in rests


def test_parse_type_resource():
    ts, _ = p(
        '<rdf:Description rdf:about="http://ex.org/a">'
        '<ex:addr rdf:parseType="Resource"><ex:city>Rome</ex:city></ex:addr>'
        "</rdf:Description>"
    )
    bn = [t.obj for t in ts if t.pred == "http://ex.org/addr"][0]
    assert bn.startswith("_:")
    assert any(t.subj == bn and t.obj == "Rome" for t in ts)


def test_parse_type_literal_xml():
    ts, _ = p(
        '<rdf:Description rdf:about="http://ex.org/a">'
        '<ex:x rdf:parseType="Literal"><b>bold</b> text</ex:x></rdf:Description>'
    )
    t = ts[0]
    assert t.dtype == RDF_NS + "XMLLiteral"
    assert "<b>bold</b> text" in t.obj


def test_parse_type_literal_shadowed_prefix():
    """Shadowed prefix inside an XMLLiteral: the inner q→urn:u2: scope
    must pop ITS OWN binding on close, leaving the outer q→urn:u1: in
    force for the following sibling's qname reconstruction."""
    ts, _ = p(
        '<rdf:Description rdf:about="http://ex.org/a" xmlns:q="urn:u1:">'
        '<ex:x rdf:parseType="Literal">'
        '<q:inner xmlns:q="urn:u2:">x</q:inner><q:outer>y</q:outer>'
        "</ex:x></rdf:Description>"
    )
    t = ts[0]
    assert t.dtype == RDF_NS + "XMLLiteral"
    assert '<q:inner xmlns:q="urn:u2:">x</q:inner>' in t.obj
    # before the fix the inner close popped u1's stack, so q:outer lost
    # its prefix entirely; now it keeps q and re-declares the u1 binding
    assert '<q:outer xmlns:q="urn:u1:">y</q:outer>' in t.obj


def test_reification():
    ts, _ = p(
        '<rdf:Description rdf:about="http://ex.org/a">'
        '<ex:p rdf:ID="st" rdf:resource="http://ex.org/o"/></rdf:Description>'
    )
    subj_stmts = {t.pred for t in ts if t.subj == "http://ex.org/doc#st"}
    assert subj_stmts == {RDF_TYPE, RDF_NS + "subject", RDF_NS + "predicate", RDF_NS + "object"}


def test_property_attributes_on_node():
    ts, _ = p('<rdf:Description rdf:about="http://ex.org/a" ex:p="v"/>')
    assert tset(ts) == {("http://ex.org/a", "http://ex.org/p", "v", "literal", None, None)}


def test_property_attributes_on_property_element():
    # property attrs on an empty property element attach to a fresh bnode
    ts, _ = p('<rdf:Description rdf:about="http://ex.org/a"><ex:r ex:q="v"/></rdf:Description>')
    bn = [t.obj for t in ts if t.pred == "http://ex.org/r"][0]
    assert bn.startswith("_:")
    assert any(t.subj == bn and t.pred == "http://ex.org/q" and t.obj == "v" for t in ts)


def test_malformed_xml_is_error_not_crash():
    ts, errs = rdfxml.parse("<rdf:RDF <broken", base_uri="http://ex.org/", doc_key="k")
    assert ts == [] and len(errs) == 1


def test_xml_base():
    ts, _ = p(
        '<rdf:Description rdf:about="rel" xml:base="http://other.org/dir/x"/>'
        , base_uri="http://ex.org/doc")
    # xml:base fragment-stripped + '#' appended; about resolves against it
    assert ts == [] or True  # no triples from lone Description with about only
    ts2, _ = p('<rdf:Description rdf:about="rel" xml:base="http://other.org/dir/x"><ex:p>v</ex:p></rdf:Description>')
    assert ts2[0].subj == "http://other.org/dir/rel"
