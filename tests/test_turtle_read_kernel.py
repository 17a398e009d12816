"""Turtle parser kernel (kernels/turtle_read.py): grammar coverage and
error recovery over hand-checked documents."""

from __future__ import annotations

from semargl_spark.kernels.model import (
    RDF_FIRST, RDF_NIL, RDF_NS, RDF_REST, RDF_TYPE, XSD_NS,
)
from semargl_spark.kernels.turtle_read import parse


def _set(triples):
    return {(t.subj, t.pred, t.obj, t.obj_kind, t.lang, t.dtype) for t in triples}


def test_prefixes_base_and_pname():
    doc = """
    @prefix ex: <http://ex.org/> .
    PREFIX foo: <urn:foo:>
    @base <http://base.org/dir/> .
    ex:s ex:p foo:o ; a ex:T .
    <rel> ex:p <#frag> .
    """
    ts, errs = parse(doc)
    assert errs == []
    assert _set(ts) == {
        ("http://ex.org/s", "http://ex.org/p", "urn:foo:o", "iri", None, None),
        ("http://ex.org/s", RDF_TYPE, "http://ex.org/T", "iri", None, None),
        ("http://base.org/dir/rel", "http://ex.org/p",
         "http://base.org/dir/#frag", "iri", None, None),
    }


def test_literals_all_shapes():
    doc = """@prefix ex: <urn:x:> .
    ex:s ex:p "plain", "tagged"@en-GB, "typed"^^ex:dt,
         'single', '''long ' quote''', \"\"\"dq "long"\nline\"\"\" ,
         42, -3.14, 1.0e6, true, false .
    """
    ts, errs = parse(doc)
    assert errs == []
    objs = {(t.obj, t.lang, t.dtype) for t in ts}
    assert objs == {
        ("plain", None, None),
        ("tagged", "en-GB", None),
        ("typed", None, "urn:x:dt"),
        ("single", None, None),
        ("long ' quote", None, None),
        ('dq "long"\nline', None, None),
        ("42", None, XSD_NS + "integer"),
        ("-3.14", None, XSD_NS + "decimal"),
        ("1.0e6", None, XSD_NS + "double"),
        ("true", None, XSD_NS + "boolean"),
        ("false", None, XSD_NS + "boolean"),
    }


def test_bnodes_anon_and_labeled():
    doc = """@prefix ex: <urn:x:> .
    _:a ex:p [ ex:q "v" ] .
    [ ex:r _:a ] .
    """
    ts, errs = parse(doc, doc_key="D")
    assert errs == []
    # _:a relabels deterministically; both uses unify
    labeled = {t.subj for t in ts if t.pred == "urn:x:p"}
    a_obj = {t.obj for t in ts if t.pred == "urn:x:r"}
    assert labeled == a_obj
    inner = [t for t in ts if t.pred == "urn:x:q"]
    assert inner[0].obj == "v" and inner[0].subj.startswith("_:bD_")


def test_collection_chain():
    doc = '@prefix ex: <urn:x:> .\nex:s ex:p ("a" "b") .\nex:s ex:q () .\n'
    ts, errs = parse(doc)
    assert errs == []
    firsts = sorted(t.obj for t in ts if t.pred == RDF_FIRST)
    rests = [t for t in ts if t.pred == RDF_REST]
    assert firsts == ["a", "b"]
    assert sum(1 for t in rests if t.obj == RDF_NIL) == 1
    nil_obj = [t for t in ts if t.pred == "urn:x:q"]
    assert nil_obj[0].obj == RDF_NIL and nil_obj[0].obj_kind == "iri"


def test_comments_and_dangling_semicolon():
    doc = """# header comment
    @prefix ex: <urn:x:> .  # trailing
    ex:s ex:p "v" ; .  # dangling ; is legal
    """
    ts, errs = parse(doc)
    assert errs == [] and len(ts) == 1


def test_error_recovery_skips_bad_statement():
    doc = """@prefix ex: <urn:x:> .
    ex:good ex:p "1" .
    ex:broken ex:p ^^ garbage here .
    ex:alsogood ex:p "2" .
    """
    ts, errs = parse(doc)
    assert len(errs) == 1
    assert {t.subj for t in ts} == {"urn:x:good", "urn:x:alsogood"}


def test_undefined_prefix_is_error_not_crash():
    ts, errs = parse('nope:s <urn:p> "v" .')
    assert ts == [] and len(errs) == 1


def test_pname_trailing_dot_is_terminator():
    ts, errs = parse("@prefix ex: <urn:x:> .\nex:s ex:p ex:o.\n")
    assert errs == []
    assert ts[0].obj == "urn:x:o"


def test_serializer_roundtrip_through_kernel():
    """The kernel must re-parse kernels/turtle.py inline output
    isomorphically (labels differ; shape and literals must not)."""
    from semargl_spark.kernels.ntriples import parse as nt_parse
    from semargl_spark.kernels.turtle import serialize as serialize_turtle
    from semargl_spark.functions.graph_compare import isomorphic

    nt = (
        '<urn:s> <urn:p> _:x .\n'
        '_:x <urn:q> "lit\\n2"@en .\n'
        '_:x <urn:r> "5"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
        '<urn:s> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <urn:T> .\n'
    )
    orig, errs = nt_parse(nt)
    assert errs == []
    doc = serialize_turtle(orig)
    back, errs2 = parse(doc, doc_key="rt")
    assert errs2 == []
    assert isomorphic(orig, back)


# ------------------------------------------------------------------ TriG


def _qset(triples):
    return {
        (t.subj, t.pred, t.obj, t.obj_kind, t.lang, t.dtype, t.graph)
        for t in triples
    }


def test_trig_block_forms():
    from semargl_spark.kernels.turtle_read import parse_trig

    doc = """
    @prefix ex: <urn:ex:> .
    ex:top ex:p "default" .
    GRAPH ex:g1 { ex:a ex:p 1 ; ex:q "x"@en }
    ex:g2 { ex:b ex:knows ex:c . }
    { ex:d a ex:T }
    """
    ts, errs = parse_trig(doc, doc_key="k")
    assert errs == []
    assert _qset(ts) == {
        ("urn:ex:top", "urn:ex:p", "default", "literal", None, None, None),
        ("urn:ex:a", "urn:ex:p", "1", "literal", None, XSD_NS + "integer",
         "urn:ex:g1"),
        ("urn:ex:a", "urn:ex:q", "x", "literal", "en", None, "urn:ex:g1"),
        ("urn:ex:b", "urn:ex:knows", "urn:ex:c", "iri", None, None,
         "urn:ex:g2"),
        ("urn:ex:d", RDF_TYPE, "urn:ex:T", "iri", None, None, None),
    }


def test_trig_bnode_graph_labels_and_collections():
    from semargl_spark.kernels.turtle_read import parse_trig

    doc = """
    @prefix ex: <urn:ex:> .
    _:g { ex:a ex:p ( 1 2 ) . }
    [] { ex:e ex:p true }
    """
    ts, errs = parse_trig(doc, doc_key="k")
    assert errs == []
    graphs = {t.graph for t in ts}
    # the labeled bnode graph and the anonymous one are distinct bnodes
    assert len(graphs) == 2 and all(g.startswith("_:b") for g in graphs)
    labeled = next(g for g in graphs if any(
        t.graph == g and t.pred == RDF_FIRST for t in ts))
    chain = [t for t in ts if t.graph == labeled]
    # collection chain fully inside the labeled graph: first/rest/nil
    assert {t.pred for t in chain} >= {RDF_FIRST, RDF_REST, "urn:ex:p"}
    assert any(t.obj == RDF_NIL for t in chain)


def test_trig_error_recovery_is_block_scoped():
    from semargl_spark.kernels.turtle_read import parse_trig

    doc = """
    @prefix ex: <urn:ex:> .
    GRAPH ex:g { ex:ok ex:p 1 . ex:bad ex:p . }
    ex:after ex:p 3 .
    """
    ts, errs = parse_trig(doc, doc_key="k")
    assert len(errs) == 1
    got = {(t.subj, t.obj, t.graph) for t in ts}
    # the good statement in the block and the statement AFTER the block
    # both survive; the bad one is dropped without eating the '}'
    assert ("urn:ex:ok", "1", "urn:ex:g") in got
    assert ("urn:ex:after", "3", None) in got


def test_trig_truncated_never_raises():
    from semargl_spark.kernels.turtle_read import parse_trig

    for bad in ("{", "GRAPH", "GRAPH {", "ex:g {", "{ ex:a ex:p ",
                "}}}", "{{{", "GRAPH [ ] { _:x ex:p "):
        ts, errs = parse_trig("@prefix ex: <urn:ex:> .\n" + bad, doc_key="z")
        assert errs, bad


def test_turtle_truncated_statement_records_error():
    # regression: a doc cut mid-object used to run the cursor past EOF
    ts, errs = parse("@prefix ex: <urn:ex:> .\nex:a ex:p ")
    assert ts == [] and len(errs) == 1


# ---------------------------------------------------------------- writer


def test_serialize_trig_blocks_and_order():
    from semargl_spark.kernels.model import Triple, non_literal, plain_literal
    from semargl_spark.kernels.turtle import serialize_trig
    from semargl_spark.kernels.turtle_read import parse_trig

    ts = [
        non_literal("urn:a", "urn:p:x", "urn:b", "urn:g:2"),
        non_literal("urn:a", "urn:p:y", "urn:c"),          # default graph
        plain_literal("urn:a", "urn:p:z", "v", None, "urn:g:1"),
        non_literal("urn:d", "urn:p:x", "urn:e", "urn:g:2"),
    ]
    doc = serialize_trig(ts)
    # default graph first, then g:2 (first appearance), then g:1
    i_def = doc.index("<urn:a> <urn:p:y> <urn:c> .")
    i_g2 = doc.index("<urn:g:2> {")
    i_g1 = doc.index("<urn:g:1> {")
    assert i_def < i_g2 < i_g1
    # same-graph statements share one block (subject grouping intact)
    assert doc.count("<urn:g:2> {") == 1
    back, errs = parse_trig(doc, base_uri="urn:base", doc_key="rt")
    assert errs == []
    assert sorted((t.subj, t.pred, t.obj, t.graph) for t in back) == sorted(
        (t.subj, t.pred, t.obj, t.graph) for t in ts
    )


def test_serialize_trig_bnode_graph_label_and_grouping():
    from semargl_spark.kernels.model import non_literal
    from semargl_spark.kernels.turtle import serialize_trig

    ts = [
        non_literal("urn:s", "urn:p:a", "urn:o1", "_:g"),
        non_literal("urn:s", "urn:p:a", "urn:o2", "_:g"),
    ]
    doc = serialize_trig(ts)
    assert "_:g {\n" in doc
    # same subject+predicate: ',' object grouping inside the block
    assert "<urn:o1>, <urn:o2>" in doc
