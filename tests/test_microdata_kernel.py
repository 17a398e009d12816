"""HTML microdata kernel (kernels/microdata.py): schema.org
itemscope/itemprop → triples, W3C Microdata-to-RDF core mapping."""

import json

from semargl_spark.kernels import microdata


def tset(ts):
    return {(t.subj, t.pred, t.obj, t.obj_kind, t.lang) for t in ts}


def test_typed_item_full_surface():
    doc = """<!DOCTYPE html><html><body>
    <div itemscope itemtype="https://schema.org/Person" itemid="urn:e:1">
      <span itemprop="name">Ada <b>Lovelace</b></span>
      <a itemprop="url" href="/ada">home</a>
      <meta itemprop="birthDate" content="1815-12-10">
      <time itemprop="deathDate" datetime="1852-11-27">27 Nov</time>
      <span itemprop="https://ex.org/abs">absolute</span>
    </div></body></html>"""
    ts, errs = microdata.parse(doc, base_uri="https://s.example/p", doc_key="d")
    assert errs == []
    assert ("urn:e:1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "https://schema.org/Person", "iri", None) in tset(ts)
    got = {(t.pred, t.obj) for t in ts}
    # descendant text concatenates through nested markup
    assert ("https://schema.org/name", "Ada Lovelace") in got
    # relative URL values resolve against the document base
    assert ("https://schema.org/url", "https://s.example/ada") in got
    assert ("https://schema.org/birthDate", "1815-12-10") in got
    # time prefers the datetime attribute over its text
    assert ("https://schema.org/deathDate", "1852-11-27") in got
    # absolute property names pass through
    assert ("https://ex.org/abs", "absolute") in got


def test_nested_item_untyped_fallback_and_lang():
    doc = ('<div itemscope itemtype="https://schema.org/Person">'
           '<div itemprop="knows" itemscope>'
           '<span itemprop="name" lang="fr">Babbage</span></div></div>')
    ts, errs = microdata.parse(doc, doc_key="k")
    assert errs == []
    s = tset(ts)
    outer, inner = "_:bk_n0", "_:bk_n1"
    assert (outer, "https://schema.org/knows", inner, "bnode", None) in s
    # untyped nested item: property names fall back to the md# vocabulary
    assert (inner, "http://www.w3.org/1999/xhtml/microdata#name",
            "Babbage", "literal", "fr") in s


def test_multiple_prop_names_and_types():
    doc = ('<div itemscope itemtype="https://schema.org/A https://schema.org/B">'
           '<span itemprop="x y">v</span></div>')
    ts, _ = microdata.parse(doc, doc_key="k")
    preds = {t.pred for t in ts if t.obj == "v"}
    assert preds == {"https://schema.org/x", "https://schema.org/y"}
    types = {t.obj for t in ts if t.pred.endswith("#type")}
    assert types == {"https://schema.org/A", "https://schema.org/B"}


def test_hash_vocab_derivation():
    doc = ('<div itemscope itemtype="https://ex.org/vocab#T">'
           '<span itemprop="p">v</span></div>')
    ts, _ = microdata.parse(doc, doc_key="k")
    assert any(t.pred == "https://ex.org/vocab#p" for t in ts)


def test_itemref_warns_never_fails():
    doc = ('<div itemscope itemref="a b"><span itemprop="p">v</span></div>')
    ts, errs = microdata.parse(doc, doc_key="k")
    assert any("itemref" in e for e in errs)


def test_tag_soup_recovers():
    doc = '<div itemscope itemtype="https://s.org/T"><span itemprop="name">x'
    ts, errs = microdata.parse(doc, doc_key="k")
    # unclosed elements still emit their collected text properties
    assert any(t.pred == "https://s.org/name" and t.obj == "x" for t in ts)


def test_sniff_routes_microdata_vs_rdfa():
    from semargl_spark.operators.extract import sniff_format

    assert sniff_format('<div itemscope itemtype="https://s.org/T">x</div>') \
        == "microdata"
    # RDFa attributes win when both syntaxes appear (reference parity)
    assert sniff_format('<div itemscope property="p" about="#x">x</div>') \
        == "rdfa"
    assert sniff_format('<div about="#x">hi</div>') == "rdfa"


def test_extraction_operator_end_to_end(spark):
    from semargl_spark.operators.extract import extract_statements, triples

    t = spark.createDataFrame(
        [("c1", 0, '<div itemscope itemtype="https://schema.org/T" '
                   'itemid="urn:e:1"><span itemprop="name">N</span></div>')],
        "conv_id string, turn_idx int, text string",
    )
    rows = triples(extract_statements(t)).collect()  # sniffed, not forced
    assert {(r.subj, r.pred, r.obj) for r in rows} == {
        ("urn:e:1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "https://schema.org/T"),
        ("urn:e:1", "https://schema.org/name", "N"),
    }
