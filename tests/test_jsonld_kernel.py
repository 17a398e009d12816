"""JSON-LD kernel unit tests (semantics of jsonld/.../JsonLdContentHandler
+ EvalContext — @context/@id/@type/@value/@list/@set/@reverse/@graph/
containers, scalar typing)."""

from semargl_spark.kernels import jsonld
from semargl_spark.kernels.model import RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE

XSD = "http://www.w3.org/2001/XMLSchema#"


def p(doc, **kw):
    kw.setdefault("base_uri", "http://ex.org/doc")
    kw.setdefault("doc_key", "k")
    return jsonld.parse(doc, **kw)


def tset(ts):
    return {(t.subj, t.pred, t.obj, t.obj_kind, t.lang, t.dtype, t.graph) for t in ts}


def test_basic_node():
    ts, errs = p('{"@id": "http://ex.org/a", "http://ex.org/p": "v"}')
    assert errs == []
    assert tset(ts) == {("http://ex.org/a", "http://ex.org/p", "v", "literal", None, None, None)}


def test_context_term_and_curie():
    doc = '''{"@context": {"ex": "http://ex.org/", "name": "ex:name"},
              "@id": "ex:a", "name": "n", "ex:other": "o"}'''
    ts, errs = p(doc)
    assert tset(ts) == {
        ("http://ex.org/a", "http://ex.org/name", "n", "literal", None, None, None),
        ("http://ex.org/a", "http://ex.org/other", "o", "literal", None, None, None),
    }


def test_vocab_and_language():
    doc = '''{"@context": {"@vocab": "http://v.org/", "@language": "en"},
              "@id": "http://ex.org/a", "word": "hello"}'''
    ts, _ = p(doc)
    assert tset(ts) == {
        ("http://ex.org/a", "http://v.org/word", "hello", "literal", "en", None, None)
    }


def test_type_coercion_and_id_coercion():
    doc = '''{"@context": {"age": {"@id": "http://ex.org/age", "@type": "http://www.w3.org/2001/XMLSchema#int"},
                           "knows": {"@id": "http://ex.org/knows", "@type": "@id"}},
              "@id": "http://ex.org/a", "age": "30", "knows": "http://ex.org/b"}'''
    ts, _ = p(doc)
    assert tset(ts) == {
        ("http://ex.org/a", "http://ex.org/age", "30", "literal", None, XSD + "int", None),
        ("http://ex.org/a", "http://ex.org/knows", "http://ex.org/b", "iri", None, None, None),
    }


def test_scalars():
    doc = '{"@id": "http://ex.org/a", "http://ex.org/p": [1, 1.5, true]}'
    ts, _ = p(doc)
    objs = {(t.obj, t.dtype) for t in ts}
    assert objs == {
        ("1", XSD + "integer"),
        ("1.5E0", XSD + "double"),
        ("true", XSD + "boolean"),
    }


def test_value_object():
    doc = '''{"@id": "http://ex.org/a",
              "http://ex.org/p": {"@value": "chat", "@language": "fr"},
              "http://ex.org/q": {"@value": "x", "@type": "http://ex.org/T"}}'''
    ts, _ = p(doc)
    assert tset(ts) == {
        ("http://ex.org/a", "http://ex.org/p", "chat", "literal", "fr", None, None),
        ("http://ex.org/a", "http://ex.org/q", "x", "literal", None, "http://ex.org/T", None),
    }


def test_list_construction():
    doc = '{"@id": "http://ex.org/a", "http://ex.org/p": {"@list": ["x", "y"]}}'
    ts, _ = p(doc)
    preds = [t.pred for t in ts]
    assert preds.count(RDF_FIRST) == 2 and preds.count(RDF_REST) == 2
    rests = [t.obj for t in ts if t.pred == RDF_REST]
    assert RDF_NIL in rests
    attach = [t for t in ts if t.pred == "http://ex.org/p"]
    assert len(attach) == 1 and attach[0].obj_kind == "bnode"


def test_empty_list_is_nil():
    doc = '{"@id": "http://ex.org/a", "http://ex.org/p": {"@list": []}}'
    ts, _ = p(doc)
    assert tset(ts) == {
        ("http://ex.org/a", "http://ex.org/p", RDF_NIL, "iri", None, None, None)
    }


def test_set_flattens():
    doc = '{"@id": "http://ex.org/a", "http://ex.org/p": {"@set": ["x", "y"]}}'
    ts, _ = p(doc)
    assert {t.obj for t in ts} == {"x", "y"}


def test_reverse():
    doc = '''{"@context": {"children": {"@reverse": "http://ex.org/parent"}},
              "@id": "http://ex.org/a",
              "children": [{"@id": "http://ex.org/kid"}]}'''
    ts, _ = p(doc)
    assert tset(ts) == {
        ("http://ex.org/kid", "http://ex.org/parent", "http://ex.org/a", "iri", None, None, None)
    }


def test_named_graph():
    doc = '''{"@id": "http://ex.org/g", "http://ex.org/p": "top",
              "@graph": [{"@id": "http://ex.org/a", "http://ex.org/q": "in"}]}'''
    ts, _ = p(doc)
    by_graph = {t.graph for t in ts}
    assert by_graph == {None, "http://ex.org/g"}


def test_top_level_graph_is_default():
    doc = '{"@graph": [{"@id": "http://ex.org/a", "http://ex.org/q": "in"}]}'
    ts, _ = p(doc)
    assert ts[0].graph is None


def test_language_map():
    doc = '''{"@context": {"label": {"@id": "http://ex.org/label", "@container": "@language"}},
              "@id": "http://ex.org/a", "label": {"en": "cat", "de": "Katze"}}'''
    ts, _ = p(doc)
    assert {(t.obj, t.lang) for t in ts} == {("cat", "en"), ("Katze", "de")}


def test_type_triples():
    doc = '{"@id": "http://ex.org/a", "@type": ["http://ex.org/T1", "http://ex.org/T2"]}'
    ts, _ = p(doc)
    assert {t.obj for t in ts} == {"http://ex.org/T1", "http://ex.org/T2"}
    assert all(t.pred == RDF_TYPE for t in ts)


def test_bnode_ids_renamed_per_document():
    doc = '{"@id": "_:me", "http://ex.org/p": {"@id": "_:me"}}'
    ts, _ = p(doc, doc_key="c1_0")
    assert ts[0].subj == "_:bc1_0_n0" and ts[0].obj == "_:bc1_0_n0"


def test_relative_id_resolution():
    ts, _ = p('{"@id": "child", "http://ex.org/p": "v"}', base_uri="http://ex.org/dir/doc")
    assert ts[0].subj == "http://ex.org/dir/child"


def test_invalid_json_gives_error_row():
    ts, errs = p("{not json")
    assert ts == [] and len(errs) == 1


def test_remote_context_rejected_offline():
    ts, errs = p('{"@context": "http://remote.example/ctx", "@id": "http://ex.org/a"}')
    assert any("remote" in e for e in errs)


def test_remote_context_registry_resolves_offline():
    reg = {
        "https://kg.example/ctx/v1": {
            "name": "urn:p:name",
            "knows": {"@id": "urn:p:knows", "@type": "@id"},
        },
        # registry values may reference registry IRIs (one splice/round)
        "https://kg.example/ctx/v2": [
            "https://kg.example/ctx/v1", {"age": "urn:p:age"},
        ],
    }
    doc = ('{"@context":"https://kg.example/ctx/v1","@id":"urn:e:1",'
           '"name":"Ada","knows":"urn:e:2"}')
    ts, errs = jsonld.parse(doc, doc_key="t", context_registry=reg)
    assert errs == []
    assert tset(ts) == {
        ("urn:e:1", "urn:p:name", "Ada", "literal", None, None, None),
        ("urn:e:1", "urn:p:knows", "urn:e:2", "iri", None, None, None),
    }
    ts2, errs2 = jsonld.parse(
        '{"@context":"https://kg.example/ctx/v2","@id":"urn:e:1","age":7}',
        doc_key="t", context_registry=reg,
    )
    assert errs2 == [] and ts2[0].pred == "urn:p:age"


def test_remote_context_unregistered_still_errors():
    reg = {"https://kg.example/ctx/v1": {"p": "urn:p:p"}}
    ts, errs = jsonld.parse(
        '{"@context":"https://other/ctx","@id":"urn:e:1","p":"v"}',
        doc_key="t", context_registry=reg,
    )
    assert ts == [] and any("not supported offline" in e for e in errs)


def test_remote_context_cache_never_aliases_registries():
    url = "https://kg.example/ctx/cachetest"
    doc = '{"@context":"%s","@id":"urn:e:1","name":"x"}' % url
    a, _ = jsonld.parse(doc, doc_key="t",
                        context_registry={url: {"name": "urn:p:a"}})
    b, _ = jsonld.parse(doc, doc_key="t",
                        context_registry={url: {"name": "urn:p:b"}})
    assert a[0].pred == "urn:p:a" and b[0].pred == "urn:p:b"
