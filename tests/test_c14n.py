"""RDF dataset canonicalization (kernels/c14n.py, RDFC-1.0): label
assignment, isomorphism invariance under random relabel+shuffle,
automorphic N-degree cases, and the Spark operator surface."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from semargl_spark.kernels.c14n import (
    canonical_labels,
    canonical_nquads,
    canonicalize,
)
from semargl_spark.kernels.model import Triple


def T(s, p, o, k="iri", lang=None, dt=None, g=None):
    return Triple(s, p, o, k, lang, dt, g)


def test_distinguishable_bnodes_get_hash_ordered_labels():
    qs = [
        T("_:x", "urn:p:label", "x1", "literal"),
        T("_:y", "urn:p:label", "y1", "literal"),
        T("_:x", "urn:p:knows", "_:y", "bnode"),
        T("urn:e:1", "urn:p:owner", "_:x", "bnode"),
    ]
    labels = canonical_labels(qs)
    assert set(labels.values()) == {"_:c14n0", "_:c14n1"}
    # canonical doc is sorted, relabeled, newline-terminated
    doc = canonical_nquads(qs)
    assert doc.splitlines() == sorted(doc.splitlines())
    assert "_:x" not in doc and "_:c14n0" in doc


def test_iri_only_document_has_no_labels_and_stable_doc():
    qs = [T("urn:a", "urn:p", "urn:b"), T("urn:a", "urn:q", "v", "literal")]
    assert canonical_labels(qs) == {}
    assert canonical_nquads(qs) == (
        '<urn:a> <urn:p> <urn:b> .\n<urn:a> <urn:q> "v" .\n'
    )


def test_automorphic_cycles_canonicalize_identically():
    # 2-cycle and 4-cycle: every bnode shares the same first-degree
    # hash, forcing the N-degree permutation walk
    for n in (2, 3, 4):
        a = [T(f"_:{i}", "urn:p:n", f"_:{(i + 1) % n}", "bnode")
             for i in range(n)]
        b = [T(f"_:q{(i * 7) % n}", "urn:p:n", f"_:q{(i * 7 + 7) % n}",
               "bnode") for i in range(n)]
        random.Random(n).shuffle(b)
        assert canonical_nquads(a) == canonical_nquads(b)


def test_graph_position_and_literals_feed_the_hash():
    # same triples, different named-graph bnode → different doc
    base = [T("urn:s", "urn:p", "urn:o", g="_:g"),
            T("_:g", "urn:p:label", "a", "literal")]
    other = [T("urn:s", "urn:p", "urn:o", g="_:g"),
             T("_:g", "urn:p:label", "b", "literal")]
    assert canonical_nquads(base) != canonical_nquads(other)
    # literal-typed obj equal to a bnode label is NOT relabeled
    lit = [T("_:b", "urn:p", "_:b", "literal")]
    out = canonicalize(lit)
    assert out[0].subj == "_:c14n0" and out[0].obj == "_:b"


def test_poison_guard_raises():
    import pytest

    qs = [T(f"_:{i}", "urn:p:n", f"_:{(i + 1) % 12}", "bnode")
          for i in range(12)]
    with pytest.raises(ValueError):
        canonical_labels(qs, max_degree_nodes=8)


@st.composite
def _bnode_graph(draw):
    n = draw(st.integers(2, 6))
    m = draw(st.integers(1, 10))
    edges = [
        (draw(st.integers(0, n - 1)), draw(st.integers(0, n - 1)))
        for _ in range(m)
    ]
    anchors = draw(st.lists(st.integers(0, n - 1), max_size=3))
    return n, edges, anchors


@settings(max_examples=60, deadline=None)
@given(_bnode_graph(), st.integers(0, 2**30))
def test_isomorphism_invariance_random(graph, seed):
    n, edges, anchors = graph
    rng = random.Random(seed)
    perm = list(range(n))
    rng.shuffle(perm)

    def build(names):
        qs = [T(names[a], "urn:p:n", names[b], "bnode") for a, b in edges]
        qs += [T(names[a], "urn:p:anchor", f"v{i}", "literal")
               for i, a in enumerate(anchors)]
        rng.shuffle(qs)
        return qs

    one = build([f"_:a{i}" for i in range(n)])
    two = build([f"_:zz{perm[i]}" for i in range(n)])
    assert canonical_nquads(one) == canonical_nquads(two)


def test_spark_c14n_operators(spark):
    from semargl_spark.operators.c14n_ops import c14n_doc_hashes, c14n_labels

    rows = [
        ("c1", 0, "_:x", "urn:p:label", "xx", "literal", None, None, None),
        ("c1", 0, "_:x", "urn:p:knows", "_:y", "bnode", None, None, None),
        ("c1", 0, "_:y", "urn:p:label", "yy", "literal", None, None, None),
        # doc with no bnodes → no label rows, still a doc hash
        ("c2", 0, "urn:a", "urn:p", "urn:b", "iri", None, None, None),
    ]
    st_df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, subj string, pred string, obj string,"
        " obj_kind string, lang string, dtype string, graph string",
    )
    labs = c14n_labels(st_df).collect()
    assert {(r["conv_id"], r["label"]) for r in labs} == {
        ("c1", "_:x"), ("c1", "_:y")
    }
    hashes = {r["conv_id"]: r for r in c14n_doc_hashes(st_df).collect()}
    assert hashes["c1"]["n_quads"] == 3 and hashes["c1"]["error"] is None
    # isomorphic relabel of c1 produces the identical content address
    rows2 = [(c, t, s.replace("_:x", "_:k").replace("_:y", "_:w"), p,
              o.replace("_:x", "_:k").replace("_:y", "_:w"), k, la, dt, g)
             for c, t, s, p, o, k, la, dt, g in rows]
    st2 = spark.createDataFrame(rows2, st_df.schema)
    h2 = {r["conv_id"]: r for r in c14n_doc_hashes(st2).collect()}
    assert h2["c1"]["doc_sha256"] == hashes["c1"]["doc_sha256"]
