"""Unit tests for the KG fusion operators
(semargl_spark/operators/fusion.py): OWL property-semantics inference,
sameAs entity fusion, and iterative truth discovery."""

from __future__ import annotations

import pytest

from semargl_spark.operators.fusion import (
    OWL_SAME_AS,
    owl_infer,
    sameas_fuse,
    truth_discovery,
)


def _g(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def _rows(df):
    return {tuple(r) for r in df.collect()}


class TestOwlInfer:
    def test_inverse_both_directions(self, spark):
        g = _g(spark, [
            ("a", "urn:p:partOf", "b"),
            ("c", "urn:p:hasPart", "d"),
        ])
        out = _rows(owl_infer(g, inverse=[("urn:p:partOf", "urn:p:hasPart")]))
        assert out == {
            ("b", "urn:p:hasPart", "a"),
            ("d", "urn:p:partOf", "c"),
        }

    def test_symmetric_excludes_asserted(self, spark):
        g = _g(spark, [
            ("a", "urn:p:adj", "b"),
            ("b", "urn:p:adj", "a"),  # mirror already asserted
            ("c", "urn:p:adj", "d"),
        ])
        out = _rows(owl_infer(g, symmetric=["urn:p:adj"]))
        assert out == {("d", "urn:p:adj", "c")}

    def test_transitive_closure_new_pairs_only(self, spark):
        g = _g(spark, [
            ("a", "urn:p:in", "b"),
            ("b", "urn:p:in", "c"),
            ("c", "urn:p:in", "d"),
            ("x", "urn:p:other", "y"),
        ])
        out = _rows(owl_infer(g, transitive=["urn:p:in"]))
        assert out == {
            ("a", "urn:p:in", "c"),
            ("a", "urn:p:in", "d"),
            ("b", "urn:p:in", "d"),
        }

    def test_transitive_cycle_terminates(self, spark):
        g = _g(spark, [
            ("a", "urn:p:in", "b"),
            ("b", "urn:p:in", "a"),
        ])
        out = _rows(owl_infer(g, transitive=["urn:p:in"]))
        # closure on a 2-cycle adds the self-loops
        assert out == {("a", "urn:p:in", "a"), ("b", "urn:p:in", "b")}

    def test_functional_emits_canonical_sameas(self, spark):
        g = _g(spark, [
            ("s", "urn:p:capital", "z"),
            ("s", "urn:p:capital", "a"),
            ("t", "urn:p:capital", "only"),
        ])
        out = _rows(owl_infer(g, functional=["urn:p:capital"]))
        assert out == {("a", OWL_SAME_AS, "z")}

    def test_inverse_functional(self, spark):
        g = _g(spark, [
            ("u1", "urn:p:made", "w"),
            ("u2", "urn:p:made", "w"),
            ("u3", "urn:p:made", "v"),
        ])
        out = _rows(owl_infer(g, inverse_functional=["urn:p:made"]))
        assert out == {("u1", OWL_SAME_AS, "u2")}

    def test_no_axioms_raises(self, spark):
        g = _g(spark, [("a", "p", "b")])
        with pytest.raises(ValueError):
            owl_infer(g)


class TestSameasFuse:
    def test_chain_fuses_to_min_and_rewrites_both_sides(self, spark):
        sameas = spark.createDataFrame(
            [("e1", "m1"), ("m1", "a1")], "src string, dst string"
        )
        g = _g(spark, [
            ("m1", "urn:p:knows", "e2"),   # subj rewrite
            ("e2", "urn:p:knows", "e1"),   # obj rewrite
            ("a1", "urn:p:knows", "e2"),   # collides with row 1 post-fuse
            ("zz", "urn:p:knows", "zz"),   # untouched passthrough
        ])
        out = _rows(sameas_fuse(g, sameas))
        assert out == {
            ("a1", "urn:p:knows", "e2"),
            ("e2", "urn:p:knows", "a1"),
            ("zz", "urn:p:knows", "zz"),
        }

    def test_empty_sameas_is_identity_set(self, spark):
        sameas = spark.createDataFrame([], "src string, dst string")
        g = _g(spark, [("a", "p", "b"), ("a", "p", "b")])
        assert _rows(sameas_fuse(g, sameas)) == {("a", "p", "b")}


class TestTruthDiscovery:
    def _a(self, spark, rows):
        return spark.createDataFrame(
            rows, "source string, subj string, pred string, obj string"
        )

    def test_majority_vote_round1(self, spark):
        a = self._a(spark, [
            ("s1", "e", "p", "X"),
            ("s2", "e", "p", "X"),
            ("s3", "e", "p", "Y"),
        ])
        out = truth_discovery(a, rounds=1).collect()
        assert [tuple(r) for r in out] == [("e", "p", "X", 2)]

    def test_tie_breaks_to_min_obj(self, spark):
        a = self._a(spark, [
            ("s1", "e", "p", "B"),
            ("s2", "e", "p", "A"),
        ])
        out = truth_discovery(a, rounds=1).collect()
        assert [tuple(r) for r in out] == [("e", "p", "A", 1)]

    def test_round2_reliability_flips_tied_claim(self, spark):
        # s1 agrees with the majority on e1/e2; s2 never does. On e3
        # only s1 and s2 speak and s2's claim wins the round-1 tie
        # lexicographically — round 2's reliability weights flip it.
        a = self._a(spark, [
            ("s1", "e1", "p", "X"), ("s3", "e1", "p", "X"),
            ("s1", "e2", "p", "Y"), ("s3", "e2", "p", "Y"),
            ("s2", "e1", "p", "W"),
            ("s1", "e3", "p", "Z"),
            ("s2", "e3", "p", "A"),
        ])
        r1 = {(r.subj, r.obj) for r in truth_discovery(a, rounds=1).collect()}
        assert ("e3", "A") in r1
        r2 = {
            (r.subj, r.obj): r.score
            for r in truth_discovery(a, rounds=2).collect()
        }
        # s1 weight = 1 + 2 agreements (e1, e2) = 3;
        # s2 weight = 1 + 1 (it won the e3 round-1 tie) = 2
        assert r2[("e3", "Z")] == 3
        assert ("e3", "A") not in {k for k in r2}

    def test_duplicate_assertions_count_once(self, spark):
        a = self._a(spark, [
            ("s1", "e", "p", "X"),
            ("s1", "e", "p", "X"),
            ("s2", "e", "p", "Y"),
        ])
        out = truth_discovery(a, rounds=1).collect()
        # X vs Y tie at weight 1 each → min obj wins
        assert [tuple(r) for r in out] == [("e", "p", "X", 1)]

    def test_invalid_rounds(self, spark):
        a = self._a(spark, [("s1", "e", "p", "X")])
        with pytest.raises(ValueError):
            truth_discovery(a, rounds=0)


class TestDifferential:
    """Fusion operators vs pure-Python mirrors on seeded random
    instances — structural variety beyond the fixed oracle corpus."""

    def test_truth_discovery_matches_python_mirror(self, spark):
        import random

        rng = random.Random(7)
        for trial in range(3):
            rows = []
            for _ in range(60):
                rows.append((
                    f"s{rng.randrange(5)}",
                    f"e{rng.randrange(8)}",
                    "p",
                    f"o{rng.randrange(4)}",
                ))
            a = spark.createDataFrame(
                rows, "source string, subj string, pred string, obj string"
            )
            for rounds in (1, 2, 3):
                got = {
                    (r.subj, r.pred): (r.obj, r.score)
                    for r in truth_discovery(a, rounds=rounds).collect()
                }
                assert got == _truth_mirror(set(rows), rounds)

    def test_owl_transitive_matches_python_closure(self, spark):
        import random

        rng = random.Random(11)
        from semargl_spark.operators.fusion import owl_infer

        for trial in range(3):
            edges = {
                (f"v{rng.randrange(10)}", f"v{rng.randrange(10)}")
                for _ in range(14)
            }
            edges = {(a, b) for a, b in edges}
            g = spark.createDataFrame(
                [(a, "urn:p:in", b) for a, b in edges],
                "subj string, pred string, obj string",
            )
            got = {
                (r.subj, r.obj)
                for r in owl_infer(g, transitive=["urn:p:in"]).collect()
            }
            # warshall closure minus asserted
            clo = set(edges)
            changed = True
            while changed:
                changed = False
                for a, b in list(clo):
                    for c, d in list(clo):
                        if b == c and (a, d) not in clo:
                            clo.add((a, d))
                            changed = True
            assert got == clo - edges


def _truth_mirror(assertions, rounds):
    """Pure-Python truth_discovery: same integer weights/tie-breaks."""
    a = sorted(assertions)
    sources = sorted({s for s, *_ in a})
    w = {s: 1 for s in sources}
    winners = {}
    for r in range(rounds):
        score = {}
        for s, subj, pred, obj in a:
            score[(subj, pred, obj)] = score.get((subj, pred, obj), 0) + w[s]
        winners = {}
        for (subj, pred, obj), sc in score.items():
            cur = winners.get((subj, pred))
            # max score, tie → lexicographic min obj
            if cur is None or (-sc, obj) < (-cur[1], cur[0]):
                winners[(subj, pred)] = (obj, sc)
        if r + 1 < rounds:
            agree = {s: 0 for s in sources}
            for s, subj, pred, obj in a:
                if winners.get((subj, pred), (None,))[0] == obj:
                    agree[s] += 1
            w = {s: 1 + agree[s] for s in sources}
    return winners


class TestPredicateAlign:
    def test_overlap_containment_and_disjoint(self, spark):
        from semargl_spark.operators.fusion import predicate_align

        g1 = _g(spark, [
            ("a", "p:knows", "b"), ("c", "p:knows", "d"),
            ("a", "p:rel", "x"),
        ])
        g2 = _g(spark, [
            ("a", "q:friend", "b"),            # half of knows
            ("a", "q:rel2", "x"),              # all of rel
            ("zz", "q:other", "zz"),           # disjoint
        ])
        out = {
            (r.pred1, r.pred2): (r.n1, r.n2, r.inter, r.jaccard_pm)
            for r in predicate_align(g1, g2).collect()
        }
        assert out == {
            ("p:knows", "q:friend"): (2, 1, 1, 500),
            ("p:rel", "q:rel2"): (1, 1, 1, 1000),
        }

    def test_min_overlap_filters(self, spark):
        from semargl_spark.operators.fusion import predicate_align

        g1 = _g(spark, [("a", "p", "b")])
        g2 = _g(spark, [("a", "q", "b")])
        assert predicate_align(g1, g2, min_overlap=2).count() == 0
        with pytest.raises(ValueError):
            predicate_align(g1, g2, min_overlap=0)

    def test_duplicates_collapse_to_set_semantics(self, spark):
        from semargl_spark.operators.fusion import predicate_align

        g1 = _g(spark, [("a", "p", "b"), ("a", "p", "b")])
        g2 = _g(spark, [("a", "q", "b")])
        r = predicate_align(g1, g2).collect()[0]
        assert (r.n1, r.n2, r.inter, r.jaccard_pm) == (1, 1, 1, 1000)


class TestQuotientGraph:
    def test_regular_block_and_counts(self, spark):
        from semargl_spark.operators.graph import quotient_graph

        edges = spark.createDataFrame(
            [("a1", "p", "b1"), ("a1", "p", "b2"),
             ("a2", "p", "b1"), ("a2", "p", "b2"),
             ("a1", "p", "a2"),
             ("a1", "p", "b1")],  # duplicate edge collapses
            "src string, pred string, dst string",
        )
        colors = spark.createDataFrame(
            [("a1", "A"), ("a2", "A"), ("b1", "B"), ("b2", "B")],
            "node string, color string",
        )
        out = {
            (r.src_color, r.pred, r.dst_color): (r.n_edges, r.n_src, r.n_dst)
            for r in quotient_graph(edges, colors).collect()
        }
        # A→B is the complete bipartite block: n_edges == n_src * n_dst
        assert out == {
            ("A", "p", "B"): (4, 2, 2),
            ("A", "p", "A"): (1, 1, 1),
        }
