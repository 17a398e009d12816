"""End-to-end extraction over Spark: generator → mapInPandas kernels →
statements DataFrame (SURVEY.md §7.1 minimum slice)."""

import pytest
from pyspark.sql import functions as F

from semargl_spark.operators.extract import (
    dedup_triples,
    errors,
    extract_statements,
    sniff_format,
    triples,
)
from semargl_spark.sources.transcripts import synth_transcripts

from conftest import SF_DIR


def test_ntriples_extraction_counts(spark):
    t = synth_transcripts(spark, SF_DIR, fmt="ntriples")
    n_turns = t.count()
    st = extract_statements(t)
    assert triples(st).count() == 4 * n_turns
    assert errors(st).count() == 0


def test_mixed_corpus_splits(spark):
    t = synth_transcripts(spark, SF_DIR)
    st = extract_statements(t).cache()
    kinds = {r["obj_kind"] for r in st.select("obj_kind").distinct().collect()}
    assert "error" in kinds and "literal" in kinds and "iri" in kinds
    # malformed turns produce errors but never fail the job
    assert errors(st).count() > 0
    st.unpersist()


def test_extraction_is_pure_per_turn(spark):
    """per-turn text equality invariant: same (text, doc_uri) → same rows."""
    t = synth_transcripts(spark, SF_DIR, fmt="jsonld").limit(10)
    a = extract_statements(t).collect()
    b = extract_statements(t).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_dedup_triples(spark):
    t = synth_transcripts(spark, SF_DIR, fmt="ntriples").limit(5)
    st = extract_statements(t)
    doubled = st.unionByName(st)
    assert dedup_triples(doubled).count() == st.count()


def test_sniffer():
    assert sniff_format('{"@id": "x"}') == "jsonld"
    assert sniff_format("<urn:a> <urn:b> <urn:c> .") == "ntriples"
    assert sniff_format("# comment\n<urn:a> <urn:b> <urn:c> .") == "ntriples"
    assert sniff_format('<?xml version="1.0"?><rdf:RDF>') == "rdfxml"
    assert sniff_format('<div about="#x">hi</div>') == "rdfa"
    assert sniff_format("plain prose here") == "text"
    # attribute sniffs are tag-anchored (r3 advice): prose or script that
    # merely MENTIONS the attribute names must not cross-route
    assert sniff_format('<div itemscope itemtype="urn:t">x</div>') == "microdata"
    assert sniff_format("<p>the itemscope attribute is neat</p>") == "rdfa"
    assert (
        sniff_format('<div itemscope><script>var property="x"</script></div>')
        == "microdata"
    )
    assert sniff_format('<div property="urn:p" itemscope>both</div>') == "rdfa"


def test_extraction_plan_is_narrow(spark):
    """The extraction stage adds no shuffle (SURVEY.md §4.2: the parse is
    embarrassingly parallel; shuffles belong to linking/canon only).
    The only Exchange in the plan is the generator's deliberate
    round-robin seed spread."""
    t = synth_transcripts(spark, SF_DIR, fmt="ntriples")
    base_plan = t._jdf.queryExecution().executedPlan().toString()
    plan = triples(extract_statements(t))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == base_plan.count("Exchange") == 1
    assert "roundrobin" in plan.lower()


def test_chunked_reassembly_ultra_long_conversation(spark):
    """A conversation far past any sane single-row budget must split
    into byte-bounded parts, and a shared author bnode must still unify
    across every part (name-keyed relabeling under the conversation
    doc_key)."""
    from semargl_spark.operators.extract import reassemble_conversations

    n_turns, budget = 200, 4096
    filler = "x" * 900  # ~1 KB turns → ~200 KB conversation
    rows = [
        (
            "cbig",
            i,
            f'<urn:e:{i}> <urn:p:pad> "{filler}" .\n'
            f'_:shared <urn:p:label> "turn {i}"@en .\n'
            f'_:t{i} <urn:p:local> "only {i}" .\n',
        )
        for i in range(n_turns)
    ]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")

    docs = reassemble_conversations(t, max_bytes=budget).persist()
    parts = docs.collect()
    assert len(parts) > 10  # genuinely chunked
    per_turn = max(len(r[2]) for r in rows) + 1
    assert all(len(p["text"].encode()) <= budget + per_turn for p in parts)
    assert {p["doc_key"] for p in parts} == {"cbig"}
    # parts partition the turns: total payload preserved
    assert sum(p["text"].count("<urn:p:pad>") for p in parts) == n_turns

    st = triples(extract_statements(docs, default_fmt="ntriples"))
    shared = st.filter(F.col("pred") == "urn:p:label")
    # one unified bnode carrying all turn labels
    assert shared.select("subj").distinct().count() == 1
    assert shared.count() == n_turns
    assert shared.first()["subj"] == "_:bcbig_xshared"
    # per-turn bnodes stay distinct
    local = st.filter(F.col("pred") == "urn:p:local")
    assert local.select("subj").distinct().count() == n_turns
    docs.unpersist()


def test_chunked_reassembly_matches_unchunked_semantics(spark):
    """Chunked extraction must produce the same graph as the one-row
    path up to bnode labels: compare with labels normalized away."""
    from semargl_spark.operators.extract import reassemble_conversations

    t = synth_transcripts(spark, SF_DIR, fmt="ntriples").limit(40)

    def norm(df):
        return {
            tuple(r)
            for r in df.select(
                "conv_id",
                F.regexp_replace("subj", r"^_:.*", "_:B").alias("subj"),
                "pred",
                "obj",
                "obj_kind",
            ).collect()
        }

    whole = triples(
        extract_statements(reassemble_conversations(t), default_fmt="ntriples")
    )
    chunked = triples(
        extract_statements(
            reassemble_conversations(t, max_bytes=200), default_fmt="ntriples"
        )
    )
    assert norm(whole) == norm(chunked)
