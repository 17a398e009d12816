"""Reference-API facade tests: property keys, sink selection, gates."""

import pytest
from pyspark.sql import functions as F

from semargl_spark.processor import ParseError, StreamProcessor
from semargl_spark.sources.transcripts import synth_transcripts

from conftest import SF_DIR


def _t(spark, fmt="ntriples", n=40):
    return synth_transcripts(spark, SF_DIR, fmt=fmt).limit(n)


def test_statements_sink_and_gates(spark):
    sp = StreamProcessor()
    out = sp.process(_t(spark), fmt="ntriples")
    assert out.count() == 160  # 4 triples per turn, no error rows
    assert out.filter(F.col("obj_kind") == "error").count() == 0

    # output graph off + processor graph on → only error rows (none here)
    sp2 = StreamProcessor()
    assert sp2.setProperty(StreamProcessor.ENABLE_OUTPUT_GRAPH, False)
    assert sp2.setProperty(StreamProcessor.ENABLE_PROCESSOR_GRAPH, True)
    assert sp2.process(_t(spark), fmt="ntriples").count() == 0

    assert not sp2.setProperty("http://example.org/unknown", 1)


def test_rendered_sinks(spark):
    lines = StreamProcessor(output="ntriples").process(_t(spark), fmt="ntriples")
    assert lines.columns == ["line"]
    assert lines.count() == 160
    ttl = StreamProcessor(output="turtle").process(_t(spark), fmt="ntriples")
    assert ttl.columns == ["conv_id", "turn_idx", "turtle"]


def test_turtle_sink_rejects_unhonorable_properties(spark):
    """setProperty consumed ⟹ takes effect (reference Pipe.setProperty
    contract): the per-document turtle sink cannot apply vocab expansion
    or graph gating, so non-default settings must raise, not silently
    no-op."""
    for key, value in [
        (StreamProcessor.ENABLE_VOCAB_EXPANSION, True),
        (StreamProcessor.ENABLE_PROCESSOR_GRAPH, True),
        (StreamProcessor.ENABLE_OUTPUT_GRAPH, False),
    ]:
        sp = StreamProcessor(output="turtle")
        assert sp.setProperty(key, value)
        with pytest.raises(ValueError, match="turtle"):
            sp.process(_t(spark), fmt="ntriples")


def test_error_recovery_disabled_raises(spark):
    bad = spark.createDataFrame(
        [("cX", 0, "<urn:a> <urn:b> !!malformed")],
        "conv_id string, turn_idx int, text string",
    )
    sp = StreamProcessor()
    sp.setProperty(StreamProcessor.ENABLE_ERROR_RECOVERY, False)
    with pytest.raises(ParseError):
        sp.process(bad, fmt="ntriples")
    # recovery on (default): same corpus, zero task failures, error rows
    sp2 = StreamProcessor()
    sp2.setProperty(StreamProcessor.ENABLE_PROCESSOR_GRAPH, True)
    out = sp2.process(bad, fmt="ntriples")
    assert out.filter(F.col("obj_kind") == "error").count() >= 1


def test_vocab_expansion_via_property(spark):
    vocab = spark.createDataFrame(
        [("urn:p:knows", "http://www.w3.org/2002/07/owl#equivalentProperty",
          "urn:p:acquaintedWith")],
        ["subj", "pred", "obj"],
    )
    sp = StreamProcessor()
    sp.setProperty(StreamProcessor.ENABLE_VOCAB_EXPANSION, True)
    sp.setProperty(StreamProcessor.VOCABULARY_PROPERTY, vocab)
    out = sp.process(_t(spark), fmt="ntriples")
    assert out.filter(F.col("pred") == "urn:p:acquaintedWith").count() == 40
