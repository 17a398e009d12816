"""WET-style record splitting (sources/wet_records.py)."""


def test_wet_split_records(spark):
    from semargl_spark.sources.wet_records import split_wet_records

    wet = ("junk preamble\n"
           "WARC/1.0\n"
           "WARC-Type: conversion\n"
           "WARC-Target-URI: https://a.example/x\n"
           "WARC-Date: 2026-01-01T00:00:00Z\n"
           "Content-Length: 11\n"
           "\n"
           "hello world\n\n"
           "WARC/1.0\r\n"
           "WARC-Type: conversion\r\n"
           "WARC-Target-URI: https://b.example/y\r\n"
           "\r\n"
           "second doc\nline two\n")
    df = spark.createDataFrame([(1, wet)], "file_id long, content string")
    rows = {r.record_idx: r for r in split_wet_records(df).collect()}
    assert set(rows) == {0, 1}
    r0, r1 = rows[0], rows[1]
    assert r0.target_uri == "https://a.example/x"
    assert r0.warc_date == "2026-01-01T00:00:00Z"
    assert r0.content_length == 11 and r0.text == "hello world"
    # CRLF framing, absent headers → NULL, multi-line payload preserved
    assert r1.target_uri == "https://b.example/y"
    assert r1.warc_date is None and r1.content_length is None
    assert r1.text == "second doc\nline two"


def test_wet_split_empty_and_headerless(spark):
    from semargl_spark.sources.wet_records import split_wet_records

    df = spark.createDataFrame(
        [(1, "no records here at all"), (2, "WARC/1.0\n\nbare body\n")],
        "file_id long, content string",
    )
    rows = split_wet_records(df).collect()
    assert len(rows) == 1
    assert rows[0].file_id == 2 and rows[0].text == "bare body"
    assert rows[0].target_uri is None
