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


def test_parse_sitemaps_entries_and_index(spark):
    from semargl_spark.sources.sitemap import parse_sitemaps

    sm = ('<?xml version="1.0"?><urlset>'
          '<url><loc>https://a.example/p?x=1&amp;y=2</loc>'
          '<lastmod>2026-01-01</lastmod><changefreq>daily</changefreq>'
          '<priority>0.8</priority></url>'
          '<url><loc>https://a.example/q</loc></url></urlset>')
    idx = ('<sitemapindex><sitemap><loc>https://a.example/s1.xml</loc>'
           '</sitemap></sitemapindex>')
    df = spark.createDataFrame(
        [(1, sm), (2, idx), (3, "garbage <not xml")],
        "file_id long, content string",
    )
    rows = {(r.file_id, r.entry_idx): r for r in parse_sitemaps(df).collect()}
    assert set(rows) == {(1, 0), (1, 1), (2, 0)}  # malformed → zero rows
    full = rows[(1, 0)]
    assert full.loc == "https://a.example/p?x=1&y=2"  # &amp; unescaped
    assert full.priority_pm == 800 and full.changefreq == "daily"
    assert rows[(1, 1)].lastmod is None
    assert rows[(2, 0)].kind == "sitemap"


def test_crawl_schedule_politeness(spark):
    from semargl_spark.operators.curation import crawl_schedule

    urls = spark.createDataFrame(
        [(i, f"https://h{i % 2}.example/p/{i}") for i in range(6)],
        "doc_id long, url string",
    )
    delays = spark.createDataFrame(
        [("h0.example", 5)], "host string, crawl_delay_s int")
    got = {r.doc_id: r for r in crawl_schedule(urls, delays).collect()}
    # h0 gets docs 0,2,4 at 5s spacing; h1 falls back to the 1s default
    assert [(got[i].fetch_seq, got[i].fetch_offset_s) for i in (0, 2, 4)] \
        == [(0, 0), (1, 5), (2, 10)]
    assert [(got[i].fetch_seq, got[i].fetch_offset_s) for i in (1, 3, 5)] \
        == [(0, 0), (1, 1), (2, 2)]


def test_stream_crawl_frontier_dedups_across_batches(spark, tmp_path):
    from semargl_spark.streaming.stream_crawl import stream_crawl_frontier

    def wet(uri, body):
        return (f"WARC/1.0\nWARC-Type: conversion\n"
                f"WARC-Target-URI: {uri}\n\n{body}\n")

    rows = [
        (1, wet("https://a.example/x", "doc x")),
        # tracker-spelled twin of the same page, identical payload
        (2, wet("HTTPS://A.Example/x?utm_source=t", "doc x")),
        (3, wet("https://a.example/y", "doc y")),
        (4, "no records in this landing file"),
    ]
    df = spark.createDataFrame(rows, "file_id long, content string")
    # many small files force several micro-batches through the dedup state
    df.repartition(4).write.mode("overwrite").parquet(str(tmp_path / "in"))
    q = stream_crawl_frontier(spark, str(tmp_path / "in"),
                              str(tmp_path / "out"), str(tmp_path / "ckpt"))
    q.awaitTermination()
    got = {(r.url_canon, r.text)
           for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert got == {("https://a.example/x", "doc x"),
                   ("https://a.example/y", "doc y")}
    # idempotent re-drain: no new rows
    q2 = stream_crawl_frontier(spark, str(tmp_path / "in"),
                               str(tmp_path / "out"), str(tmp_path / "ckpt"))
    q2.awaitTermination()
    assert spark.read.parquet(str(tmp_path / "out")).count() == 2
