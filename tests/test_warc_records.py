"""WARC/1.x framing: Content-Length-authoritative payload cuts, HTTP
header lifting, delimiter recovery, never-raise tolerance."""

import pytest
from pyspark.sql import SparkSession

from semargl_spark.sources.warc_records import split_warc_records


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def _warc(uri: str, payload: bytes, wtype: str = "response",
          extra: bytes = b"") -> bytes:
    return (
        b"WARC/1.0\r\n"
        + f"WARC-Type: {wtype}\r\n".encode()
        + b"WARC-Record-ID: <urn:uuid:abc-1>\r\n"
        + f"WARC-Target-URI: {uri}\r\n".encode()
        + b"WARC-Date: 2026-01-02T03:04:05Z\r\n"
        + extra
        + f"Content-Length: {len(payload)}\r\n".encode()
        + b"\r\n"
        + payload
        + b"\r\n\r\n"
    )


_HTTP = (
    b"HTTP/1.1 200 OK\r\n"
    b"Content-Type: text/html; charset=utf-8\r\n"
    b"Server: x\r\n"
    b"\r\n"
    b"<html><body>hello</body></html>"
)


def test_warc_response_record_http_split(spark):
    content = _warc("https://a.example/p", _HTTP)
    df = spark.createDataFrame(
        [(1, bytearray(content))], "file_id long, content binary"
    )
    rows = split_warc_records(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.warc_type == "response"
    assert r.record_id == "urn:uuid:abc-1"
    assert r.target_uri == "https://a.example/p"
    assert r.warc_date == "2026-01-02T03:04:05Z"
    assert r.content_length == len(_HTTP)
    assert r.http_status == 200
    assert r.http_content_type == "text/html; charset=utf-8"
    assert r.body == "<html><body>hello</body></html>"


def test_warc_payload_embedding_warc_line_not_torn(spark):
    # the whole reason Content-Length is authoritative: a response whose
    # BODY contains WARC framing lines must stay one record
    evil = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
        b"about archives:\nWARC/1.0\nWARC-Type: response\n\nnot a record"
    )
    content = _warc("https://a.example/evil", evil) + _warc(
        "https://a.example/next", _HTTP
    )
    df = spark.createDataFrame([(1, content.decode("utf-8"))],
                               "file_id long, content string")
    rows = sorted(split_warc_records(df).collect(),
                  key=lambda r: r.record_idx)
    assert len(rows) == 2
    assert "WARC/1.0" in rows[0].body
    assert rows[1].target_uri == "https://a.example/next"


def test_warc_warcinfo_and_preamble(spark):
    info = b"software: test\nformat: WARC File Format 1.1\n"
    content = (
        b"junk preamble bytes\n"
        + b"WARC/1.1\r\nWARC-Type: warcinfo\r\nContent-Length: "
        + str(len(info)).encode()
        + b"\r\n\r\n"
        + info
        + b"\r\n\r\n"
        + _warc("https://b.example/x", _HTTP)
    )
    df = spark.createDataFrame([(7, content.decode())],
                               "file_id long, content string")
    rows = sorted(split_warc_records(df).collect(),
                  key=lambda r: r.record_idx)
    assert [r.warc_type for r in rows] == ["warcinfo", "response"]
    assert rows[0].http_status is None
    assert rows[0].body == "software: test\nformat: WARC File Format 1.1"
    assert rows[1].http_status == 200


def test_warc_overrun_length_recovers_at_next_record(spark):
    # declared length overruns the file → delimiter recovery keeps the
    # prefix and the NEXT record still parses
    broken = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://c.example/1\r\n"
        b"Content-Length: 999999\r\n\r\n"
        + _HTTP
        + b"\r\n\r\n"
        + _warc("https://c.example/2", _HTTP)
    )
    df = spark.createDataFrame([(1, broken.decode())],
                               "file_id long, content string")
    rows = sorted(split_warc_records(df).collect(),
                  key=lambda r: r.record_idx)
    assert len(rows) == 2
    assert rows[0].target_uri == "https://c.example/1"
    assert rows[0].body.endswith("</html>")
    assert rows[1].target_uri == "https://c.example/2"


def test_warc_garbage_and_null_never_raise(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "no warc here"), (4, "WARC/1.0\r\n")],
        "file_id long, content string",
    )
    rows = split_warc_records(df).collect()
    # only file 4 has a (degenerate, empty) record frame
    assert all(r.file_id == 4 for r in rows)


def test_warc_gzip_members_split_and_corrupt_prefix(spark):
    """.warc.gz layout: each record its own gzip member; a corrupted
    later member yields the intact prefix records, never a raise."""
    import zlib

    def gz(b):
        c = zlib.compressobj(9, zlib.DEFLATED, 31)
        return c.compress(b) + c.flush()

    r1 = _warc("https://g.example/1", _HTTP)
    r2 = _warc("https://g.example/2", _HTTP)
    good = gz(r1) + gz(r2)
    corrupt = gz(r1) + b"\x1f\x8b\x08\x00garbage-not-a-member"
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(corrupt))],
        "file_id long, content binary",
    )
    rows = sorted(
        ((r.file_id, r.record_idx, r.target_uri)
         for r in split_warc_records(df).collect())
    )
    assert rows == [
        (1, 0, "https://g.example/1"),
        (1, 1, "https://g.example/2"),
        (2, 0, "https://g.example/1"),
    ]


def test_warc_charset_aware_body_decode(spark):
    """charset= in the HTTP Content-Type governs entity decoding:
    latin-1 and cp1252 bodies must not mojibake under a blind utf-8
    pass; unknown charsets fall back to utf-8-replace."""
    lat = "café olé".encode("latin-1")
    cp = "café — dash".encode("cp1252")
    utf = "café utf".encode("utf-8")
    mk = lambda ct, body: _warc(
        "https://cs.example/x",
        b"HTTP/1.1 200 OK\r\nContent-Type: " + ct + b"\r\n\r\n" + body,
    )
    df = spark.createDataFrame(
        [
            (1, bytearray(mk(b"text/html; charset=ISO-8859-1", lat))),
            (2, bytearray(mk(b'text/html; charset="windows-1252"', cp))),
            (3, bytearray(mk(b"text/html; charset=utf-8", utf))),
            (4, bytearray(mk(b"text/html; charset=bogus-enc", utf))),
            (5, bytearray(mk(b"text/html", utf))),
        ],
        "file_id long, content binary",
    )
    got = {r.file_id: r.body for r in split_warc_records(df).collect()}
    assert got[1] == "café olé"
    assert got[2] == "café — dash"
    assert got[3] == got[4] == got[5] == "café utf"
