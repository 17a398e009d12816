"""WARC/1.x record splitting — the raw Common Crawl ingestion shape.

A WARC file is a concatenation of records, each a version line
(``WARC/1.0`` / ``WARC/1.1``), a header block (``WARC-Type``,
``WARC-Target-URI``, ``WARC-Date``, ``Content-Length`` …), a blank
line, then exactly ``Content-Length`` bytes of payload, then two
blank lines. Unlike the derived WET shape (see ``wet_records``),
the length header is AUTHORITATIVE: response payloads are arbitrary
bytes (HTML, images, even embedded ``WARC/1.0`` lines), so framing
must count bytes, not pattern-match — a regex split would tear any
page that quotes a WARC header. For ``response`` records the payload
itself is an HTTP message; the splitter also lifts the status code
and entity headers and hands downstream the entity body, which is
what the main-content/quality chain (``html_main_blocks`` →
``gopher_filter`` → dedup) consumes.

Spark-first shape: a narrow ``mapInArrow`` over (file_id, content) —
pure per-file sequential framing, zero shuffle, rows grow only by the
records-per-file factor; 1000 executors each frame their own file
splits independently. Content arrives as a string or binary column;
lengths are counted on UTF-8 bytes. Framing is error-tolerant and
never fails the task (reference E10 contract,
core/.../BaseStreamProcessor.java:91-120): a record whose declared
length overruns the file falls back to delimiter recovery (next
version line at a line start), and undeclared lengths frame the same
way, so a truncated tail still yields its prefix records.
"""

from __future__ import annotations

import re
from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_VERSION_RE = re.compile(rb"(?m)^WARC/(?:0\.\d+|1\.\d+)\r?\n")
_HDR_RE = re.compile(rb"^([A-Za-z0-9_.-]+):[ \t]*(.*?)[ \t]*$")
_STATUS_RE = re.compile(rb"^HTTP/\d\.\d[ \t]+(\d{3})")

_OUT_FIELDS = [
    ("record_idx", IntegerType(), pa.int32()),
    ("warc_type", StringType(), pa.string()),
    ("record_id", StringType(), pa.string()),
    ("target_uri", StringType(), pa.string()),
    ("warc_date", StringType(), pa.string()),
    ("content_length", LongType(), pa.int64()),
    ("http_status", IntegerType(), pa.int32()),
    ("http_content_type", StringType(), pa.string()),
    ("body", StringType(), pa.string()),
]


def _hdr_block(data: bytes, start: int) -> tuple[dict, int]:
    """Parse ``Name: value`` lines from ``start`` until the blank line;
    returns (lower-cased header dict, index just past the blank line)."""
    headers: dict[str, bytes] = {}
    pos = start
    n = len(data)
    while pos < n:
        eol = data.find(b"\n", pos)
        if eol < 0:
            eol = n
        line = data[pos:eol].rstrip(b"\r")
        nxt = eol + 1
        if line == b"":
            return headers, nxt
        m = _HDR_RE.match(line)
        if m:
            headers[m.group(1).decode("latin-1").lower()] = m.group(2)
        pos = nxt
    return headers, n


def _http_split(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """HTTP-message payload → (status, content-type, entity body)."""
    m = _STATUS_RE.match(payload)
    if not m:
        return None, None, payload
    status = int(m.group(1))
    headers, body_start = _hdr_block(payload, payload.find(b"\n") + 1)
    ctype = headers.get("content-type")
    return (
        status,
        ctype.decode("latin-1") if ctype is not None else None,
        payload[body_start:],
    )


_CHARSET_RE = re.compile(r"charset\s*=\s*\"?([A-Za-z0-9_.:-]+)", re.I)


def _decode_body(body: bytes, hctype: str | None) -> str:
    """Charset-aware entity decoding: honor ``charset=`` in the HTTP
    Content-Type (crawled pages are NOT all UTF-8 — latin-1/cp1252
    bodies mojibake under a blind utf-8 pass); unknown or absent
    charsets fall back to UTF-8 with replacement, never a raise."""
    codec = "utf-8"
    if hctype:
        m = _CHARSET_RE.search(hctype)
        if m:
            codec = m.group(1)
    try:
        return body.decode(codec, errors="replace")
    except LookupError:
        return body.decode("utf-8", errors="replace")


def _frame_records(data: bytes):
    """Yield (warc_headers, payload_bytes) per record, Content-Length
    authoritative, delimiter recovery on overrun/absence."""
    pos = 0
    n = len(data)
    while True:
        m = _VERSION_RE.search(data, pos)
        if m is None:
            return
        headers, body_start = _hdr_block(data, m.end())
        clen = None
        raw = headers.get("content-length")
        if raw is not None and raw.isdigit():
            clen = int(raw)
        if clen is not None and body_start + clen <= n:
            payload = data[body_start : body_start + clen]
            pos = body_start + clen
        else:
            # undeclared or overrunning length: recover at the next
            # version line that opens a real record (followed by a
            # WARC- header or immediate blank line, as in wet_records)
            nxt = _VERSION_RE.search(data, body_start)
            while nxt is not None:
                after = data[nxt.end() : nxt.end() + 5]
                if after.startswith(b"WARC-") or after[:2] in (b"\r\n", b"\n\n") or after[:1] == b"\n":
                    break
                nxt = _VERSION_RE.search(data, nxt.end())
            end = nxt.start() if nxt is not None else n
            payload = data[body_start:end].rstrip(b"\r\n")
            pos = end
        yield headers, clen, payload


def gunzip_members(data: bytes) -> bytes:
    """Concatenated gzip members → concatenated plaintext — the
    ``.warc.gz`` layout (Common Crawl compresses each record as its own
    gzip member so readers can seek to records). Best-effort: a
    corrupted member ends the scan and the prefix decodes, matching the
    truncated-tail tolerance of the framing itself."""
    import zlib

    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n and data[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        try:
            out += d.decompress(data[pos:])
        except zlib.error:
            break
        if not d.eof:
            break
        remaining = len(d.unused_data)
        pos = n - remaining
    return bytes(out)


def split_warc_records(
    files: DataFrame, id_col: str = "file_id", content_col: str = "content"
) -> DataFrame:
    """``(file_id, content)`` → one row per WARC record. Gzip input
    (``.warc.gz`` member-per-record, sniffed by magic) is inflated
    in-kernel first.

    → (file_id, record_idx, warc_type, record_id, target_uri,
    warc_date, content_length, http_status, http_content_type, body):
    ``record_idx`` is the record's 0-based position within its file;
    WARC header fields are NULL when absent; ``http_status`` /
    ``http_content_type`` are lifted from the embedded HTTP message of
    ``response``-style payloads (NULL for non-HTTP payloads, whose
    ``body`` is the raw payload text). Bytes before the first version
    line (split preambles) are dropped.
    """
    id_field = files.schema[id_col]
    src = files.select(id_col, content_col)

    out_schema = StructType(
        [StructField(id_col, id_field.dataType, id_field.nullable)]
        + [StructField(nm, t, True) for nm, t, _ in _OUT_FIELDS]
    )

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        arrow_id_type = None
        for rb in batches:
            names = rb.schema.names
            id_arr = rb.column(names.index(id_col))
            arrow_id_type = id_arr.type
            ids = id_arr.to_pylist()
            contents = rb.column(names.index(content_col)).to_pylist()
            cols: list[list] = [[] for _ in range(1 + len(_OUT_FIELDS))]
            for fid, content in zip(ids, contents):
                if content is None:
                    continue
                data = (
                    content
                    if isinstance(content, (bytes, bytearray))
                    else str(content).encode("utf-8")
                )
                if data[:2] == b"\x1f\x8b":
                    data = gunzip_members(bytes(data))
                for idx, (headers, clen, payload) in enumerate(
                    _frame_records(bytes(data))
                ):
                    wtype = headers.get("warc-type")
                    is_http = wtype in (b"response", b"request") or (
                        b"application/http"
                        in headers.get("content-type", b"")
                    )
                    if is_http:
                        status, hctype, body = _http_split(payload)
                        text = _decode_body(body, hctype)
                    else:
                        status, hctype, body = None, None, payload
                        text = body.decode("utf-8", errors="replace")
                    cols[0].append(fid)
                    cols[1].append(idx)
                    cols[2].append(
                        wtype.decode("latin-1") if wtype is not None else None
                    )
                    rid = headers.get("warc-record-id")
                    cols[3].append(
                        rid.decode("latin-1").strip("<>") if rid is not None else None
                    )
                    uri = headers.get("warc-target-uri")
                    cols[4].append(
                        uri.decode("latin-1") if uri is not None else None
                    )
                    dt = headers.get("warc-date")
                    cols[5].append(
                        dt.decode("latin-1") if dt is not None else None
                    )
                    cols[6].append(clen)
                    cols[7].append(status)
                    cols[8].append(hctype)
                    cols[9].append(text.strip("\r\n"))
            yield pa.RecordBatch.from_arrays(
                [pa.array(cols[0], type=arrow_id_type)]
                + [
                    pa.array(c, type=t)
                    for c, (_, _, t) in zip(cols[1:], _OUT_FIELDS)
                ],
                names=[id_col] + [nm for nm, _, _ in _OUT_FIELDS],
            )

    return src.mapInArrow(run, schema=out_schema)
