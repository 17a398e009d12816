"""WET-style record splitting — the Common Crawl ingestion shape.

A WET (WARC-encapsulated text) file is a concatenation of records,
each a ``WARC/1.0`` header block (``WARC-Type``, ``WARC-Target-URI``,
``WARC-Date``, ``Content-Length`` …) followed by a blank line and the
extracted text payload. A crawl-curation pipeline's first step is
splitting these concatenations into one row per document with the URI
and date lifted out of the headers — everything downstream
(url_canonicalize → html_main_blocks/quality → dedup) keys on that
row shape.

Spark-first: the splitter is pure JVM expressions — one regex split on
the record delimiter, a posexplode, and regexp header extraction; no
Python in the path, no shuffle (rows grow by the records-per-file
factor only). Payload boundaries follow the blank line after the
header block; ``Content-Length`` is carried through as metadata but
NOT used to cut the payload (concatenated WET text payloads are
newline-delimited in practice, and trusting the delimiter keeps the
splitter robust to length drift from re-encoding — the documented
deviation from strict WARC framing, where the length is authoritative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# record boundary = a WARC/1.0 version line IMMEDIATELY followed by a
# WARC- header line (or the end-of-headers blank line, tolerating
# degenerate headerless records) — a payload line that merely quotes
# "WARC/1.0" before ordinary prose (pages about web archiving) must not
# split a record mid-payload and fabricate a bogus NULL-header record.
# Java regex lookahead, JVM-side.
_REC_DELIM = r"(?m)^WARC/1\.0\r?\n(?=WARC-|\r?\n)"


def split_wet_records(
    files: DataFrame, id_col: str = "file_id", text_col: str = "content"
) -> DataFrame:
    """``(file_id, content)`` → one row per WET record.

    → (file_id, record_idx, warc_type, target_uri, warc_date,
    content_length, text): ``record_idx`` is the record's 0-based
    position within its file; header fields are NULL when absent;
    ``text`` is the payload after the first blank line, trimmed of
    leading/trailing newlines. Preamble bytes before the first
    ``WARC/1.0`` line (file-level ``warcinfo`` junk, BOMs) are dropped.
    """
    recs = files.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), _REC_DELIM)).alias(
            "_idx", "_rec"
        ),
    ).filter((F.col("_idx") > 0) & (F.trim(F.col("_rec")) != ""))

    header = F.regexp_extract(F.col("_rec"), r"(?s)^(.*?)\r?\n\r?\n", 1)
    # anchored + lazy: matches at most once, so replace-all is safe
    body = F.regexp_replace(F.col("_rec"), r"(?s)^.*?\r?\n\r?\n", "")

    def hdr(name):
        return F.regexp_extract(
            header, rf"(?m)^{name}:\s*(\S[^\r\n]*)", 1
        )

    def opt(col):
        return F.when(col == "", None).otherwise(col)

    return recs.select(
        id_col,
        (F.col("_idx") - 1).cast("int").alias("record_idx"),
        opt(hdr("WARC-Type")).alias("warc_type"),
        opt(hdr("WARC-Target-URI")).alias("target_uri"),
        opt(hdr("WARC-Date")).alias("warc_date"),
        opt(hdr("Content-Length")).cast("long").alias("content_length"),
        F.regexp_replace(
            F.regexp_replace(body, r"^[\r\n]+", ""), r"[\r\n]+$", ""
        ).alias("text"),
    )
