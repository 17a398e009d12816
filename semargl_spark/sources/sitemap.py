"""Sitemap parsing — the crawl-frontier feed beside robots.txt.

XML sitemaps (sitemaps.org protocol) carry either ``<url>`` entries
(page locations with optional lastmod/changefreq/priority) or — in an
index file — ``<sitemap>`` entries pointing at child sitemaps. The
frontier builder needs both flattened to rows.

Spark-first: sitemaps are flat, schema-fixed XML, so entry extraction
is two ``regexp_extract_all`` passes plus per-entry field regexes —
all JVM expressions, narrow (rows grow by entries-per-file), no Python
and no shuffle. Entities in ``<loc>`` get the standard five-entity
unescape (ampersands are common in URLs). Malformed files simply yield
zero entries — never a failure (E10 discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _unescape(col):
    for ent, rep in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                     ("&#39;", "'"), ("&apos;", "'"), ("&amp;", "&")):
        col = F.replace(col, F.lit(ent), F.lit(rep))
    return col


def parse_sitemaps(
    files: DataFrame, id_col: str = "file_id", text_col: str = "content"
) -> DataFrame:
    """``(file_id, content)`` → one row per sitemap entry.

    → (file_id, entry_idx, kind, loc, lastmod, changefreq, priority_pm):
    ``kind`` is ``url`` for page entries and ``sitemap`` for index
    entries; ``entry_idx`` numbers url and sitemap entries in one
    document-order sequence; optional fields are NULL when absent;
    ``priority`` is scaled to integer permil (0.5 → 500) so the column
    is drift-free across engines.
    """
    url_entries = F.expr(
        f"regexp_extract_all({text_col}, '(?s)<url>(.*?)</url>', 1)"
    )
    smap_entries = F.expr(
        f"regexp_extract_all({text_col}, '(?s)<sitemap>(.*?)</sitemap>', 1)"
    )
    entries = F.concat(
        F.transform(url_entries, lambda x: F.struct(
            F.lit("url").alias("kind"), x.alias("body"))),
        F.transform(smap_entries, lambda x: F.struct(
            F.lit("sitemap").alias("kind"), x.alias("body"))),
    )
    rows = files.select(
        F.col(id_col),
        F.posexplode(entries).alias("entry_idx", "_e"),
    )

    def field(name):
        return F.regexp_extract(
            F.col("_e.body"), rf"(?s)<{name}>\s*(.*?)\s*</{name}>", 1
        )

    def opt(col):
        return F.when(col == "", None).otherwise(col)

    return rows.select(
        id_col,
        F.col("entry_idx").cast("int"),
        F.col("_e.kind").alias("kind"),
        opt(_unescape(field("loc"))).alias("loc"),
        opt(field("lastmod")).alias("lastmod"),
        opt(field("changefreq")).alias("changefreq"),
        F.when(field("priority") == "", None)
        .otherwise((field("priority").cast("double") * 1000).cast("int"))
        .alias("priority_pm"),
    )
