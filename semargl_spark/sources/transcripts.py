r"""Deterministic synthetic transcripts source.

Builds the BASELINE.json ``input_hint`` table

    (conv_id:string, turn_idx:int, role:string, text:string,
     tool:string, ts:timestamp)

entirely with JVM-side Catalyst expressions (no Python UDFs, no driver
loops) so generation itself scales linearly with the corpus: the seed set
is the driver-provided ``documents`` table's ``doc_id`` column, each doc
spawning ``turns_per_doc`` turns via ``explode(sequence(...))`` — a
narrow, shuffle-free plan.

Each turn's ``text`` embeds exactly one payload kind (FIXTURES.md §1):
NTriples, JSON-LD, RDFa/XHTML, plain prose, or malformed markup. All
payloads are **closed-form functions of (did, turn_idx)** so the DuckDB
oracle can compute the *expected extraction output* analytically — any
parser deviation shows up as a hash mismatch without the oracle needing
an RDF parser (see __spark_entry__.py oracle_sql()).

Payload kind for the mixed corpus: ``kind = (did*7 + turn_idx) % 5``:
0=ntriples 1=jsonld 2=rdfa 3=prose 4=malformed-ntriples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z

XSD_DECIMAL = "http://www.w3.org/2001/XMLSchema#decimal"
XSD_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"

# the five payload builders, each a Column-valued function of (did, tix)


def _nt_name_payload(did):
    # every 10th doc exercises literal escapes: "Entity \"N\"\n"
    return F.when(
        did % 10 == 0, F.format_string('Entity \\"%d\\"\\n', did)
    ).otherwise(F.format_string("Entity %d", did))


def nt_text(did, tix):
    return F.format_string(
        "# turn %d\n"
        '<urn:e:%d> <urn:p:name> "%s" .\n'
        "<urn:e:%d> <urn:p:knows> <urn:e:%d> .\n"
        '<urn:e:%d> <urn:p:score> "%d.5"^^<' + XSD_DECIMAL + "> .\n"
        '_:a <urn:p:label> "turn %d"@en .\n',
        tix, did, _nt_name_payload(did), did, did + 1, did, did % 100, tix,
    )


def nq_text(did, tix):
    return F.format_string(
        '<urn:e:%d> <urn:p:name> "Entity %d" <urn:g:%d> .\n'
        "<urn:e:%d> <urn:p:knows> <urn:e:%d> .\n"
        '_:x <urn:p:label> "g"@en <urn:g:%d> .\n',
        did, did, did % 10, did, did + 1, did % 10,
    )


def jsonld_text(did, tix):
    return F.format_string(
        '{"@context": {"name": "urn:p:name", '
        '"knows": {"@id": "urn:p:knows", "@type": "@id"}, '
        '"score": {"@id": "urn:p:score", "@type": "' + XSD_INTEGER + '"}, '
        '"tags": "urn:p:tag"}, '
        '"@id": "urn:e:%d", "@type": "urn:t:Thing", '
        '"name": "Entity %d", "knows": "urn:e:%d", '
        '"score": %d, "tags": ["a%d", "b"]}',
        did, did, did + 1, did % 50, did,
    )


def rdfa_text(did, tix):
    return F.format_string(
        '<div xmlns="http://www.w3.org/1999/xhtml" about="urn:e:%d">'
        '<span property="http://purl.org/dc/terms/title">Turn %d</span>'
        '<a rel="http://purl.org/dc/terms/relation" href="urn:e:%d">x</a>'
        "</div>",
        did, tix, did + 1,
    )


def rdfa_role_text(did, tix):
    """RDFa payload whose @role element (no @id) yields a generated,
    never-named bnode — the reference marks exactly these 'shortenable'
    (RdfaParser.java:352), so Turtle rendering inlines them as [...]."""
    return F.format_string(
        '<div xmlns="http://www.w3.org/1999/xhtml" about="urn:e:%d">'
        '<span property="http://purl.org/dc/terms/title">Turn %d</span>'
        '<a rel="http://purl.org/dc/terms/relation" href="urn:e:%d">x</a>'
        '<span role="note">r%d</span>'
        "</div>",
        did, tix, did + 1, did,
    )


def rdfxml_text(did, tix):
    return F.format_string(
        '<?xml version="1.0"?>\n'
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:p="urn:p:">'
        '<rdf:Description rdf:about="urn:e:%d">'
        "<p:name>Entity %d</p:name>"
        '<p:knows rdf:resource="urn:e:%d"/>'
        "</rdf:Description></rdf:RDF>",
        did, did, did + 1,
    )



def trig_text(did, tix):
    """TriG payload: a default-graph triple, a GRAPH-keyword block, and
    a label-shorthand block (bnode + 'a' + optional final '.')."""
    return F.format_string(
        "@prefix e: <urn:e:> .\n"
        "@prefix p: <urn:p:> .\n"
        'e:%d p:name "Entity %d" .\n'
        "GRAPH <urn:g:%d> { e:%d p:knows e:%d ; p:score %d }\n"
        '<urn:g:meta> { _:m p:label "turn %d"@en . e:%d a <urn:t:Thing> }\n',
        did, did, did % 10, did, did + 1, did % 100, tix, did,
    )


def prose_text(did, tix):
    return F.format_string(
        "the quick brown fox jumps over turn %d of conversation %d", tix, did
    )


def malformed_text(did, tix):
    return F.format_string('<urn:e:%d> <urn:p:name "broken turn %d', did, tix)


_FMT_BUILDERS = {
    "ntriples": nt_text,
    "nquads": nq_text,
    "trig": trig_text,
    "jsonld": jsonld_text,
    "rdfa": rdfa_text,
    "rdfa_role": rdfa_role_text,
    "rdfxml": rdfxml_text,
    "text": prose_text,
    "malformed": malformed_text,
}

# builder name → the parser format its payload carries
_FMT_ALIASES = {"malformed": "ntriples", "rdfa_role": "rdfa"}


def _seed_turns(spark: SparkSession, sf_dir: str, turns_per_doc: int) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("int").alias("did")
    )
    # the seed parquet is a single small file → spread the doc ids across
    # the cluster BEFORE the explode so text generation and extraction
    # parallelize (row contents are unchanged; all queries are
    # order-insensitive)
    # one partition per core: extraction cost is uniform per turn, so
    # more-but-smaller tasks only add per-task Arrow/scheduling overhead
    from ..spark_util import default_parallelism

    target = default_parallelism(spark)
    docs = docs.repartition(target)
    if turns_per_doc < 1:
        # sequence(0, -1) would generate a DESCENDING [0, -1] pair, not
        # an empty corpus — negative turn indices then corrupt doc URIs
        raise ValueError(f"turns_per_doc must be >= 1, got {turns_per_doc}")
    return docs.select(
        "did",
        F.explode(
            F.sequence(F.lit(0), F.lit(turns_per_doc - 1))
        ).alias("turn_idx"),
    )


def _finish(turns: DataFrame) -> DataFrame:
    did, tix = F.col("did"), F.col("turn_idx")
    role = (
        F.when(tix % 3 == 0, "user")
        .when(tix % 3 == 1, "assistant")
        .otherwise("tool")
    )
    return turns.select(
        F.concat(F.lit("c"), did.cast("string")).alias("conv_id"),
        tix.cast("int").alias("turn_idx"),
        role.alias("role"),
        F.col("text"),
        F.col("fmt"),
        # tool turns carry a tool name keyed by (did + round) where
        # round = turn_idx // 3 — tool turns all sit at turn_idx ≡ 2
        # (mod 3), so keying by the round makes the name vary BOTH
        # across conversations and across a conversation's successive
        # tool calls (tool-chain analytics need non-degenerate bigrams)
        F.when(
            role == "tool",
            F.element_at(
                F.array(
                    F.lit("rdf_extract"), F.lit("web_search"), F.lit("code_exec")
                ),
                ((did + F.floor(tix / 3)) % 3 + 1).cast("int"),
            ),
        )
        .otherwise(F.lit(None))
        .alias("tool"),
        F.timestamp_seconds(F.lit(EPOCH_2024) + did * 3600 + tix * 60).alias("ts"),
    )


def synth_transcripts(
    spark: SparkSession,
    sf_dir: str,
    turns_per_doc: int = 4,
    fmt: str | None = None,
) -> DataFrame:
    """Mixed-format transcripts (fmt=None) or a single-format corpus.

    Includes a ``fmt`` column carrying the payload format, playing the
    role of the reference's MIME-type hint
    (BaseStreamProcessor.processWithMime, BaseStreamProcessor.java:91-120).
    """
    turns = _seed_turns(spark, sf_dir, turns_per_doc)
    did, tix = F.col("did"), F.col("turn_idx")
    if fmt is not None:
        builder = _FMT_BUILDERS[fmt]
        out = turns.withColumn("text", builder(did, tix)).withColumn(
            "fmt", F.lit(_FMT_ALIASES.get(fmt, fmt))
        )
        return _finish(out)

    kind = (did * 7 + tix) % 5
    text = (
        F.when(kind == 0, nt_text(did, tix))
        .when(kind == 1, jsonld_text(did, tix))
        .when(kind == 2, rdfa_text(did, tix))
        .when(kind == 3, prose_text(did, tix))
        .otherwise(malformed_text(did, tix))
    )
    fmt_col = (
        F.when(kind == 0, "ntriples")
        .when(kind == 1, "jsonld")
        .when(kind == 2, "rdfa")
        .when(kind == 3, "text")
        .otherwise("ntriples")
    )
    out = turns.withColumn("text", text).withColumn("fmt", fmt_col)
    return _finish(out)


def entity_dictionary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcastable linking dictionary (FIXTURES.md §4).

    Two deterministic surface forms per entity IRI: the normalized name
    ("entity N", weight 1.0) and a truncated alias ("ent N", weight 0.5).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("int").alias("did")
    )
    iri = F.concat(F.lit("urn:e:"), F.col("did").cast("string"))
    full = docs.select(
        iri.alias("canonical_iri"),
        F.format_string("entity %d", F.col("did")).alias("surface_form"),
        F.lit(1.0).alias("weight"),
    )
    alias = docs.select(
        iri.alias("canonical_iri"),
        F.format_string("ent %d", F.col("did")).alias("surface_form"),
        F.lit(0.5).alias("weight"),
    )
    return full.unionByName(alias)


# ---------------------------------------------------------------- zipf skew

def zipf_level(v):
    """Geometric popularity level of a residue ``v`` in [0, 64): level 0
    takes mass 32/64, level 1 takes 16/64, … level 5 and 6 take 1/64
    each — the deterministic stand-in for zipf-distributed popularity
    (hot head, long tail) that a SQL oracle replays with one CASE.
    Column-in/Column-out; keep in sync with :func:`zipf_level_sql`."""
    return (
        F.when(v < 32, 0)
        .when(v < 48, 1)
        .when(v < 56, 2)
        .when(v < 60, 3)
        .when(v < 62, 4)
        .when(v == 62, 5)
        .otherwise(6)
    )


def zipf_level_sql(v: str) -> str:
    """DuckDB mirror of :func:`zipf_level` over the SQL expression ``v``."""
    return (
        f"CASE WHEN {v} < 32 THEN 0 WHEN {v} < 48 THEN 1 "
        f"WHEN {v} < 56 THEN 2 WHEN {v} < 60 THEN 3 "
        f"WHEN {v} < 62 THEN 4 WHEN {v} = 62 THEN 5 ELSE 6 END"
    )


def synth_transcripts_zipf(
    spark: SparkSession, sf_dir: str, cap: int = 48
) -> DataFrame:
    """Zipf-SKEWED transcript corpus (same schema as
    :func:`synth_transcripts`): conversation lengths decay harmonically
    — ``n_turns(did) = clamp(192 // (did%512 + 1), 1, cap)`` so a few
    conversations are ``cap`` turns while the tail is single-turn — and
    each turn's ntriples payload asserts a mention whose target entity
    follows the geometric :func:`zipf_level` popularity (entity
    ``urn:z:0`` absorbs HALF of all mentions — the hub key that breaks
    naive groupBy/join plans at scale). The ``%512`` block makes the
    hot-conversation count grow with the corpus instead of pinning one
    global maximum, so the shape is scale-invariant.

    Every payload stays a closed form of (did, turn_idx): the skew
    gates' DuckDB oracles recompute expected outputs analytically.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("int").alias("did")
    )
    from ..spark_util import default_parallelism

    docs = docs.repartition(default_parallelism(spark))
    did = F.col("did")
    n_turns = F.least(
        F.lit(cap),
        F.greatest(
            F.lit(1), F.floor(F.lit(192) / ((did % 512) + 1)).cast("int")
        ),
    )
    turns = docs.select(
        "did",
        F.explode(
            F.sequence(F.lit(0), (n_turns - 1).cast("int"))
        ).alias("turn_idx"),
    )
    tix = F.col("turn_idx")
    eid = zipf_level((did * 31 + tix * 17) % 64)
    s = lambda c: c.cast("string")  # noqa: E731
    text = F.concat(
        F.lit("<urn:e:"), s(did),
        F.lit("> <urn:p:mentions> <urn:z:"), s(eid), F.lit("> .\n"),
        F.lit("<urn:e:"), s(did),
        F.lit('> <urn:p:name> "Entity '), s(did), F.lit('" .\n'),
    )
    out = turns.withColumn("text", text).withColumn(
        "fmt", F.lit("ntriples")
    )
    return _finish(out)
