"""Triple-extraction stage: transcripts → statements DataFrame.

This is the Spark analogue of the reference's StreamProcessor pipeline
(/root/reference/core/src/main/java/org/semarglproject/source/
StreamProcessor.java:35-106): one transcript turn = one document, the
format column plays the MIME-type role
(BaseStreamProcessor.processWithMime, BaseStreamProcessor.java:91-120),
and the parser kernels run *vectorized* inside ``mapInArrow`` — Arrow
record batches in, Arrow record batches out with per-column list
building (measured ~15% faster than the ``mapInPandas`` equivalent: no
pandas object-array detour on either side), no per-row Python UDFs, no
shuffle (a narrow 1→N flatMap; SURVEY.md §2.2).

Error handling follows the reference's ENABLE_ERROR_RECOVERY semantics
(NTriplesParser.java:92-103): a malformed document yields zero triples
plus processor-graph rows (obj_kind='error'), never a task failure
(ProcessorGraphHandler.java:28-42).
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from typing import Callable

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels import ntriples
from ..schema import STATEMENTS_SCHEMA

def _arrow_schema() -> pa.Schema:
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(STATEMENTS_SCHEMA)


ARROW_SCHEMA = _arrow_schema()

# per-format error class IRIs mirroring e.g. NTriplesParser.ERROR
# (NTriplesParser.java:39)
ERROR_CLASS = "http://semarglproject.org/{fmt}/Error"

def _parse_text(fmt: str, name_keyed: bool = False,
                context_registry: dict | None = None):
    """Lazy import of the format kernels so partially-built formats never
    break the module import.

    ``name_keyed`` applies to the line-oriented formats whose documents
    survive text-level chunking (NTriples/NQuads): author bnode labels
    relabel as a pure function of their name so chunks of one document
    parsed independently under a shared doc_key unify."""
    if fmt == "ntriples":
        return lambda text, base, key: ntriples.parse(
            text, doc_key=key, name_keyed=name_keyed
        )
    if fmt == "nquads":
        return lambda text, base, key: ntriples.parse_nquads(
            text, doc_key=key, name_keyed=name_keyed
        )
    try:
        if fmt == "jsonld":
            from ..kernels import jsonld

            return lambda text, base, key: jsonld.parse(
                text, base_uri=base, doc_key=key,
                context_registry=context_registry,
            )
        if fmt == "rdfa":
            from ..kernels import rdfa

            return lambda text, base, key: rdfa.parse(text, base_uri=base, doc_key=key)
        if fmt == "microdata":
            from ..kernels import microdata

            return lambda text, base, key: microdata.parse(
                text, base_uri=base, doc_key=key
            )
        if fmt == "rdfxml":
            from ..kernels import rdfxml

            return lambda text, base, key: rdfxml.parse(text, base_uri=base, doc_key=key)
        if fmt == "turtle":
            from ..kernels import turtle_read

            return lambda text, base, key: turtle_read.parse(
                text, base_uri=base, doc_key=key
            )
        if fmt == "trig":
            from ..kernels import turtle_read

            return lambda text, base, key: turtle_read.parse_trig(
                text, base_uri=base, doc_key=key
            )
    except ImportError:  # format kernel not built yet
        return None
    return None


_SNIFF_JSON = re.compile(r"\s*[{\[]")
_SNIFF_RDFXML = re.compile(r"\s*(<\?xml[^>]*\?>\s*)?<rdf:RDF")
_SNIFF_MARKUP = re.compile(r"\s*<[A-Za-z!?]")
# attribute sniffs are anchored to an ATTRIBUTE position (inside a tag,
# after '<' and before the closing '>') so prose or inline script that
# merely mentions 'itemscope' / 'property=' cannot cross-route a document
_SNIFF_MICRODATA_ATTR = re.compile(r"<[^>]*\bitemscope\b")
# RDFa-specific attributes (not shared with plain HTML): presence routes
# a markup document to the RDFa kernel even if it also has itemscope
_SNIFF_RDFA_ATTR = re.compile(
    r"<[^>]*\b(?:property|typeof|vocab|prefix|about|resource)\s*="
)
_SNIFF_NT = re.compile(r"\s*(#|<[^ >]+>\s+<)")
_SNIFF_TURTLE = re.compile(r"\s*(@prefix|@base|PREFIX\s|BASE\s)")


def sniff_format(text: str) -> str:
    """Heuristic format detection, the analogue of the reference's
    MIME/extension sniffing (BaseStreamProcessor.java:91-120) plus RDFa's
    document autodetection (rdfa/.../DocumentContext.java:74-118)."""
    if _SNIFF_JSON.match(text):
        return "jsonld"
    if _SNIFF_RDFXML.match(text):
        return "rdfxml"
    if _SNIFF_TURTLE.match(text):
        return "turtle"
    if _SNIFF_NT.match(text):
        return "ntriples"
    if _SNIFF_MARKUP.match(text):
        # markup carrying itemscope but no RDFa attributes is microdata;
        # documents with both route to RDFa (reference parity — the
        # reference only knows RDFa)
        if _SNIFF_MICRODATA_ATTR.search(text) and not _SNIFF_RDFA_ATTR.search(text):
            return "microdata"
        return "rdfa"
    return "text"


def doc_uri(conv_id: str, turn_idx: int) -> str:
    return f"urn:transcript:{conv_id}:{turn_idx}"


def extract_statements(
    transcripts: DataFrame,
    default_fmt: str | None = None,
    context_registry: dict | None = None,
) -> DataFrame:
    """transcripts(conv_id, turn_idx, text[, fmt]) → statements.

    Rows with obj_kind='error' are the processor-graph side channel; use
    :func:`triples` / :func:`errors` to split. ``default_fmt`` overrides
    the per-row fmt column; when both are absent the format is sniffed.

    ``context_registry`` maps remote JSON-LD @context IRIs to parsed
    context values so schema.org-style corpora extract OFFLINE — the
    dict ships once per task inside the closure (broadcast semantics);
    executors never fetch, and unregistered IRIs remain error rows.
    """
    has_fmt = "fmt" in transcripts.columns
    # an explicit doc_key column (emitted by chunked reassembly) scopes
    # bnode labels to the ORIGINAL document, not the chunk, and switches
    # the line-oriented kernels to name-keyed bnode relabeling so labels
    # unify across independently parsed chunks
    has_key = "doc_key" in transcripts.columns
    cols = (
        ["conv_id", "turn_idx", "text"]
        + (["fmt"] if has_fmt else [])
        + (["doc_key"] if has_key else [])
    )
    src = transcripts.select(*cols)

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        kernels: dict[str, Callable] = {}
        for rb in batches:
            # per-output-column lists → pa.array skips the pandas
            # object-array detour on the write side; .to_pylist() skips
            # it on the read side
            out = [[] for _ in range(9)]
            app = [c.append for c in out]
            names = rb.schema.names
            convs = rb.column(names.index("conv_id")).to_pylist()
            tixs = rb.column(names.index("turn_idx")).to_pylist()
            texts = rb.column(names.index("text")).to_pylist()
            fmts = rb.column(names.index("fmt")).to_pylist() if has_fmt else None
            keys = rb.column(names.index("doc_key")).to_pylist() if has_key else None
            for i, (conv, tix, text) in enumerate(zip(convs, tixs, texts)):
                fmt = default_fmt or (fmts[i] if fmts is not None else None)
                if fmt is None:
                    fmt = sniff_format(text or "")
                if fmt == "text" or not text:
                    continue
                if fmt not in kernels:
                    kernels[fmt] = _parse_text(
                        fmt, name_keyed=has_key,
                        context_registry=context_registry,
                    )
                kernel = kernels[fmt]
                tix = int(tix)
                base = doc_uri(conv, tix)
                key = keys[i] if keys is not None else f"{conv}_{tix}"
                if kernel is None:
                    # an explicitly requested format we cannot parse is an
                    # error, not a silent drop (E10: the corpus must never
                    # shrink without a processor-graph signal)
                    err_class = ERROR_CLASS.format(fmt=fmt)
                    app[0](conv); app[1](tix); app[2](base); app[3](err_class)
                    app[4](f"unsupported format: {fmt}"); app[5]("error")
                    app[6](None); app[7](None); app[8](None)
                    continue
                try:
                    stmts, errs = kernel(text, base, key)
                except Exception as exc:  # never fail the task (E10)
                    stmts, errs = [], [f"{type(exc).__name__}: {exc}"]
                for t in stmts:
                    app[0](conv); app[1](tix); app[2](t.subj); app[3](t.pred)
                    app[4](t.obj); app[5](t.obj_kind); app[6](t.lang)
                    app[7](t.dtype); app[8](t.graph)
                err_class = ERROR_CLASS.format(fmt=fmt)
                for msg in errs:
                    app[0](conv); app[1](tix); app[2](base); app[3](err_class)
                    app[4](msg); app[5]("error"); app[6](None)
                    app[7](None); app[8](None)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(c, type=f.type)
                    for c, f in zip(out, ARROW_SCHEMA)
                ],
                schema=ARROW_SCHEMA,
            )

    return src.mapInArrow(run, schema=STATEMENTS_SCHEMA)


def reassemble_conversations(
    transcripts: DataFrame, max_bytes: int | None = None
) -> DataFrame:
    """Per-conversation document reassembly (SURVEY.md §2.7): all turns
    of a conversation concatenated in stable (conv_id ⟶ turn_idx) order
    into ONE document, so author bnode labels unify across turns the way
    they would inside a single reference document.

    Default path — one hash aggregation: ``collect_list`` of
    (turn_idx, text) structs + ``array_sort`` per group — a single
    shuffle keyed by conv_id with map-side partial aggregation, instead
    of a window (which would sort every partition globally).

    ``max_bytes`` enables the overflow-safe path: a pathological
    conversation (10^6 long turns) would otherwise hit Spark's 2 GB
    single-row ceiling inside ``collect_list``. Turns are assigned a
    ``part`` by their running byte offset (window cumulative sum — this
    path pays a per-conversation sort, the price of bounded rows) and
    each part aggregates separately: (conv_id, turn_idx=part_idx, text,
    doc_key=conv_id). A part holds the turns whose prefix offset falls
    in [k·max_bytes, (k+1)·max_bytes), so it exceeds max_bytes by at
    most one turn's length, and a single turn larger than the budget
    occupies a part alone. The emitted ``doc_key`` column makes
    downstream extraction scope bnodes to the CONVERSATION and relabel
    author bnodes by NAME (see :func:`extract_statements`), so labels
    still unify across parts exactly as in the single-document path."""
    if max_bytes is None:
        ordered = F.array_sort(F.collect_list(F.struct("turn_idx", "text")))
        return transcripts.groupBy("conv_id").agg(
            F.concat_ws("\n", F.transform(ordered, lambda s: s["text"])).alias("text"),
        ).withColumn("turn_idx", F.lit(0).cast("int"))

    if max_bytes < 1:
        raise ValueError(f"max_bytes must be >= 1, got {max_bytes}")
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(
        F.sum(F.octet_length("text") + F.lit(1)).over(w), F.lit(0)
    )
    part = F.floor(cum_before / F.lit(max_bytes)).cast("int")
    ordered = F.array_sort(F.collect_list(F.struct("turn_idx", "text")))
    return (
        transcripts.withColumn("_part", part)
        .groupBy("conv_id", "_part")
        .agg(
            F.concat_ws("\n", F.transform(ordered, lambda s: s["text"])).alias("text"),
        )
        .select(
            "conv_id",
            F.col("_part").alias("turn_idx"),
            "text",
            F.col("conv_id").alias("doc_key"),
        )
    )


def triples(statements: DataFrame) -> DataFrame:
    """The output graph: non-error statements (E9 output-graph gate)."""
    return statements.filter(F.col("obj_kind") != "error")


def errors(statements: DataFrame) -> DataFrame:
    """The processor graph: error side channel (E9/E10)."""
    return statements.filter(F.col("obj_kind") == "error")


def dedup_triples(statements: DataFrame) -> DataFrame:
    """Graph set semantics: a model is a *set* of statements (reference
    test oracle compares models as sets, SesameTestHelper.java:188-196).
    Catalyst turns this into partial+final hash aggregation."""
    return statements.dropDuplicates(
        ["conv_id", "turn_idx", "subj", "pred", "obj", "obj_kind", "lang", "dtype", "graph"]
    )
