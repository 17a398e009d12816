r"""JVM-side NTriples/NQuads rendering (reference: NTriplesSerializer /
NQuadsSerializer, rdf/.../NTriplesSerializer.java:29-227).

The common path — ASCII content — renders entirely with Catalyst string
expressions (chained replace + concat → whole-stage codegen), the
analogue of the reference's tight char loop. Non-ASCII ``\uXXXX``
escaping needs per-char logic; documents containing such characters can
be routed through the Python kernel (kernels/serialize.py) — the
predicate :func:`needs_python_path` selects them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _escape_literal(col: Column) -> Column:
    # order matters: backslash first (NTriplesSerializer.java:148-195)
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    out = F.replace(out, F.lit("\t"), F.lit("\\t"))
    out = F.replace(out, F.lit("\b"), F.lit("\\b"))
    out = F.replace(out, F.lit("\f"), F.lit("\\f"))
    return out


def _term(value: Column, kind: Column, lang: Column, dtype: Column) -> Column:
    literal = F.concat(F.lit('"'), _escape_literal(value), F.lit('"'))
    literal = (
        F.when(lang.isNotNull(), F.concat(literal, F.lit("@"), lang))
        .when(dtype.isNotNull(), F.concat(literal, F.lit("^^<"), dtype, F.lit(">")))
        .otherwise(literal)
    )
    return (
        F.when(kind == "literal", literal)
        .when(kind == "bnode", value)
        .otherwise(F.concat(F.lit("<"), value, F.lit(">")))
    )


def render_ntriples(statements: DataFrame, quads: bool = False) -> DataFrame:
    """statements → one ``line`` column of NTriples/NQuads text."""
    df = statements.filter(F.col("obj_kind") != "error")
    subj = F.when(
        F.col("subj").startswith("_:"), F.col("subj")
    ).otherwise(F.concat(F.lit("<"), F.col("subj"), F.lit(">")))
    pred = F.concat(F.lit("<"), F.col("pred"), F.lit(">"))
    obj = _term(F.col("obj"), F.col("obj_kind"), F.col("lang"), F.col("dtype"))
    if quads:
        graph = F.when(
            F.col("graph").isNull(), F.lit("")
        ).otherwise(
            F.concat(
                F.lit(" "),
                F.when(F.col("graph").startswith("_:"), F.col("graph")).otherwise(
                    F.concat(F.lit("<"), F.col("graph"), F.lit(">"))
                ),
            )
        )
        line = F.concat(subj, F.lit(" "), pred, F.lit(" "), obj, graph, F.lit(" ."))
    else:
        line = F.concat(subj, F.lit(" "), pred, F.lit(" "), obj, F.lit(" ."))
    return df.select(line.alias("line"))


def render_turtle_docs(transcripts: DataFrame, fmt: str = "ntriples") -> DataFrame:
    """One Turtle document per turn: parser → Turtle writer fused in a
    single shuffle-free ``mapInArrow`` pass, the Spark analogue of the
    reference's ``X.connect(TurtleSerializer.connect(sink))`` pipe chain
    (rdfa/src/test/java/.../RdfaParserTest.java:61,
    rdf/.../TurtleSerializer.java:32-238). Returns
    (conv_id, turn_idx, turtle)."""
    from ..kernels import turtle as turtle_kernel

    return _render_docs(transcripts, fmt, turtle_kernel.serialize, "turtle")


def render_trig_docs(transcripts: DataFrame, fmt: str = "nquads") -> DataFrame:
    """One TriG document per turn (kernels/turtle.serialize_trig):
    default-graph statements as bare Turtle, named graphs as
    ``<g> { ... }`` blocks in first-appearance order — the writer-side
    completion of the TriG reader, same fused shuffle-free
    ``mapInArrow`` shape as render_turtle_docs. Returns
    (conv_id, turn_idx, trig)."""
    from ..kernels import turtle as turtle_kernel

    return _render_docs(
        transcripts, fmt, turtle_kernel.serialize_trig, "trig"
    )


def _render_docs(transcripts, fmt, serializer, out_col) -> DataFrame:
    import pyarrow as pa
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    from .extract import _parse_text, doc_uri

    schema = StructType(
        [
            StructField("conv_id", StringType(), False),
            StructField("turn_idx", IntegerType(), False),
            StructField(out_col, StringType(), True),
        ]
    )
    arrow_schema = pa.schema(
        [("conv_id", pa.string()), ("turn_idx", pa.int32()), (out_col, pa.string())]
    )

    def run(batches):
        kernel = _parse_text(fmt)
        for rb in batches:
            names = rb.schema.names
            convs = rb.column(names.index("conv_id")).to_pylist()
            tixs = rb.column(names.index("turn_idx")).to_pylist()
            texts = rb.column(names.index("text")).to_pylist()
            docs = []
            for conv, tix, text in zip(convs, tixs, texts):
                try:
                    stmts, _errs = kernel(
                        text or "", doc_uri(conv, int(tix)), f"{conv}_{int(tix)}"
                    )
                except Exception:  # error recovery: empty doc, never a task failure
                    stmts = []
                docs.append(serializer(stmts))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(convs, pa.string()),
                    pa.array(tixs, pa.int32()),
                    pa.array(docs, pa.string()),
                ],
                schema=arrow_schema,
            )

    return transcripts.select("conv_id", "turn_idx", "text").mapInArrow(run, schema)


def needs_python_path(statements: DataFrame) -> DataFrame:
    """Rows whose content needs per-char \\uXXXX escaping (non-ASCII) —
    checked across every rendered term, including predicate and graph."""
    non_ascii = r"[^\x00-\x7F]"
    cond = F.regexp_like(F.col("subj"), F.lit(non_ascii)) | F.regexp_like(
        F.col("pred"), F.lit(non_ascii)
    ) | F.regexp_like(F.col("obj"), F.lit(non_ascii))
    if "dtype" in statements.columns:
        cond = cond | (
            F.col("dtype").isNotNull()
            & F.regexp_like(F.col("dtype"), F.lit(non_ascii))
        )
    if "graph" in statements.columns:
        cond = cond | (
            F.col("graph").isNotNull()
            & F.regexp_like(F.col("graph"), F.lit(non_ascii))
        )
    return statements.filter(cond)


def render_jsonld(statements: DataFrame) -> DataFrame:
    """statements → one flat expanded-form JSON-LD node object per
    subject: ``(subj, json)`` where ``json`` is
    ``{"@id":..., "<pred>":[{"@id"|"@value":...}, ...], ...}`` with
    predicates sorted, object arrays set-deduplicated and sorted, and
    literals carrying ``@language`` / ``@type`` when present.

    The reference ships JSON-LD parsing only (JsonLdParser.java); this
    is the target-side writer completing the NT/NQ/Turtle/JSON-LD
    matrix. Expanded form on purpose: no @context negotiation, so the
    output is a pure function of the statement set — deterministic at
    any parallelism, and re-parseable by kernels/jsonld.py (round-trip
    property-tested).

    JSON string escaping reuses :func:`_escape_literal` (\\\\ \\" \\n
    \\r \\t \\b \\f) plus ``\\u00XX`` for the remaining C0 control
    characters JSON forbids raw (RFC 8259 §7). IRIs/bnode labels are
    emitted unescaped (the parsers reject IRIs containing
    quote/backslash, so none can reach a rendered statement).

    Plan: everything JVM-side — two hash aggregations, (subj, pred)
    object-array build then per-subject pair join; both map-side
    partial, no Python in the path. A pathological subject with 10^6
    distinct objects would hit the single-row ceiling like any
    collect_list — cap upstream with the same discipline as
    inverted_index posting lists if the KG carries such hubs."""
    df = statements.filter(F.col("obj_kind") != "error")
    lit_tail = (
        F.when(
            F.col("lang").isNotNull(),
            F.concat(F.lit(',"@language":"'), F.col("lang"), F.lit('"')),
        )
        .when(
            F.col("dtype").isNotNull(),
            F.concat(F.lit(',"@type":"'), F.col("dtype"), F.lit('"')),
        )
        .otherwise(F.lit(""))
    )
    # JSON additionally requires \u00XX for the control characters the
    # NTriples escape set leaves raw (RFC 8259 §7) — literals CAN carry
    # them (the NT kernel unescapes \uXXXX on parse). Still a chain of
    # whole-stage-codegen string replaces, no Python.
    esc = _escape_literal(F.col("obj"))
    for c in range(0x20):
        ch = chr(c)
        if ch in "\n\r\t\b\f":
            continue
        esc = F.replace(esc, F.lit(ch), F.lit(f"\\u{c:04x}"))
    obj_repr = F.when(
        F.col("obj_kind") == "literal",
        F.concat(
            F.lit('{"@value":"'), esc, F.lit('"'),
            lit_tail, F.lit("}"),
        ),
    ).otherwise(F.concat(F.lit('{"@id":"'), F.col("obj"), F.lit('"}')))
    per_pred = (
        df.select("subj", "pred", obj_repr.alias("o"))
        .groupBy("subj", "pred")
        .agg(F.array_join(F.sort_array(F.collect_set("o")), ",").alias("vals"))
    )
    pair = F.concat(
        F.lit('"'), F.col("pred"), F.lit('":['), F.col("vals"), F.lit("]")
    )
    return (
        per_pred.select("subj", pair.alias("pair"))
        .groupBy("subj")
        .agg(F.array_join(F.sort_array(F.collect_list("pair")), ",").alias("pairs"))
        .select(
            "subj",
            F.concat(
                F.lit('{"@id":"'), F.col("subj"), F.lit('",'),
                F.col("pairs"), F.lit("}"),
            ).alias("json"),
        )
    )
