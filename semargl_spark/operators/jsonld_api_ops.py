"""Document-level JSON-LD API operators: expand / compact / flatten.

Completes the JSON-LD API surface around the toRdf kernel (the
reference ships parsing only — jsonld/src/main/java/org/semarglproject/
jsonld/JsonLdParser.java; its manifest gates only toRdf cases). Each
operator is one narrow ``mapInArrow`` pass over ``(doc_id, text)`` —
no shuffle, no per-row Python UDFs; Arrow carries the batches, the
kernel (kernels/jsonld_api.py) does per-document work proportional to
document size only.

Scale shape: embarrassingly parallel over documents; at 10^12 turns
the operator inherits the scan's partitioning, and the processed-
context cache (kernels/jsonld.py:152) collapses the per-document
context cost for real corpora that reuse a handful of contexts. A
caller-supplied compaction context is closed over and shipped once per
task, like a broadcast dict.
"""

from __future__ import annotations

from typing import Any, Iterator

import pyarrow as pa
from pyspark.sql import DataFrame


_SCHEMA = "doc_id bigint, json string, n_nodes int, n_errors int"


def jsonld_api_transform(
    docs: DataFrame,
    mode: str = "expand",
    *,
    context: Any = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    base_uri: str = "",
) -> DataFrame:
    """``(doc_id, text)`` → ``(doc_id, json, n_nodes, n_errors)``.

    ``mode``: ``expand`` (canonical expanded form), ``flatten``
    (node-map flattened form, ``_:b0``-issued labels), ``compact``
    (compacted against ``context``, which becomes the output's
    ``@context``), or ``frame`` (reshaped by the frame document passed
    via ``context``). ``json`` is canonical (sorted keys, minimal
    separators) so equal documents are byte-equal at any parallelism.
    Malformed documents never fail the task: they produce ``[]`` /
    ``{}`` plus an error count (reference recovery contract,
    core/.../BaseStreamProcessor.java:111-119).
    """
    if mode not in ("expand", "flatten", "compact", "frame"):
        raise ValueError(f"unknown mode: {mode}")
    if mode == "compact" and context is None:
        raise ValueError("compact mode requires a context")
    if mode == "frame" and context is None:
        raise ValueError("frame mode requires a frame document (context=)")

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..kernels import jsonld_api as api

        arrow_schema = pa.schema(
            [
                ("doc_id", pa.int64()),
                ("json", pa.string()),
                ("n_nodes", pa.int32()),
                ("n_errors", pa.int32()),
            ]
        )
        for batch in batches:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            out_json, out_nodes, out_errs = [], [], []
            for text in texts:
                try:
                    expanded, errors = api.expand(text or "", base_uri=base_uri)
                    if mode == "expand":
                        result: Any = expanded
                    elif mode == "flatten":
                        result = api.flatten(expanded)
                    elif mode == "frame":
                        result, cerrs = api.frame(
                            expanded, context, base_uri=base_uri
                        )
                        errors = errors + cerrs
                    else:
                        result, cerrs = api.compact(
                            expanded, context, base_uri=base_uri
                        )
                        errors = errors + cerrs
                    n_nodes = len(result) if isinstance(result, list) else 1
                except Exception as exc:  # recovery: empty doc, never a task failure
                    result, errors, n_nodes = [], [f"jsonld api error: {exc}"], 0
                out_json.append(api.canonical_json(result))
                out_nodes.append(n_nodes)
                out_errs.append(len(errors))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(out_json, pa.string()),
                    pa.array(out_nodes, pa.int32()),
                    pa.array(out_errs, pa.int32()),
                ],
                schema=arrow_schema,
            )

    return docs.select(docs[id_col].cast("long"), docs[text_col]).mapInArrow(
        run, _SCHEMA
    )
