"""Per-document RDF dataset canonicalization (RDFC-1.0) as a Spark
stage over the statements table.

Each (conv_id, turn_idx) document is canonicalized INDEPENDENTLY —
bnode scopes never cross documents in the extraction model (kernels'
BnodeAllocator keys labels by doc), so per-doc RDFC-1.0 gives the
canonical form a signer/deduper needs without any cross-document
shuffle beyond the one groupBy. Scale shape: one hash-partition on the
doc key, then per-group Python (kernels/c14n.py) inside applyInPandas;
work per group is linear in the doc's quads except for automorphic
bnode clusters, which are bounded by ``max_degree_nodes`` (poison-graph
guard, raised documents surface as error rows, never task failures —
the E10 contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LABELS_SCHEMA = (
    "conv_id string, turn_idx int, label string, canon string, "
    "error string"
)
_DOCS_SCHEMA = (
    "conv_id string, turn_idx int, n_quads int, doc_sha256 string, "
    "error string"
)


def _to_triples(pdf):
    from ..kernels.model import Triple

    cols = ["subj", "pred", "obj", "obj_kind", "lang", "dtype", "graph"]
    out = []
    for row in pdf[cols].itertuples(index=False, name=None):
        s, p, o, k, lang, dt, g = (
            None if v is None or (isinstance(v, float) and v != v) else v
            for v in row
        )
        out.append(Triple(s, p, o, k, lang, dt, g))
    return out


def c14n_labels(statements: DataFrame, max_degree_nodes: int = 8) -> DataFrame:
    """→ (conv_id, turn_idx, label, canon, error): the RDFC-1.0
    canonical identifier for every blank node of every document.
    Documents with no bnodes emit nothing; documents exceeding the
    automorphic-group guard emit one error row."""

    def run(key, pdf):
        import pandas as pd

        from ..kernels.c14n import canonical_labels

        conv_id, turn_idx = key
        try:
            labels = canonical_labels(
                _to_triples(pdf), max_degree_nodes=max_degree_nodes
            )
            rows = [
                (conv_id, turn_idx, lab, can, None)
                for lab, can in sorted(labels.items())
            ]
        except ValueError as exc:
            rows = [(conv_id, turn_idx, None, None, str(exc))]
        return pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "label", "canon", "error"]
        )

    return statements.groupBy("conv_id", "turn_idx").applyInPandas(
        run, _LABELS_SCHEMA
    )


def c14n_doc_hashes(
    statements: DataFrame, max_degree_nodes: int = 8
) -> DataFrame:
    """→ (conv_id, turn_idx, n_quads, doc_sha256, error): SHA-256 of
    each document's canonical N-Quads form — the content address two
    isomorphic documents share (exact graph-level dedup key that ignores
    bnode naming and statement order, unlike text-level fingerprints)."""

    def run(key, pdf):
        import hashlib

        import pandas as pd

        from ..kernels.c14n import canonical_nquads

        conv_id, turn_idx = key
        try:
            doc = canonical_nquads(
                _to_triples(pdf), max_degree_nodes=max_degree_nodes
            )
            rows = [(conv_id, turn_idx, len(pdf),
                     hashlib.sha256(doc.encode("utf-8")).hexdigest(), None)]
        except ValueError as exc:
            rows = [(conv_id, turn_idx, len(pdf), None, str(exc))]
        return pd.DataFrame(
            rows,
            columns=["conv_id", "turn_idx", "n_quads", "doc_sha256", "error"],
        )

    return statements.groupBy("conv_id", "turn_idx").applyInPandas(
        run, _DOCS_SCHEMA
    )
