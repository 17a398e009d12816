r"""Distributed model set-operations (SURVEY.md §2.9).

The reference's conformance oracle treats a graph as a *set* of
statements and diffs two models modulo blank-node labels
(ModelUtil.equals via SesameTestHelper.areModelsEqual /
SesameTestHelper.diff, /root/reference/core/src/test/java/org/
semarglproject/test/SesameTestHelper.java:188-212). Driver-side the
exact bijection check lives in functions/graph_compare.py; at corpus
scale the same comparison runs distributed: canonicalize bnode labels
deterministically, then diff with ``except`` (a Catalyst left-anti
hash join — shuffles only the two models' rows, broadcast when one
side is small, AQE otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# extraction kernels label bnodes "_:b{conv}_{tix}_{local}" (globally
# unique, SURVEY.md §1.2); stripping the document prefix recovers the
# reference's per-document "_:{local}" sequence. conv_id is free-form
# and may itself contain underscores, so the prefix is matched greedily
# up to the LAST "_{tix}_" whose remainder (the local label, always
# "n<counter>") is underscore-free.
_DOC_PREFIX = r"^_:b.*_\d+_(?=[^_]*$)"

_MODEL_COLS = ["subj", "pred", "obj", "obj_kind", "lang", "dtype", "graph"]


def canonical_bnodes(statements: DataFrame) -> DataFrame:
    """Rewrite globally-unique bnode labels back to their per-document
    canonical form so models from different documents compare equal."""
    strip = lambda c: F.regexp_replace(c, _DOC_PREFIX, "_:")
    out = statements
    for col in ("subj", "obj", "graph"):
        if col in statements.columns:
            out = out.withColumn(
                col,
                F.when(F.col(col).startswith("_:"), strip(F.col(col))).otherwise(
                    F.col(col)
                ),
            )
    return out


def model_diff(a: DataFrame, b: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Symmetric difference of two statement models (set semantics,
    canonical bnode labels): rows only in ``a`` tagged side='a', rows
    only in ``b`` tagged side='b'. ``keys`` are carried grouping columns
    (e.g. conv_id) so many per-document comparisons run in one pass."""
    keys = keys or []
    cols = keys + [c for c in _MODEL_COLS if c in a.columns and c in b.columns]
    ca = canonical_bnodes(a).select(cols)
    cb = canonical_bnodes(b).select(cols)
    a_only = ca.subtract(cb).withColumn("side", F.lit("a"))
    b_only = cb.subtract(ca).withColumn("side", F.lit("b"))
    return a_only.unionByName(b_only)
