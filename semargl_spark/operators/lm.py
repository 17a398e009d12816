"""Corpus-trained bigram language-model fluency scoring.

CCNet-style quality filtering ranks documents by how well a language
model trained on the corpus predicts them (Wenzek et al. 2020, "CCNet:
Extracting High Quality Monolingual Datasets from Web Crawl Data").
This operator trains an add-one-smoothed word-bigram model over the
WHOLE input corpus and scores every document against it, all inside
one Spark job — no external model artifact, no Python in the hot path.

Exactness contract: CCNet's perplexity is a float geometric mean whose
log-sum order varies per shuffle, so it cannot be oracle-gated
bit-for-bit across engines. We instead score each document by the
ARITHMETIC mean of its smoothed bigram probabilities, quantized per
bigram to integer micro-units BEFORE summing:

    q(w1,w2)    = floor(10^6 * (count(w1,w2)+1) / (count(w1 ·)+V))
    score_micro = floor(Σ q / n_bigrams)

Every step is integer multiply / floor-div / sum — associative,
commutative, exact — so the result is bit-identical at any
parallelism and in any engine (the same fixed-point discipline as
operators/graph.py pagerank). The ranking it induces tracks the
perplexity ranking (both are monotone in the per-bigram smoothed
probabilities); the absolute number is a fluency score, not a
perplexity.

Scale shape (10^12-doc corpus):
* bigrams are aggregated per (doc, w1, w2) FIRST, so the model-count
  joins move one row per distinct bigram per doc, not one per token;
* corpus counts c2=(w1,w2) and c1=(w1) are map-side-partial groupBys
  over that already-reduced table;
* V (vocab size) is a one-row aggregate crossJoined back in — Spark
  broadcasts a single row, never a driver collect;
* the probability joins are equi-joins on bigram/unigram keys; hot
  bigrams ("of the") are exactly the AQE skew-join case, noted below.

Reference parity: the reference is a parser framework with no LM
surface; this is task-spec training-data-pipeline surface alongside
operators/text.py quality_score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**6


def bigram_lm_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """→ (doc_id, n_bigrams, score_micro): add-one-smoothed bigram-LM
    fluency in integer micro-units, trained on ``docs`` itself.

    Documents with fewer than two tokens have no bigrams: n_bigrams=0,
    score_micro NULL (they carry no fluency evidence either way; the
    caller's length rule — c4_rule_filter — is the right gate for
    them).
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    base = docs.select(F.col(id_col).alias("doc_id"), pairs.alias("pairs"), toks.alias("toks"))

    # one row per distinct bigram per doc, with multiplicity k
    bid = (
        base.select("doc_id", F.explode("pairs").alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").cast("long").alias("k"))
    )
    c2 = bid.groupBy("w1", "w2").agg(F.sum("k").cast("long").alias("c2"))
    c1 = bid.groupBy("w1").agg(F.sum("k").cast("long").alias("c1"))
    vocab = (
        base.select(F.explode("toks").alias("tok"))
        .agg(F.count_distinct("tok").cast("long").alias("v"))
    )

    q = (
        bid.join(c2, ["w1", "w2"])  # hot bigrams → AQE skew-join splits them
        .join(c1, ["w1"])
        .crossJoin(vocab)  # one-row broadcast
        .select(
            "doc_id",
            "k",
            F.expr(f"({SCALE} * (c2 + 1)) div (c1 + v)").alias("q"),
        )
    )
    scored = q.groupBy("doc_id").agg(
        F.sum("k").cast("long").alias("n_bigrams"),
        F.expr("sum(q * k) div sum(k)").cast("long").alias("score_micro"),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.col("score_micro"),
        )
    )
