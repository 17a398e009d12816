"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — correctness baseline: a crossJoin pruned to
  a query subset, dot products via ``F.zip_with`` + ``F.aggregate``
  (JVM-side, no Python);
* LSH-bucketed ANN — the scale path: random-hyperplane signatures bucket
  vectors so the candidate join is an equi-join on the bucket key, not a
  cross join. At 100 TB the crossJoin is impossible; the bucketed
  variant shuffles each side once on a short key.

Hyperplanes are generated deterministically (seeded) on the driver and
inlined as literals — tiny, no broadcast needed.

An embedding-cosine near-duplicate detector reuses the same kernels.
"""

from __future__ import annotations

import random

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def _np_fold_dot(mat, plane):
    """Per-dimension accumulation ``((0 + v₀p₀) + v₁p₁) + …`` vectorized
    across rows — float64 IEEE adds in exactly the order Spark's
    ``F.aggregate`` left fold and DuckDB's ``list_reduce`` perform them,
    so the result is BIT-IDENTICAL to the expression path while running
    at numpy speed. (A plain ``mat @ plane`` would use pairwise/SIMD
    summation whose low bits differ — enough to flip an LSH sign at the
    hyperplane boundary and break the value-hash gate.)"""
    import numpy as np

    acc = np.zeros(mat.shape[0], dtype=np.float64)
    for i in range(mat.shape[1]):
        acc += mat[:, i] * plane[i]
    return acc


def _np_fold_pair(a_mat, b_mat):
    """(dot, ‖a‖², ‖b‖²) with the same per-dim left-fold order."""
    import numpy as np

    n = a_mat.shape[0]
    dot = np.zeros(n, dtype=np.float64)
    na = np.zeros(n, dtype=np.float64)
    nb = np.zeros(n, dtype=np.float64)
    for i in range(a_mat.shape[1]):
        x, y = a_mat[:, i], b_mat[:, i]
        dot += x * y
        na += x * x
        nb += y * y
    return dot, na, nb


def _stack(series):
    import numpy as np

    return np.stack([np.asarray(v, dtype=np.float64) for v in series])


def with_cosine(
    df: DataFrame, a_col: str, b_col: str, out: str = "cosine",
    method: str = "arrow",
) -> DataFrame:
    """Cosine of two fixed-dim vector columns.

    ``method="arrow"`` (default) computes it in an Arrow-batched pandas
    UDF with per-dim fold order (see _np_fold_pair) — ~100× the
    interpreted higher-order-function expression, which survives as
    ``method="expr"`` (the differential-testing reference; the two are
    asserted bit-equal in tests)."""
    a, b = F.col(a_col), F.col(b_col)
    if method == "expr":
        denom = _norm(a) * _norm(b)
        return df.withColumn(
            out, F.when(denom == 0, F.lit(0.0)).otherwise(_dot(a, b) / denom)
        )
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(av: pd.Series, bv: pd.Series) -> pd.Series:
        import numpy as np

        if len(av) == 0:
            return pd.Series([], dtype="float64")
        dot, na, nb = _np_fold_pair(_stack(av), _stack(bv))
        denom = np.sqrt(na) * np.sqrt(nb)
        res = np.where(denom == 0, 0.0, dot / np.where(denom == 0, 1.0, denom))
        return pd.Series(res)

    return df.withColumn(out, _cos(a, b))


def _cosine_struct(vec_col, cvec, cid):
    """(cos, cid) struct for a candidate centroid — zero-norm guarded."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    denom = _norm(v) * _norm(cvec)
    return F.struct(
        F.when(denom == 0, F.lit(0.0)).otherwise(_dot(v, cvec) / denom).alias("cos"),
        cid.alias("cid"),
    )


def _topk(scored: DataFrame, k: int) -> DataFrame:
    """(query_id, neighbor_id, cosine) → top-k per query without a
    global sort: a bounded sorted array per key (single shuffle,
    map-side partial aggregation)."""
    return (
        scored.groupBy("query_id")
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(F.struct("cosine", "neighbor_id")), asc=False
                ),
                1,
                k,
            ).alias("nn")
        )
        .select("query_id", F.explode("nn").alias("nn"))
        .select(
            "query_id",
            F.col("nn.neighbor_id").alias("neighbor_id"),
            F.round(F.col("nn.cosine"), 6).alias("cosine"),
        )
    )


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (baseline; quadratic).

    Returns (query_id, neighbor_id, cosine) with the query itself
    excluded, k rows per query."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    )
    pairs = q.crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = with_cosine(pairs, "qvec", "nvec").select(
        "query_id", "neighbor_id", "cosine"
    )
    return _topk(scored, k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_bucket(
    df: DataFrame, vec_col: str, dim: int, n_planes: int = 8, seed: int = 42,
    method: str = "arrow",
) -> DataFrame:
    """Random-hyperplane signature as an int bucket column.

    ``method="arrow"`` (default): one Arrow-batched pandas UDF computes
    all plane dots with per-dim fold order (_np_fold_dot) — bit-equal
    to the Catalyst path but vectorized across the batch instead of
    interpreting n_planes higher-order folds per row.
    ``method="expr"``: the original all-JVM expression (differential
    reference, asserted equal in tests)."""
    planes = _hyperplanes(dim, n_planes, seed)
    if method == "expr":
        sig = F.lit(0)
        for i, plane in enumerate(planes):
            lit_plane = F.array(*[F.lit(float(x)) for x in plane])
            bit = F.when(
                _dot(F.col(vec_col), lit_plane) >= 0, F.lit(1 << i)
            ).otherwise(F.lit(0))
            sig = sig.bitwiseOR(bit)
        return df.withColumn("bucket", sig)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _sig(vec: pd.Series) -> pd.Series:
        import numpy as np

        if len(vec) == 0:
            return pd.Series([], dtype="int32")
        mat = _stack(vec)
        out = np.zeros(len(vec), dtype=np.int64)
        for i, plane in enumerate(planes):
            out |= np.where(_np_fold_dot(mat, np.asarray(plane)) >= 0, 1 << i, 0)
        return pd.Series(out.astype("int32"))

    return df.withColumn("bucket", _sig(F.col(vec_col)))


def ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket (equi-join).
    The bucketed candidate index is (lazily) checkpointed — queries
    typically derive from the same corpus, and without it the
    signature UDF re-runs over the corpus for the candidate side."""
    emb_b = lsh_bucket(embeddings, vec_col, dim, n_planes).select(
        "bucket", F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    ).localCheckpoint(eager=False)
    # the query side is checkpointed too: Catalyst infers
    # isnotnull(bucket) from the join key and pushes the signature UDF
    # below the repartition to evaluate the filter early — running the
    # UDF TWICE per query row; the checkpoint pins one evaluation
    q_b = lsh_bucket(queries, vec_col, dim, n_planes).select(
        "bucket", F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    ).localCheckpoint(eager=False)
    pairs = q_b.join(emb_b, "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = with_cosine(pairs, "qvec", "nvec").select(
        "query_id", "neighbor_id", "cosine"
    )
    return _topk(scored, k)


def _argbest(cents_col, vec_col):
    """(cos, cid) struct of the nearest centroid — array_max over a
    transform, so the whole argmax is one narrow JVM expression (ties
    break to the larger cid, mirrored by the SQL oracle)."""
    return F.array_max(
        F.transform(
            cents_col, lambda c: _cosine_struct(vec_col, c["cvec"], c["cid"])
        )
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    centroid_every: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) ANN: the scale path beyond LSH buckets.

    * coarse quantizer: a deterministic centroid subset
      (``vec_id % centroid_every == 0`` here so the oracle can mirror
      it; k-means over a sample in production — the plumbing is
      identical);
    * centroids are collected into ONE array row and broadcast, so
      cell assignment is a narrow per-row argmax (no shuffle, no
      |V|×|C| expansion);
    * each query probes its ``nprobe`` nearest cells; candidates are
      fetched with an equi-join on the cell id — the only shuffle,
      keyed by cell, touching ~nprobe/|C| of the corpus instead of a
      cross join.

    Returns (query_id, neighbor_id, cosine), ≤k rows per query."""
    cents = embeddings.filter(F.col(id_col) % centroid_every == 0).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
    )
    cent_row = cents.select(
        F.sort_array(F.collect_list(F.struct("cid", "cvec"))).alias("cents")
    )

    # cell assignment: narrow argmax per vector
    assigned = (
        embeddings.crossJoin(F.broadcast(cent_row))
        .withColumn("best", _argbest(F.col("cents"), vec_col))
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("nvec"),
            F.col("best.cid").alias("cell"),
        )
    )

    # query probes: top-nprobe cells per query
    probes = (
        queries.crossJoin(F.broadcast(cent_row))
        .withColumn(
            "probe",
            F.slice(
                F.sort_array(
                    F.transform(
                        "cents",
                        lambda c: _cosine_struct(vec_col, c["cvec"], c["cid"]),
                    ),
                    asc=False,
                ),
                1,
                nprobe,
            ),
        )
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            F.explode("probe.cid").alias("cell"),
        )
    )

    pairs = probes.join(assigned, "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = with_cosine(pairs, "qvec", "nvec").select(
        "query_id", "neighbor_id", "cosine"
    )
    return _topk(scored, k)


def embedding_near_dups(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH buckets.

    The bucketed corpus is (lazily) checkpointed: it feeds BOTH sides
    of the self-join, and without it the signature UDF re-runs over
    the full corpus per side."""
    b = lsh_bucket(embeddings, vec_col, dim, n_planes).localCheckpoint(
        eager=False
    )
    left = b.select("bucket", F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    right = b.select("bucket", F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = left.join(right, "bucket").filter(F.col("id_a") < F.col("id_b"))
    return (
        with_cosine(pairs, "va", "vb")
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
        .distinct()
    )


def random_projection(
    embeddings: DataFrame,
    out_dim: int = 8,
    scale: int = 1000,
    seed: str = "rp",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Signed ±1 random projection (dense Achlioptas / JL transform) →
    (vec_id, j, v): fixed-point integer projections onto ``out_dim``
    pseudo-random ±1 directions.

    The sign matrix is a pure function of (seed, j, i) — first md5 hex
    digit even → +1 — so any engine (and the SQL oracle) reproduces it
    without sharing state; components quantize to bigints at ``scale``
    (ROUND half-away, the gram_matrix convention) so the integer dot
    products are bit-exact at any parallelism.

    Scale shape: entirely row-local — the d×k sign matrix is inlined as
    k literal arrays (zip_with · aggregate, whole-stage codegen), so
    projecting 10^12 vectors is a zero-shuffle map with output k/d the
    input width. This is the cheap dimensionality-reduction front-end
    for LSH/IVF when d is large; distances distort by at most
    ±ε·‖x‖‖y‖ with k = O(log N / ε²) (Johnson–Lindenstrauss).
    """
    import hashlib

    if out_dim < 1:
        raise ValueError(f"out_dim must be >= 1, got {out_dim}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    dim = embeddings.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    signs = [
        [
            1 if hashlib.md5(f"{seed}|{j}|{i}".encode()).hexdigest()[0]
            in "02468ace" else -1
            for i in range(dim)
        ]
        for j in range(out_dim)
    ]
    q = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * scale).cast("long"),
    )
    projs = []
    for j in range(out_dim):
        s = F.array(*[F.lit(v).cast("long") for v in signs[j]])
        projs.append(
            F.aggregate(
                F.zip_with(F.col("_q"), s, lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
        )
    return (
        embeddings.select(id_col, q.alias("_q"))
        .select(id_col, F.posexplode(F.array(*projs)).alias("j", "v"))
        .select(id_col, F.col("j").cast("int"), "v")
    )


def knn_graph(
    embeddings: DataFrame,
    dim: int,
    k: int = 3,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate k-NN similarity graph over the WHOLE corpus (the
    edge list graph-based clustering / graph dedup starts from):
    every vector queries its own LSH bucket for its top-k cosine
    neighbors, and the directed k-NN lists are symmetrized to
    undirected edges → (src_id, dst_id, cosine, mutual) with
    src_id < dst_id; ``mutual`` marks edges present in BOTH top-k
    lists (the usual sparsification knob — mutual-kNN graphs are
    robust to hub vectors that appear in everyone's list).

    Plan: one LSH signature projection (Arrow-batched), ONE bucket
    equi-join (never all-pairs — candidate volume is per-bucket), the
    bounded-array top-k aggregation, then one (least, greatest) pair
    aggregation whose count distinguishes mutual from one-sided edges.
    Hub buckets (skewed signatures) are bounded by the signature
    granularity — raise n_planes to split hot buckets; AQE covers
    residual join skew."""
    # bucket ONCE and checkpoint: queries and candidates are the same
    # corpus here, so routing through ann_topk would run the signature
    # UDF (and the corpus scan) twice, once per join side
    bkt = lsh_bucket(embeddings, vec_col, dim, n_planes).localCheckpoint(
        eager=False
    )
    q_b = bkt.select(
        "bucket", F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    emb_b = bkt.select(
        "bucket", F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
    )
    pairs = q_b.join(emb_b, "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    e = _topk(
        with_cosine(pairs, "qvec", "nvec").select(
            "query_id", "neighbor_id", "cosine"
        ),
        k,
    )
    a, b = F.col("query_id"), F.col("neighbor_id")
    und = e.select(
        F.least(a, b).alias("src_id"),
        F.greatest(a, b).alias("dst_id"),
        "cosine",
    )
    return (
        und.groupBy("src_id", "dst_id")
        .agg(
            F.max("cosine").alias("cosine"),
            (F.count("*") == 2).alias("mutual"),
        )
    )


def quantize_embeddings(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Scalar (symmetric, per-vector) int quantization of an embedding
    column — the storage/IO layer of a 100-TB ANN index (4× smaller
    than float32, int-dot-product distance): (vec_id, scale_num, qvec)
    where qvec[j] = floor(L · v[j] / m), m = max|v| and L = 2^(bits-1)−1.
    Dequantize as qvec[j]·m/L; m is returned as ``scale_num`` so the
    round trip stays exact-integer in the gate.

    floor (not round-half-up) on purpose: both engines evaluate the
    identical double expression, so floors agree bit-for-bit — banker's
    vs half-up rounding at representation boundaries is exactly the
    cross-engine drift the oracle discipline bans. Zero vectors
    quantize to zeros with scale 0.

    Plan: shuffle-free projection, all JVM higher-order functions
    (transform/array_max) — no Python, no shuffle, whole-stage safe."""
    if not 2 <= bits <= 16:
        raise ValueError(f"bits must be in [2, 16], got {bits}")
    level = (1 << (bits - 1)) - 1
    v = F.col(vec_col)
    m = F.array_max(F.transform(v, lambda x: F.abs(x)))
    passthrough = (
        [F.col("bucket")] if "bucket" in embeddings.columns else []
    )
    return embeddings.select(
        F.col(id_col),
        *passthrough,
        m.alias("scale_num"),
        F.when(m == 0, F.transform(v, lambda x: F.lit(0)))
        .otherwise(
            F.transform(
                v, lambda x: F.floor(F.lit(float(level)) * x / m).cast("int")
            )
        )
        .alias("qvec"),
    )


def quantized_topk(
    quantized: DataFrame,
    query_ids: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact-integer top-k over a :func:`quantize_embeddings` index:
    candidates scored by the raw int dot product Σ qa[j]·qb[j] —
    the arithmetic a SIMD int8 kernel runs on a real ANN serving node,
    and bit-identical in any engine (the reason the score column is
    the UNNORMALIZED integer dot, not a float cosine; rank by it, or
    dequantize driver-side with the two scale_num factors).

    Returns (query_id, neighbor_id, dot) — k rows per query, ties
    broken by neighbor_id descending, self excluded.

    Plan: if the index carries a ``bucket`` column (compose
    :func:`lsh_bucket` before :func:`quantize_embeddings`), candidates
    come from ONE bucket equi-join — the scale path, never all-pairs.
    Without a bucket column this is the exact brute-force baseline
    (small-corpus oracle use only; a 10^12-vector crossJoin is the
    round-1 anti-pattern this signature exists to avoid)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # the index feeds both the query-resolve join and the candidate
    # side; checkpoint so an upstream quantize/bucket pipeline runs once
    quantized = quantized.localCheckpoint(eager=False)
    on_bucket = "bucket" in quantized.columns
    qcols = [F.col(id_col).alias("query_id"), F.col("qvec").alias("qa")]
    ccols = [F.col(id_col).alias("neighbor_id"), F.col("qvec").alias("qb")]
    if on_bucket:
        qcols.append(F.col("bucket"))
        ccols.append(F.col("bucket"))
    q = query_ids.join(quantized, id_col).select(*qcols)
    c = quantized.select(*ccols)
    pairs = q.join(c, "bucket") if on_bucket else q.crossJoin(c)
    pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.aggregate(
            F.zip_with("qa", "qb", lambda a, b: a.cast("long") * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("dot"),
    )
    return (
        scored.groupBy("query_id")
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(F.struct("dot", "neighbor_id")), asc=False
                ),
                1,
                k,
            ).alias("nn")
        )
        .select("query_id", F.explode("nn").alias("nn"))
        .select(
            "query_id",
            F.col("nn.neighbor_id").alias("neighbor_id"),
            F.col("nn.dot").alias("dot"),
        )
    )


def knn_classify(
    quantized: DataFrame,
    labels: DataFrame,
    query_ids: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Majority-vote kNN label prediction over a
    :func:`quantize_embeddings` index → (query_id, true_label,
    pred_label, correct): the standard embedding-quality probe a
    training pipeline runs after every encoder change (if nearest
    neighbors don't share labels, the space is bad — catch it before a
    10^12-token run, not after).

    Composes :func:`quantized_topk` (pass an index built through
    :func:`lsh_bucket` so candidates come from ONE bucket equi-join —
    the scale path) with an integer vote: per query, count neighbor
    labels and take the argmax, ties broken by the smaller label. A
    query whose bucket holds no other vector is absent from the output
    (no neighbors → no vote), deterministically.

    Plan shape: the vote tally is |queries|·|labels| rows (tiny), the
    per-query argmax window partitions by query_id — never a global
    sort; the neighbor→label join is an equi-join where AQE broadcasts
    the (queries × k)-row side.
    """
    nn = quantized_topk(quantized, query_ids, k=k, id_col=id_col)
    votes = nn.join(
        labels.select(
            F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("vote")
        ),
        "neighbor_id",
    )
    tally = votes.groupBy("query_id", "vote").agg(F.count("*").alias("c"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("vote"))
    pred = tally.withColumn("pr", F.row_number().over(w)).filter(F.col("pr") == 1)
    truth = labels.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("true_label")
    )
    return pred.join(truth, "query_id").select(
        "query_id",
        "true_label",
        F.col("vote").alias("pred_label"),
        (F.col("vote") == F.col("true_label")).alias("correct"),
    )


def binarize_embeddings(
    embeddings: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """1-bit sign quantization → (vec_id, bvec: array<bigint>): each
    group of 64 dimensions packs MSB-first into one BIGINT word, bit =
    1 iff v[j] > 0 (zeros and missing tail dims pack as 0) — the 32×
    compression tier below :func:`quantize_embeddings`'s int8 (4×).
    Sign-bit + Hamming preserves cosine neighborhoods in expectation
    (it is hyperplane-LSH with axis-aligned planes: Charikar 2002,
    "Similarity estimation techniques from rounding algorithms"), which
    is why binary rerank front-ends are the standard first tier of a
    10^12-vector serving stack: the whole index is dims/8 bytes per
    vector and distance is XOR+popcount.

    Packing is pure bitwise (shiftleft/or folds — no arithmetic
    overflow paths, ANSI-safe) over JVM higher-order functions: a
    shuffle-free, Python-free projection. ``dim`` fixes the word count
    statically so the plan shape is data-independent.
    """
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    v = F.col(vec_col)
    n_words = (dim + 63) // 64

    def word(w: int):
        return F.aggregate(
            F.sequence(F.lit(w * 64), F.lit(w * 64 + 63)),
            F.lit(0).cast("long"),
            lambda acc, j: F.shiftleft(acc, 1).bitwiseOR(
                F.when(F.get(v, j) > 0, F.lit(1).cast("long"))
                .otherwise(F.lit(0).cast("long"))
            ),
        )

    passthrough = (
        [F.col("bucket")] if "bucket" in embeddings.columns else []
    )
    return embeddings.select(
        F.col(id_col),
        *passthrough,
        F.array(*[word(w) for w in range(n_words)]).alias("bvec"),
    )


def hamming_topk(
    binarized: DataFrame,
    query_ids: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact Hamming top-k over a :func:`binarize_embeddings` index →
    (query_id, neighbor_id, hamming): k rows per query, distance =
    Σ bit_count(xor(word_a, word_b)) — ascending, ties broken by
    neighbor_id ascending, self excluded. Bit-identical in any engine
    (integer popcounts, no floats).

    Plan shape mirrors :func:`quantized_topk`: with a ``bucket``
    column (compose :func:`lsh_bucket` first) candidates come from one
    bucket equi-join; without it this is the brute-force tier — which
    for BINARY codes is the production reality far longer than for
    floats (a 10^12-vector binary index is dims/8 TB and scans at
    memory bandwidth; pair with IVF routing when even that is too
    much).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    binarized = binarized.localCheckpoint(eager=False)
    on_bucket = "bucket" in binarized.columns
    qcols = [F.col(id_col).alias("query_id"), F.col("bvec").alias("ba")]
    ccols = [F.col(id_col).alias("neighbor_id"), F.col("bvec").alias("bb")]
    if on_bucket:
        qcols.append(F.col("bucket"))
        ccols.append(F.col("bucket"))
    q = query_ids.join(binarized, id_col).select(*qcols)
    c = binarized.select(*ccols)
    pairs = q.join(c, "bucket") if on_bucket else q.crossJoin(c)
    pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.aggregate(
            F.zip_with(
                "ba", "bb", lambda a, b: F.bit_count(a.bitwiseXOR(b))
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x.cast("long"),
        ).alias("hamming"),
    )
    return (
        scored.groupBy("query_id")
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(F.struct("hamming", "neighbor_id"))
                ),
                1,
                k,
            ).alias("nn")
        )
        .select("query_id", F.explode("nn").alias("nn"))
        .select(
            "query_id",
            F.col("nn.neighbor_id").alias("neighbor_id"),
            F.col("nn.hamming").alias("hamming"),
        )
    )
