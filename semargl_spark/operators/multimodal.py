"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode step is STUBBED (the container ships no image/audio codecs) —
``DecodeUnavailable`` is raised by the real path and a deterministic
fake decoder stands in for tests — but the Spark-side machinery is real
and exercised: schemas, Arrow-batched ``mapInArrow`` over binary
columns, batch shapes, partitioning.

Design for 100 TB of media:
* binary payloads stay opaque to Catalyst (no JVM copies beyond the
  scan); metadata columns (mime, width, height, duration) are normal
  pruned/pushed-down columns;
* decode/feature-extract runs per Arrow record batch in ``mapInArrow`` —
  batches bound peak memory (spark.sql.execution.arrow.maxRecordsPerBatch
  should be lowered for large payloads);
* frame sampling emits 1→N rows (video → frames) exactly like the
  parser flatMap, keeping the stage narrow.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("mime", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


class DecodeUnavailable(NotImplementedError):
    """Raised by the real decode path for formats whose codecs are not
    installed in this environment (JPEG, compressed video/audio).
    WAV-PCM, G.711 µ-law WAV, 24-bit BMP, 8-bit PNG, and GIF decode
    for real via the pure-Python codecs in :mod:`.media_codecs`; wire
    PIL/ffmpeg here for the rest on a cluster image that ships them."""


def real_decode(payload: bytes, mime: str):
    """Real decode dispatch. ``audio/wav``, ``audio/basic`` (µ-law),
    ``image/bmp``, ``image/png``, and ``image/gif`` parse the actual
    container bytes (media_codecs.py); everything else needs a codec
    library this container doesn't ship."""
    from . import media_codecs

    if mime == "audio/wav":
        return media_codecs.wav_features(payload)
    if mime == "image/bmp":
        return media_codecs.bmp_features(payload)
    if mime == "image/png":
        return media_codecs.png_features(payload)
    if mime == "audio/basic":
        return media_codecs.mulaw_features(payload)
    if mime == "image/gif":
        return media_codecs.gif_features(payload)
    raise DecodeUnavailable(
        f"no codec for {mime}: install PIL/ffmpeg in the cluster image"
    )


def fake_decode(payload: bytes, mime: str, dim: int = 8) -> list[float]:
    """Deterministic stand-in decoder: sha256 of the payload folded into
    a unit-scaled float vector. Same contract as a real embedding."""
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:dim]]


def synth_media(spark, sf_dir: str, turns_per_doc: int = 1) -> DataFrame:
    """Deterministic synthetic media table derived from documents: the
    payload is the utf-8 text (an opaque stand-in blob)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.concat(F.lit("m"), F.col("doc_id").cast("string")).alias("media_id"),
        F.when(F.col("doc_id").cast("int") % 3 == 0, "image/png")
        .when(F.col("doc_id").cast("int") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit(64).cast("int").alias("width"),
        F.lit(64).cast("int").alias("height"),
        (F.col("doc_id").cast("int") % 10 * 1000).cast("int").alias("duration_ms"),
    )


def synth_wav_payload(did: int) -> bytes:
    """Closed-form PCM WAV for doc ``did``: mono 16-bit 8 kHz,
    ``64 + did % 64`` samples, ``s[i] = ((did*31 + i*7) % 256) - 128``.
    Every wav_features() statistic is therefore an analytic function of
    ``did`` that a SQL oracle can recompute."""
    from .media_codecs import encode_wav

    n = 64 + did % 64
    samples = [((did * 31 + i * 7) % 256) - 128 for i in range(n)]
    return encode_wav(8000, 1, samples, bits=16)


def synth_bmp_payload(did: int) -> bytes:
    """Closed-form 24-bit BMP for doc ``did``: ``(8 + did % 5) ×
    (8 + did % 7)``, pixel (x, y) = ((did + 7x + 13y) % 256,
    (3·did + 11x + y) % 256, (5·did + x·y) % 256)."""
    from .media_codecs import encode_bmp

    w, h = 8 + did % 5, 8 + did % 7
    rows = [
        [
            (
                (did + 7 * x + 13 * y) % 256,
                (3 * did + 11 * x + y) % 256,
                (5 * did + x * y) % 256,
            )
            for x in range(w)
        ]
        for y in range(h)
    ]
    return encode_bmp(w, h, rows)


def synth_png_payload(did: int) -> bytes:
    """Closed-form truecolor PNG for doc ``did``: same dimensions and
    pixel formula as :func:`synth_bmp_payload` (so ONE analytic oracle
    branch covers both image codecs), encoded with the default
    cycling per-scanline filters — every payload exercises the full
    None/Sub/Up/Average/Paeth bank through a real zlib stream."""
    from .media_codecs import encode_png

    w, h = 8 + did % 5, 8 + did % 7
    rows = [
        [
            (
                (did + 7 * x + 13 * y) % 256,
                (3 * did + 11 * x + y) % 256,
                (5 * did + x * y) % 256,
            )
            for x in range(w)
        ]
        for y in range(h)
    ]
    return encode_png(w, h, rows)


def synth_mulaw_payload(did: int) -> bytes:
    """Closed-form G.711 µ-law WAV for doc ``did``: mono 8 kHz,
    ``64 + did % 64`` code bytes ``c[i] = (did*7 + i*13) % 256`` stored
    directly (every byte is a valid µ-law code), so the expanded linear
    samples — and every feature statistic — are pure integer functions
    of (did, i) a SQL oracle replays with the segment-expansion
    formula."""
    from .media_codecs import encode_wav_mulaw

    n = 64 + did % 64
    return encode_wav_mulaw(
        8000, 1, [(did * 7 + i * 13) % 256 for i in range(n)]
    )


def _gif_palette() -> list[tuple[int, int, int]]:
    # unique tuples (i*7+1 is a mod-256 bijection) so the encoder's
    # color->index lut is well-defined
    return [((i * 7 + 1) % 256, (i * 3) % 256, (i * 5) % 256)
            for i in range(256)]


def synth_gif_payload(did: int) -> bytes:
    """Closed-form GIF for doc ``did``: same dimensions as the BMP/PNG
    payloads, pixel (x, y) = palette[(did + 7x + 13y) % 256] with the
    fixed bijective palette — the decoded r/g/b are affine functions of
    the index, so the oracle stays closed-form while the payload goes
    through a REAL growing-table LZW stream."""
    from .media_codecs import encode_gif

    w, h = 8 + did % 5, 8 + did % 7
    pal = _gif_palette()
    rows = [
        [pal[(did + 7 * x + 13 * y) % 256] for x in range(w)]
        for y in range(h)
    ]
    return encode_gif(w, h, rows, pal)


def synth_real_media(spark, sf_dir: str) -> DataFrame:
    """Deterministic REAL media table: genuine PCM WAV blobs (doc ids
    ≡ 0 mod 5), 24-bit BMP (≡ 1), PNG (≡ 2), µ-law WAV (≡ 3), and GIF
    (≡ 4), built executor-side per Arrow batch — the payloads parse
    with any standards-conforming reader."""
    import pyarrow as pa

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("int").alias("did")
    )
    out_schema = StructType(
        [
            StructField("media_id", StringType(), False),
            StructField("mime", StringType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )
    arrow_schema = pa.schema(
        [("media_id", pa.string()), ("mime", pa.string()), ("payload", pa.binary())]
    )

    def build(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            mids, mimes, blobs = [], [], []
            for did in rb.column(0).to_pylist():
                mids.append(f"m{did}")
                k = did % 5
                if k == 0:
                    mimes.append("audio/wav")
                    blobs.append(synth_wav_payload(did))
                elif k == 1:
                    mimes.append("image/bmp")
                    blobs.append(synth_bmp_payload(did))
                elif k == 2:
                    mimes.append("image/png")
                    blobs.append(synth_png_payload(did))
                elif k == 3:
                    mimes.append("audio/basic")
                    blobs.append(synth_mulaw_payload(did))
                else:
                    mimes.append("image/gif")
                    blobs.append(synth_gif_payload(did))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(mids, pa.string()),
                    pa.array(mimes, pa.string()),
                    pa.array(blobs, pa.binary()),
                ],
                schema=arrow_schema,
            )

    return docs.mapInArrow(build, schema=out_schema)


def resize_real(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL resize: decode → nearest-neighbor resample → re-encode per
    Arrow batch. BMP, PNG, and GIF in this container
    (media_codecs.resize_bmp / resize_png / resize_gif); other mimes
    raise :class:`DecodeUnavailable` — filter first."""
    import pyarrow as pa

    from .media_codecs import resize_bmp, resize_gif, resize_png

    src = media.select("media_id", "mime", "payload")
    out_schema = StructType(
        [
            StructField("media_id", StringType(), False),
            StructField("mime", StringType(), False),
            StructField("payload", BinaryType(), False),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
        ]
    )
    arrow_schema = pa.schema(
        [
            ("media_id", pa.string()),
            ("mime", pa.string()),
            ("payload", pa.binary()),
            ("width", pa.int32()),
            ("height", pa.int32()),
        ]
    )

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            names = rb.schema.names
            mids, mimes, blobs = [], [], []
            for mid, mime, payload in zip(
                rb.column(names.index("media_id")).to_pylist(),
                rb.column(names.index("mime")).to_pylist(),
                rb.column(names.index("payload")).to_pylist(),
            ):
                if mime == "image/bmp":
                    resized = resize_bmp(bytes(payload), width, height)
                elif mime == "image/png":
                    resized = resize_png(bytes(payload), width, height)
                elif mime == "image/gif":
                    resized = resize_gif(bytes(payload), width, height)
                else:
                    raise DecodeUnavailable(
                        f"real resize needs a codec for {mime}"
                    )
                mids.append(mid)
                mimes.append(mime)
                blobs.append(resized)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(mids, pa.string()),
                    pa.array(mimes, pa.string()),
                    pa.array(blobs, pa.binary()),
                    pa.array([width] * len(mids), pa.int32()),
                    pa.array([height] * len(mids), pa.int32()),
                ],
                schema=arrow_schema,
            )

    return src.mapInArrow(run, schema=out_schema)


def resize_media(
    media: DataFrame, width: int, height: int, use_fake: bool = True
) -> DataFrame:
    """Resize stage: (media_id, mime, payload, w, h) → resized payload +
    updated dimensions.

    The real path decodes/resizes/re-encodes per Arrow batch exactly
    like :func:`extract_features` (PIL/ffmpeg in the cluster image —
    stubbed here). The deterministic fake used in this sandbox is a
    sha256 content stamp over (payload ‖ resize tag) — notably it stays
    a pure Catalyst expression (whole-stage codegen, zero Python), so
    the *pipeline* shape (schema, partitioning, pushdown) is exercised
    for real."""
    if not use_fake:
        # the genuine decode→resample→re-encode path (BMP in this
        # container) lives in resize_real; it returns the same id/mime/
        # payload/width/height columns without the duration passthrough
        return resize_real(media, width, height)
    tag = F.encode(F.lit(f"|resize:{width}x{height}"), "utf-8")
    stamped = F.encode(F.sha2(F.concat(F.col("payload"), tag), 256), "utf-8")
    return media.select(
        "media_id",
        "mime",
        stamped.alias("payload"),
        F.lit(width).cast("int").alias("width"),
        F.lit(height).cast("int").alias("height"),
        "duration_ms",
    )


def extract_features(
    media: DataFrame, frames_per_video: int = 3, dim: int = 8, use_fake: bool = True
) -> DataFrame:
    """Decode/feature-extract per Arrow record batch; videos fan out to
    ``frames_per_video`` rows (frame sampling), others to one row."""
    import pyarrow as pa

    src = media.select("media_id", "mime", "payload")
    arrow_schema = pa.schema(
        [
            ("media_id", pa.string()),
            ("frame_idx", pa.int32()),
            ("feature", pa.list_(pa.float32())),
        ]
    )

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        decode = fake_decode if use_fake else real_decode
        for rb in batches:
            names = rb.schema.names
            mids_out, frames, feats = [], [], []
            for mid, mime, payload in zip(
                rb.column(names.index("media_id")).to_pylist(),
                rb.column(names.index("mime")).to_pylist(),
                rb.column(names.index("payload")).to_pylist(),
            ):
                blob = bytes(payload) if payload is not None else b""
                n_frames = frames_per_video if mime.startswith("video/") else 1
                for i in range(n_frames):
                    # ASCII frame tag (not raw bytes) so external SQL
                    # oracles can recompute the fake-decode digest
                    vec = decode(blob + f"|f{i}".encode(), mime)
                    mids_out.append(mid)
                    frames.append(i)
                    feats.append([float(x) for x in vec[:dim]])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(mids_out, pa.string()),
                    pa.array(frames, pa.int32()),
                    pa.array(feats, pa.list_(pa.float32())),
                ],
                schema=arrow_schema,
            )

    return src.mapInArrow(run, schema=FEATURES_SCHEMA)
