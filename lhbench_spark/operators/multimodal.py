"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for 100 TB multimodal corpora:
- payloads live in a `binary` column; metadata (mime, width, duration, …)
  in sibling typed columns — never parsed out of the blob in the hot path;
- decode / feature-extraction runs as Arrow-batched Pandas functions via
  ``mapInPandas`` (one Python worker per partition, vectorized transfer) —
  NEVER a row-at-a-time Python UDF;
- partitioning by size: blobs dominate partition bytes, so upstream
  writers should target `spark.sql.files.maxPartitionBytes`-sized row
  groups; the decode stage is CPU-bound and benefits from
  ``repartition`` to core count before ``mapInPandas``.

The actual image/audio decoders are NOT available in this environment
(no PIL/ffmpeg); ``decode_image`` raises NotImplementedError by design,
and ``fake_image_features`` is the deterministic stand-in that keeps the
schema, batching, and partitioning real and testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Canonical multimodal schema: blob + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), False),
        StructField("mime", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("byte_len", LongType(), False),
        StructField("sha1", StringType(), False),
        StructField("brightness", DoubleType(), True),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque payloads so the binary
    pipeline is exercised end-to-end on the driver testdata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
    )


def decode_image(payload: bytes) -> object:
    """Real decoder stub — the container ships no imaging libraries.
    A production build plugs PIL/libvips here; everything around it
    (schema, batching, partitioning) is unchanged."""
    raise NotImplementedError("image decoding requires an imaging library (PIL/libvips)")


def _fake_brightness(payload: bytes) -> float:
    """Deterministic stand-in for a decoded-image statistic: mean byte
    value — keeps the numeric column shape real without a decoder."""
    if not payload:
        return 0.0
    return sum(payload) / len(payload) / 255.0


def resize_plan(media: DataFrame, max_side: int = 512) -> DataFrame:
    """Resize PLANNING: compute target dimensions (aspect-preserving,
    bounded by ``max_side``) from the metadata columns — pure JVM
    arithmetic, no blob access. The pixel resample itself belongs in a
    ``mapInPandas`` stage exactly like :func:`extract_features` (stubbed
    here with the decoders, :func:`decode_image`); planning dims
    metadata-side means the Python stage receives only rows that actually
    need work (``dst != src`` filter pushes down before any decode).

    NULL source dims (non-image media) get deterministic synthetic dims
    so the driver testdata exercises the arithmetic end to end."""
    src_w = F.coalesce(
        F.col("width"), (F.lit(320) + F.pmod(F.col("media_id") * 7, F.lit(1600))).cast("int")
    )
    src_h = F.coalesce(
        F.col("height"), (F.lit(240) + F.pmod(F.col("media_id") * 13, F.lit(900))).cast("int")
    )
    longest = F.greatest(src_w, src_h)
    # integer arithmetic only (`div` = floor division) — engine-exact,
    # no float rounding ambiguity between Spark and any oracle.
    m = media.select(
        "media_id",
        src_w.alias("src_w"),
        src_h.alias("src_h"),
        longest.alias("_longest"),
    )
    dst_w = F.when(F.col("_longest") <= max_side, F.col("src_w")).otherwise(
        F.expr(f"CAST((src_w * {int(max_side)}) div _longest AS INT)")
    )
    dst_h = F.when(F.col("_longest") <= max_side, F.col("src_h")).otherwise(
        F.expr(f"CAST((src_h * {int(max_side)}) div _longest AS INT)")
    )
    return m.select(
        "media_id",
        "src_w",
        "src_h",
        dst_w.alias("dst_w"),
        dst_h.alias("dst_h"),
        (dst_w != F.col("src_w")).alias("needs_resize"),
    )


def sample_frame_offsets(media: DataFrame, stride_ms: int = 2500) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one row per sampled
    frame offset (``sequence`` + ``explode`` — JVM-side row generation,
    the shape a real decoder stage consumes). Duration is synthesized
    from byte_len (10 ms per byte) since the container ships no ffprobe;
    a production build reads it from metadata. Integer-exact on purpose.

    The downstream frame DECODE is the stubbed part; at scale the
    exploded (media_id, frame_off_ms) relation is repartitioned to core
    count and fed to a ``mapInPandas`` decoder exactly like
    :func:`extract_features`."""
    duration_ms = (F.length("payload").cast("long") * 10).alias("duration_ms")
    return media.select(
        "media_id",
        duration_ms,
        F.explode(
            F.expr(f"sequence(0L, CAST(length(payload) AS BIGINT) * 10, {int(stride_ms)}L)")
        ).alias("frame_off_ms"),
    )


def audio_window_offsets(
    media: DataFrame, win_samples: int = 100, hop_samples: int = 40
) -> DataFrame:
    """Audio-frame windowing plumbing: one row per (media_id, sample
    offset) for a sliding window over a PCM payload — the relation a
    real STFT/filterbank stage consumes downstream (stubbed with the
    decoders like the image/video paths). The payload stands in for
    8-bit mono PCM (1 byte = 1 sample) since no audio codec ships in
    this container; a production build reads sample counts from the
    container metadata instead. ``sequence`` + ``explode_outer``:
    JVM-side row generation, and payloads shorter than one window keep
    their row with a NULL offset so per-media aggregation sees them."""
    samples = F.length("payload").cast("long")
    offsets = F.expr(
        f"CASE WHEN length(payload) >= {int(win_samples)} THEN "
        f"sequence(0L, CAST(length(payload) AS BIGINT) - {int(win_samples)}, "
        f"{int(hop_samples)}L) ELSE array() END"
    )
    return media.select(
        "media_id",
        samples.alias("samples"),
        F.explode_outer(offsets).alias("win_off"),
    )


def extract_features(
    media: DataFrame, batch_rows: int = 1024, parallelism: int | None = None
) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas`` streams column batches through one Python worker per
    partition — the only sanctioned Python hot path in this engine.

    ``parallelism``: repartition before the Python stage. Leave None for
    light extractors (each extra partition costs a Python worker spawn,
    which dominates on small inputs); set to core count for genuinely
    CPU-bound decodes (image/audio), where worker spawn amortizes."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "sha1": payloads.map(lambda b: hashlib.sha1(bytes(b)).hexdigest()),
                    "brightness": payloads.map(lambda b: _fake_brightness(bytes(b))),
                }
            )

    if parallelism:
        media = media.repartition(parallelism)
    return media.mapInPandas(compute, schema=FEATURE_SCHEMA)
