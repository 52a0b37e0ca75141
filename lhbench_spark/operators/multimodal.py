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
