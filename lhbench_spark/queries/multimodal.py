"""Multimodal-column queries (north-star extension).

`multimodal_binary_meta` exercises the JVM-side binary path (encode →
byte length → hex) and is oracle-checked. The Pandas-UDF feature
extraction path (operators/multimodal.py) is covered by unit tests and
registered as a rows-only query (no SQL oracle — mapInPandas is not
SQL-expressible).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lhbench_spark.catalog import table
from lhbench_spark.operators import multimodal
from lhbench_spark.queries.registry import query

_BINARY_META_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS byte_len,
       lower(substr(hex(encode(text)), 1, 16)) AS hex_prefix,
       md5(text) AS payload_md5
FROM documents
"""


@query("multimodal_binary_meta", tags=("multimodal", "binary"), oracle=_BINARY_META_ORACLE)
def multimodal_binary_meta(spark, sf_dir):
    """Binary payload metadata, JVM-side only: byte length (UTF-8 encode),
    hex prefix, content digest. The blob never reaches Python."""
    docs = table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.length(payload).cast("bigint").alias("byte_len"),
        F.lower(F.substring(F.hex(payload), 1, 16)).alias("hex_prefix"),
        F.md5(payload).alias("payload_md5"),
    )


@query("multimodal_features", tags=("multimodal", "pandas-udf"))
def multimodal_features(spark, sf_dir):
    """Arrow-batched (mapInPandas) feature extraction over binary payloads
    — rows-only check (not SQL-expressible); exactness is covered by unit
    tests against hashlib on the driver side."""
    docs = table(spark, sf_dir, "documents")
    return multimodal.extract_features(multimodal.documents_as_media(docs))


# Resize planning + frame sampling are integer-exact arithmetic over
# metadata (operators/multimodal.py) — fully oracle-checkable even though
# the pixel/frame DECODE stage is stubbed (no PIL/ffmpeg in this env).
_SAMPLE_PLAN_ORACLE = """
WITH media AS (
    SELECT doc_id AS media_id,
           encode(text) AS payload,
           320 + (doc_id * 7) % 1600 AS src_w,
           240 + (doc_id * 13) % 900 AS src_h
    FROM documents
), dims AS (
    SELECT media_id, src_w, src_h,
           greatest(src_w, src_h) AS longest
    FROM media
), plan AS (
    SELECT media_id, src_w, src_h,
           CASE WHEN longest <= 512 THEN src_w
                ELSE CAST((src_w * 512) // longest AS INT) END AS dst_w,
           CASE WHEN longest <= 512 THEN src_h
                ELSE CAST((src_h * 512) // longest AS INT) END AS dst_h
    FROM dims
), frames AS (
    SELECT media_id,
           octet_length(payload) * 10 AS duration_ms,
           (octet_length(payload) * 10) // 2500 + 1 AS n_frames
    FROM media
)
SELECT p.media_id,
       CAST(p.src_w AS INT) AS src_w, CAST(p.src_h AS INT) AS src_h,
       CAST(p.dst_w AS INT) AS dst_w, CAST(p.dst_h AS INT) AS dst_h,
       CAST(f.duration_ms AS BIGINT) AS duration_ms,
       CAST(f.n_frames AS BIGINT) AS n_frames,
       CAST((f.n_frames - 1) * 2500 AS BIGINT) AS last_off_ms
FROM plan p JOIN frames f ON p.media_id = f.media_id
"""


@query(
    "multimodal_sample_plan",
    tags=("multimodal", "resize", "frames"),
    oracle=_SAMPLE_PLAN_ORACLE,
)
def multimodal_sample_plan(spark, sf_dir):
    """Resize planning (aspect-preserving, metadata-side) + frame-offset
    sampling (sequence/explode then re-aggregated) — the two Spark-side
    stages that bracket a stubbed decoder. n_frames is counted from the
    EXPLODED offset relation, so the plumbing a real decoder would
    consume is what the oracle's closed form checks."""
    media = multimodal.documents_as_media(table(spark, sf_dir, "documents"))
    plan = multimodal.resize_plan(media, max_side=512)
    frames = multimodal.sample_frame_offsets(media, stride_ms=2500)
    frame_agg = frames.groupBy("media_id").agg(
        F.max("duration_ms").alias("duration_ms"),
        F.count(F.lit(1)).alias("n_frames"),
        F.max("frame_off_ms").alias("last_off_ms"),
    )
    return plan.drop("needs_resize").join(frame_agg, "media_id")


_AUDIO_WINDOWS_ORACLE = """
WITH media AS (
    SELECT doc_id AS media_id, octet_length(encode(text)) AS samples
    FROM documents
)
SELECT media_id,
       CAST(samples AS BIGINT) AS samples,
       CAST(CASE WHEN samples >= 100 THEN (samples - 100) // 40 + 1
                 ELSE 0 END AS BIGINT) AS n_windows,
       CAST(CASE WHEN samples >= 100 THEN ((samples - 100) // 40) * 40
            END AS BIGINT) AS last_off
FROM media
"""


@query(
    "audio_frame_windows",
    tags=("multimodal", "audio", "windows"),
    oracle=_AUDIO_WINDOWS_ORACLE,
)
def audio_frame_windows(spark, sf_dir):
    """Audio-frame windowing plan: sliding sample windows (100-sample
    window, 40-sample hop) generated per payload with sequence +
    explode_outer, then re-aggregated per media — so the exploded
    relation a real STFT stage would consume is what the oracle's
    closed form verifies (including sub-window payloads, which keep a
    NULL-offset row and count 0 windows)."""
    media = multimodal.documents_as_media(table(spark, sf_dir, "documents"))
    offs = multimodal.audio_window_offsets(media, win_samples=100, hop_samples=40)
    return offs.groupBy("media_id").agg(
        F.max("samples").alias("samples"),
        F.count("win_off").alias("n_windows"),
        F.max("win_off").alias("last_off"),
    )
