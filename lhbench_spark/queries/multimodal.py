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
