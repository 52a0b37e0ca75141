"""Training-data assembly queries over ``documents`` (north-star extension).

The last mile of an LLM data pipeline, after cleaning and dedup:
rebalance the corpus toward a target language mixture, split
train/val/test deterministically with a leakage audit, and pack
documents into fixed token-budget training sequences. All three are
pure JVM-side plans (hash / window / aggregate — no Python in the hot
path), each paired with a value-identical DuckDB oracle.

Cross-engine determinism: membership decisions hash ``md5(salt ||
doc_id)`` and compare a 24-bit integer prefix numerically — Spark
``conv(hex, 16, 10)``, DuckDB ``CAST('0x' || hex AS BIGINT)`` — so both
engines evaluate the identical predicate with zero float rounding in
the decision path (the same discipline as ``sample_stratified_hash``,
which compares fixed-width hex lexicographically; the numeric form here
additionally supports DATA-DERIVED thresholds, where a rate of exactly
1.0 would overflow a fixed-width hex literal).

Reference provenance: the reference has no training-data surface (it is
a storage-format benchmark); these extend the engine the way its
workloads extend TPC-DS — see SURVEY.md §2 "LLM-pipeline operators".
"""

from __future__ import annotations

from lhbench_spark.catalog import table
from lhbench_spark.operators import textnorm
from lhbench_spark.queries.registry import query

# 24-bit hash space for keep/split decisions: md5's first 6 hex digits.
_HASH_SPACE = 16777216


def _key24_duck(salt: str) -> str:
    return (
        f"CAST('0x' || substr(md5('{salt}' || CAST(doc_id AS VARCHAR)), 1, 6)"
        " AS BIGINT)"
    )


# -- Mixture rebalancing -----------------------------------------------------
# Two-pass weighted sampling toward an EQUAL per-language mixture: pass 1
# aggregates per-language counts (metadata-sized: one row per language at
# any corpus size), derives keep_thresh = min(1, target_n / n_lang) over
# the 24-bit hash space; pass 2 is a scan-bound hash filter joined to the
# broadcast rate table. This is the data-mixing step that downsamples a
# dominant language (en is ~44% of the corpus) to a target share — the
# rates come from corpus STATISTICS, not constants, which is what
# distinguishes mixture rebalancing from plain stratified sampling.
# 100 TB: pass 1 is one map-side-combined agg; the rates frame is
# |languages| rows (broadcast-hintable: aggregated, bounded); pass 2
# never shuffles the corpus (filter + partial agg).

_MIXTURE_ORACLE = f"""
WITH counts AS (
    SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY lang
), rates AS (
    SELECT lang, n_total,
           CAST(floor(least(
               1.0,
               (CAST(SUM(n_total) OVER () AS DOUBLE) / COUNT(*) OVER ())
                   / n_total) * {_HASH_SPACE}) AS BIGINT) AS keep_thresh
    FROM counts
)
SELECT d.lang, r.n_total, r.keep_thresh,
       CAST(SUM(CASE WHEN {_key24_duck("mix1:")} < r.keep_thresh
                THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       CAST(SUM(CASE WHEN {_key24_duck("mix1:")} < r.keep_thresh
                THEN d.doc_id ELSE 0 END) AS BIGINT) AS sampled_id_sum
FROM documents d JOIN rates r USING (lang)
GROUP BY d.lang, r.n_total, r.keep_thresh
"""


@query(
    "corpus_mixture_sample",
    tags=("assembly", "sample", "documents", "extension"),
    oracle=_MIXTURE_ORACLE,
)
def corpus_mixture_sample(spark, sf_dir):
    """Deterministic mixture rebalancing: derive per-language keep rates
    from corpus counts (target = equal shares), sample by hashed doc_id,
    report per-language totals + an exact membership checksum."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    # Whole-frame window over the AGGREGATED counts (one row per
    # language — bounded at any SF, so the single-partition window is a
    # metadata-sized step, not a data-sized one).
    w = Window.partitionBy()
    rates = counts.select(
        "lang",
        "n_total",
        F.floor(
            F.least(
                F.lit(1.0),
                (
                    F.sum("n_total").over(w).cast("double")
                    / F.count(F.lit(1)).over(w)
                )
                / F.col("n_total"),
            )
            * _HASH_SPACE
        )
        .cast("long")
        .alias("keep_thresh"),
    )
    key = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("mix1:"), F.col("doc_id").cast("string"))), 1, 6
        ),
        16,
        10,
    ).cast("long")
    keep = key < F.col("keep_thresh")
    return (
        docs.join(F.broadcast(rates), "lang")
        .groupBy("lang", "n_total", "keep_thresh")
        .agg(
            F.sum(F.when(keep, 1).otherwise(0)).alias("n_sampled"),
            F.sum(F.when(keep, F.col("doc_id")).otherwise(0)).alias(
                "sampled_id_sum"
            ),
        )
    )


# -- Train/val/test split with leakage audit --------------------------------
# Deterministic 90/5/5 split by hashed doc_id (8-bit prefix: train < 230,
# val < 243, test otherwise), plus the audit a real pipeline runs before
# training: no canonical fingerprint (md5 of the normalized token stream,
# same key as text_fingerprint) may appear in two splits — near-identical
# documents landing across the train/test boundary is test-set leakage.
# 100 TB: split assignment is scan-bound; the audit is one fingerprint
# shuffle (the same cost class as exact dedup); the 1-row audit result
# joins back by broadcast.

_SPLIT_ORACLE = f"""
WITH base AS (
    SELECT doc_id, n_chars,
           CASE WHEN CAST('0x' || substr(md5('split1:' ||
                    CAST(doc_id AS VARCHAR)), 1, 2) AS BIGINT) < 230
                THEN 'train'
                WHEN CAST('0x' || substr(md5('split1:' ||
                    CAST(doc_id AS VARCHAR)), 1, 2) AS BIGINT) < 243
                THEN 'val'
                ELSE 'test' END AS split,
           md5(array_to_string({textnorm.tokens_duck("text")}, ' ')) AS fp
    FROM documents
), leak AS (
    SELECT CAST(SUM(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_leaked_fp
    FROM (SELECT fp, COUNT(DISTINCT split) AS ns FROM base GROUP BY fp)
)
SELECT split, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
       leak.n_leaked_fp
FROM base, leak
GROUP BY split, leak.n_leaked_fp
"""


@query(
    "corpus_train_split",
    tags=("assembly", "split", "documents", "extension"),
    oracle=_SPLIT_ORACLE,
)
def corpus_train_split(spark, sf_dir):
    """Deterministic train/val/test split (hash-ranged 90/5/5) with
    per-split stats and a fingerprint-level leakage audit."""
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    k8 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("split1:"), F.col("doc_id").cast("string"))),
            1,
            2,
        ),
        16,
        10,
    ).cast("long")
    base = docs.select(
        "doc_id",
        "n_chars",
        F.when(k8 < 230, "train").when(k8 < 243, "val").otherwise("test").alias(
            "split"
        ),
        F.md5(
            F.expr(f"array_join({textnorm.tokens_spark('text')}, ' ')")
        ).alias("fp"),
    )
    leak = (
        base.groupBy("fp")
        .agg(F.countDistinct("split").alias("ns"))
        .agg(
            F.sum(F.when(F.col("ns") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_leaked_fp")
        )
    )
    per_split = base.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum("doc_id").alias("id_checksum"),
    )
    # 1-row audit frame: aggregated => broadcast-hintable; plans as a
    # BroadcastNestedLoopJoin, never a CartesianProduct.
    return per_split.crossJoin(F.broadcast(leak))


# -- Sequence packing --------------------------------------------------------
# Pack documents into fixed token-budget training sequences (budget 512)
# by cumulative fill: within each (source, shard) stream, ordered by
# doc_id, a document joins the sequence its cumulative token count ends
# in. Packing is SHARD-LOCAL by design — training sequences need
# determinism, not global order, so the window partitions are
# (source, doc_id % 8) streams whose count scales with the shard
# constant, never a single global sort. 100 TB: one shuffle into
# |sources| × |shards| streams (raise the shard modulus with cluster
# size to bound per-stream volume); everything else is scan-bound
# projection + one aggregate.

_PACK_BUDGET = 512

_PACK_ORACLE = f"""
WITH t AS (
    SELECT source, doc_id % 8 AS shard, doc_id,
           len({textnorm.tokens_duck("text")}) AS n_tok
    FROM documents
), c AS (
    SELECT source, shard, doc_id, n_tok,
           SUM(n_tok) OVER (PARTITION BY source, shard ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
    FROM t
)
SELECT source, shard,
       CAST(floor((greatest(cum, 1) - 1) / CAST({_PACK_BUDGET} AS DOUBLE))
            AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc,
       ROUND(CAST(SUM(n_tok) AS DOUBLE) / {_PACK_BUDGET}, 6) AS fill_frac
FROM c
GROUP BY source, shard, seq_id
"""


@query(
    "corpus_pack_sequences",
    tags=("assembly", "packing", "documents", "extension"),
    oracle=_PACK_ORACLE,
)
def corpus_pack_sequences(spark, sf_dir):
    """Shard-local sequence packing: cumulative token fill over
    (source, doc_id % 8) streams, budget 512 tokens per sequence;
    one row per packed sequence with fill statistics."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    t = docs.select(
        "source",
        (F.col("doc_id") % 8).alias("shard"),
        "doc_id",
        F.size(F.expr(textnorm.tokens_spark("text"))).alias("n_tok"),
    )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("n_tok").over(w))
    seq_id = F.floor(
        (F.greatest(F.col("cum"), F.lit(1)) - 1)
        / F.lit(_PACK_BUDGET).cast("double")
    ).cast("long")
    return (
        c.withColumn("seq_id", seq_id)
        .groupBy("source", "shard", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
            F.round(
                F.sum("n_tok").cast("double") / _PACK_BUDGET, 6
            ).alias("fill_frac"),
        )
    )


# -- Weighted sampling (Efraimidis–Spirakis A-ES) ----------------------------
# Distributed weighted sampling without replacement: key = u^(1/w) with a
# DETERMINISTIC per-doc uniform u from the 24-bit md5 space, take the
# top-k keys per stratum. One projection + one per-stratum top-k window —
# at 100 TB this is the one-pass weighted reservoir over any corpus
# (the A-ES key makes "sample ∝ weight without replacement" a plain
# top-k, which distributes trivially). Engine-exactness: u and 1/w are
# exact IEEE of identical operands; pow() can differ in the last ulp
# between libms, so the ranking key is rounded to 12 decimals first
# (ties, including rounding-created ones, break by doc_id in both
# engines).
_WEIGHTED_K = 20

_WEIGHTED_SAMPLE_ORACLE = f"""
WITH keyed AS (
    SELECT lang, doc_id, n_chars,
           ROUND(POWER(({_key24_duck("wsamp:")} + 0.5) / {_HASH_SPACE},
                       1.0 / n_chars), 12) AS skey
    FROM documents
    WHERE n_chars > 0
), ranked AS (
    SELECT lang, doc_id, n_chars, skey,
           ROW_NUMBER() OVER (PARTITION BY lang
                              ORDER BY skey DESC, doc_id) AS rnk
    FROM keyed
)
SELECT lang, doc_id, n_chars, ROUND(skey, 6) AS score, rnk
FROM ranked WHERE rnk <= {_WEIGHTED_K}
"""


@query(
    "sample_weighted_reservoir",
    tags=("sample", "weighted", "documents", "extension"),
    oracle=_WEIGHTED_SAMPLE_ORACLE,
)
def sample_weighted_reservoir(spark, sf_dir):
    """Weighted sampling without replacement (A-ES): per-language top-k
    of u^(1/weight) with weight = document length — longer documents
    proportionally likelier, deterministic under the hashed uniform."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("wsamp:"), F.col("doc_id").cast("string"))),
                1,
                6,
            ),
            16,
            10,
        ).cast("long")
        + F.lit(0.5)
    ) / F.lit(float(_HASH_SPACE))
    keyed = docs.select(
        "lang",
        "doc_id",
        "n_chars",
        F.round(F.pow(u, F.lit(1.0) / F.col("n_chars")), 12).alias("skey"),
    )
    w = Window.partitionBy("lang").orderBy(F.desc("skey"), F.asc("doc_id"))
    return (
        keyed.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _WEIGHTED_K)
        .select(
            "lang",
            "doc_id",
            "n_chars",
            F.round("skey", 6).alias("score"),
            "rnk",
        )
    )
