"""Similarity-search queries over `embeddings` (north-star extension).

Brute-force cosine top-k is the exact baseline; the LSH-bucketed variant
is the sub-linear scale path. Both oracles compute cosine in DuckDB over
DOUBLE[] lists so the arithmetic matches Spark's double-precision
zip_with/aggregate fold.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lhbench_spark.catalog import table
from lhbench_spark.operators import similarity
from lhbench_spark.operators.similarity import LSH_PLANES, lsh_bucket_duck
from lhbench_spark.queries.registry import query

_DIM = 64
_TOPK = 5
_NQUERIES = 20

# No memoization: every invocation recomputes the codebook from the
# parquet inputs. (A per-sf_dir memo previously let bench iterations 2-3
# skip the centroid collect — a cross-run result cache the r10
# optimization rules prohibit; a real deployment trains the codebook
# offline, but the BENCHED number must include what the query computes.)


def _ivf_cents(spark, sf_dir):
    return similarity.ivf_centroids(table(spark, sf_dir, "embeddings"))

_BRUTE_ORACLE = f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
    FROM embeddings WHERE vec_id < {_NQUERIES}
), c AS (
    SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings
), scored AS (
    SELECT query_id, neighbor_id, ROUND(list_cosine_similarity(qv, cv), 9) AS cos
    FROM q CROSS JOIN c WHERE neighbor_id <> query_id
), ranked AS (
    SELECT query_id, neighbor_id, cos,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id) AS rnk
    FROM scored
)
SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, rnk
FROM ranked WHERE rnk <= {_TOPK}
"""


@query("sim_bruteforce_topk", tags=("similarity", "embedding"), oracle=_BRUTE_ORACLE)
def sim_bruteforce_topk(spark, sf_dir):
    """Exact cosine top-k: broadcast the query set, score the corpus in
    place (no corpus shuffle), window-rank per query. At 100 TB this is
    one pass over the corpus per query batch — the exact-recall baseline
    every ANN variant is measured against."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(emb.vec_id < _NQUERIES)
    return similarity.brute_force_topk(emb, queries, k=_TOPK)


_ANN_ORACLE = f"""
WITH v AS (
    SELECT vec_id, embedding::DOUBLE[] AS ev,
           {lsh_bucket_duck("embedding::DOUBLE[]", _DIM, LSH_PLANES)} AS bucket
    FROM embeddings
), q AS (
    SELECT vec_id AS query_id, ev AS qv, bucket FROM v WHERE vec_id < {_NQUERIES}
), scored AS (
    SELECT query_id, v.vec_id AS neighbor_id,
           ROUND(list_cosine_similarity(qv, v.ev), 9) AS cos
    FROM q JOIN v ON q.bucket = v.bucket AND v.vec_id <> q.query_id
), ranked AS (
    SELECT query_id, neighbor_id, cos,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id) AS rnk
    FROM scored
)
SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, rnk
FROM ranked WHERE rnk <= {_TOPK}
"""


@query("sim_ann_lsh_topk", tags=("similarity", "embedding", "ann"), oracle=_ANN_ORACLE)
def sim_ann_lsh_topk(spark, sf_dir):
    """ANN top-k via random-hyperplane LSH buckets + exact re-rank inside
    the bucket. Candidates ≈ corpus/2^planes per query — the sub-linear
    path when the corpus no longer admits a full scan per query batch."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(emb.vec_id < _NQUERIES)
    return similarity.ann_topk(emb, queries, dim=_DIM, k=_TOPK)


_IVF_ORACLE = f"""
WITH v AS (
    SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
), cents AS (
    SELECT vec_id AS cid, ev AS ce FROM v WHERE vec_id % 125 = 0
), assign AS (
    SELECT vec_id, ev, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY list_distance(ev, ce), cid) AS crnk
    FROM v CROSS JOIN cents
), cells AS (
    SELECT vec_id, ev, cid AS cell FROM assign WHERE crnk = 1
), probes AS (
    SELECT vec_id AS query_id, ev AS qv, cid AS cell
    FROM assign WHERE vec_id < {_NQUERIES} AND crnk <= 2
), scored AS (
    SELECT query_id, c.vec_id AS neighbor_id,
           ROUND(list_cosine_similarity(qv, c.ev), 9) AS cos
    FROM probes p JOIN cells c ON p.cell = c.cell AND c.vec_id <> p.query_id
), ranked AS (
    SELECT query_id, neighbor_id, cos,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id) AS rnk
    FROM scored
)
SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, rnk
FROM ranked WHERE rnk <= {_TOPK}
"""


@query("ann_ivf_topk", tags=("similarity", "embedding", "ann", "ivf"), oracle=_IVF_ORACLE)
def ann_ivf_topk(spark, sf_dir):
    """IVF-style ANN: coarse cells + multi-probe + exact re-rank — the
    trained-quantizer scale path next to the LSH tier (at 100 TB the
    corpus is stored partitioned by cell, so a probe reads probes/cells
    of the data)."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(emb.vec_id < _NQUERIES)
    return similarity.ivf_topk(
        emb, queries, dim=_DIM, k=_TOPK, probes=2, cents=_ivf_cents(spark, sf_dir)
    )


@query(
    "ann_ivf_partitioned",
    tags=("similarity", "embedding", "ann", "ivf", "partition-pruning"),
    oracle=_IVF_ORACLE,
)
def ann_ivf_partitioned(spark, sf_dir):
    """The IVF STORAGE path: ingest writes the corpus Hive-partitioned by
    cell (ivf_write_partitioned), and a probe collects its cell ids —
    the metadata-sized index lookup — then scans only those partition
    directories (static partition pruning, plan-asserted) before the
    exact rerank. Byte-identical results to ann_ivf_topk (same oracle);
    the difference is scan cost: probes/num_cells of the corpus instead
    of all of it — the read-path contract that makes IVF an index rather
    than a filter at 100 TB."""
    import tempfile

    emb = table(spark, sf_dir, "embeddings")
    cents = _ivf_cents(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="lhbench_ivf_") + "/by_cell"
    similarity.ivf_write_partitioned(emb, cents, out)
    queries = emb.filter(emb.vec_id < _NQUERIES)
    return similarity.ivf_partitioned_topk(
        spark, out, queries, k=_TOPK, probes=2, cents=cents
    )


@query(
    "ann_ivf_incremental",
    tags=("similarity", "embedding", "ann", "ivf", "incremental"),
    oracle=_IVF_ORACLE,
)
def ann_ivf_incremental(spark, sf_dir):
    """IVF index MAINTENANCE: build the cell-partitioned store from the
    initial corpus only, then append a later-arriving batch via
    ivf_append_partitioned — assignment against the EXISTING codebook,
    O(batch) job input, no retrain, no corpus re-read (the incremental
    sibling of dedup_incremental_store's signature-store probe). The
    probe then runs over the grown store; results — and the oracle —
    are identical to a from-scratch build over the full corpus, which
    is exactly the maintenance contract: growth must not change what
    queries see."""
    import tempfile

    emb = table(spark, sf_dir, "embeddings")
    cents = _ivf_cents(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="lhbench_ivfinc_") + "/by_cell"
    base = emb.filter((emb.vec_id % 17) != 3)
    batch = emb.filter((emb.vec_id % 17) == 3)
    similarity.ivf_write_partitioned(base, cents, out)
    similarity.ivf_append_partitioned(batch, cents, out)
    queries = emb.filter(emb.vec_id < _NQUERIES)
    return similarity.ivf_partitioned_topk(
        spark, out, queries, k=_TOPK, probes=2, cents=cents
    )


_QUANT_ORACLE = """
WITH v AS (
    SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
), n AS (
    SELECT vec_id,
           sqrt(list_aggregate(list_transform(ev, x -> x * x), 'sum')) AS nrm,
           ev
    FROM v
), nv AS (
    SELECT vec_id, nrm,
           CASE WHEN nrm = 0.0 THEN ev
                ELSE list_transform(ev, x -> x / nrm) END AS uv
    FROM n
), q AS (
    SELECT vec_id, nrm, uv,
           list_aggregate(list_transform(uv, x -> abs(x)), 'max') AS mx
    FROM nv
), qv AS (
    SELECT vec_id, nrm,
           CASE WHEN mx = 0.0 THEN list_transform(uv, x -> CAST(0 AS INT))
                ELSE list_transform(uv, x -> CAST(round(x * 127.0 / mx) AS INT))
           END AS iq
    FROM q
)
SELECT vec_id,
       ROUND(nrm, 6) AS l2_norm,
       CAST(list_aggregate(iq, 'sum') AS BIGINT) AS q_sum,
       CAST(list_aggregate(iq, 'max') AS INT) AS q_max
FROM qv
"""


@query(
    "ann_embedding_quantize",
    tags=("similarity", "embedding", "quantize"),
    oracle=_QUANT_ORACLE,
)
def ann_embedding_quantize(spark, sf_dir):
    """Embedding maintenance: L2-normalize then symmetric int8 quantize
    (operators/similarity.py) — the compression pass before ANN indexing
    (4x smaller than float32). Pure higher-order-function projection:
    JVM-side, no shuffle, scan-bandwidth bound. Output: per-vector norm
    and quantized fingerprint, value-checked against DuckDB's list ops."""
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", similarity.as_double("embedding").alias("_v")
    )
    unit = emb.select(
        "vec_id",
        similarity.norm("_v").alias("_nrm"),
        similarity.l2_normalize("_v").alias("_uv"),
    )
    q = unit.select(
        "vec_id",
        "_nrm",
        similarity.quantize_int8("_uv").alias("_iq"),
    )
    return q.select(
        "vec_id",
        F.round("_nrm", 6).alias("l2_norm"),
        F.expr("aggregate(_iq, 0L, (acc, v) -> acc + v)").alias("q_sum"),
        F.array_max("_iq").alias("q_max"),
    )


# -- Per-label centroids (exact integer space) -----------------------------
# Class centroids over the int8-quantized unit vectors: quantization makes
# the per-dimension sums exact integers, so the cross-engine compare is
# bit-exact with no float-summation-order hazard. Plan shape: posexplode
# to (label, dim, q) then hash-agg — map-side partial agg collapses each
# partition to |labels| x dim rows BEFORE the shuffle, so shuffle volume
# is partitions x labels x dim regardless of corpus size.
_CENTROID_ORACLE = """
WITH v AS (
    SELECT label, embedding::DOUBLE[] AS ev FROM embeddings
), n AS (
    SELECT label, sqrt(list_aggregate(list_transform(ev, x -> x * x), 'sum')) AS nrm, ev
    FROM v
), nv AS (
    SELECT label,
           CASE WHEN nrm = 0.0 THEN ev ELSE list_transform(ev, x -> x / nrm) END AS uv
    FROM n
), q AS (
    SELECT label, uv, list_aggregate(list_transform(uv, x -> abs(x)), 'max') AS mx
    FROM nv
), qv AS (
    SELECT label,
           CASE WHEN mx = 0.0 THEN list_transform(uv, x -> CAST(0 AS INT))
                ELSE list_transform(uv, x -> CAST(round(x * 127.0 / mx) AS INT))
           END AS iq
    FROM q
), e AS (
    SELECT label, iq, unnest(generate_series(1, len(iq))) AS dim FROM qv
)
SELECT label, CAST(dim AS INT) AS dim,
       COUNT(*) AS n_vecs,
       CAST(SUM(iq[dim]) AS BIGINT) AS q_sum,
       ROUND(CAST(SUM(iq[dim]) AS DOUBLE) / COUNT(*), 6) AS centroid_q
FROM e
GROUP BY label, dim
"""


@query(
    "ann_label_centroids",
    tags=("similarity", "embedding", "centroid", "extension"),
    oracle=_CENTROID_ORACLE,
)
def ann_label_centroids(spark, sf_dir):
    """Per-label centroid of int8-quantized unit embeddings, long format
    (label, dim) — the k-means update step / class-prototype computation
    done with exact integer aggregation."""
    from lhbench_spark.operators import fan_out

    emb = fan_out(table(spark, sf_dir, "embeddings")).select(
        "label", similarity.as_double("embedding").alias("_v")
    )
    unit = emb.select("label", similarity.l2_normalize("_v").alias("_uv"))
    # The exchange below is a projection-collapse barrier as well as a
    # rebalance: without it Catalyst inlines the whole normalize+quantize
    # lambda chain INTO the generator and re-evaluates it once per output
    # dimension (O(dim^2) lambda work per vector).
    q = unit.select("label", similarity.quantize_int8("_uv").alias("_iq")).repartition(
        spark.sparkContext.defaultParallelism
    )
    ex = q.select("label", F.posexplode("_iq").alias("pos", "q"))
    return (
        ex.groupBy("label", (F.col("pos") + 1).cast("int").alias("dim"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("q").alias("q_sum"),
            F.round(F.sum("q").cast("double") / F.count(F.lit(1)), 6).alias("centroid_q"),
        )
    )

_RECALL_ORACLE = f"""
WITH exact AS (
    SELECT query_id, neighbor_id FROM ({_BRUTE_ORACLE})
), lsh AS (
    SELECT query_id, neighbor_id FROM ({_ANN_ORACLE})
), ivf AS (
    SELECT query_id, neighbor_id FROM ({_IVF_ORACLE})
), per_q AS (
    SELECT e.query_id,
           COUNT(l.neighbor_id) AS lsh_hits,
           COUNT(i.neighbor_id) AS ivf_hits
    FROM exact e
    LEFT JOIN lsh l
      ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id
    LEFT JOIN ivf i
      ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
       CAST(SUM(ivf_hits) AS BIGINT) AS ivf_hits,
       CAST(SUM(lsh_hits) AS BIGINT) AS lsh_hits,
       ROUND(SUM(ivf_hits) / (COUNT(*) * {_TOPK}.0), 6) AS ivf_recall,
       ROUND(SUM(lsh_hits) / (COUNT(*) * {_TOPK}.0), 6) AS lsh_recall
FROM per_q
"""


@query(
    "ann_recall",
    tags=("similarity", "embedding", "ann", "recall"),
    oracle=_RECALL_ORACLE,
)
def ann_recall(spark, sf_dir):
    """Measured ANN quality: recall@k of the IVF and LSH tiers against
    the exact brute-force top-k — the measurement that picks the tier for
    a given corpus. On this corpus (true neighbors at cosine ≈ 0.35, i.e.
    nearly random directions) IVF multi-probe reaches ~0.8 recall while
    single-probe hyperplane LSH collapses toward 0 — which is exactly why
    the choice must be measured, not assumed. Integer hit counts
    aggregate exactly; one final division each."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(emb.vec_id < _NQUERIES)
    exact = similarity.brute_force_topk(emb, queries, k=_TOPK).select(
        "query_id", "neighbor_id"
    )
    lsh = similarity.ann_topk(emb, queries, dim=_DIM, k=_TOPK).select(
        F.col("query_id").alias("l_qid"), F.col("neighbor_id").alias("l_nid")
    )
    ivf = similarity.ivf_topk(
        emb, queries, dim=_DIM, k=_TOPK, probes=2, cents=_ivf_cents(spark, sf_dir)
    ).select(
        F.col("query_id").alias("i_qid"), F.col("neighbor_id").alias("i_nid")
    )
    per_q = (
        exact.join(
            lsh,
            (F.col("query_id") == F.col("l_qid"))
            & (F.col("neighbor_id") == F.col("l_nid")),
            "left",
        )
        .join(
            ivf,
            (F.col("query_id") == F.col("i_qid"))
            & (F.col("neighbor_id") == F.col("i_nid")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("l_nid").alias("lsh_hits"),
            F.count("i_nid").alias("ivf_hits"),
        )
    )
    denom = F.count(F.lit(1)) * float(_TOPK)
    return per_q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.sum("ivf_hits").cast("bigint").alias("ivf_hits"),
        F.sum("lsh_hits").cast("bigint").alias("lsh_hits"),
        F.round(F.sum("ivf_hits") / denom, 6).alias("ivf_recall"),
        F.round(F.sum("lsh_hits") / denom, 6).alias("lsh_recall"),
    )


@query(
    "sim_kmeans_recall",
    tags=("similarity", "embedding", "ann", "kmeans", "no-oracle"),
)
def sim_kmeans_recall(spark, sf_dir):
    """Measured payoff of codebook training (rows-only by nature: Lloyd
    means are float sums whose order is engine-scheduled, so no bitwise
    SQL oracle exists; the refinement math itself is verified against
    numpy in tests/test_similarity_ops.py): IVF recall@k with the raw
    stride codebook vs the same codebook after 2 Lloyd iterations
    (operators.similarity.kmeans_refine), against exact brute-force
    ground truth. Same bounded shapes as ann_recall — broadcast query
    side, inline-argmin assignment, integer hit counts."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(emb.vec_id < _NQUERIES)
    base_cents = _ivf_cents(spark, sf_dir)
    # one Lloyd pass: on this corpus the first pass captures essentially
    # all of the centroid shift (measured: iters=2 changes recall by
    # ≤0.01 vs iters=1 at both bench SFs) and each extra pass is a full
    # corpus aggregation per suite iteration
    refined = similarity.kmeans_refine(emb, base_cents, iters=1)
    exact = similarity.brute_force_topk(emb, queries, k=_TOPK).select(
        "query_id", "neighbor_id"
    )
    # probes=1 for BOTH tiers: the comparison isolates the CODEBOOK
    # effect (only the centroids differ), and single-probe halves the two
    # extra IVF pipelines this query pays per suite iteration
    base = similarity.ivf_topk(
        emb, queries, dim=_DIM, k=_TOPK, probes=1, cents=base_cents
    ).select(F.col("query_id").alias("b_qid"), F.col("neighbor_id").alias("b_nid"))
    ref = similarity.ivf_topk(
        emb, queries, dim=_DIM, k=_TOPK, probes=1, cents=refined
    ).select(F.col("query_id").alias("r_qid"), F.col("neighbor_id").alias("r_nid"))
    per_q = (
        exact.join(
            base,
            (F.col("query_id") == F.col("b_qid"))
            & (F.col("neighbor_id") == F.col("b_nid")),
            "left",
        )
        .join(
            ref,
            (F.col("query_id") == F.col("r_qid"))
            & (F.col("neighbor_id") == F.col("r_nid")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("b_nid").alias("base_hits"),
            F.count("r_nid").alias("refined_hits"),
        )
    )
    denom = F.count(F.lit(1)) * float(_TOPK)
    return per_q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.sum("base_hits").cast("bigint").alias("base_hits"),
        F.sum("refined_hits").cast("bigint").alias("refined_hits"),
        F.round(F.sum("base_hits") / denom, 6).alias("base_recall"),
        F.round(F.sum("refined_hits") / denom, 6).alias("refined_recall"),
    )


# --- Product quantization (PQ) tier ---------------------------------------

_PQ_RERANK = 50


def _pq_cb(spark, sf_dir):
    # Recomputed per invocation — same no-memo rule as _ivf_cents above.
    return similarity.pq_codebook(table(spark, sf_dir, "embeddings"))


def _pq_sq_duck(a: str, b: str, sub: int) -> str:
    # Same sequential left fold as operators.similarity._pq_sq.
    return (
        f"list_reduce(list_transform(range(1, {sub + 1}), i -> "
        f"({a}[i]-{b}[i])*({a}[i]-{b}[i])), (acc,x) -> acc + x)"
    )


def _pq_oracle() -> str:
    subs, k_codes, stride = (
        similarity.PQ_SUBS, similarity.PQ_CODES, similarity.PQ_STRIDE,
    )
    sub = _DIM // subs
    sub_v = f"(ev[((m-1)*{sub}+1):(m*{sub})])"
    sub_c = f"(cl[j][((m-1)*{sub}+1):(m*{sub})])"
    sub_q = f"(qv[((m-1)*{sub}+1):(m*{sub})])"
    sub_code = f"(cl[codes[m]][((m-1)*{sub}+1):(m*{sub})])"
    return f"""
WITH v AS (
    SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
), samp AS (
    SELECT vec_id AS cid, ev FROM v WHERE vec_id % {stride} = 0
    ORDER BY vec_id LIMIT {k_codes}
), cb AS (
    SELECT list(ev ORDER BY cid) AS cl FROM samp
), enc_raw AS (
    SELECT vec_id, m, j, {_pq_sq_duck(sub_v, sub_c, sub)} AS d
    FROM v CROSS JOIN cb
    CROSS JOIN (SELECT unnest(range(1, {subs + 1})) AS m)
    CROSS JOIN (SELECT unnest(range(1, {k_codes + 1})) AS j)
), codes1 AS (
    SELECT vec_id, m, j AS code FROM (
        SELECT vec_id, m, j,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, j) AS rn
        FROM enc_raw) t WHERE rn = 1
), cvec AS (
    SELECT vec_id, list(code ORDER BY m) AS codes FROM codes1 GROUP BY vec_id
), q AS (
    SELECT vec_id AS query_id, ev AS qv FROM v WHERE vec_id < {_NQUERIES}
), adc AS (
    SELECT query_id, c.vec_id AS neighbor_id,
           list_reduce(list_transform(range(1, {subs + 1}), m ->
               {_pq_sq_duck(sub_q, sub_code, sub)}), (acc,x) -> acc + x) AS ad
    FROM q CROSS JOIN cvec c CROSS JOIN cb
    WHERE c.vec_id <> query_id
), adcr AS (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY ad, neighbor_id) AS arnk
    FROM adc
), exact AS (
    SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, v.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                   ORDER BY ROUND(list_cosine_similarity(q.qv, v.ev), 9) DESC,
                            v.vec_id) AS rnk
        FROM q CROSS JOIN v WHERE v.vec_id <> q.query_id) t
    WHERE rnk <= {_TOPK}
), rerank AS (
    SELECT query_id, neighbor_id FROM (
        SELECT a.query_id, a.neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY a.query_id
                   ORDER BY ROUND(list_cosine_similarity(q.qv, v.ev), 9) DESC,
                            a.neighbor_id) AS rnk
        FROM adcr a JOIN q ON q.query_id = a.query_id
        JOIN v ON v.vec_id = a.neighbor_id
        WHERE a.arnk <= {_PQ_RERANK}) t
    WHERE rnk <= {_TOPK}
), adck AS (
    SELECT query_id, neighbor_id FROM adcr WHERE arnk <= {_TOPK}
)
SELECT (SELECT COUNT(DISTINCT query_id) FROM q)::BIGINT AS n_queries,
       (SELECT COUNT(*) FROM adck JOIN exact USING (query_id, neighbor_id))::BIGINT AS adc_hits,
       (SELECT COUNT(*) FROM rerank JOIN exact USING (query_id, neighbor_id))::BIGINT AS rerank_hits,
       ROUND((SELECT COUNT(*) FROM adck JOIN exact USING (query_id, neighbor_id))
             / ((SELECT COUNT(DISTINCT query_id) FROM q) * {_TOPK}.0), 6) AS adc_recall,
       ROUND((SELECT COUNT(*) FROM rerank JOIN exact USING (query_id, neighbor_id))
             / ((SELECT COUNT(DISTINCT query_id) FROM q) * {_TOPK}.0), 6) AS rerank_recall
"""


@query(
    "ann_pq_recall",
    tags=("similarity", "embedding", "ann", "pq", "recall"),
    oracle=_pq_oracle(),
)
def ann_pq_recall(spark, sf_dir):
    """Measured quality of the product-quantization tier: recall@k of raw
    ADC top-k (codes only — what a codes-resident scan returns) and of
    ADC top-50 + exact re-rank, against brute-force ground truth. PQ here
    stores 8 codes per 64-dim vector (32× smaller than float32) — at
    100 TB the codes table is what fits in scan bandwidth, and re-rank
    touches raw vectors for only ``rerank`` ids per query. The expected
    shape on this corpus: raw ADC recall is poor (quantization noise ≈
    the tiny cosine spread of near-random vectors) and re-rank recovers
    most of it — the measurement that sizes the rerank budget."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(emb.vec_id < _NQUERIES)
    cb = _pq_cb(spark, sf_dir)
    # Candidate list feeds BOTH tiers (raw-ADC top-k and the re-rank);
    # materialize once instead of re-running the ADC scan per branch.
    cand = similarity.pq_adc_candidates(
        emb, queries, cb, rerank=_PQ_RERANK
    ).localCheckpoint(eager=False)
    exact = similarity.brute_force_topk(emb, queries, k=_TOPK).select(
        "query_id", "neighbor_id"
    )
    adck = cand.filter(F.col("arnk") <= _TOPK).select(
        F.col("query_id").alias("a_qid"), F.col("neighbor_id").alias("a_nid")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), similarity.as_double("embedding").alias("_cv")
    ).withColumn("_cn", similarity.norm("_cv"))
    qv = queries.select(
        F.col("vec_id").alias("query_id"), similarity.as_double("embedding").alias("_qv")
    ).withColumn("_qn", similarity.norm("_qv"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("_cos"), F.asc("neighbor_id")
    )
    rr = (
        cand.join(c, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            similarity.cosine_prenormed("_qv", "_cv", "_qn", "_cn").alias("_cos"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOPK)
        .select(F.col("query_id").alias("r_qid"), F.col("neighbor_id").alias("r_nid"))
    )
    per_q = (
        exact.join(
            adck,
            (F.col("query_id") == F.col("a_qid"))
            & (F.col("neighbor_id") == F.col("a_nid")),
            "left",
        )
        .join(
            rr,
            (F.col("query_id") == F.col("r_qid"))
            & (F.col("neighbor_id") == F.col("r_nid")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("a_nid").alias("adc_hits"),
            F.count("r_nid").alias("rerank_hits"),
        )
    )
    denom = F.count(F.lit(1)) * float(_TOPK)
    return per_q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.sum("adc_hits").cast("bigint").alias("adc_hits"),
        F.sum("rerank_hits").cast("bigint").alias("rerank_hits"),
        F.round(F.sum("adc_hits") / denom, 6).alias("adc_recall"),
        F.round(F.sum("rerank_hits") / denom, 6).alias("rerank_recall"),
    )


# kNN label classification over the ANN tier — the standard intrinsic
# eval of an embedding space ("do nearest neighbors share labels?") and
# the label-propagation primitive for weakly-supervised corpus labeling.
# Corpus = labeled vectors (80%), queries = the held-out 20%; prediction
# = majority label among the LSH top-5 (ties break to the smaller
# label), scored against the held-out truth per class. The neighbor
# label join is UNREDUCED corpus-sized — no hint, AQE owns it.
_KNN_ORACLE = f"""
WITH v AS (
    SELECT vec_id, label, embedding::DOUBLE[] AS ev,
           {{bucket}} AS bucket
    FROM embeddings
), c AS (
    SELECT vec_id AS neighbor_id, label AS nl, ev, bucket
    FROM v WHERE vec_id % 5 != 0
), q AS (
    SELECT vec_id AS query_id, label AS true_label, ev AS qv, bucket
    FROM v WHERE vec_id % 5 = 0
), scored AS (
    SELECT query_id, neighbor_id, nl, true_label,
           ROUND(list_cosine_similarity(qv, c.ev), 9) AS cos
    FROM q JOIN c USING (bucket)
), topk AS (
    SELECT * FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) <= 5
), votes AS (
    SELECT query_id, true_label, nl, COUNT(*) AS cnt
    FROM topk GROUP BY 1, 2, 3
), pred AS (
    SELECT query_id, true_label, nl AS pred_label FROM votes
    QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cnt DESC, nl ASC) = 1
)
SELECT true_label,
       COUNT(*) AS n_queries,
       CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct,
       ROUND(CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS accuracy
FROM pred
GROUP BY true_label
"""


@query(
    "ann_knn_classify",
    tags=("similarity", "embedding", "knn", "classification", "extension"),
    oracle=_KNN_ORACLE.format(
        bucket=similarity.lsh_bucket_duck("embedding::DOUBLE[]", _DIM, similarity.LSH_PLANES)
    ),
)
def ann_knn_classify(spark, sf_dir):
    """kNN majority-vote classification of a held-out 20% against the
    labeled 80%, over the LSH ANN tier; per-class accuracy census."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    emb = table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    queries = emb.filter(F.col("vec_id") % 5 == 0)
    nn = similarity.ann_topk(corpus, queries, dim=_DIM, k=5)
    labels = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nl")
    )
    votes = (
        nn.join(labels, "neighbor_id")
        .groupBy("query_id", "nl")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cnt"), F.asc("nl"))
    pred = (
        votes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("query_id", F.col("nl").alias("pred_label"))
    )
    truth = queries.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    correct = F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
    return (
        pred.join(truth, "query_id")
        .groupBy("true_label")
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.sum(correct).cast("bigint").alias("n_correct"),
            F.round(
                F.sum(correct).cast("double") / F.count(F.lit(1)), 6
            ).alias("accuracy"),
        )
    )
