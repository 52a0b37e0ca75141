"""Deduplication queries over `documents` (north-star extension surface).

Each query wraps an operator from lhbench_spark.operators.dedup and pairs
it with a DuckDB oracle generated from the SAME constants
(operators/hashing.py, operators/textnorm.py) — one source of truth for
hash parameters across both engines.

The bucket-size cap in the Spark operators (MAX_BUCKET) is modeled in
every pairing oracle via QUALIFY, so Spark and oracle stay equivalent at
ANY scale factor — including ones where degenerate buckets get dropped.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lhbench_spark.catalog import table
from lhbench_spark.operators import dedup, hashing, textnorm
from lhbench_spark.queries.registry import query

_NORM = textnorm.norm_duck("text")


@query(
    "dedup_exact",
    tags=("dedup", "documents"),
    oracle=f"""
SELECT md5(t) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS dup_cnt
FROM (SELECT doc_id, {_NORM} AS t FROM documents) n
GROUP BY 1
""",
)
def dedup_exact(spark, sf_dir):
    """Exact dedup via hash-groupBy on normalized text. Grouping on the
    md5 digest (not the raw string) keeps shuffle rows narrow at 100 TB."""
    docs = table(spark, sf_dir, "documents")
    return dedup.exact_dedup_keepers(docs).select(
        F.col("_fp").alias("fp"), "keep_id", "dup_cnt"
    )


_WORD_SHINGLES = textnorm.word_shingles_duck("text")

_MINHASH_PAIRS_CTE = f"""
WITH sh AS (
    SELECT doc_id, {_WORD_SHINGLES} AS shingles FROM documents
), hs AS (
    SELECT doc_id, {hashing.shingle_hashes_duck('shingles')} AS hashes FROM sh
), hset AS (
    SELECT doc_id, list_distinct(hashes) AS hset FROM hs
), sig AS (
    SELECT doc_id, {hashing.minhash_sig_duck('hashes')} AS sig FROM hs
), banded_raw AS (
    SELECT doc_id, unnest({hashing.band_keys_duck('sig')}) AS bkey FROM sig
), banded AS (
    SELECT * FROM banded_raw
    QUALIFY COUNT(*) OVER (PARTITION BY bkey) <= {dedup.MAX_BUCKET}
), cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a JOIN banded b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
), verified AS (
    -- Jaccard over DISTINCT H32 shingle-hash sets (identical on both
    -- engines); |A∪B| = |A|+|B|-|A∩B| for sets
    SELECT doc_a, doc_b,
           CAST(len(list_intersect(sa.hset, sb.hset)) AS DOUBLE)
           / (len(sa.hset) + len(sb.hset)
              - len(list_intersect(sa.hset, sb.hset))) AS jac
    FROM cand
    JOIN hset sa ON sa.doc_id = doc_a
    JOIN hset sb ON sb.doc_id = doc_b
), pairs AS (
    SELECT doc_a, doc_b, ROUND(jac, 6) AS jaccard
    FROM verified WHERE jac >= 0.7
)
"""

# Benchmark-discipline note (reference parity): every reference query is
# bounded (LIMIT 100, Benchmark.scala collects the result). Pair sets grow
# with the corpus, so the registry entries return (a) an exact aggregate
# fingerprint of the full pair set and (b) a tie-broken top-100 sample —
# the operators themselves still produce the full pair DataFrames.

_MINHASH_SUMMARY_ORACLE = (
    _MINHASH_PAIRS_CTE
    + """
SELECT COUNT(*) AS pair_cnt,
       CAST(SUM(CAST(jaccard AS DECIMAL(18,8))) AS DOUBLE) AS jac_sum,
       MAX(jaccard) AS jac_max,
       CAST(COUNT(DISTINCT doc_a) AS BIGINT) AS distinct_doc_a
FROM pairs
"""
)


@query(
    "dedup_minhash_lsh",
    tags=("dedup", "minhash", "documents"),
    oracle=_MINHASH_SUMMARY_ORACLE,
)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash(k=16) + LSH(4 bands × 4 rows) near-dup pairs at Jaccard
    ≥ 0.7, exact-verified; returns the exact aggregate fingerprint of the
    full pair set (count / jaccard sum / max / distinct docs). Banding is
    tuned so the s-curve midpoint ≈ threshold: the 0.3-0.6
    template-similarity mass is pruned band-side, never verified."""
    docs = table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.7)
    return pairs.agg(
        F.count(F.lit(1)).alias("pair_cnt"),
        F.sum(F.col("jaccard").cast("decimal(18,8)")).cast("double").alias("jac_sum"),
        F.max("jaccard").alias("jac_max"),
        F.countDistinct("doc_a").cast("bigint").alias("distinct_doc_a"),
    )


_MINHASH_TOP_ORACLE = (
    _MINHASH_PAIRS_CTE
    + """
SELECT doc_a, doc_b, jaccard
FROM pairs
ORDER BY jaccard DESC, doc_a, doc_b
LIMIT 100
"""
)


@query(
    "dedup_minhash_top_pairs",
    tags=("dedup", "minhash", "documents", "topk"),
    oracle=_MINHASH_TOP_ORACLE,
)
def dedup_minhash_top_pairs(spark, sf_dir):
    """Pair-level verification sample: the tie-broken top-100 near-dup
    pairs by Jaccard (TakeOrderedAndProject — bounded at any corpus
    size, the reference's LIMIT-100 discipline)."""
    docs = table(spark, sf_dir, "documents")
    return (
        dedup.minhash_lsh_pairs(docs, threshold=0.7)
        .orderBy(F.desc("jaccard"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(100)
    )


_CORPUS_PRED = "doc_id % 5 != 0"
_BATCH_PRED = "doc_id % 5 = 0"

_INCREMENTAL_ORACLE = f"""
WITH corpus AS (
    SELECT doc_id, text FROM documents WHERE {_CORPUS_PRED}
), batch AS (
    SELECT doc_id, text FROM documents WHERE {_BATCH_PRED}
), chs AS (
    SELECT doc_id,
           {hashing.shingle_hashes_duck(textnorm.word_shingles_duck('text'))} AS hashes
    FROM corpus
), cset AS (
    SELECT doc_id, list_distinct(hashes) AS hset FROM chs
), csig AS (
    SELECT doc_id, {hashing.minhash_sig_duck('hashes')} AS sig FROM chs
), cband_raw AS (
    SELECT doc_id, unnest({hashing.band_keys_duck('sig')}) AS bkey FROM csig
), cband AS (
    -- bucket cap on STORE buckets only (mirrors minhash_store)
    SELECT * FROM cband_raw
    QUALIFY COUNT(*) OVER (PARTITION BY bkey) <= {dedup.MAX_BUCKET}
), bhs AS (
    SELECT doc_id,
           {hashing.shingle_hashes_duck(textnorm.word_shingles_duck('text'))} AS hashes
    FROM batch
), bset AS (
    SELECT doc_id, list_distinct(hashes) AS hset FROM bhs
), bsig AS (
    SELECT doc_id, {hashing.minhash_sig_duck('hashes')} AS sig FROM bhs
), bband AS (
    SELECT doc_id, unnest({hashing.band_keys_duck('sig')}) AS bkey FROM bsig
), cand AS (
    SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS match_id
    FROM bband b JOIN cband c ON b.bkey = c.bkey
), verified AS (
    SELECT batch_id, match_id,
           ROUND(CAST(len(list_intersect(sb.hset, sa.hset)) AS DOUBLE)
                 / (len(sa.hset) + len(sb.hset)
                    - len(list_intersect(sb.hset, sa.hset))), 6) AS jaccard
    FROM cand
    JOIN bset sb ON sb.doc_id = batch_id
    JOIN cset sa ON sa.doc_id = match_id
    WHERE CAST(len(list_intersect(sb.hset, sa.hset)) AS DOUBLE)
          / (len(sa.hset) + len(sb.hset)
             - len(list_intersect(sb.hset, sa.hset))) >= 0.7
), best AS (
    SELECT * FROM verified
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY batch_id ORDER BY jaccard DESC, match_id ASC) = 1
)
SELECT b.doc_id AS batch_id,
       best.match_id IS NOT NULL AS is_dup,
       best.match_id,
       best.jaccard
FROM batch b LEFT JOIN best ON b.doc_id = best.batch_id
"""


@query(
    "dedup_incremental_store",
    tags=("dedup", "minhash", "incremental", "documents"),
    oracle=_INCREMENTAL_ORACLE,
)
def dedup_incremental_store(spark, sf_dir):
    """Incremental batch-vs-store dedup — the steady-state form of corpus
    dedup at 100 TB: the corpus signature store (distinct H32 shingle
    sets + bucket-capped LSH band index, operators.dedup.minhash_store)
    is built once, and each arriving batch (here the doc_id % 5 = 0
    slice, probing the other 80%) computes only its own signatures and
    probes the store with an ids-only band join. One verdict row per
    batch doc: is it a near-dup (Jaccard ≥ 0.7) of anything ingested, and
    of what. Cost is O(batch), independent of corpus size."""
    docs = table(spark, sf_dir, "documents")
    corpus = docs.filter(F.expr(_CORPUS_PRED))
    batch = docs.filter(F.expr(_BATCH_PRED))
    return dedup.incremental_dedup_verdicts(corpus, batch, threshold=0.7)


_TOKENS_DISTINCT_DUCK = f"list_distinct({textnorm.tokens_duck('text')})"

_SIMHASH_ORACLE = f"""
WITH h AS (
    SELECT doc_id, {hashing.token_hashes_duck(_TOKENS_DISTINCT_DUCK)} AS hs
    FROM documents
)
SELECT doc_id, {hashing.simhash_from_hashes_duck('hs')} AS simhash
FROM h
"""


@query("dedup_simhash", tags=("dedup", "simhash", "documents"), oracle=_SIMHASH_ORACLE)
def dedup_simhash(spark, sf_dir):
    """60-bit SimHash fingerprints (per-bit majority over distinct token
    hashes, hashed once per token). One narrow projection — no shuffle."""
    docs = table(spark, sf_dir, "documents")
    return dedup.simhash_fingerprints(docs)


_SIMHASH_PAIRS_ORACLE = f"""
WITH h AS (
    SELECT doc_id, {hashing.token_hashes_duck(_TOKENS_DISTINCT_DUCK)} AS hs
    FROM documents
), fp AS (
    SELECT doc_id, {hashing.simhash_from_hashes_duck('hs')} AS simhash FROM h
), banded_raw AS (
    SELECT doc_id, simhash,
           unnest({hashing.simhash_band_keys_duck('simhash')}) AS bkey
    FROM fp
), banded AS (
    SELECT * FROM banded_raw
    QUALIFY COUNT(*) OVER (PARTITION BY bkey) <= {dedup.MAX_BUCKET}
), cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.simhash AS fa, b.simhash AS fb
    FROM banded a JOIN banded b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
), pairs AS (
    SELECT doc_a, doc_b, CAST(bit_count(xor(fa, fb)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(fa, fb)) <= 6
)
SELECT COUNT(*) AS pair_cnt,
       CAST(SUM(hamming) AS BIGINT) AS hamming_sum,
       CAST(COUNT(DISTINCT doc_a) AS BIGINT) AS distinct_doc_a
FROM pairs
"""


@query(
    "dedup_simhash_pairs",
    tags=("dedup", "simhash", "documents"),
    oracle=_SIMHASH_PAIRS_ORACLE,
)
def dedup_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs: 15-bit band collision over the 60-bit
    fingerprint → hamming ≤ 6 verify. Banding bounds the candidate set
    exactly like MinHash-LSH; output is the exact aggregate fingerprint
    of the pair set (bounded at any corpus size)."""
    docs = table(spark, sf_dir, "documents")
    pairs = dedup.simhash_near_pairs(docs, max_hamming=6)
    return pairs.agg(
        F.count(F.lit(1)).alias("pair_cnt"),
        F.sum("hamming").cast("bigint").alias("hamming_sum"),
        F.countDistinct("doc_a").cast("bigint").alias("distinct_doc_a"),
    )


def _ngram_pairs_cte_body(threshold: float, cap: int = dedup.MAX_BUCKET) -> str:
    """Shared DuckDB CTE chain for word-n-gram-Jaccard pairs with the
    ADAPTIVE blocking of operators.dedup.ngram_jaccard_pairs: blocks
    ≤ cap pair exactly (one 'S' key per doc), over-cap blocks switch to
    MinHash-LSH band keys composed with the block key ('L' keys) — same
    H32, same signature constants, same bucket cap, byte-identical key
    strings."""
    sep = dedup.BLOCK_SEP
    return f"""sh AS (
    SELECT doc_id, lang || '{sep}' || source AS blk,
           list_distinct({hashing.shingle_hashes_duck(_WORD_SHINGLES)}) AS hset
    FROM documents
), sized AS (
    SELECT *, COUNT(*) OVER (PARTITION BY blk) AS bsz FROM sh
), sigd AS (
    SELECT *, CASE WHEN bsz > {cap}
                   THEN {hashing.minhash_sig_duck('hset')} END AS sig
    FROM sized
), keyed AS (
    SELECT doc_id, hset,
           CASE WHEN bsz <= {cap} THEN ['S{sep}' || blk]
                ELSE list_transform({hashing.band_keys_duck('sig')},
                                    k -> 'L{sep}' || blk || '{sep}' || k)
           END AS keys
    FROM sigd
), banded_raw AS (
    SELECT doc_id, unnest(keys) AS bkey FROM keyed
), banded AS (
    SELECT * FROM banded_raw
    QUALIFY COUNT(*) OVER (PARTITION BY bkey) <= {cap}
), cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a JOIN banded b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
), raw_pairs AS (
    SELECT doc_a, doc_b,
           CAST(len(list_intersect(sa.hset, sb.hset)) AS DOUBLE)
           / (len(sa.hset) + len(sb.hset)
              - len(list_intersect(sa.hset, sb.hset))) AS jac
    FROM cand
    JOIN sh sa ON sa.doc_id = doc_a
    JOIN sh sb ON sb.doc_id = doc_b
), pairs AS (
    -- filter on the UNROUNDED value, round afterwards (operator order)
    SELECT doc_a, doc_b, ROUND(jac, 6) AS jaccard
    FROM raw_pairs WHERE jac >= {threshold}
)"""


_NGRAM_ORACLE = f"""
WITH {_ngram_pairs_cte_body(0.2)}
SELECT COUNT(*) AS pair_cnt,
       CAST(SUM(CAST(jaccard AS DECIMAL(18,8))) AS DOUBLE) AS jac_sum,
       MAX(jaccard) AS jac_max
FROM pairs
"""


@query("dedup_ngram_jaccard", tags=("dedup", "jaccard", "documents"), oracle=_NGRAM_ORACLE)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact word-3-gram Jaccard with adaptive blocking: (lang, source)
    blocks pair exactly while small, and switch to MinHash-LSH banding
    INSIDE the block once they exceed the bucket cap — candidates stay
    near-linear at any corpus size instead of going quadratic-or-dropped.
    Returns the exact aggregate fingerprint of the pair set."""
    docs = table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.2)
    return pairs.agg(
        F.count(F.lit(1)).alias("pair_cnt"),
        F.sum(F.col("jaccard").cast("decimal(18,8)")).cast("double").alias("jac_sum"),
        F.max("jaccard").alias("jac_max"),
    )


# Connected components over the 3-gram-Jaccard pair graph (threshold 0.5
# — tighter than the pair query's 0.2, so clusters are true near-dup
# groups; (lang, source) blocking keeps both the pair graph and its
# closure tractable at any corpus size). The oracle computes the same
# closure with a recursive CTE: reach(id, r) = transitive closure over
# the symmetrized edge set, cluster label = MIN(reachable id) — identical
# semantics to the min-label-propagation fixpoint in operators/cluster.py.
_CLUSTER_ORACLE = f"""
WITH RECURSIVE {_ngram_pairs_cte_body(0.5)}, sym AS (
    SELECT doc_a AS s, doc_b AS d FROM pairs
    UNION
    SELECT doc_b, doc_a FROM pairs
), nodes AS (
    SELECT DISTINCT s AS id FROM sym
), reach AS (
    SELECT id, id AS r FROM nodes
    UNION
    SELECT reach.id, e.d AS r FROM reach JOIN sym e ON reach.r = e.s
), labels AS (
    SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id
), clusters AS (
    SELECT cluster_id, COUNT(*) AS sz FROM labels GROUP BY cluster_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(sz) AS BIGINT) AS n_docs,
       CAST(MAX(sz) AS BIGINT) AS max_size,
       CAST(SUM(cluster_id) AS BIGINT) AS keeper_id_sum
FROM clusters
"""


@query(
    "dedup_cluster_keepers",
    tags=("dedup", "cluster", "iterative", "documents"),
    oracle=_CLUSTER_ORACLE,
)
def dedup_cluster_keepers(spark, sf_dir):
    """Near-dup CLUSTER formation: word-3-gram-Jaccard pairs (>= 0.5) →
    connected components by iterative min-label propagation with pointer
    jumping (operators/cluster.py) → one keeper (min doc_id) per
    component. The iterative fixpoint is value-checked against a
    recursive-CTE transitive closure in DuckDB — the strongest oracle an
    iterative algorithm can get. Output is the bounded cluster
    fingerprint."""
    from lhbench_spark.operators.cluster import connected_components

    docs = table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    labels = connected_components(pairs)
    clusters = labels.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("sz"))
    return clusters.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        F.sum("sz").cast("bigint").alias("n_docs"),
        F.max("sz").cast("bigint").alias("max_size"),
        F.sum("cluster_id").cast("bigint").alias("keeper_id_sum"),
    )


def _emb_near_dup_oracle() -> str:
    from lhbench_spark.operators import similarity as sim

    return f"""
WITH v AS (
    SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
), banded_raw AS (
    SELECT vec_id, unnest({sim.neardup_band_keys_duck('ev', 64)}) AS bkey FROM v
), banded AS (
    SELECT * FROM banded_raw
    QUALIFY COUNT(*) OVER (PARTITION BY bkey) <= 1000
), cand AS (
    SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM banded a JOIN banded b ON a.bkey = b.bkey AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b,
       ROUND(ROUND(list_cosine_similarity(va.ev, vb.ev), 9), 6) AS cosine
FROM cand
JOIN v va ON va.vec_id = vec_a
JOIN v vb ON vb.vec_id = vec_b
WHERE ROUND(list_cosine_similarity(va.ev, vb.ev), 9) >= 0.4
"""


@query(
    "dedup_embedding_cosine",
    tags=("dedup", "embedding"),
    oracle=_emb_near_dup_oracle(),
)
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding near-dup pairs via banded random-hyperplane LSH
    blocking — candidates stay near-linear in corpus size (label blocks
    grow O(corpus) and went quadratic). The threshold is calibrated to
    THIS corpus the same way as SemDeDup's tau: the synthetic embeddings
    are near-orthogonal (max banded-candidate cosine ~0.49), so real
    near-dup 0.95 never fires and every oracle match would be the
    trivial 0 = 0; 0.4 sits just inside the candidate tail and yields
    a non-empty, value-checked pair set at every SF."""
    from lhbench_spark.operators.similarity import embedding_near_dup_pairs

    emb = table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, dim=64, threshold=0.4)


_SPAN_K = 8

_REPEATED_SPANS_ORACLE = f"""
WITH w AS (
    SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w FROM documents
), s AS (
    SELECT doc_id,
           array_to_string(list_slice(w, i + 1, i + {_SPAN_K}), ' ') AS span
    FROM w, UNNEST(range(0, greatest(len(w) - {_SPAN_K} + 1, 0))) AS t(i)
)
SELECT md5(span) AS fp, MIN(span) AS span,
       COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occurrences
FROM s GROUP BY 1
HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY n_docs DESC, n_occurrences DESC, span
LIMIT 50
"""


@query(
    "dedup_repeated_spans",
    tags=("dedup", "documents", "span-level"),
    oracle=_REPEATED_SPANS_ORACLE,
)
def dedup_repeated_spans(spark, sf_dir):
    """Exact substring-level dedup (beyond the reference; the span-dedup
    pass of LLM training pipelines): every 8-token sliding window,
    grouped by span digest, reporting spans recurring in >=2 documents.
    Linear in total tokens (never pairwise); the single shuffle groups on
    a fixed-width digest. Top-50 fully tie-broken."""
    return dedup.repeated_spans(
        table(spark, sf_dir, "documents"), k=_SPAN_K, min_docs=2, top=50
    )


_CONTAINMENT_ORACLE = f"""
WITH sh AS (
    SELECT doc_id, {_WORD_SHINGLES} AS shingles FROM documents
), hset AS (
    SELECT doc_id,
           list_distinct({hashing.shingle_hashes_duck('shingles')}) AS hset
    FROM sh
), posts_raw AS (
    SELECT doc_id, unnest(hset) AS h FROM hset
), posts AS (
    SELECT * FROM posts_raw
    QUALIFY COUNT(*) OVER (PARTITION BY h) <= {dedup.MAX_BUCKET}
), cand AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM posts a JOIN posts b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= 3
), verify AS (
    SELECT c.doc_a, c.doc_b,
           CAST(len(list_intersect(ha.hset, hb.hset)) AS DOUBLE) AS inter,
           least(len(ha.hset), len(hb.hset)) AS mn
    FROM cand c
    JOIN hset ha ON ha.doc_id = c.doc_a
    JOIN hset hb ON hb.doc_id = c.doc_b
)
SELECT doc_a, doc_b, ROUND(inter / mn, 6) AS containment
FROM verify WHERE inter / mn >= 0.6
"""


@query(
    "dedup_containment",
    tags=("dedup", "containment", "documents"),
    oracle=_CONTAINMENT_ORACLE,
)
def dedup_containment(spark, sf_dir):
    """Doc-in-doc containment pairs (|A∩B| / min(|A|,|B|) ≥ 0.6):
    asymmetric overlap that MinHash banding cannot see (its collisions
    track Jaccard, and a small doc inside a big one has low Jaccard).
    Candidates come from capped per-shingle posting lists shared ≥3
    times; the cap is mirrored in the oracle via QUALIFY, so both
    engines agree at any scale factor."""
    return dedup.containment_pairs(
        table(spark, sf_dir, "documents"), threshold=0.6, min_shared=3
    )


# SemDeDup (Abbas et al. 2023): semantic deduplication that prunes the
# pairwise search to WITHIN k-means cells of the embedding space — the
# scale trick that makes embedding-level dedup feasible on web-scale
# corpora (pairs are O(sum cell²), never O(corpus²); at 100 TB the
# corpus is stored PARTITIONED BY cell, so the within-cell self-join is
# co-located and shuffle-free). Keeper rule: a vector is dropped iff a
# LOWER-id vector in its cell has cosine >= threshold — deterministic
# without materializing connected components. The threshold is calibrated
# to THIS corpus: the synthetic embeddings are near-orthogonal (within-cell
# max cosine ~0.51), so the near-identical 0.95 of real SemDeDup would
# never fire; 0.4 sits at the ~p99.9 of the within-cell pair distribution
# and exercises the drop path at every SF.
_SEMANTIC_TAU = 0.4

_SEMANTIC_ORACLE = f"""
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
), drops AS (
    SELECT DISTINCT b.cell, b.vec_id
    FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE floor(list_cosine_similarity(a.ev, b.ev) * 1e9 + 0.5)
              >= floor({_SEMANTIC_TAU} * 1e9 + 0.5)
), sizes AS (
    SELECT cell, COUNT(*) AS n_vecs FROM cells GROUP BY 1
), d AS (
    SELECT cell, COUNT(*) AS n_dropped FROM drops GROUP BY 1
)
SELECT sizes.cell AS cell, n_vecs,
       COALESCE(n_dropped, 0) AS n_dropped,
       n_vecs - COALESCE(n_dropped, 0) AS n_kept
FROM sizes LEFT JOIN d USING (cell)
"""


@query(
    "dedup_semantic_cells",
    tags=("dedup", "embedding", "semdedup", "extension"),
    oracle=_SEMANTIC_ORACLE,
)
def dedup_semantic_cells(spark, sf_dir):
    """SemDeDup: per-k-means-cell near-duplicate pruning over embeddings.
    Cell assignment is the IVF inline-argmin projection (no Exchange);
    the candidate join is cell-local; output is the per-cell
    kept/dropped census (cells-sized, metadata-bounded)."""
    from pyspark.sql import functions as F

    from lhbench_spark.operators import similarity
    from lhbench_spark.queries.similarity import _ivf_cents

    emb = table(spark, sf_dir, "embeddings")
    cents = _ivf_cents(spark, sf_dir)
    cells = similarity.ivf_assign(
        emb.select("vec_id", similarity.as_double("embedding").alias("_ev")),
        cents, 1, "vec_id", "_ev",
    )
    # Per-cell census via Arrow-batched matmul (the SemDeDup reference
    # technique): one groupBy shuffle on the cell key, then each task
    # scores its whole cell as a dense product. The pure-DataFrame
    # self-join form is semantically identical but evaluates interpreted
    # zip_with lambdas per pair-coordinate (HOFs don't codegen) —
    # measured ~6.5 s at sf0.1 vs milliseconds of BLAS.
    return similarity.semantic_dedup_census(cells, _SEMANTIC_TAU)
