"""Deduplication operators for large-scale corpus curation.

Beyond the reference's surface (its tables are synthetic-unique), these are
the dedup primitives an LLM-training-data pipeline needs, each built from
Spark built-ins (no Python UDFs — every hash/shingle expression compiles
into whole-stage codegen):

- exact dedup          — hash-groupBy on normalized text
- MinHash + LSH        — shingle → k-minhash signature → banded bucket
                         join → candidate pairs → exact Jaccard verify
- SimHash              — per-bit majority sign of token hashes → banded
                         hamming candidates
- n-gram Jaccard       — exact set similarity with adaptive blocking
                         (small blocks pair exactly; over-cap blocks
                         switch to LSH banding inside the block)
- embedding cosine     — near-dup pairs over an embedding column

Scale design: every pairwise step is preceded by a blocking/banding stage
so no O(n²) comparison ever materializes. The LSH band join shuffles on
the band key (tunable bands×rows tradeoff in operators/hashing.py); skewed
buckets (boilerplate text) are the known hazard — AQE skew-join handles
moderate skew, and a bucket-size cap is applied before pairing so a
degenerate bucket (e.g. empty-string docs) cannot produce a quadratic
blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lhbench_spark.operators import fan_out, hashing, textnorm

# Buckets larger than this are dropped from pair generation (they indicate
# degenerate/boilerplate content that needs a dedicated rule, not n² work).
# 256 keeps the worst bucket's pair contribution ≤ ~32k pairs; template-y
# corpora otherwise put >10% of all docs in one band bucket and the
# "capped" candidate set goes quadratic anyway (measured 1.1M candidate
# pairs from 5k docs with the cap at 1000).
MAX_BUCKET = 256


def normalized(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("_norm", F.expr(textnorm.norm_spark(text_col)))


def exact_dedup_keepers(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct normalized text: the minimum id wins (the
    deterministic `keep-first` policy). Single hash-agg shuffle on the
    normalized text — at 100 TB, group on md5(_norm) instead of the full
    string to cut shuffle width; we group on the digest here for that
    reason and keep a sample count per group."""
    return (
        normalized(df, text_col)
        .withColumn("_fp", F.md5("_norm"))
        .groupBy("_fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_cnt"),
        )
    )


def with_shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Shingle computation is CPU-bound per row — fan the scan out to
    core count first (a small-on-disk corpus otherwise computes
    single-threaded; see operators.fan_out)."""
    norm = textnorm.norm_spark(text_col)
    return fan_out(df).withColumn("_shingles", F.expr(textnorm.shingles_spark(norm, n)))


def with_word_shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Word n-gram shingles (Broder w-shingling) — the MinHash unit.
    ~6x fewer shingles per doc than char 3-grams, so the md5-per-shingle
    leaf and the verify-stage intersects shrink proportionally."""
    return fan_out(df).withColumn(
        "_shingles", F.expr(textnorm.word_shingles_spark(text_col, n))
    )


def minhash_signatures(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, shingles, sig: array<bigint>[k]) per document. Shingle hashes
    are materialized in their own projection (md5 once per shingle, not
    once per hash function; CollapseProject keeps multi-referenced
    non-cheap expressions un-inlined)."""
    hashed = with_word_shingles(df, text_col).select(
        F.col(id_col),
        F.col("_shingles"),
        F.expr(hashing.shingle_hashes_spark("_shingles")).alias("_hs"),
    )
    return hashed.select(
        F.col(id_col),
        F.col("_shingles"),
        F.expr(hashing.minhash_sig_spark("_hs")).alias("_sig"),
    )


def _capped_buckets(banded: DataFrame, key: str, cap: int = MAX_BUCKET) -> DataFrame:
    w = Window.partitionBy(key)
    return banded.withColumn("_bsz", F.count(F.lit(1)).over(w)).filter(
        F.col("_bsz") <= cap
    )


def bucket_stats(banded: DataFrame, key: str) -> DataFrame:
    """Observability for the bucket cap: per-bucket sizes with a dropped
    flag. Run alongside any *_pairs operator to see how many buckets (and
    rows) the MAX_BUCKET guard excluded — the cap itself is silent in the
    pair output (and mirrored in the oracles via QUALIFY)."""
    return (
        banded.groupBy(key)
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .withColumn("dropped", F.col("bucket_size") > MAX_BUCKET)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
) -> DataFrame:
    """Near-duplicate candidate pairs with exact-Jaccard verification.

    Plan: signature (narrow) → explode band keys (×4) → self-join on band
    key carrying ONLY (id, bkey) → distinct id pairs → join the shingle
    sets back for the Jaccard verify. Shingle arrays are ~KB per doc; at
    100 TB they must not ride the band-join shuffle (4 band copies per
    doc) nor the pair dedupe — ids only, re-joined once per verified pair.
    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    # Hash each shingle once; signatures fold the hash array, and the
    # exact-Jaccard verify intersects the DISTINCT hash sets — int64
    # comparisons, not 1M× string-array intersections. Both engines use
    # the same H32, so hash-set Jaccard is engine-identical (and the
    # standard approach at corpus scale).
    hashed = with_word_shingles(df, text_col).select(
        F.col(id_col).alias("_id"),
        F.expr(hashing.shingle_hashes_spark("_shingles")).alias("_hs"),
    )
    # The md5-per-shingle projection is the expensive leaf and is consumed
    # by THREE downstream branches (banding, verify-join doc_a side,
    # verify-join doc_b side) whose exchanges differ — without persistence
    # Spark recomputes it per branch (measured 3-4× the pipeline cost at
    # sf0.1). localCheckpoint (not cache): materialized once, storage
    # released when the plan is GC'd — a cache() here leaked executor
    # blocks across bench iterations because nothing unpersisted it. The
    # signature is min-per-hash-function, invariant under array_distinct,
    # so it derives from the persisted set. At cluster scale this persist
    # is a written signature table, computed once per corpus ingest.
    sh = (
        hashed.select("_id", F.array_distinct("_hs").alias("_hset"))
        .withColumn("_sz", F.size("_hset"))
        .localCheckpoint(eager=False)
    )
    sigs = sh.select(
        "_id", F.expr(hashing.minhash_sig_spark("_hset")).alias("_sig")
    )
    banded = _capped_buckets(
        sigs.select(
            "_id",
            F.explode(F.expr(hashing.band_keys_spark("_sig"))).alias("_bkey"),
        ),
        "_bkey",
    )
    cand = (
        banded.select(F.col("_id").alias("doc_a"), "_bkey")
        .join(banded.select(F.col("_id").alias("doc_b"), "_bkey"), "_bkey")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # MERGE-hint the hash-set sides: AQE would otherwise broadcast the
    # checkpointed array frame when it measures small (bench SFs), and
    # building that broadcast serializes every hash-set array through the
    # driver — measured 3x the whole query cold (24.5s -> 8.2s at sf0.1).
    # At 100 TB the set frame IS the corpus and could never broadcast, so
    # the shuffle join is the only plan that exists at scale; pinning it
    # removes a strategy AQE gets wrong at every size.
    pairs = cand.join(
        sh.select(
            F.col("_id").alias("doc_a"),
            F.col("_hset").alias("_sa"),
            F.col("_sz").alias("_za"),
        ).hint("merge"),
        "doc_a",
    ).join(
        sh.select(
            F.col("_id").alias("doc_b"),
            F.col("_hset").alias("_sb"),
            F.col("_sz").alias("_zb"),
        ).hint("merge"),
        "doc_b",
    )
    # Size-ratio prefilter: for sets, jac(A,B) ≤ min(|A|,|B|)/max(|A|,|B|).
    # Division form: |A∩B| ≤ min and |A∪B| ≥ max exactly (small ints are
    # exact doubles) and fl() is monotone, so fl(min/max) ≥ fl(jac) — the
    # prune can never be stricter than the final jac ≥ threshold filter,
    # for ANY threshold (the multiply form depended on how
    # threshold×greatest happened to round).
    pairs = pairs.filter(
        F.least("_za", "_zb") / F.greatest("_za", "_zb") >= threshold
    )
    # |A∪B| = |A|+|B|-|A∩B| for sets: one array_intersect per pair (CSE'd
    # within each operator) instead of materializing the concatenated
    # distinct union array — the hot expression at verify volume.
    inter = F.size(F.array_intersect("_sa", "_sb")).cast("double")
    jac = inter / (F.col("_za") + F.col("_zb") - inter)
    return pairs.filter(jac >= threshold).select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )


def minhash_store(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Build the persistent half of incremental dedup: the corpus
    signature store, as two frames —

    - ``sets``:  (_id, _hset: array<bigint>, _sz) distinct H32 shingle
      hashes per document (the exact-Jaccard verify side);
    - ``bands``: (_id, _bkey) LSH band index rows, bucket-capped.

    This is the 100 TB ingest pattern: the store is computed ONCE per
    corpus (here materialized via localCheckpoint; at cluster scale both
    frames are parquet tables written at ingest and maintained
    incrementally), and each arriving batch probes it without ever
    re-shingling the corpus. Bucket cap applies to STORE buckets — a
    degenerate store bucket (boilerplate) would otherwise fan every
    probing batch row out quadratically.
    """
    hashed = with_word_shingles(corpus, text_col).select(
        F.col(id_col).alias("_id"),
        F.expr(hashing.shingle_hashes_spark("_shingles")).alias("_hs"),
    )
    sets = (
        hashed.select("_id", F.array_distinct("_hs").alias("_hset"))
        .withColumn("_sz", F.size("_hset"))
        .localCheckpoint(eager=False)
    )
    sigs = sets.select(
        "_id", F.expr(hashing.minhash_sig_spark("_hset")).alias("_sig")
    )
    bands = _capped_buckets(
        sigs.select(
            "_id",
            F.explode(F.expr(hashing.band_keys_spark("_sig"))).alias("_bkey"),
        ),
        "_bkey",
    ).select("_id", "_bkey")
    return sets, bands


def incremental_dedup_verdicts(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
) -> DataFrame:
    """Batch-vs-store near-dup screening — the incremental-ingest dedup
    every large corpus actually runs (full-corpus pair generation is a
    one-time backfill; day-to-day dedup is "is this NEW doc a near-dup of
    anything already ingested?").

    Plan: corpus signature store from :func:`minhash_store`; the batch
    computes only its OWN signatures, probes the store's band index with
    an ids-only join, and exact-verifies candidates against the store's
    hash sets. Per batch doc the best verified match wins (highest
    jaccard, then lowest store id — fully tie-broken). Batch docs with no
    verified match come through the left join as is_dup = false.

    Output: (batch_id, is_dup, match_id, jaccard) — one row per batch
    document. Cost is O(batch × probe-fanout), independent of corpus
    size once the store exists.
    """
    sets, bands = minhash_store(corpus, id_col, text_col)
    bhashed = with_word_shingles(batch, text_col).select(
        F.col(id_col).alias("batch_id"),
        F.expr(hashing.shingle_hashes_spark("_shingles")).alias("_hs"),
    )
    bsets = (
        bhashed.select("batch_id", F.array_distinct("_hs").alias("_bset"))
        .withColumn("_bz", F.size("_bset"))
        .localCheckpoint(eager=False)
    )
    bsigs = bsets.select(
        "batch_id", F.expr(hashing.minhash_sig_spark("_bset")).alias("_sig")
    )
    bbands = bsigs.select(
        "batch_id",
        F.explode(F.expr(hashing.band_keys_spark("_sig"))).alias("_bkey"),
    )
    cand = (
        bbands.join(bands.withColumnRenamed("_id", "match_id"), "_bkey")
        .select("batch_id", "match_id")
        .dropDuplicates(["batch_id", "match_id"])
    )
    # merge-hint ONLY the corpus set side: that frame scales with the
    # whole ingested corpus and must never be AQE-broadcast
    # (driver-serializing every hash set; impossible at corpus scale —
    # same rationale as ngram_jaccard_pairs). The batch set side is
    # bounded by the arriving batch, so AQE may legitimately broadcast
    # it; forcing merge there would only serialize the candidate join
    # through however many partitions the (small) batch hashes into.
    pairs = cand.join(bsets, "batch_id").join(
        sets.select(
            F.col("_id").alias("match_id"),
            F.col("_hset").alias("_sa"),
            F.col("_sz").alias("_za"),
        ).hint("merge"),
        "match_id",
    )
    # Same monotone size-ratio prune as minhash_lsh_pairs (never stricter
    # than the jac >= threshold filter, so absent from the oracle).
    pairs = pairs.filter(
        F.least("_za", "_bz") / F.greatest("_za", "_bz") >= threshold
    )
    inter = F.size(F.array_intersect("_sa", "_bset")).cast("double")
    jac = inter / (F.col("_za") + F.col("_bz") - inter)
    verified = pairs.filter(jac >= threshold).select(
        "batch_id", "match_id", F.round(jac, 6).alias("jaccard")
    )
    w = Window.partitionBy("batch_id").orderBy(
        F.col("jaccard").desc(), F.col("match_id").asc()
    )
    best = (
        verified.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return (
        batch.select(F.col(id_col).alias("batch_id"))
        .join(best, "batch_id", "left")
        .select(
            "batch_id",
            F.col("match_id").isNotNull().alias("is_dup"),
            "match_id",
            "jaccard",
        )
    )


def simhash_fingerprints(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash bigint) — 60-bit per-bit-majority fingerprint over the
    distinct token set. Token hashes are materialized ONCE in a separate
    projection (CollapseProject keeps multi-referenced non-cheap
    expressions un-inlined), so md5 runs once per token, not once per
    fingerprint bit."""
    tokens = f"array_distinct({textnorm.tokens_spark(text_col)})"
    hashed = fan_out(df).select(
        F.col(id_col),
        F.expr(hashing.token_hashes_spark(tokens)).alias("_h"),
    )
    return hashed.select(
        F.col(id_col),
        F.expr(hashing.simhash_from_hashes_spark("_h")).alias("simhash"),
    )


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 6,
) -> DataFrame:
    """Candidate pairs by 15-bit band collision over the 60-bit
    fingerprint, verified by hamming distance. The 15-bit bands are the
    scale lever: candidates require 15 consecutive identical bits, so the
    survivor set stays near-linear on natural corpora (the old 8-bit bands
    over 32 bits let ~36% of all pairs through)."""
    fps = simhash_fingerprints(df, id_col, text_col)
    bands = fps.select(
        F.col(id_col).alias("_id"),
        "simhash",
        F.explode(F.expr(hashing.simhash_band_keys_spark("simhash"))).alias("_bkey"),
    )
    bands = _capped_buckets(bands, "_bkey")
    left = bands.select(F.col("_id").alias("doc_a"), F.col("simhash").alias("_fa"), "_bkey")
    right = bands.select(F.col("_id").alias("doc_b"), F.col("simhash").alias("_fb"), "_bkey")
    pairs = (
        left.join(right, "_bkey")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "_fa", "_fb")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("_fa").bitwiseXOR(F.col("_fb")))
    return pairs.filter(hamming <= max_hamming).select(
        "doc_a", "doc_b", hamming.cast("int").alias("hamming")
    )


#: Separator for composite candidate keys (unit separator — collision-free
#: for text block columns; identical literal in the DuckDB oracles).
BLOCK_SEP = "\x1f"


def ngram_jaccard_pairs(
    df: DataFrame,
    block_cols: tuple[str, ...] = ("lang", "source"),
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.2,
    n: int = 3,
    cap: int = MAX_BUCKET,
) -> DataFrame:
    """Exact word-n-gram Jaccard pairs with ADAPTIVE candidate blocking.

    Natural blocks ((lang, source)) grow O(corpus), so a fixed choice is
    wrong at some scale: all-pairs inside blocks goes quadratic, while
    dropping over-cap blocks degenerates to "dedup only small blocks".
    Adaptive rule, decided per block from its size:

    - block ≤ cap  → ONE candidate key per doc ('S' + block): exact
      all-pairs inside the block, bounded by cap².
    - block > cap  → MinHash-LSH band keys composed WITH the block key
      ('L' + block + band): candidates stay near-linear however large the
      block, recall follows the LSH s-curve (operators/hashing.py tuning),
      and every candidate is still exact-Jaccard verified. The bucket cap
      then applies to the composed band buckets, so a degenerate
      boilerplate bucket inside a huge block still cannot go quadratic.

    The verify intersects DISTINCT H32 shingle-hash sets (int64), not the
    shingle strings — same trick as the MinHash verify: int comparisons at
    pair volume, identical H32 in the DuckDB oracle. Word shingles
    (Broder w-shingling) rather than char 3-grams: ~6x fewer md5 leaf
    hashes and proportionally narrower verify intersects."""
    sh = (
        with_word_shingles(df, text_col, n)
        .select(
            F.col(id_col).alias("_id"),
            F.concat_ws(BLOCK_SEP, *block_cols).alias("_blk"),
            F.array_distinct(
                F.expr(hashing.shingle_hashes_spark("_shingles"))
            ).alias("_hset"),
        )
        .withColumn("_sz", F.size("_hset"))
        # localCheckpoint (not cache): three consumers (candidate keys,
        # both verify-join sides) would otherwise re-shingle the corpus
        # each; storage is released when the plan is GC'd, where cache()
        # leaked blocks across bench iterations with no unpersist. At
        # cluster scale this is a written shingle-hash table, computed
        # once per corpus ingest.
        .localCheckpoint(eager=False)
    )
    big = F.col("_bsz") > cap
    keyed = (
        sh.withColumn("_bsz", F.count(F.lit(1)).over(Window.partitionBy("_blk")))
        # CASE short-circuits per row: the 16-fold signature is only
        # evaluated for rows of over-cap blocks.
        .withColumn(
            "_sig", F.when(big, F.expr(hashing.minhash_sig_spark("_hset")))
        )
        .withColumn(
            "_keys",
            F.when(
                ~big, F.array(F.concat_ws(BLOCK_SEP, F.lit("S"), F.col("_blk")))
            ).otherwise(
                F.expr(
                    f"transform({hashing.band_keys_spark('_sig')}, "
                    f"k -> concat('L{BLOCK_SEP}', _blk, '{BLOCK_SEP}', k))"
                )
            ),
        )
    )
    banded = _capped_buckets(
        keyed.select("_id", F.explode("_keys").alias("_bkey")), "_bkey", cap
    )
    # Candidates carry (id, key) only — the shingle-hash arrays do not ride
    # the self-join (same shuffle-width discipline as the MinHash band
    # join). Banded pairs can collide in up to MINHASH_BANDS buckets, so
    # dedupe before the verify join.
    cand = (
        banded.select(F.col("_id").alias("doc_a"), "_bkey")
        .join(banded.select(F.col("_id").alias("doc_b"), "_bkey"), "_bkey")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # MERGE-hint the hash-set sides: AQE would otherwise broadcast the
    # checkpointed array frame when it measures small (bench SFs), and
    # building that broadcast serializes every hash-set array through the
    # driver — measured 3x the whole query cold (24.5s -> 8.2s at sf0.1).
    # At 100 TB the set frame IS the corpus and could never broadcast, so
    # the shuffle join is the only plan that exists at scale; pinning it
    # removes a strategy AQE gets wrong at every size.
    pairs = cand.join(
        sh.select(
            F.col("_id").alias("doc_a"),
            F.col("_hset").alias("_sa"),
            F.col("_sz").alias("_za"),
        ).hint("merge"),
        "doc_a",
    ).join(
        sh.select(
            F.col("_id").alias("doc_b"),
            F.col("_hset").alias("_sb"),
            F.col("_sz").alias("_zb"),
        ).hint("merge"),
        "doc_b",
    )
    # Same provably-never-stricter division-form size-ratio prune as the
    # MinHash verify.
    pairs = pairs.filter(
        F.least("_za", "_zb") / F.greatest("_za", "_zb") >= threshold
    )
    inter = F.size(F.array_intersect("_sa", "_sb")).cast("double")
    jac = inter / (F.col("_za") + F.col("_zb") - inter)
    return pairs.filter(jac >= threshold).select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )


def repeated_spans(
    df: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    top: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact substring-level dedup: k-token spans that recur across
    documents (the span-dedup pass of training-data pipelines — repeated
    boilerplate/template spans are memorization fuel even when whole
    documents are unique; doc-level MinHash cannot see them).

    Spark-first shape: tokenize → explode every k-token sliding window →
    group by the span's md5 digest. All expressions are JVM built-ins
    (transform/sequence/slice inside whole-stage codegen); the exploded
    stream is O(total tokens) rows — linear, never pairwise — and the
    one shuffle groups on a FIXED-WIDTH 32-char digest, so shuffle width
    is independent of k (group-by-span would ship k tokens per row; at
    the span lengths real pipelines use, k=50+, that is the difference
    between a narrow and a fat shuffle at 100 TB). Output is capped
    deterministically (n_docs, n_occurrences, span — span is unique per
    group, so the top-k is fully tie-broken)."""
    words = F.split(F.col(text_col), r"\s+")
    spans = (
        df.select(F.col(id_col).alias("_id"), words.alias("_w"))
        # guard BEFORE sequence(): sequence(0, negative) would generate a
        # descending range and fabricate spans for short docs
        .filter(F.size("_w") >= k)
        .select(
            "_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(_w) - {k}), "
                    f"i -> concat_ws(' ', slice(_w, i + 1, {k})))"
                )
            ).alias("span"),
        )
    )
    return (
        spans.select(F.md5("span").alias("fp"), "_id", "span")
        .groupBy("fp")
        .agg(
            F.min("span").alias("span"),
            F.countDistinct("_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .orderBy(F.desc("n_docs"), F.desc("n_occurrences"), F.asc("span"))
        .limit(top)
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
    min_shared: int = 3,
) -> DataFrame:
    """Doc-in-doc detection: pairs with high CONTAINMENT
    |A∩B| / min(|A|,|B|) — the asymmetric overlap measure. A small
    document quoted inside a 10× larger one has Jaccard ≈ 0.1 (invisible
    to MinHash banding, whose collision probability tracks Jaccard) but
    containment ≈ 1.0, so candidates come from per-shingle POSTING LISTS
    instead: explode distinct shingle hashes, cap each posting list
    (frequency cap — stopword-like shingles would go quadratic), self-join
    per hash, and keep pairs sharing >= min_shared capped postings. The
    verify recomputes exact intersection over the full hash sets. All
    candidate traffic is (id, hash) pairs — ids only, like the MinHash
    path."""
    hashed = with_word_shingles(df, text_col).select(
        F.col(id_col).alias("_id"),
        F.expr(hashing.shingle_hashes_spark("_shingles")).alias("_hs"),
    )
    # localCheckpoint (not cache): materialized once, storage released
    # when the plan is GC'd — a cache() here leaked executor blocks
    # across bench iterations because nothing unpersisted it.
    sh = (
        hashed.select("_id", F.array_distinct("_hs").alias("_hset"))
        .withColumn("_sz", F.size("_hset"))
        .localCheckpoint(eager=False)
    )
    posts = _capped_buckets(
        sh.select("_id", F.explode("_hset").alias("_h")), "_h"
    )
    cand = (
        posts.select(F.col("_id").alias("doc_a"), "_h")
        .join(posts.select(F.col("_id").alias("doc_b"), "_h"), "_h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("_shared"))
        .filter(F.col("_shared") >= min_shared)
    )
    # merge-hint: see ngram_jaccard_pairs — the set frame must never be
    # AQE-broadcast.
    pairs = cand.join(
        sh.select(F.col("_id").alias("doc_a"), F.col("_hset").alias("_sa"),
                  F.col("_sz").alias("_za")).hint("merge"),
        "doc_a",
    ).join(
        sh.select(F.col("_id").alias("doc_b"), F.col("_hset").alias("_sb"),
                  F.col("_sz").alias("_zb")).hint("merge"),
        "doc_b",
    )
    inter = F.size(F.array_intersect("_sa", "_sb")).cast("double")
    cont = inter / F.least("_za", "_zb")
    return pairs.filter(cont >= threshold).select(
        "doc_a", "doc_b", F.round(cont, 6).alias("containment")
    )
