"""Training-run preparation queries over ``documents`` (north-star
extension, the stage after :mod:`lhbench_spark.queries.assembly`).

Operations a large-scale pretraining pipeline runs between "corpus
is clean" and "tokens hit the trainer", each expressed as a pure
JVM-side plan (hash / window / aggregate — no Python anywhere) and each
paired with a value-identical DuckDB oracle (later additions — the BPE
training loop, the logistic-regression fit, temperature mixture
weights — are documented at their definitions below):

- **Domain capping** (`train_domain_caps`): keep at most K documents per
  source, highest-priority first — the anti-boilerplate guard against a
  single domain flooding the mixture. The rank filter compiles to a
  map-side partial WindowGroupLimit (plan-tested), so one mega-domain
  cannot serialize into a single sort task at 100 TB.
- **Corpus-wide block dedup** (`train_line_dedup`): the C4/RefinedWeb
  line-dedup recipe adapted to the word-stream fixtures — split every
  document into fixed word blocks, keep each distinct block only at its
  first corpus position, and reassemble the surviving text per document.
- **Deterministic global shuffle** (`train_global_shuffle`): assign every
  document a shard and an exact within-shard position from a salted
  md5 key. Positions come from the *distributed order-index* pattern
  (bounded per-(shard, key-range) counts -> prefix-sum offsets ->
  local row_number), not one row_number over each whole shard.
- **Epoch planning** (`train_epoch_plan`): per-source fractional-epoch
  repetition counts (the LLaMA-style "this source gets 1.6 epochs"
  table) derived from corpus statistics with pure integer arithmetic,
  then a deterministic hash draw for the fractional epoch.

Cross-engine determinism: every keep/assign decision is integer-valued
— md5-prefix keys compared against integer thresholds (the
``corpus_mixture_sample`` discipline), and the epoch weights are
computed with bigint multiply-then-DIV instead of float ratios, so both
engines evaluate bit-identical predicates with no rounding boundary.

Reference provenance: the reference is a storage-format benchmark with
no training-data surface (SURVEY.md §0); these extend the engine the
same way its refresh workloads extend TPC-DS — see SURVEY.md §2
"LLM-pipeline operators".
"""

from __future__ import annotations

from lhbench_spark.catalog import table
from lhbench_spark.queries.registry import query

# 24-bit hash space (md5's first 6 hex digits) — shared decision space
# with queries/assembly.py.
_HASH_SPACE = 16777216


def _key24_duck(salt: str) -> str:
    return (
        f"CAST('0x' || substr(md5('{salt}' || CAST(doc_id AS VARCHAR)), 1, 6)"
        " AS BIGINT)"
    )


def _key24_spark(salt: str):
    from pyspark.sql import functions as F

    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string"))), 1, 6
        ),
        16,
        10,
    ).cast("long")


# -- Domain capping ----------------------------------------------------------
# Keep <= CAP docs per source, priority (n_chars DESC, doc_id ASC) — a
# total order, so top-k is unique. 100 TB shape: the classic hazard is
# a row_number() window sorting each whole domain in one task (a crawl
# dump where one host holds 10^9 pages becomes a single straggler).
# Spark >= 3.5 closes this natively: the rank-limit filter pushes a
# WindowGroupLimit in PARTIAL mode below the Exchange, so each map task
# forwards at most CAP rows per source and the final per-source sort
# sees <= CAP x input-partitions rows, never the whole domain — the
# plan-asserted map-side top-k (tests/test_plans.py). Hand-rolling a
# salted two-stage top-k here would only ADD a shuffle; the idiomatic
# single window IS the scale-correct plan on this engine.

_DOMAIN_CAP = 15

_DOMAIN_CAPS_ORACLE = f"""
WITH ranked AS (
    SELECT source, doc_id, n_chars,
           row_number() OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id
           ) AS rk
    FROM documents
), tot AS (
    SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
)
SELECT t.source, CAST(t.n_docs AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(r.doc_id) AS BIGINT) AS kept_id_sum,
       CAST(MIN(r.n_chars) AS BIGINT) AS cap_floor_chars
FROM ranked r JOIN tot t USING (source)
WHERE r.rk <= {_DOMAIN_CAP}
GROUP BY 1, 2
"""


@query(
    "train_domain_caps",
    tags=("training", "dedup", "documents", "extension"),
    oracle=_DOMAIN_CAPS_ORACLE,
)
def train_domain_caps(spark, sf_dir):
    """Per-source document cap (keep the top-K by priority). The rank
    filter compiles to a map-side partial WindowGroupLimit, so no task
    ever sorts a whole domain — see the module comment."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    kept = (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _DOMAIN_CAP)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").alias("kept_id_sum"),
            F.min("n_chars").alias("cap_floor_chars"),
        )
    )
    totals = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    # Both sides are per-source aggregates (bounded at any corpus size).
    return totals.join(kept, "source").select(
        "source", "n_docs", "n_kept", "kept_id_sum", "cap_floor_chars"
    )


# -- Corpus-wide block dedup (C4-style line dedup) ---------------------------
# Split each document into consecutive _BLOCK_WORDS-word blocks, keep a
# block's text only at its FIRST corpus occurrence (min (doc_id,
# block_idx) over its md5), reassemble per document. The dedup key is
# md5(block) in BOTH engines — at 100 TB the first-occurrence shuffle
# moves 16-byte digests, not block text, and both engines make
# identical decisions under any (vanishingly unlikely) digest collision.
# Shuffle ledger: blocks explode map-side (no shuffle), one hash-agg on
# the digest, one digest join back, one doc_id re-agg — every stage is
# key-distributed and O(blocks), never O(corpus^2).

_BLOCK_WORDS = 8

_LINE_DEDUP_ORACLE = f"""
WITH blocks AS (
    SELECT doc_id,
           unnest(range(CAST(ceil(len(arr) / {_BLOCK_WORDS}.0) AS BIGINT)))
               AS block_idx,
           arr
    FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM documents)
), named AS (
    SELECT doc_id, block_idx,
           array_to_string(
               arr[(block_idx * {_BLOCK_WORDS} + 1):
                   (block_idx * {_BLOCK_WORDS} + {_BLOCK_WORDS})], ' ') AS block
    FROM blocks
), keep AS (
    SELECT doc_id, block_idx, block
    FROM (SELECT *, row_number() OVER (
              PARTITION BY md5(block) ORDER BY doc_id, block_idx) AS rk
          FROM named)
    WHERE rk = 1
), tot AS (
    SELECT doc_id,
           CAST(ceil(len(string_split(text, ' ')) / {_BLOCK_WORDS}.0)
                AS BIGINT) AS n_blocks
    FROM documents
)
SELECT t.doc_id, t.n_blocks,
       CAST(COUNT(k.block) AS BIGINT) AS n_kept,
       COALESCE(string_agg(k.block, ' ' ORDER BY k.block_idx), '')
           AS dedup_text
FROM tot t LEFT JOIN keep k USING (doc_id)
GROUP BY 1, 2
"""


@query(
    "train_line_dedup",
    tags=("training", "dedup", "documents", "extension"),
    oracle=_LINE_DEDUP_ORACLE,
)
def train_line_dedup(spark, sf_dir):
    """Corpus-wide first-occurrence block dedup (the C4 line-dedup
    recipe over word blocks) with per-document reassembly of the
    surviving text. Digest-keyed shuffles only; O(blocks) end to end."""
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    blocks_expr = F.expr(
        "transform("
        f"  sequence(0, CAST(ceil(size(split(text, ' ')) / {_BLOCK_WORDS}.0)"
        "    AS INT) - 1),"
        f"  i -> array_join(slice(split(text, ' '), i * {_BLOCK_WORDS} + 1,"
        f"    {_BLOCK_WORDS}), ' '))"
    )
    named = docs.select(
        "doc_id", F.posexplode(blocks_expr).alias("block_idx", "block")
    ).withColumn("block_idx", F.col("block_idx").cast("long"))
    firsts = named.groupBy(F.md5("block").alias("digest")).agg(
        F.min(F.struct("doc_id", "block_idx")).alias("first")
    )
    kept = (
        named.withColumn("digest", F.md5("block"))
        .join(firsts, "digest")
        .filter(
            (F.col("doc_id") == F.col("first.doc_id"))
            & (F.col("block_idx") == F.col("first.block_idx"))
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("block_idx", "block"))),
                    lambda s: s["block"],
                ),
                " ",
            ).alias("dedup_text"),
        )
    )
    totals = docs.select(
        "doc_id",
        F.expr(
            f"CAST(ceil(size(split(text, ' ')) / {_BLOCK_WORDS}.0) AS BIGINT)"
        ).alias("n_blocks"),
    )
    return totals.join(kept, "doc_id", "left").select(
        "doc_id",
        "n_blocks",
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        F.coalesce(F.col("dedup_text"), F.lit("")).alias("dedup_text"),
    )


# -- Deterministic global shuffle --------------------------------------------
# Every document gets (shard, pos): shard = key24 % N_SHARDS, pos = its
# exact rank within the shard under (key24, doc_id). 100 TB shape: a
# row_number() over each whole shard sorts shard-sized data in
# N_SHARDS tasks; instead the key space is cut into _POS_BUCKETS
# contiguous ranges (the key's high bits, so bucket order == key
# order), per-(shard, bucket) counts are prefix-summed on a bounded
# N_SHARDS x _POS_BUCKETS frame, and the exact pos is the bucket offset
# plus a local rank — the classic distributed order-index. Result is
# identical to the naive per-shard row_number (the oracle computes THAT)
# but every sort task holds ~1/_POS_BUCKETS of a shard.

_N_SHARDS = 16
_POS_BUCKETS = 64

_GLOBAL_SHUFFLE_ORACLE = f"""
WITH keyed AS (
    SELECT doc_id, {_key24_duck("shuf1:")} AS k FROM documents
)
SELECT doc_id, k % {_N_SHARDS} AS shard,
       row_number() OVER (
           PARTITION BY k % {_N_SHARDS} ORDER BY k, doc_id) AS pos
FROM keyed
"""


@query(
    "train_global_shuffle",
    tags=("training", "shuffle", "documents", "extension"),
    oracle=_GLOBAL_SHUFFLE_ORACLE,
)
def train_global_shuffle(spark, sf_dir):
    """Deterministic pre-training shuffle: hash-assigned shard + exact
    within-shard position via the distributed order-index pattern
    (bounded range counts -> prefix-sum offsets -> local rank), never a
    whole-shard sort in one task."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id", _key24_spark("shuf1:").alias("k")
    ).select(
        "doc_id",
        "k",
        (F.col("k") % _N_SHARDS).alias("shard"),
        # High bits of k: bucket b's keys all precede bucket b+1's keys.
        F.floor(F.col("k") / (_HASH_SPACE // _POS_BUCKETS)).alias("bucket"),
    )
    counts = keyed.groupBy("shard", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    # Prefix sum over the bounded (shard x bucket) frame — at most
    # N_SHARDS * POS_BUCKETS rows at ANY corpus size.
    w_off = (
        Window.partitionBy("shard")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "shard",
        "bucket",
        F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("offset"),
    )
    w_local = Window.partitionBy("shard", "bucket").orderBy("k", "doc_id")
    return (
        keyed.join(F.broadcast(offsets), ["shard", "bucket"])
        .withColumn("pos", F.col("offset") + F.row_number().over(w_local))
        .select("doc_id", "shard", "pos")
    )


# -- Epoch planning ----------------------------------------------------------
# Per-source repetition counts for a fixed token budget: sources whose
# documents are longer than the corpus mean get proportionally more
# epochs (a stand-in for any externally supplied quality weight), capped
# to [0.5, 2.5] epochs, milli-epoch precision. A document is repeated
# floor(weight) times plus one more iff its hash key falls under the
# fractional part — so a 1.6-epoch source repeats every doc once and a
# deterministic 60% of docs twice. All arithmetic is bigint multiply +
# integer DIV (no float ratio anywhere), so the weight table and every
# draw are bit-identical across engines. 100 TB: one map-combined
# stats agg (|sources| rows), the weight frame broadcasts, the plan
# pass is scan-bound.

_EPOCH_ORACLE = f"""
WITH stats AS (
    SELECT source, COUNT(*) AS n_docs, SUM(n_chars) AS sum_chars
    FROM documents GROUP BY source
), weights AS (
    SELECT source, n_docs,
           least(2500, greatest(500,
               (sum_chars * (SELECT SUM(n_docs) FROM stats) * 1000)
                   // (n_docs * (SELECT SUM(sum_chars) FROM stats))
           )) AS weight_m
    FROM stats
)
SELECT d.source, CAST(w.n_docs AS BIGINT) AS n_docs,
       CAST(w.weight_m AS BIGINT) AS weight_m,
       CAST(SUM(w.weight_m // 1000
                + CASE WHEN {_key24_duck("epoch1:")}
                       < ((w.weight_m % 1000) * {_HASH_SPACE}) // 1000
                  THEN 1 ELSE 0 END) AS BIGINT) AS total_copies,
       CAST(SUM(d.doc_id * (w.weight_m // 1000
                + CASE WHEN {_key24_duck("epoch1:")}
                       < ((w.weight_m % 1000) * {_HASH_SPACE}) // 1000
                  THEN 1 ELSE 0 END)) AS BIGINT) AS copies_id_checksum
FROM documents d JOIN weights w USING (source)
GROUP BY 1, 2, 3
"""


@query(
    "train_epoch_plan",
    tags=("training", "sample", "documents", "extension"),
    oracle=_EPOCH_ORACLE,
)
def train_epoch_plan(spark, sf_dir):
    """Fractional-epoch repetition plan per source (data-derived
    milli-epoch weights, deterministic hash draw for the fractional
    epoch) — integer arithmetic end to end, scan-bound after one
    bounded stats aggregation."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    stats = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("sum_chars")
    )
    # Corpus totals via a whole-frame window over the AGGREGATED stats
    # (one row per source — bounded), same shape as corpus_mixture_sample.
    w = Window.partitionBy()
    weights = (
        stats.withColumn("tot_docs", F.sum("n_docs").over(w))
        .withColumn("tot_chars", F.sum("sum_chars").over(w))
        .select(
            "source",
            "n_docs",
            F.least(
                F.lit(2500).cast("long"),
                F.greatest(
                    F.lit(500).cast("long"),
                    F.expr(
                        "(sum_chars * tot_docs * 1000)"
                        " DIV (n_docs * tot_chars)"
                    ),
                ),
            ).alias("weight_m"),
        )
    )
    key = _key24_spark("epoch1:")
    extra = F.when(
        key < F.expr(f"((weight_m % 1000) * {_HASH_SPACE}) DIV 1000"), 1
    ).otherwise(0)
    n_copies = F.expr("weight_m DIV 1000") + extra
    return (
        docs.join(F.broadcast(weights), "source")
        .groupBy("source", "n_docs", "weight_m")
        .agg(
            F.sum(n_copies).alias("total_copies"),
            F.sum(F.col("doc_id") * n_copies).alias("copies_id_checksum"),
        )
    )


# -- BPE training loop (multi-round) -----------------------------------------
# The full tokenizer-training inner loop, K genuine rounds: count
# adjacent pairs over the CURRENT tokenization, pick the most frequent
# (tie-broken by the injective '|'-joined pair key), re-tokenize the
# whole corpus with a
# leftmost non-overlapping fold, repeat — each round's statistics come
# from the PREVIOUS round's merged corpus, which is what distinguishes
# BPE training from applying K pre-learned merges. Pair keys join
# tokens with '|' (tokens are [a-z0-9]+ or space-joined merges, so '|'
# is unambiguous once merged tokens contain spaces); the merged token
# itself stays space-joined, matching corpus_bpe_apply_merge. 100 TB
# shape per round: pair enumeration is a scan-bound array projection,
# the count is one map-side-combined hash agg + LIMIT 1
# (TakeOrderedAndProject), the fold is a projection against the
# broadcast 1-row winner — K rounds = K bounded shuffles, zero Python,
# zero driver-side frequency tables.

_BPE_ROUNDS = 3


def _bpe_pair_duck(toks: str) -> str:
    return (
        f"unnest(list_transform(range(1, len({toks})),"
        f" i -> {toks}[i] || '|' || {toks}[i+1]))"
    )


def _bpe_oracle() -> str:
    from lhbench_spark.operators import textnorm

    ctes = [f"t0 AS (SELECT doc_id, {textnorm.tokens_duck('text')} AS toks FROM documents)"]
    for r in range(_BPE_ROUNDS):
        # Tie-break on the '|'-joined pair key, which is injective over
        # token pairs; the space-joined merged text is NOT (two distinct
        # pairs of space-bearing merge tokens can render identically in
        # rounds >= 2), so ordering by it would leave a count tie
        # engine-arbitrary.
        ctes.append(
            f"top{r} AS (SELECT string_split(pair, '|')[1] AS pa,"
            f" string_split(pair, '|')[2] AS pb,"
            f" replace(pair, '|', ' ') AS merged"
            f" FROM (SELECT pair"
            f"       FROM (SELECT {_bpe_pair_duck('toks')} AS pair FROM t{r})"
            f"       GROUP BY pair ORDER BY COUNT(*) DESC, pair LIMIT 1))"
        )
        ctes.append(
            f"t{r + 1} AS (SELECT doc_id,"
            " list_reduce("
            "   list_prepend([]::VARCHAR[], list_transform(toks, x -> [x])),"
            "   (acc, x) -> CASE"
            "     WHEN len(acc) > 0 AND acc[-1] = pa AND x[1] = pb"
            "     THEN list_append(list_slice(acc, 1, len(acc) - 1), merged)"
            "     ELSE list_append(acc, x[1]) END"
            f" ) AS toks FROM t{r} CROSS JOIN top{r})"
        )
    rows = " UNION ALL ".join(
        f"SELECT {r + 1} AS round,"
        f" (SELECT merged FROM top{r}) AS merge_pair,"
        f" (SELECT CAST(SUM(len(toks)) AS BIGINT) FROM t{r + 1}) AS tokens_after"
        for r in range(_BPE_ROUNDS)
    )
    return f"WITH {', '.join(ctes)} {rows} ORDER BY round"


@query(
    "train_bpe_loop",
    tags=("training", "tokens", "bpe", "documents", "extension"),
    oracle=_bpe_oracle(),
)
def train_bpe_loop(spark, sf_dir):
    """The BPE tokenizer training loop, three genuine rounds: each
    round counts adjacent pairs over the previous round's re-tokenized
    corpus, merges the winner corpus-wide, and reports the shrinking
    token count — round statistics are data-derived from the merged
    state, not a fixed merge list."""
    from pyspark.sql import functions as F

    from lhbench_spark.operators import fan_out, textnorm

    # CPU-partition the corpus once up front: every round's pair count
    # and fold re-scan this frame (via the per-round checkpoint), and a
    # byte-planned scan of a small-on-disk text table would pin the
    # whole loop to one core (fan_out no-ops at real split counts).
    t = fan_out(table(spark, sf_dir, "documents").select("doc_id", "text")).select(
        "doc_id", F.expr(textnorm.tokens_spark("text")).alias("toks")
    )
    pair_expr = (
        "CASE WHEN size(toks) < 2 THEN array() "
        "ELSE transform(sequence(1, size(toks) - 1), "
        "i -> concat(element_at(toks, i), '|', element_at(toks, i + 1))) END"
    )
    fold_expr = (
        "aggregate(toks, CAST(array() AS array<string>), "
        "(acc, x) -> CASE "
        "WHEN size(acc) > 0 AND element_at(acc, -1) = pa AND x = pb "
        "THEN concat(slice(acc, 1, size(acc) - 1), array(merged)) "
        "ELSE concat(acc, array(x)) END)"
    )
    rounds = []
    for r in range(_BPE_ROUNDS):
        top1 = (
            t.select(F.explode(F.expr(pair_expr)).alias("pair"))
            .groupBy("pair")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(
                "pair",
                "cnt",
                F.replace(F.col("pair"), F.lit("|"), F.lit(" ")).alias("merged"),
            )
            # tie-break on the injective '|'-joined key (see oracle note)
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .select(
                F.split("pair", "\\|").getItem(0).alias("pa"),
                F.split("pair", "\\|").getItem(1).alias("pb"),
                "merged",
            )
        )
        t = t.crossJoin(F.broadcast(top1)).select(
            "doc_id", F.expr(fold_expr).alias("toks"), "merged"
        )
        # Materialize each round's merged state once (lazy
        # localCheckpoint, same policy as train_logreg_fit's feature
        # frame below): without it, round r's pair count AND the final
        # per-round union both re-execute rounds 1..r's crossJoin+fold
        # chain — O(rounds²) fold passes, measured 13.9 s vs ~8 s at
        # sf0.1 for 3 rounds; at a real 30-merge BPE run the quadratic
        # blowup is the whole job. The checkpointed state is the
        # re-tokenized corpus (same scale as the input), and lineage
        # truncation means every downstream pass scans it exactly once.
        t = t.localCheckpoint(eager=False)
        rounds.append(
            t.agg(
                F.lit(r + 1).alias("round"),
                F.first("merged").alias("merge_pair"),
                F.sum(F.size("toks")).cast("bigint").alias("tokens_after"),
            )
        )
        t = t.drop("merged")
    out = rounds[0]
    for extra in rounds[1:]:
        out = out.unionByName(extra)
    return out.orderBy("round")


# -- Distributed logistic-regression training (exact GD loop) ----------------
# The quality-classifier TRAINING side (corpus_quality_classifier applies
# fixed weights; this FITS them): 3 full-batch gradient-descent steps of
# a logistic head over integer text features, with every cross-engine
# number EXACT by construction:
#   - features are integers (bias, n_tokens, n_distinct_tokens, max
#     token length) from the shared tokenizer;
#   - weights live in integer micro-units; the per-row logit
#     z = Σ w_j·x_j is a BIGINT dot product (exact, order-free);
#   - the sigmoid is the smooth cubic surrogate
#     s(z) = 0.5 + (3/8)z − (1/32)z³ clamped to [−2, 2] — multiplications
#     by exact binary constants on bit-identical doubles, so both
#     engines produce the same bits (no libm exp(), whose ulps differ
#     across runtimes);
#   - per-row gradient contributions round to integer micro-units via
#     floor(v·1e6 + 0.5) (identical semantics both engines), so the
#     corpus-wide gradient SUM is a bigint — exact under any summation
#     order — and the weight update is integer DIV (truncation matches
#     '//' in DuckDB, verified).
# 100 TB shape per step: ONE map-side-combined aggregation over the
# corpus (4 bigint sums + 2 counts); only the 4-number weight vector
# leaves the cluster (the codebook-collect pattern of sim_kmeans).
# Accuracy is an integer sign comparison — no float in the metric.

_LR_STEPS = 3
_LR_DIV = 1024  # lr = 1/1024 of the mean gradient, micro-unit integer DIV

# Target: long-document class (n_chars >= 300, near the corpus
# median) — a TEXT-DERIVED label. The synthetic corpus's lang/source
# labels are independent of the token stream by construction (the
# langid queries are oracle-parity demos, not accuracy demos), so a
# label classifier could never move off baseline; the length class is
# genuinely encoded in the features below, and accuracy climbing off
# the ~50% baseline across steps proves the GD mechanics end to end.
# Features: bias; English stopword hits; distinct-token count; max
# token length — each CENTERED by a fixed integer offset (corpus-scale
# medians: 3 / 25 / 8) so the class boundary is reachable without a
# feature-scale-sized bias; centering by integer literals preserves
# exactness. All integers from the shared tokenizer.
_LOGREG_FEATS_DUCK = """
    SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y,
           1 AS x0,
           {en_hits} - 3 AS x1,
           len(list_distinct(toks)) - 25 AS x2,
           COALESCE(list_max(list_transform(toks, t -> length(t))), 0) - 8
               AS x3
    FROM (SELECT n_chars, {toks} AS toks FROM documents)
"""

_LOGREG_SIG = (
    "CASE WHEN {z} <= -2.0 THEN 0.0 WHEN {z} >= 2.0 THEN 1.0 "
    "ELSE 0.5 + {z} * 0.375 - {z} * {z} * {z} * 0.03125 END"
)


def _logreg_oracle() -> str:
    from lhbench_spark.operators import textnorm

    feats = _LOGREG_FEATS_DUCK.format(
        toks=textnorm.tokens_duck("text"),
        en_hits=textnorm.stopword_hits_duck("toks", "en"),
    )
    ctes = [f"feats AS ({feats})", "w0 AS (SELECT 0 AS w0, 0 AS w1, 0 AS w2, 0 AS w3)"]
    for k in range(_LR_STEPS):
        z = f"(CAST(w0*x0 + w1*x1 + w2*x2 + w3*x3 AS DOUBLE) / 1000000.0)"
        s = _LOGREG_SIG.format(z="z")
        ctes.append(
            f"g{k} AS (SELECT "
            + ", ".join(
                f"CAST(SUM(CAST(floor((y - s) * x{j} * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS s{j}"
                for j in range(4)
            )
            + ", COUNT(*) AS n FROM (SELECT y, x0, x1, x2, x3, "
            f"{s} AS s FROM (SELECT *, {z} AS z FROM feats CROSS JOIN w{k})))"
        )
        ctes.append(
            f"w{k + 1} AS (SELECT "
            + ", ".join(
                f"(SELECT w{j} FROM w{k}) + s{j} // (n * {_LR_DIV}) AS w{j}"
                for j in range(4)
            )
            + f" FROM g{k})"
        )
        ctes.append(
            f"a{k + 1} AS (SELECT CAST(SUM(CASE WHEN "
            "(w0*x0 + w1*x1 + w2*x2 + w3*x3 >= 0) = (y = 1) THEN 1 ELSE 0 END) "
            f"AS BIGINT) AS n_correct FROM feats CROSS JOIN w{k + 1})"
        )
    rows = " UNION ALL ".join(
        f"SELECT {k + 1} AS step, w0, w1, w2, w3,"
        f" (SELECT n_correct FROM a{k + 1}) AS n_correct FROM w{k + 1}"
        for k in range(_LR_STEPS)
    )
    return f"WITH {', '.join(ctes)} {rows} ORDER BY step"


@query(
    "train_logreg_fit",
    tags=("training", "classifier", "documents", "extension"),
    oracle=_logreg_oracle(),
)
def train_logreg_fit(spark, sf_dir):
    """Fit the logistic quality/language head with 3 full-batch GD
    steps — bigint dot products, a cubic sigmoid surrogate, micro-unit
    integer weight updates — so the whole training trajectory is exact
    and engine-independent. One aggregation pass per step; only the
    4-number weight vector is collected (codebook pattern)."""
    from pyspark.sql import functions as F

    from lhbench_spark.operators import textnorm

    feats = (
        table(spark, sf_dir, "documents")
        .select(
            F.when(F.col("n_chars") >= 300, 1).otherwise(0).alias("y"),
            F.expr(textnorm.tokens_spark("text")).alias("toks"),
        )
        .select(
            "y",
            F.lit(1).alias("x0"),
            F.expr(textnorm.stopword_hits_spark("toks", "en") + " - 3").alias(
                "x1"
            ),
            F.expr("size(array_distinct(toks)) - 25").alias("x2"),
            F.expr(
                "COALESCE(array_max(transform(toks, t -> length(t))), 0) - 8"
            ).alias("x3"),
        )
    )
    # Materialize the feature frame once: it is 5 small integers per
    # document (label + 4 features), so even at corpus scale it is a
    # tiny fraction of the text it derives from — and every GD pass
    # after this scans the integer frame instead of re-running the
    # tokenizer over the full corpus (measured 12 s -> ~4 s at sf0.1;
    # at 100 TB the difference is the whole job). localCheckpoint
    # (lazy), not cache: same policy as the dedup set-frames —
    # truncates the lineage so the plan cannot re-expand to the text
    # scan, and releases with the session.
    feats = feats.localCheckpoint(eager=False)
    w = [0, 0, 0, 0]
    out_rows = []
    for k in range(_LR_STEPS):
        z = f"(CAST({w[0]}*x0 + {w[1]}*x1 + {w[2]}*x2 + {w[3]}*x3 AS DOUBLE) / 1000000.0)"
        s = _LOGREG_SIG.format(z="z")
        stepped = feats.withColumn("z", F.expr(z)).withColumn("s", F.expr(s))
        sums = stepped.agg(
            *[
                F.sum(
                    F.expr(
                        f"CAST(floor((y - s) * x{j} * 1000000 + 0.5) AS BIGINT)"
                    )
                ).alias(f"s{j}")
                for j in range(4)
            ],
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        n = sums["n"]
        w = [
            w[j] + int(sums[f"s{j}"]) // (n * _LR_DIV)
            if (int(sums[f"s{j}"]) >= 0 or int(sums[f"s{j}"]) % (n * _LR_DIV) == 0)
            else w[j] - (-int(sums[f"s{j}"])) // (n * _LR_DIV)
            for j in range(4)
        ]
        n_correct = feats.filter(
            F.expr(
                f"({w[0]}*x0 + {w[1]}*x1 + {w[2]}*x2 + {w[3]}*x3 >= 0) = (y = 1)"
            )
        ).count()
        out_rows.append((k + 1, w[0], w[1], w[2], w[3], n_correct))
    return spark.createDataFrame(
        out_rows, "step int, w0 bigint, w1 bigint, w2 bigint, w3 bigint, n_correct bigint"
    ).orderBy("step")


# -- Temperature-scaled mixture weights ---------------------------------------
# The multilingual/temperature-sampling staple (alpha = 0.5, i.e.
# p_i ∝ n_i^0.5): upweight small sources, damp the head, without the
# degenerate uniform mixture. Exactness discipline: sqrt on a bigint is
# a correctly-rounded IEEE op (bit-identical across engines — unlike
# exp/ln, which is why the logreg query above uses a polynomial), and
# the weight is then frozen into integer micro-units via
# floor(sqrt(n)·1e6 + 0.5) so the cross-source total is a bigint sum —
# exact under any aggregation order. Every share/boost below is a
# division of identical doubles, so no rounding window exists anywhere.
# 100 TB shape: one map-side-combined count per source, then all
# arithmetic on the source-cardinality frame (bounded domain); the
# global-total window runs over that already-aggregated frame only.

_MIX_TEMP_ORACLE = """
WITH per_src AS (
    SELECT source, COUNT(*) AS n_docs,
           CAST(floor(sqrt(COUNT(*)) * 1000000 + 0.5) AS BIGINT) AS wq
    FROM documents GROUP BY source
)
SELECT source, n_docs,
       ROUND(wq / SUM(wq) OVER (), 9) AS temp_share,
       ROUND(n_docs / SUM(n_docs) OVER (), 9) AS flat_share,
       ROUND((wq / SUM(wq) OVER ()) / (n_docs / SUM(n_docs) OVER ()), 9)
           AS boost
FROM per_src
"""


@query(
    "train_mixture_temperature",
    tags=("training", "mixture", "documents", "extension"),
    oracle=_MIX_TEMP_ORACLE,
)
def train_mixture_temperature(spark, sf_dir):
    """Temperature-scaled source mixture (p_i ∝ n_i^alpha, alpha = 0.5):
    per-source sampling shares that damp the head domain and boost the
    tail, next to the flat (proportional) share and the resulting boost
    factor. See the module comment for the micro-unit exactness
    discipline; the partition-less total window is over the per-source
    aggregate (bounded domain), which the global-window plan lint
    explicitly permits."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    per_src = per_src.withColumn(
        "wq",
        F.floor(F.sqrt(F.col("n_docs")) * F.lit(1000000) + F.lit(0.5)).cast(
            "bigint"
        ),
    )
    w = Window.partitionBy()
    temp_share = F.col("wq") / F.sum("wq").over(w)
    flat_share = F.col("n_docs") / F.sum("n_docs").over(w)
    return per_src.select(
        "source",
        "n_docs",
        F.round(temp_share, 9).alias("temp_share"),
        F.round(flat_share, 9).alias("flat_share"),
        F.round(temp_share / flat_share, 9).alias("boost"),
    )
