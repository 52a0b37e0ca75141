"""Text-analysis queries over `documents` (north-star extension)."""

from __future__ import annotations

from lhbench_spark.catalog import table
from lhbench_spark.operators import hashing
from lhbench_spark.operators import text as text_ops
from lhbench_spark.operators import textnorm
from lhbench_spark.queries.registry import query

_TOKS = textnorm.tokens_duck("text")
_NORM = textnorm.norm_duck("text")

_TOKEN_STATS_ORACLE = f"""
SELECT doc_id,
       len({_TOKS}) AS n_tokens,
       len(list_distinct({_TOKS})) AS n_uniq_tokens,
       ROUND(
           CAST(CASE WHEN len({_TOKS}) > 0
                THEN list_aggregate(list_transform({_TOKS}, t -> length(t)), 'sum')
                ELSE 0 END AS DOUBLE)
           / greatest(len({_TOKS}), 1), 6) AS avg_token_len,
       length({_NORM}) AS n_chars_norm
FROM documents
"""


@query("text_token_stats", tags=("text", "documents"), oracle=_TOKEN_STATS_ORACLE)
def text_token_stats(spark, sf_dir):
    """Token counting (regexp tokenizer, JVM-side): counts, uniques,
    average token length, normalized char length. Pure projection —
    no shuffle, scales with scan bandwidth."""
    return text_ops.token_stats(table(spark, sf_dir, "documents"))


# BPE-ish pre-tokenization (the GPT-2 pretokenizer shape): letter runs,
# <=3-digit number chunks, punctuation runs, each optionally space-prefixed.
# Counting THESE (not whitespace words) approximates LLM token budgets —
# the number every curation pipeline sizes its corpus by. The pattern uses
# only alternation + classes + bounded repeats, which Java regex (Spark)
# and RE2 (DuckDB) match identically.
_BPE_PAT = r" ?[a-z]+| ?[0-9]{1,3}| ?[^a-z0-9\s]+|\s+"

_BPE_ORACLE = f"""
SELECT doc_id,
       len(regexp_extract_all(lower(text), ' ?[a-z]+| ?[0-9]{{1,3}}| ?[^a-z0-9\\s]+|\\s+'))
           AS n_subword,
       len({_TOKS}) AS n_word,
       ROUND(CAST(len(regexp_extract_all(lower(text), ' ?[a-z]+| ?[0-9]{{1,3}}| ?[^a-z0-9\\s]+|\\s+')) AS DOUBLE)
           / greatest(len({_TOKS}), 1), 6) AS subword_per_word
FROM documents
"""


@query("corpus_bpe_tokens", tags=("text", "tokens", "documents"), oracle=_BPE_ORACLE)
def corpus_bpe_tokens(spark, sf_dir):
    """BPE-ish subword token counting next to whitespace word counting —
    the LLM-token-budget estimate per document. Pure regexp projection
    (scan-bandwidth bound, no shuffle); identical regex semantics on both
    engines."""
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    n_sub = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(_BPE_PAT), F.lit(0)))
    n_word = F.expr(f"size({textnorm.tokens_spark('text')})")
    return docs.select(
        "doc_id",
        n_sub.alias("n_subword"),
        n_word.alias("n_word"),
        F.round(
            n_sub.cast("double") / F.greatest(n_word, F.lit(1)), 6
        ).alias("subword_per_word"),
    )


def _stop_duck(lang: str) -> str:
    return textnorm.stopword_hits_duck(_TOKS, lang)


_QUALITY_ORACLE = f"""
SELECT doc_id,
       len({_TOKS}) AS n_tokens,
       ROUND(CAST({_stop_duck("en")} AS DOUBLE) / greatest(len({_TOKS}), 1), 6)
           AS stopword_ratio,
       ROUND(CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
           / greatest(length(text), 1), 6) AS alpha_ratio,
       ROUND(CAST(len(list_distinct({_TOKS})) AS DOUBLE) / greatest(len({_TOKS}), 1), 6)
           AS diversity
FROM documents
"""


@query("text_quality_scores", tags=("text", "documents"), oracle=_QUALITY_ORACLE)
def text_quality_scores(spark, sf_dir):
    """Quality heuristics (stopword ratio, alpha ratio, token diversity) —
    the standard cheap filters before expensive model-based scoring."""
    return text_ops.quality_scores(table(spark, sf_dir, "documents"))


def _langid_oracle() -> str:
    hits = {lang: _stop_duck(lang) for lang in textnorm.STOPWORDS}
    best = "greatest(" + ", ".join(hits.values()) + ")"
    whens = "\n           ".join(
        f"WHEN {hits[lang]} = {best} THEN '{lang}'" for lang in textnorm.STOPWORDS
    )
    return f"""
SELECT doc_id,
       CASE WHEN {best} = 0 THEN 'und'
           {whens}
       END AS lang_guess
FROM documents
"""


@query("text_langid", tags=("text", "documents"), oracle=_langid_oracle())
def text_langid(spark, sf_dir):
    """Stopword-hit language ID (n-gram heuristic family): argmax of
    per-language stopword hits with deterministic tie-break order."""
    return text_ops.lang_id(table(spark, sf_dir, "documents"))


_FINGERPRINT_ORACLE = f"""
SELECT doc_id, md5(array_to_string({_TOKS}, ' ')) AS fingerprint
FROM documents
"""


@query("text_fingerprint", tags=("text", "documents"), oracle=_FINGERPRINT_ORACLE)
def text_fingerprint(spark, sf_dir):
    """Canonical token-stream fingerprint (md5 of the normalized token
    join) — layout-insensitive exact dedup key."""
    return text_ops.fingerprints(table(spark, sf_dir, "documents"))


_TFIDF_ORACLE = """
WITH tok AS (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
    FROM documents
), tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
), docfreq AS (
    SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
), n AS (
    SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents
), scored AS (
    SELECT tf.doc_id, tf.term, tf.tf,
           ROUND(tf.tf * ln(CAST(n.n_docs + 1 AS DOUBLE) / (docfreq.df + 1)), 6)
               AS tfidf
    FROM tf JOIN docfreq USING (term) CROSS JOIN n
), ranked AS (
    SELECT doc_id, term, tf, tfidf,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY tfidf DESC, term) AS rnk
    FROM scored
)
SELECT doc_id, term, tf, tfidf, rnk
FROM ranked WHERE rnk <= 3 AND doc_id % 5 = 0
"""


@query("corpus_tfidf_topterms", tags=("text", "tfidf", "documents"), oracle=_TFIDF_ORACLE)
def corpus_tfidf_topterms(spark, sf_dir):
    """Per-document top-3 terms by TF-IDF: one corpus shuffle for term
    frequencies, document frequencies broadcast back (the term dictionary
    is tiny relative to the corpus), window top-k per doc. Emitted for a
    deterministic 20% doc slice to keep output bounded; scores are
    computed over the FULL corpus."""
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    return text_ops.tfidf_top_terms(docs, k=3).filter(F.col("doc_id") % 5 == 0)


# -- Repetition / boilerplate metrics (Gopher-style filters) ---------------
# dup_token_frac and top-2-gram fraction are the standard cheap
# repetition filters before model-based quality scoring. Computed
# ARRAY-SIDE (lambda over the token array) — zero shuffle, scan-bound.
# Trade-off: the top-gram scan is O(uniq x n) per doc, right for bounded
# per-doc token counts (this corpus: <=99). For unbounded web docs the
# explode -> two-level groupBy form is the scale path; same semantics.
_REP_TOKS = "regexp_extract_all(lower(text), '[a-z0-9]+')"
_REP_GRAMS_DUCK = (
    "list_transform(generate_series(1, len(toks) - 1),"
    " i -> toks[i] || ' ' || toks[i + 1])"
)
_REPETITION_ORACLE = f"""
WITH t AS (
    SELECT doc_id, {_REP_TOKS} AS toks FROM documents
), g AS (
    SELECT doc_id, toks, {_REP_GRAMS_DUCK} AS grams FROM t
)
SELECT doc_id,
       len(grams) AS n_2gram,
       CASE WHEN len(grams) = 0 THEN 0 ELSE
           list_max(list_transform(list_distinct(grams),
                                   x -> len(list_filter(grams, y -> y = x))))
       END AS top_2gram_cnt,
       ROUND(CASE WHEN len(grams) = 0 THEN 0.0 ELSE
           CAST(list_max(list_transform(list_distinct(grams),
                    x -> len(list_filter(grams, y -> y = x)))) AS DOUBLE)
           / len(grams) END, 6) AS top_2gram_frac,
       ROUND(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
             / greatest(len(toks), 1), 6) AS dup_token_frac
FROM g
"""


@query("corpus_repetition_filters", tags=("text", "quality", "documents"), oracle=_REPETITION_ORACLE)
def corpus_repetition_filters(spark, sf_dir):
    """Repetition filters: duplicate-token fraction and most-frequent
    2-gram fraction per document, entirely in one JVM projection."""
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents").withColumn(
        "toks", F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    )
    grams = (
        "CASE WHEN size(toks) < 2 THEN CAST(array() AS ARRAY<STRING>) ELSE "
        "transform(sequence(1, size(toks) - 1),"
        " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))) END"
    )
    docs = docs.withColumn("grams", F.expr(grams))
    # Max 2-gram frequency via a sorted-run fold — O(n log n) per row.
    # The distinct×filter formulation is O(n²) per document and was the
    # whole cost of this query (the result, a max frequency, is
    # algorithm-independent, so the oracle is untouched).
    top_cnt = F.expr(
        "CASE WHEN size(grams) = 0 THEN 0 ELSE "
        "aggregate(array_sort(grams), "
        "struct(CAST('' AS STRING) AS prev, 0 AS run, 0 AS best), "
        "(acc, x) -> struct(x AS prev, "
        "CASE WHEN x = acc.prev THEN acc.run + 1 ELSE 1 END AS run, "
        "greatest(acc.best, CASE WHEN x = acc.prev THEN acc.run + 1 ELSE 1 END) AS best), "
        "acc -> acc.best) END"
    )
    return docs.select(
        "doc_id",
        F.size("grams").alias("n_2gram"),
        top_cnt.alias("top_2gram_cnt"),
        F.round(
            F.when(F.size("grams") == 0, F.lit(0.0)).otherwise(
                top_cnt.cast("double") / F.size("grams")
            ),
            6,
        ).alias("top_2gram_frac"),
        F.round(
            1.0
            - F.expr("size(array_distinct(toks))").cast("double")
            / F.greatest(F.size("toks"), F.lit(1)),
            6,
        ).alias("dup_token_frac"),
    )


# -- Deterministic stratified sampling -------------------------------------
# Hash-based Bernoulli sampling with per-stratum rates (downsample the
# dominant language, keep the tail) — the reproducible alternative to
# rand(): keep iff the first 4 hex digits of md5(salt || doc_id) fall
# below the stratum threshold. Fixed-width lowercase hex compares
# lexicographically == numerically, so BOTH engines evaluate the
# identical predicate with zero float math. Stateless per row -> scan-
# bound; the aggregate output is one row per stratum at any corpus size.
_STRAT_KEY = "substr(md5('s1:' || CAST(doc_id AS VARCHAR)), 1, 4)"
_STRAT_THRESH = "CASE WHEN lang = 'en' THEN '2000' ELSE '8000' END"
_STRAT_SAMPLE_ORACLE = f"""
SELECT lang,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN {_STRAT_KEY} < {_STRAT_THRESH} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_sampled,
       CAST(SUM(CASE WHEN {_STRAT_KEY} < {_STRAT_THRESH} THEN doc_id ELSE 0 END)
            AS BIGINT) AS sampled_id_sum
FROM documents
GROUP BY lang
"""


@query("sample_stratified_hash", tags=("sample", "documents", "extension"), oracle=_STRAT_SAMPLE_ORACLE)
def sample_stratified_hash(spark, sf_dir):
    """Deterministic per-stratum Bernoulli sampling (en at ~12.5%, other
    langs at 50%) with an exact-integer membership checksum."""
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    key = F.substring(F.md5(F.concat(F.lit("s1:"), F.col("doc_id").cast("string"))), 1, 4)
    thresh = F.when(F.col("lang") == "en", F.lit("2000")).otherwise(F.lit("8000"))
    keep = key < thresh
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(keep, 1).otherwise(0)).alias("n_sampled"),
        F.sum(F.when(keep, F.col("doc_id")).otherwise(0)).alias("sampled_id_sum"),
    )


# -- Token-window chunking -------------------------------------------------
# Split each document into fixed-size overlapping token windows (size 20,
# stride 15) — the training-data chunking step before tokenize/pack. The
# chunk list is built array-side and exploded: rows out ~= corpus_tokens /
# stride, linear in input, no shuffle (generator fuses into the scan).
_CHUNK_ORACLE = """
WITH t AS (
    SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
    FROM documents WHERE doc_id % 5 = 0
), c AS (
    SELECT doc_id, toks,
           unnest(generate_series(0, (len(toks) - 1) // 15)) AS chunk_idx
    FROM t WHERE len(toks) > 0
)
SELECT doc_id, chunk_idx,
       len(list_slice(toks, chunk_idx * 15 + 1,
                      least(chunk_idx * 15 + 20, len(toks)))) AS n_tok_chunk,
       md5(array_to_string(
           list_slice(toks, chunk_idx * 15 + 1,
                      least(chunk_idx * 15 + 20, len(toks))), ' ')) AS chunk_md5
FROM c
"""


@query("corpus_chunk_windows", tags=("text", "chunking", "documents", "extension"), oracle=_CHUNK_ORACLE)
def corpus_chunk_windows(spark, sf_dir):
    """Overlapping token-window chunking (size 20 / stride 15) with a
    per-chunk content fingerprint."""
    from pyspark.sql import functions as F

    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .withColumn("toks", F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
        .filter(F.expr("size(toks) > 0"))
    )
    chunks = F.expr(
        "transform(sequence(0, (size(toks) - 1) div 15), i -> struct("
        " i AS chunk_idx,"
        " size(slice(toks, i * 15 + 1, 20)) AS n_tok_chunk,"
        " md5(concat_ws(' ', slice(toks, i * 15 + 1, 20))) AS chunk_md5))"
    )
    return docs.select("doc_id", F.explode(chunks).alias("c")).select("doc_id", "c.*")


# -- PII-style redaction (over events.props JSON) --------------------------
# The documents corpus is digit-free, so the redaction surface is the
# events property blob: digit runs -> '#'. Count + redact + length, all
# regexp built-ins; pattern uses only a digit class, which Java regex
# (Spark) and RE2 (DuckDB) treat identically. Bounded by the % 100 slice
# (pushed to the scan); stateless per row at any scale.
_REDACT_ORACLE = """
SELECT event_id,
       len(regexp_extract_all(props, '[0-9]+')) AS n_digit_runs,
       regexp_replace(props, '[0-9]+', '#', 'g') AS redacted,
       length(regexp_replace(props, '[0-9]+', '#', 'g')) AS redacted_len
FROM events WHERE event_id % 100 = 0
"""


@query("corpus_pii_redact", tags=("text", "redact", "events", "extension"), oracle=_REDACT_ORACLE)
def corpus_pii_redact(spark, sf_dir):
    """Digit-run redaction over the JSON props blob — the shape of a PII
    scrubbing pass (count, redacted payload, length)."""
    from pyspark.sql import functions as F

    ev = table(spark, sf_dir, "events").filter(F.col("event_id") % 100 == 0)
    red = F.regexp_replace(F.col("props"), "[0-9]+", "#")
    return ev.select(
        "event_id",
        F.size(F.expr("regexp_extract_all(props, '[0-9]+', 0)")).alias("n_digit_runs"),
        red.alias("redacted"),
        F.length(red).alias("redacted_len"),
    )


# -- Benchmark decontamination --------------------------------------------
# Eval set = doc_id % 29 == 0 within a FIXED id range (a deterministic
# stand-in for a benchmark suite); train = the rest. The range bound is
# what makes the operator's broadcast claim true at scale: a benchmark
# suite has a fixed size, so the eval set must not grow with the corpus
# (a bare % predicate selects a constant ~3.4% FRACTION — a broadcast
# that grows linearly with corpus size). At the test SFs (doc_id < 100k)
# the bound is inactive, so the selected set is unchanged. A train doc is
# contaminated when it shares >= 1 distinct word 5-gram with any eval
# doc. The oracle recomputes the same gram hashes (same H32, same
# windows) relationally.
_DECON_N = 5
_DECON_EVAL_PRED = "doc_id % 29 = 0 AND doc_id < 100000"


def _decon_oracle() -> str:
    from lhbench_spark.operators.text import _word_grams_duck

    grams = _word_grams_duck("t", _DECON_N)
    return f"""
WITH tok AS (
    SELECT doc_id, {_TOKS} AS t FROM documents
), g AS (
    SELECT doc_id, {grams} AS gs FROM tok
), ev AS (
    SELECT DISTINCT unnest(gs) AS _g FROM g WHERE {_DECON_EVAL_PRED}
), tg AS (
    SELECT doc_id, unnest(gs) AS _g FROM g WHERE NOT ({_DECON_EVAL_PRED})
), hits AS (
    SELECT tg.doc_id, COUNT(*) AS hits
    FROM tg JOIN ev USING (_g)
    GROUP BY tg.doc_id
)
SELECT COUNT(*) AS n_flagged,
       CAST(SUM(hits) AS BIGINT) AS total_hits,
       CAST(MAX(hits) AS BIGINT) AS max_hits,
       CAST(MIN(doc_id) AS BIGINT) AS first_flagged
FROM hits
"""


@query(
    "corpus_decontaminate",
    tags=("text", "decontamination", "ngram", "documents"),
    oracle=_decon_oracle(),
)
def corpus_decontaminate(spark, sf_dir):
    """Training-corpus decontamination: flag train docs sharing distinct
    word 5-grams with the (broadcast) eval set — the standard
    n-gram-overlap guard against benchmark leakage. Returns the bounded
    aggregate fingerprint of the flagged set."""
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    eval_df = docs.filter(F.expr(_DECON_EVAL_PRED))
    train = docs.filter(~F.expr(_DECON_EVAL_PRED))
    hits = text_ops.contamination_hits(train, eval_df, n=_DECON_N)
    return hits.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_flagged"),
        F.sum("hits").cast("bigint").alias("total_hits"),
        F.max("hits").cast("bigint").alias("max_hits"),
        F.min("doc_id").cast("bigint").alias("first_flagged"),
    )


def _curation_oracle() -> str:
    hits = {lang: _stop_duck(lang) for lang in textnorm.STOPWORDS}
    best = "greatest(" + ", ".join(hits.values()) + ")"
    whens = "\n               ".join(
        f"WHEN {hits[lang]} = {best} THEN '{lang}'" for lang in textnorm.STOPWORDS
    )
    return f"""
WITH scored AS (
    SELECT doc_id, text,
           len({_TOKS}) AS n_tokens,
           ROUND(CAST(len(list_distinct({_TOKS})) AS DOUBLE)
               / greatest(len({_TOKS}), 1), 6) AS diversity,
           CASE WHEN {best} = 0 THEN 'und'
               {whens}
           END AS lang_guess
    FROM documents
), survivors AS (
    SELECT * FROM scored
    WHERE n_tokens >= 20 AND diversity >= 0.3 AND lang_guess <> 'und'
), keepers AS (
    SELECT MIN(doc_id) AS doc_id
    FROM (SELECT doc_id, {_NORM} AS t FROM survivors) n
    GROUP BY t
)
SELECT s.lang_guess,
       COUNT(*) AS n_docs,
       CAST(SUM(s.n_tokens) AS BIGINT) AS total_tokens,
       ROUND(CAST(SUM(s.n_tokens) AS DOUBLE) / COUNT(*), 6) AS avg_tokens
FROM survivors s JOIN keepers k ON s.doc_id = k.doc_id
GROUP BY s.lang_guess
"""


@query(
    "corpus_curation_pipeline",
    tags=("text", "pipeline", "dedup", "documents"),
    oracle=_curation_oracle(),
)
def corpus_curation_pipeline(spark, sf_dir):
    """End-to-end corpus curation in ONE plan — the composition a
    training-data pipeline actually runs, not isolated operators:
    quality scoring (token count + diversity) → language ID → quality/
    language gates → exact dedup among the SURVIVORS (keep lowest id) →
    per-language corpus stats. Every stage is a JVM projection or one
    hash aggregation; the only shuffles are the dedup groupBy and the
    final language rollup. The oracle recomputes the identical staged
    pipeline, so stage ORDER (dedup after filtering) is value-checked
    too."""
    from pyspark.sql import functions as F

    from lhbench_spark.operators import dedup

    docs = table(spark, sf_dir, "documents")
    q = text_ops.quality_scores(docs).select("doc_id", "n_tokens", "diversity")
    l = text_ops.lang_id(docs)
    survivors = (
        docs.join(q, "doc_id")
        .join(l, "doc_id")
        .filter(
            (F.col("n_tokens") >= 20)
            & (F.col("diversity") >= 0.3)
            & (F.col("lang_guess") != "und")
        )
    )
    keep = dedup.exact_dedup_keepers(survivors).select(
        F.col("keep_id").alias("doc_id")
    )
    curated = survivors.join(keep, "doc_id", "left_semi")
    return curated.groupBy("lang_guess").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(
            F.sum("n_tokens").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_tokens"),
    )


_BPE_MERGE_K = 25

_BPE_MERGE_ORACLE = f"""
WITH t AS (
    SELECT {_TOKS} AS toks FROM documents
), p AS (
    SELECT unnest(list_transform(range(1, len(toks)),
                                 i -> toks[i] || ' ' || toks[i+1])) AS pair
    FROM t
)
SELECT pair, COUNT(*) AS cnt
FROM p GROUP BY 1
ORDER BY cnt DESC, pair
LIMIT {_BPE_MERGE_K}
"""


@query(
    "corpus_bpe_merge_step",
    tags=("text", "tokens", "bpe", "documents"),
    oracle=_BPE_MERGE_ORACLE,
)
def corpus_bpe_merge_step(spark, sf_dir):
    """One BPE training step, distributed: corpus-wide adjacent-token-pair
    frequencies, top-25 merge candidates (tie-broken by pair text — BPE
    picks the most frequent pair each round; a full training loop re-runs
    this with the merged vocab). Shape at 100 TB: the pair enumeration is
    a per-row array projection (scan-bound, no Python), the count is ONE
    hash agg with map-side combine (shuffle = distinct pairs × partitions,
    not corpus positions), and the top-k plans TakeOrderedAndProject —
    no global sort, no driver-side frequency table."""
    from pyspark.sql import functions as F

    from lhbench_spark.operators import fan_out

    toks = textnorm.tokens_spark("text")
    pairs = (
        fan_out(table(spark, sf_dir, "documents").select("text"))
        .select(F.expr(toks).alias("t"))
        .select(
            F.explode(
                F.expr(
                    "CASE WHEN size(t) < 2 THEN array() "
                    "ELSE transform(sequence(1, size(t) - 1), "
                    "i -> concat(element_at(t, i), ' ', element_at(t, i + 1))) END"
                )
            ).alias("pair")
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(_BPE_MERGE_K)
    )


# CCNet-style LM perplexity filter (Wenzek et al., "CCNet: Extracting High
# Quality Monolingual Datasets from Web Crawl Data"): score every document
# with a small LM, split the corpus into head/middle/tail quality buckets
# at corpus percentiles. The LM here is the char-bigram model trained on
# the corpus itself (operators/text.py charlm_perplexity); the bucket
# split uses EXACT quartiles over the integer-scaled perplexity — dyadic
# fractions (0.25/0.75) over integers interpolate engine-exactly (the
# agg_percentiles_exact precedent). Exact percentile materializes the
# value multiset; at 100 TB the split thresholds come from approx
# percentile on a sample instead — the bounded-cardinality exact form is
# the oracle-checkable twin.
_CHARLM_ORACLE = """
WITH d AS (
    SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')) AS s
    FROM documents
), d2 AS (
    SELECT doc_id, s FROM d WHERE length(s) >= 2
), bg AS (
    SELECT doc_id, substring(s, CAST(i AS INTEGER), 2) AS bg
    FROM d2, UNNEST(range(1, length(s))) AS t(i)
), doc_bg AS (
    SELECT doc_id, bg, COUNT(*) AS n FROM bg GROUP BY 1, 2
), corpus AS (
    SELECT bg, SUM(n) AS cnt FROM doc_bg GROUP BY 1
), ctx AS (
    SELECT substring(bg, 1, 1) AS c1, SUM(cnt) AS ctx_cnt FROM corpus GROUP BY 1
), probs AS (
    SELECT bg,
           ROUND(ln((CAST(cnt AS DOUBLE) + 1.0)
                    / (CAST(ctx_cnt AS DOUBLE) + 27.0)), 9) AS logp
    FROM corpus JOIN ctx ON substring(corpus.bg, 1, 1) = ctx.c1
), scored AS (
    SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
           ROUND(CAST(SUM(CAST(n * logp AS DECIMAL(18,8))) AS DOUBLE)
                 / SUM(n), 6) AS mean_logp
    FROM doc_bg JOIN probs USING (bg) GROUP BY doc_id
), pp AS (
    SELECT doc_id, n_bigrams, mean_logp,
           ROUND(exp(-mean_logp), 4) AS ppl
    FROM scored
), pp2 AS (
    SELECT *, CAST(ROUND(ppl * 10000, 0) AS BIGINT) AS ppl_m FROM pp
), th AS (
    SELECT quantile_cont(ppl_m, 0.25) AS p25,
           quantile_cont(ppl_m, 0.75) AS p75
    FROM pp2
)
SELECT doc_id, n_bigrams, mean_logp, ppl,
       CASE WHEN ppl_m <= p25 THEN 'head'
            WHEN ppl_m <= p75 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM pp2, th
"""


@query(
    "corpus_charlm_perplexity",
    tags=("text", "quality", "lm", "documents", "extension"),
    oracle=_CHARLM_ORACLE,
)
def corpus_charlm_perplexity(spark, sf_dir):
    """LM-perplexity quality filter (the CCNet recipe): train a
    char-bigram LM on the corpus (one bounded-output hash agg), score
    every document (projection + broadcast of the <=729-row probability
    table + decimal sum), bucket into head/middle/tail at exact corpus
    quartiles of the integer-scaled perplexity. Every stage's shuffle is
    O(docs) or O(alphabet²) — nothing is O(characters) past the map side."""
    from pyspark.sql import functions as F

    # Materialize the scored frame once: the exact-quartile agg below and
    # the final bucket projection both consume it, and without the
    # checkpoint the whole train-and-score lineage (bigram LM hash agg +
    # broadcast + decimal sums) runs twice — once inside the broadcast
    # threshold subquery, once for the output. O(docs) rows of 5 scalars.
    scored = (
        text_ops.charlm_perplexity(table(spark, sf_dir, "documents"))
        .withColumn("ppl_m", F.round(F.col("ppl") * 10000, 0).cast("bigint"))
        .localCheckpoint()
    )
    th = scored.agg(
        F.expr("percentile(ppl_m, 0.25D)").alias("p25"),
        F.expr("percentile(ppl_m, 0.75D)").alias("p75"),
    )
    return scored.crossJoin(F.broadcast(th)).select(
        "doc_id",
        "n_bigrams",
        "mean_logp",
        "ppl",
        F.when(F.col("ppl_m") <= F.col("p25"), F.lit("head"))
        .when(F.col("ppl_m") <= F.col("p75"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


# Model-based quality classifier (the fastText-classifier step in LLM
# curation pipelines — e.g. GPT-3/LLaMA "quality filtering"): a logistic
# head over the cheap heuristic features. Weights are fixed constants (a
# trained model's coefficients load the same way); the ENTIRE scorer is
# one JVM-side projection — at 100 TB it runs at scan bandwidth, no
# shuffle, no Python. Engine-exactness: both engines evaluate the SAME
# arithmetic text over identical round-6 features (shared _CLF_Z below),
# ln is rounded to 9 decimals before use, and the sigmoid output is
# rounded to 6.
_CLF_Z = (
    "-4.0 + 6.0 * stopword_ratio + 1.5 * alpha_ratio"
    " + 3.0 * diversity + 0.35 * ln_len"
)

_CLF_ORACLE = f"""
WITH feats AS ({_QUALITY_ORACLE}),
z AS (
    SELECT doc_id, {_CLF_Z} AS z
    FROM (SELECT *, ROUND(ln(n_tokens + 1), 9) AS ln_len FROM feats) f
)
SELECT doc_id,
       ROUND(1.0 / (1.0 + exp(-z)), 6) AS score,
       ROUND(1.0 / (1.0 + exp(-z)), 6) >= 0.5 AS kept
FROM z
"""


@query(
    "corpus_quality_classifier",
    tags=("text", "quality", "classifier", "documents", "extension"),
    oracle=_CLF_ORACLE,
)
def corpus_quality_classifier(spark, sf_dir):
    """Logistic quality classifier over heuristic text features — the
    model-based keep/drop gate after the cheap rule filters. Pure
    projection (scan-bound); the linear head's arithmetic text is shared
    verbatim with the oracle so both engines evaluate identical IEEE
    operation sequences."""
    from pyspark.sql import functions as F

    feats = text_ops.quality_scores(table(spark, sf_dir, "documents"))
    z = feats.withColumn(
        "ln_len", F.round(F.expr("ln(n_tokens + 1)"), 9)
    ).withColumn("z", F.expr(_CLF_Z))
    return z.select(
        "doc_id",
        F.round(F.expr("1.0 / (1.0 + exp(-z))"), 6).alias("score"),
        (F.round(F.expr("1.0 / (1.0 + exp(-z))"), 6) >= 0.5).alias("kept"),
    )


# Feature hashing (the "hashing trick", Weinberger et al. 2009): project
# an unbounded vocabulary into a fixed-dimension signed feature space
# with ZERO driver state — no vocabulary dictionary to build, broadcast,
# or keep consistent across a 100 TB corpus, which is why large-scale
# text classifiers vectorize this way. dim = H32(token) % D, sign from
# an independent hash bit; per-(doc, dim) weight = Σ sign · tf (pure
# integer arithmetic — exact on both engines). Two hash aggs (tf, then
# dim roll-up) + one doc-norm join; shuffle rows are bounded by docs × D.
_FHASH_D = 64

def _fhash_duck() -> str:
    h = hashing.h32_duck("tok")
    return f"""
WITH tok AS (
    SELECT doc_id, unnest({textnorm.tokens_duck("text")}) AS tok
    FROM documents
), tf AS (
    SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY 1, 2
), hashed AS (
    SELECT doc_id,
           {h} % {_FHASH_D} AS dim,
           (({h} // 256) % 2) * 2 - 1 AS sign,
           tf
    FROM tf
), feat AS (
    SELECT doc_id, dim, CAST(SUM(sign * tf) AS BIGINT) AS weight
    FROM hashed GROUP BY 1, 2
), nrm AS (
    SELECT doc_id, ROUND(sqrt(CAST(SUM(weight * weight) AS DOUBLE)), 6) AS doc_norm
    FROM feat GROUP BY 1
)
SELECT f.doc_id, f.dim, f.weight, n.doc_norm
FROM feat f JOIN nrm n USING (doc_id)
WHERE f.weight != 0
"""


@query(
    "corpus_hashed_features",
    tags=("text", "features", "hashing-trick", "documents", "extension"),
    oracle=_fhash_duck(),
)
def corpus_hashed_features(spark, sf_dir):
    """Signed feature hashing into a fixed 64-dim space (long format:
    one row per non-zero (doc, dim) weight, plus the doc's L2 norm).
    No vocabulary state anywhere — the dictionary IS the hash."""
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id",
            F.explode(F.expr(textnorm.tokens_spark("text"))).alias("tok"),
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    h = F.expr(hashing.h32_spark("tok"))
    # Bit-8 sign via integer shift, NOT float division: (h / 256) is a
    # DOUBLE and only floor-matches the oracle's integer // while the
    # hash fits the 53-bit mantissa — widening to h64 would silently
    # break parity. shiftright stays exact at any hash width.
    hashed = tf.select(
        "doc_id",
        (h % _FHASH_D).alias("dim"),
        ((F.shiftright(h, 8) % 2) * 2 - 1).alias("sign"),
        "tf",
    )
    feat = hashed.groupBy("doc_id", "dim").agg(
        F.sum(F.col("sign") * F.col("tf")).cast("bigint").alias("weight")
    )
    nrm = feat.groupBy("doc_id").agg(
        F.round(
            F.sqrt(F.sum(F.col("weight") * F.col("weight")).cast("double")), 6
        ).alias("doc_norm")
    )
    return (
        feat.join(nrm, "doc_id")
        .filter(F.col("weight") != 0)
        .select("doc_id", "dim", "weight", "doc_norm")
    )


# BPE merge APPLICATION — the other half of the tokenizer training loop
# (corpus_bpe_merge_step counts pair frequencies; this applies the
# winning merge). The per-doc re-tokenization is a left fold over the
# token array replacing leftmost non-overlapping (a, b) adjacencies with
# the merged symbol — both engines fold arrays left-to-right (Spark
# aggregate(), DuckDB list_reduce with a prepended seed), so the merge
# positions are identical by construction. The winning pair is
# data-derived (top-1 by count, tie-broken by pair text) and rides in as
# a 1-row cross join — aggregated, hence broadcast-legal. Output is the
# corpus-level census of the merge round: exact integer token counts
# before/after. A full BPE train loop re-runs this pair of queries per
# merge.
_BPE_APPLY_ORACLE = f"""
WITH t AS (
    SELECT doc_id, {_TOKS} AS toks FROM documents
), p AS (
    SELECT unnest(list_transform(range(1, len(toks)),
                                 i -> toks[i] || ' ' || toks[i+1])) AS pair
    FROM t
), top1 AS (
    SELECT string_split(pair, ' ')[1] AS pa, string_split(pair, ' ')[2] AS pb,
           pair AS merged
    FROM (SELECT pair, COUNT(*) AS cnt FROM p GROUP BY 1
          ORDER BY cnt DESC, pair LIMIT 1)
), applied AS (
    SELECT doc_id, len(toks) AS n_before,
           len(list_reduce(
               list_prepend([]::VARCHAR[], list_transform(toks, x -> [x])),
               (acc, x) -> CASE
                   WHEN len(acc) > 0 AND acc[-1] = pa AND x[1] = pb
                   THEN list_append(list_slice(acc, 1, len(acc) - 1), merged)
                   ELSE list_append(acc, x[1]) END
           )) AS n_after,
           merged
    FROM t CROSS JOIN top1
)
SELECT merged AS merge_pair,
       COUNT(*) AS n_docs,
       CAST(SUM(n_before) AS BIGINT) AS tokens_before,
       CAST(SUM(n_after) AS BIGINT) AS tokens_after,
       CAST(SUM(n_before - n_after) AS BIGINT) AS n_merges,
       CAST(SUM(CASE WHEN n_after < n_before THEN 1 ELSE 0 END) AS BIGINT)
           AS docs_touched
FROM applied
GROUP BY merged
"""


@query(
    "corpus_bpe_apply_merge",
    tags=("text", "tokens", "bpe", "documents", "extension"),
    oracle=_BPE_APPLY_ORACLE,
)
def corpus_bpe_apply_merge(spark, sf_dir):
    """Apply one learned BPE merge across the corpus: find the most
    frequent adjacent pair, re-tokenize every document with a leftmost
    non-overlapping fold, report the exact corpus-level merge census."""
    from pyspark.sql import functions as F

    from lhbench_spark.operators import fan_out

    docs = table(spark, sf_dir, "documents")
    # CPU-partition before tokenize, then materialize the tokenized
    # corpus ONCE: the pair census (inside the broadcast top-1 subquery)
    # and the apply-fold projection both consume it, and without the
    # checkpoint the full tokenization runs twice per invocation.
    t = (
        fan_out(docs.select("doc_id", "text"))
        .select("doc_id", F.expr(textnorm.tokens_spark("text")).alias("toks"))
        .localCheckpoint()
    )
    pairs = t.select(
        F.explode(
            F.expr(
                "CASE WHEN size(toks) < 2 THEN array() "
                "ELSE transform(sequence(1, size(toks) - 1), "
                "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))) END"
            )
        ).alias("pair")
    )
    top1 = (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(1)
        .select(
            F.split("pair", " ").getItem(0).alias("pa"),
            F.split("pair", " ").getItem(1).alias("pb"),
            F.col("pair").alias("merged"),
        )
    )
    applied = t.crossJoin(F.broadcast(top1)).select(
        "doc_id",
        F.size("toks").alias("n_before"),
        F.size(
            F.expr(
                "aggregate(toks, CAST(array() AS array<string>), "
                "(acc, x) -> CASE "
                "WHEN size(acc) > 0 AND element_at(acc, -1) = pa AND x = pb "
                "THEN concat(slice(acc, 1, size(acc) - 1), array(merged)) "
                "ELSE concat(acc, array(x)) END)"
            )
        ).alias("n_after"),
        "merged",
    )
    return applied.groupBy(F.col("merged").alias("merge_pair")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_before").cast("bigint").alias("tokens_before"),
        F.sum("n_after").cast("bigint").alias("tokens_after"),
        F.sum(F.col("n_before") - F.col("n_after")).cast("bigint").alias("n_merges"),
        F.sum(F.when(F.col("n_after") < F.col("n_before"), 1).otherwise(0))
        .cast("bigint")
        .alias("docs_touched"),
    )
