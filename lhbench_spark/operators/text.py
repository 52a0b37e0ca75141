"""Text-analysis operators: token stats, quality scoring, language ID,
document fingerprinting. All built-ins (regexp + higher-order functions),
all expressible in the DuckDB oracle dialect for exact verification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lhbench_spark.operators import textnorm


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens, n_uniq_tokens, avg_token_len, n_chars_norm)."""
    toks = textnorm.tokens_spark(text_col)
    norm = textnorm.norm_spark(text_col)
    return df.select(
        F.col(id_col),
        F.expr(f"size({toks})").alias("n_tokens"),
        F.expr(f"size(array_distinct({toks}))").alias("n_uniq_tokens"),
        F.round(
            F.expr(
                f"aggregate({toks}, 0L, (acc, t) -> acc + length(t))"
            ).cast("double")
            / F.greatest(F.expr(f"size({toks})"), F.lit(1)),
            6,
        ).alias("avg_token_len"),
        F.expr(f"length({norm})").alias("n_chars_norm"),
    )


def quality_scores(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality features: stopword ratio, alpha ratio, token
    diversity. Ratios are int/int double divisions — engine-exact."""
    toks = textnorm.tokens_spark(text_col)
    n_tok = F.greatest(F.expr(f"size({toks})"), F.lit(1))
    stop_hits = F.expr(textnorm.stopword_hits_spark(toks, "en"))
    alpha_chars = F.expr(f"length(regexp_replace(lower({text_col}), '[^a-z]', ''))")
    total_chars = F.greatest(F.expr(f"length({text_col})"), F.lit(1))
    uniq = F.expr(f"size(array_distinct({toks}))")
    return df.select(
        F.col(id_col),
        F.expr(f"size({toks})").alias("n_tokens"),
        F.round(stop_hits.cast("double") / n_tok, 6).alias("stopword_ratio"),
        F.round(alpha_chars.cast("double") / total_chars, 6).alias("alpha_ratio"),
        F.round(uniq.cast("double") / n_tok, 6).alias("diversity"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-hit language guess (argmax over per-language hit counts,
    deterministic tie-break by fixed language order, 'und' when no hits)."""
    toks = textnorm.tokens_spark(text_col)
    hits = {
        lang: F.expr(textnorm.stopword_hits_spark(toks, lang))
        for lang in textnorm.STOPWORDS
    }
    best = F.greatest(*hits.values())
    guess = F.when(best == 0, F.lit("und"))
    for lang in textnorm.STOPWORDS:  # insertion order = tie-break order
        guess = guess.when(hits[lang] == best, F.lit(lang))
    return df.select(F.col(id_col), guess.alias("lang_guess"))


def fingerprints(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Canonical document fingerprint: md5 over the token-normalized form
    (robust to whitespace/punctuation layout, not to word changes)."""
    toks = textnorm.tokens_spark(text_col)
    return df.select(
        F.col(id_col),
        F.md5(F.expr(f"array_join({toks}, ' ')")).alias("fingerprint"),
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-k terms by TF-IDF.

    Plan: explode tokens → (doc, term, tf) hash agg (one shuffle) →
    document frequency per term (agg over the tf table, broadcast back) →
    idf = ln((N+1)/(df+1)) → window top-k per doc. The term dictionary is
    orders of magnitude smaller than the corpus, so the df side always
    broadcasts; corpus-side data shuffles exactly once. Ties broken by
    term ASC (deterministic)."""
    toks = textnorm.tokens_spark(text_col)
    exploded = df.select(
        F.col(id_col), F.explode(F.expr(toks)).alias("term")
    )
    # Materialize the tf table once: both the document-frequency agg
    # (broadcast side) and the scored join consume it — without the
    # checkpoint the explode + hash-agg shuffle runs twice. At scale
    # this is the materialized term-frequency table every IR pipeline
    # keeps anyway.
    tf = (
        exploded.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    docfreq = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(docfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1).cast("double") / (F.col("df") + 1)),
                6,
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(id_col, "term", "tf", "tfidf", "rnk")
    )


def _word_grams_spark(tok_array_col: str, n: int) -> str:
    """Spark expr: distinct H32 hashes of word n-grams over a PRE-COMPUTED
    token-array column (tokens materialized once — the regex must not be
    re-evaluated per window). Guarded for < n tokens: an unguarded
    sequence(1, size-n+1) DESCENDS when size < n in Spark (DuckDB's
    range() returns empty), so the guard is a dialect-parity requirement
    as well as a semantic one."""
    from lhbench_spark.operators import hashing

    gram = hashing.h32_spark(f"concat_ws(' ', slice({tok_array_col}, i, {n}))")
    return (
        f"CASE WHEN size({tok_array_col}) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size({tok_array_col}) - {n - 1}), "
        f"i -> {gram})) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
    )


def _word_grams_duck(tok_list_expr: str, n: int) -> str:
    """DuckDB twin of :func:`_word_grams_spark` (same H32, same windows)."""
    from lhbench_spark.operators import hashing

    gram = hashing.h32_duck(
        f"array_to_string(list_slice({tok_list_expr}, i, i + {n - 1}), ' ')"
    )
    return (
        f"CASE WHEN len({tok_list_expr}) >= {n} THEN "
        f"list_distinct(list_transform(range(1, len({tok_list_expr}) - {n - 2}), "
        f"i -> {gram})) "
        f"ELSE []::BIGINT[] END"
    )


def contamination_hits(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: per train doc, the number of DISTINCT
    word n-grams it shares with ANY eval-set document.

    The standard guard against eval leakage in a training corpus
    (n-gram-overlap decontamination). Plan shape for 100 TB: the eval
    side is a benchmark suite — thousands of docs, not billions — so its
    distinct gram-hash set broadcasts; the train side explodes to
    (doc, gram) and the join + count is one shuffle on the train side
    only. The broadcast hint is a CONTRACT on the caller: eval_df must be
    bounded independently of corpus size (a fixed id range / an actual
    benchmark table), never a fixed *fraction* of the corpus. Output:
    (doc_id, hits), only docs with >= 1 hit."""
    toks = textnorm.tokens_spark(text_col)

    def grams(df: DataFrame) -> DataFrame:
        tokenized = df.select(F.col(id_col).alias("_id"), F.expr(toks).alias("_t"))
        return tokenized.select(
            "_id", F.explode(F.expr(_word_grams_spark("_t", n))).alias("_g")
        )

    eval_grams = grams(eval_df).select("_g").distinct()
    return (
        grams(train)
        .join(F.broadcast(eval_grams), "_g")
        .groupBy(F.col("_id").alias(id_col))
        .agg(F.count(F.lit(1)).alias("hits"))
    )


def charlm_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alphabet_size: int = 27,
) -> DataFrame:
    """Character-bigram language-model perplexity per document — the
    CCNet-style LM quality filter (train a small LM on/for the corpus,
    score every document, keep the low-perplexity head).

    Two aggregation passes over one normalized projection, all JVM-side:

    1. TRAIN — per-doc bigram counts (``explode`` + hash agg; partial
       aggregation collapses each doc to <= alphabet² rows map-side, so
       the shuffle is O(docs · distinct-bigrams), never O(chars)), then
       a corpus-level roll-up whose output is bounded by alphabet²
       (<= 729 rows at a-z+space) — metadata-sized at ANY corpus size.
    2. SCORE — join the per-doc counts against the (hint-legal, bounded)
       broadcast probability table and decimal-sum ``n · log P`` per doc.

    Laplace-smoothed conditional probability
    ``P(c2|c1) = (count(c1c2)+1) / (count(c1·)+alphabet_size)``.
    Engine-exactness: log-probs are rounded to 9 decimals before the
    order-independent decimal sum (kills the 1-ulp libm ``ln`` skew
    between JVM and any oracle), the per-doc mean is one double division
    of identical operands, and perplexity = round(exp(-mean), 4).

    Returns (id, n_bigrams, mean_logp, ppl)."""
    from lhbench_spark.functions.numeric import dsum

    from lhbench_spark.operators import fan_out

    s = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]+", " "))
    # CPU-partition the corpus before the O(chars) normalize+explode:
    # byte-sized split planning puts a small-on-disk text table on one
    # core (fan_out is a no-op once the scan has enough splits).
    d = (
        fan_out(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), s.alias("_s"))
        .filter(F.length("_s") >= 2)
    )
    # TWO consumers (the corpus roll-up feeding the broadcast probability
    # table, and the score join): without a materialization the O(chars)
    # normalize + explode + two-level hash agg runs once per consumer —
    # the train pass re-reads the whole corpus to build a ≤729-row table.
    # Lazy DISK_ONLY localCheckpoint: the frame is O(docs · distinct
    # bigrams) — corpus-sized, so it must not pin executor storage memory
    # at 100 TB (same policy as the DML rewrite sets in tables.py).
    from pyspark import StorageLevel

    doc_bg = (
        d.select(
            id_col,
            F.explode(
                F.expr("transform(sequence(1, length(_s) - 1), i -> substring(_s, i, 2))")
            ).alias("bg"),
        )
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    )
    corpus = doc_bg.groupBy("bg").agg(F.sum("n").alias("cnt"))
    ctx = corpus.groupBy(F.substring("bg", 1, 1).alias("c1")).agg(
        F.sum("cnt").alias("ctx_cnt")
    )
    probs = (
        corpus.withColumn("c1", F.substring("bg", 1, 1))
        .join(ctx, "c1")
        .select(
            "bg",
            F.round(
                F.log(
                    (F.col("cnt").cast("double") + 1.0)
                    / (F.col("ctx_cnt").cast("double") + float(alphabet_size))
                ),
                9,
            ).alias("logp"),
        )
    )
    return (
        doc_bg.join(F.broadcast(probs), "bg")
        .groupBy(id_col)
        .agg(
            F.sum("n").alias("n_bigrams"),
            F.round(dsum(F.col("n") * F.col("logp")) / F.sum("n"), 6).alias(
                "mean_logp"
            ),
        )
        .withColumn("ppl", F.round(F.exp(-F.col("mean_logp")), 4))
    )
