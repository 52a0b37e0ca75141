"""Text-analysis queries over `documents` (north-star extension)."""

from __future__ import annotations

from lhbench_spark.catalog import table
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


@query("text_bpe_tokens", tags=("text", "tokens", "documents"), oracle=_BPE_ORACLE)
def text_bpe_tokens(spark, sf_dir):
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


@query("text_tfidf_topterms", tags=("text", "tfidf", "documents"), oracle=_TFIDF_ORACLE)
def text_tfidf_topterms(spark, sf_dir):
    """Per-document top-3 terms by TF-IDF: one corpus shuffle for term
    frequencies, document frequencies broadcast back (the term dictionary
    is tiny relative to the corpus), window top-k per doc. Emitted for a
    deterministic 20% doc slice to keep output bounded; scores are
    computed over the FULL corpus."""
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    return text_ops.tfidf_top_terms(docs, k=3).filter(F.col("doc_id") % 5 == 0)
