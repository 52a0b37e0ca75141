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
