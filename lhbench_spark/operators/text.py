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
