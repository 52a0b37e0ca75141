"""Text normalization / tokenization, dual-dialect.

Shared by dedup and text-analysis operators. Normalization = lowercase,
collapse whitespace, trim — the standard canonicalization step before
exact/near dedup of web-scale corpora.
"""

from __future__ import annotations

TOKEN_RE = "[a-z0-9]+"

# Minimal per-language stopword sets for the n-gram/langid heuristics.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "y", "que", "los"),
    "fr": ("le", "la", "et", "les", "des", "un"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
}


# Explicit ASCII whitespace class {space, \t, \n, \r, \f, \v} and explicit
# space-only trim, semantically identical in both dialects. Three
# cross-engine traps here, all found by the hypothesis parity test
# (tests/test_dialect_parity.py):
# - a bare ``\s`` diverges (Java regex is ASCII-only; DuckDB's RE2 also
#   matches U+00A0);
# - DuckDB's bare trim() strips unicode spaces, Spark's only ' ';
# - the literal ESCAPING differs: Spark's SQL parser processes escapes in
#   the string literal itself (``\x0B`` is not a recognized parser escape
#   and silently becomes the chars ``x0B`` — making '0' whitespace!), so
#   the Spark class spells control chars as parser-level ``\uXXXX``;
#   DuckDB passes backslashes through to RE2, which wants ``\t``-style.
_WS_SPARK = "[ \\u0009\\u000A\\u000D\\u000C\\u000B]+"
_WS_DUCK = "[ \\t\\n\\r\\f\\x0B]+"


def norm_spark(expr: str) -> str:
    return f"trim(BOTH ' ' FROM regexp_replace(lower({expr}), '{_WS_SPARK}', ' '))"


def norm_duck(expr: str) -> str:
    return f"trim(regexp_replace(lower({expr}), '{_WS_DUCK}', ' ', 'g'), ' ')"


def tokens_spark(expr: str) -> str:
    return f"regexp_extract_all(lower({expr}), '{TOKEN_RE}', 0)"


def tokens_duck(expr: str) -> str:
    return f"regexp_extract_all(lower({expr}), '{TOKEN_RE}')"


def shingles_spark(norm: str, n: int = 3) -> str:
    """Distinct character n-gram set over a normalized string expr.
    Guards the degenerate len<n case (whole string as single shingle)."""
    return (
        f"CASE WHEN length({norm}) >= {n} THEN "
        f"array_distinct(transform(sequence(1, length({norm}) - {n - 1}), "
        f"i -> substring({norm}, i, {n}))) "
        f"ELSE array({norm}) END"
    )


def shingles_duck(norm: str, n: int = 3) -> str:
    return (
        f"CASE WHEN length({norm}) >= {n} THEN "
        f"list_distinct(list_transform(range(1, length({norm}) - {n - 2}), "
        f"i -> substr({norm}, CAST(i AS INT), {n}))) "
        f"ELSE [{norm}] END"
    )


def stopword_hits_spark(tokens: str, lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"size(filter({tokens}, t -> t IN ({words})))"


def stopword_hits_duck(tokens: str, lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({tokens}, t -> t IN ({words})))"

def word_shingles_spark(text: str, n: int = 3) -> str:
    """Distinct word n-gram shingles (space-joined token windows) — the
    classic Broder w-shingling unit for document near-dup. ~6x fewer
    shingles per document than character 3-grams at equal text length,
    which cuts both the per-shingle hash cost and the verify-stage
    intersect width. Guarded for < n tokens (whole token list as one
    shingle): Spark's sequence() DESCENDS when the stop is below the
    start, so the guard is dialect-load-bearing too."""
    t = tokens_spark(text)
    return (
        f"CASE WHEN size({t}) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size({t}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({t}, i, {n})))) "
        f"ELSE array(concat_ws(' ', {t})) END"
    )


def word_shingles_duck(text: str, n: int = 3) -> str:
    t = tokens_duck(text)
    # COALESCE: array_to_string of an EMPTY list is NULL in DuckDB while
    # Spark's concat_ws yields '' — found by the parity property test.
    return (
        f"CASE WHEN len({t}) >= {n} THEN "
        f"list_distinct(list_transform(range(1, len({t}) - {n - 2}), "
        f"i -> array_to_string(list_slice({t}, i, i + {n - 1}), ' '))) "
        f"ELSE [COALESCE(array_to_string({t}, ' '), '')] END"
    )
