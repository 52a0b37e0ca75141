"""Property-based parity tests for the dual-dialect expression generators.

Every dedup/similarity oracle rests on one invariant: the Spark SQL and
DuckDB renderings of the same operator (normalization, shingling, H32,
MinHash, SimHash, LSH band keys) compute IDENTICAL values. These tests
drive both engines over hypothesis-generated inputs and assert equality —
so a dialect divergence (regex class semantics, hex parsing, integer
overflow) fails here before it poisons an oracle.

Engines are driven directly: Spark evaluates the *_spark expression over
a literal column; DuckDB evaluates the *_duck expression over the same
literal. No parquet round-trip — this isolates the expression semantics.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lhbench_spark.operators import hashing, textnorm

# Printable-ish text incl. whitespace runs; quotes/backslash excluded
# (the generators embed strings as SQL literals only in this test; the
# production path binds columns, so quoting is out of scope here).
# Bounded to Latin-1: full-Unicode CASE MAPPING legitimately diverges
# between the engines (e.g. lower('İ' U+0130) = 'i'+COMBINING DOT in
# Java's full casing vs plain 'i' in DuckDB) — a documented boundary of
# the parity contract, not an expression bug; within Latin-1 the engines
# agree.
_TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8",
        max_codepoint=0xFF,
        categories=("Lu", "Ll", "Nd", "Zs", "Po", "Sm"),
        exclude_characters="'\"\\",
    ),
    max_size=80,
)

# 10 examples/property by default (each example is 2 Spark + 2 DuckDB
# round trips; 25 cost ~58 s of the verify gate across the 9 properties).
# LHBENCH_PARITY_EXAMPLES restores the deeper sweep for nightly use.
_SETTINGS = settings(
    max_examples=int(os.environ.get("LHBENCH_PARITY_EXAMPLES", "10")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _spark_eval(spark, expr: str):
    return spark.sql(f"SELECT {expr} AS v").collect()[0]["v"]


def _duck_eval(expr: str):
    return duckdb.sql(f"SELECT {expr} AS v").fetchall()[0][0]


def _lit(s: str) -> str:
    return "'" + s + "'"


@_SETTINGS
@given(_TEXT)
def test_norm_parity(spark, s):
    got_s = _spark_eval(spark, textnorm.norm_spark(_lit(s)))
    got_d = _duck_eval(textnorm.norm_duck(_lit(s)))
    assert got_s == got_d


@_SETTINGS
@given(_TEXT)
def test_tokens_parity(spark, s):
    got_s = _spark_eval(spark, textnorm.tokens_spark(_lit(s)))
    got_d = _duck_eval(textnorm.tokens_duck(_lit(s)))
    assert list(got_s or []) == list(got_d or [])


@_SETTINGS
@given(_TEXT, st.integers(min_value=2, max_value=5))
def test_shingles_parity(spark, s, n):
    """Set equality, not list equality: DuckDB's list_distinct does not
    preserve first-occurrence order while Spark's array_distinct does.
    Every downstream consumer (intersect, min-fold, Jaccard) is
    order-insensitive, so the set is the invariant that matters."""
    got_s = _spark_eval(spark, textnorm.shingles_spark(_lit(s), n))
    got_d = _duck_eval(textnorm.shingles_duck(_lit(s), n))
    assert sorted(got_s or []) == sorted(got_d or [])


@_SETTINGS
@given(_TEXT)
def test_h32_parity(spark, s):
    got_s = _spark_eval(spark, hashing.h32_spark(_lit(s)))
    got_d = _duck_eval(hashing.h32_duck(_lit(s)))
    assert got_s == got_d
    assert 0 <= got_s < 2**32


@_SETTINGS
@given(st.lists(st.integers(min_value=0, max_value=2**32 - 1), min_size=1, max_size=40))
def test_minhash_signature_parity(spark, hashes):
    arr_s = "array(" + ", ".join(f"{h}L" for h in hashes) + ")"
    arr_d = "[" + ", ".join(str(h) for h in hashes) + "]::BIGINT[]"
    sig_s = _spark_eval(spark, hashing.minhash_sig_spark(arr_s))
    sig_d = _duck_eval(hashing.minhash_sig_duck(arr_d))
    assert list(sig_s) == list(sig_d)
    band_s = _spark_eval(spark, hashing.band_keys_spark(hashing.minhash_sig_spark(arr_s)))
    band_d = _duck_eval(hashing.band_keys_duck(hashing.minhash_sig_duck(arr_d)))
    assert list(band_s) == list(band_d)


@_SETTINGS
@given(st.lists(st.integers(min_value=0, max_value=2**32 - 1), min_size=1, max_size=40))
def test_simhash_parity(spark, hashes):
    arr_s = "array(" + ", ".join(f"{h}L" for h in hashes) + ")"
    arr_d = "[" + ", ".join(str(h) for h in hashes) + "]::BIGINT[]"
    fp_s = _spark_eval(spark, hashing.simhash_from_hashes_spark(arr_s))
    fp_d = _duck_eval(hashing.simhash_from_hashes_duck(arr_d))
    assert fp_s == fp_d
    # Untyped integer literals parse 32-bit in both engines — exactly the
    # width hazard the generators now guard with an explicit BIGINT cast.
    keys_s = _spark_eval(spark, hashing.simhash_band_keys_spark(str(fp_s)))
    keys_d = _duck_eval(hashing.simhash_band_keys_duck(str(fp_d)))
    assert list(keys_s) == list(keys_d)


@pytest.mark.parametrize("dim", [4, 64])
def test_lsh_bucket_parity(spark, dim):
    """Hyperplane LSH buckets: same Rademacher constants, same signs —
    checked over deterministic vectors (unit axes + a ramp)."""
    from lhbench_spark.operators import similarity as sim

    vecs = [[0.0] * dim, [1.0] * dim, [(-1.0) ** i * (i + 1) for i in range(dim)]]
    for v in vecs:
        arr_s = "array(" + ", ".join(f"CAST({x} AS DOUBLE)" for x in v) + ")"
        arr_d = "[" + ", ".join(str(float(x)) for x in v) + "]::DOUBLE[]"
        got_s = spark.range(1).select(
            sim.lsh_bucket(arr_s, dim).alias("b")
        ).collect()[0]["b"]
        got_d = _duck_eval(sim.lsh_bucket_duck(arr_d, dim))
        assert got_s == got_d


@_SETTINGS
@given(_TEXT, st.integers(min_value=2, max_value=4))
def test_word_shingles_parity(spark, s, n):
    """Word n-gram shingles (the MinHash unit) — set equality, same
    rationale as test_shingles_parity."""
    got_s = _spark_eval(spark, textnorm.word_shingles_spark(_lit(s), n))
    got_d = _duck_eval(textnorm.word_shingles_duck(_lit(s), n))
    assert sorted(got_s or []) == sorted(got_d or [])


@_SETTINGS
@given(st.integers(min_value=0, max_value=2**62))
def test_hash_key24_parity(spark, i):
    """The 24-bit md5 integer prefix that drives assembly-query
    membership (corpus_mixture_sample / corpus_train_split): Spark
    conv(hex,16,10) vs DuckDB CAST('0x'||hex AS BIGINT) must agree for
    any doc_id, including the rate==1.0 threshold at 16777216 that a
    fixed-width hex-string compare cannot represent."""
    s = (
        "CAST(conv(substring(md5(CONCAT('mix1:', CAST("
        f"{i} AS STRING))), 1, 6), 16, 10) AS BIGINT)"
    )
    d = f"CAST('0x' || substr(md5('mix1:' || CAST({i} AS VARCHAR)), 1, 6) AS BIGINT)"
    got_s = _spark_eval(spark, s)
    got_d = _duck_eval(d)
    assert got_s == got_d
    assert 0 <= got_s < 16777216


@_SETTINGS
@given(st.integers(min_value=0, max_value=10**9))
def test_pack_seq_assignment_parity(spark, cum):
    """Sequence-id assignment in corpus_pack_sequences:
    floor((greatest(cum,1)-1) / 512.0) must agree across engines for any
    cumulative token count (incl. the cum=0 empty-document guard)."""
    s = f"CAST(floor((greatest({cum}, 1) - 1) / CAST(512 AS DOUBLE)) AS BIGINT)"
    d = f"CAST(floor((greatest({cum}, 1) - 1) / CAST(512 AS DOUBLE)) AS BIGINT)"
    got_s = _spark_eval(spark, s)
    got_d = _duck_eval(d)
    assert got_s == got_d
    assert got_s >= 0
