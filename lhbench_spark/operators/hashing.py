"""Cross-engine deterministic hashing.

Both the Spark implementation and the DuckDB oracle must compute
bit-identical hashes, so we avoid engine-native hash() (Spark = Murmur3,
DuckDB = its own) and define H32(s) = first 8 hex digits of md5(s) as an
unsigned 32-bit integer. Everything downstream (MinHash, SimHash) is pure
int64 arithmetic on H32, identical in both engines.

Generated expressions come in two dialects:
- ``*_spark(expr)`` → Spark SQL string (used via F.expr, stays in
  whole-stage codegen — no Python UDF in any hash path).
- ``*_duck(expr)``  → DuckDB SQL string for the oracle.
"""

from __future__ import annotations

# MinHash parameters: k hash functions h_j(x) = (A[j]*x + B[j]) mod P.
# P is the smallest prime > 2^32; A values stay < 2^20 so A*H32 < 2^52
# fits comfortably in signed int64 in both engines.
MINHASH_K = 16
MINHASH_P = 4_294_967_311
# Fixed (seeded once, embedded as constants so both dialects agree).
MINHASH_A = [
    672637, 413291, 886313, 204151, 997523, 541699, 318211, 760531,
    150151, 829447, 505447, 287233, 941599, 623171, 377911, 714673,
]
MINHASH_B = [
    98921, 771173, 334571, 556027, 122251, 904837, 481249, 668699,
    217841, 843019, 395129, 579881, 131071, 926191, 453377, 688919,
]
# LSH banding: k=16 signature → 4 bands × 4 rows. The s-curve midpoint
# (1/bands)^(1/rows) = 0.25^0.25 ≈ 0.71 sits AT the dedup threshold
# (0.7): pairs above it collide with rapidly-increasing probability
# (0.8 → 88%, 0.9 → 99.8%) while the huge template-similarity mass at
# 0.3-0.6 is pruned band-side instead of being verified pair-by-pair —
# the standard (b, r) tuning for near-dup dedup at corpus scale.
MINHASH_BANDS = 4
MINHASH_ROWS_PER_BAND = 4

# SimHash: 60-bit fingerprint (fits signed int64 without touching the sign
# bit), banded for candidate generation as 4 bands × 15 bits. Wide bands
# prune aggressively: a pair collides only if 15 consecutive fingerprint
# bits agree, so near-quadratic candidate sets (the 32-bit/8-bit-band
# failure mode) cannot occur on natural corpora.
SIMHASH_BITS = 60
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = 15


def h32_spark(expr: str) -> str:
    """H32 in Spark SQL: conv() parses the hex prefix (returns string)."""
    return f"CAST(CONV(SUBSTRING(MD5({expr}), 1, 8), 16, 10) AS BIGINT)"


def h32_duck(expr: str) -> str:
    """H32 in DuckDB: hex-literal string cast."""
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"


def shingle_hashes_spark(shingles: str) -> str:
    """array<bigint> of H32 per shingle. Materialize ONCE as a column and
    feed :func:`minhash_sig_spark` — md5 is the expensive part and must
    not be recomputed per hash function (k=16×)."""
    return f"transform({shingles}, s -> {h32_spark('s')})"


def shingle_hashes_duck(shingles: str) -> str:
    return f"list_transform({shingles}, s -> {h32_duck('s')})"


def minhash_sig_spark(hashes: str) -> str:
    """array<bigint> MinHash signature over a PRE-HASHED array<bigint>
    column (see :func:`shingle_hashes_spark`) — k cheap int-only folds."""
    mins = [
        f"array_min(transform({hashes}, h -> "
        f"({MINHASH_A[j]} * h + {MINHASH_B[j]}) % {MINHASH_P}))"
        for j in range(MINHASH_K)
    ]
    return "array(" + ", ".join(mins) + ")"


def minhash_sig_duck(hashes: str) -> str:
    mins = [
        f"list_min(list_transform({hashes}, h -> "
        f"({MINHASH_A[j]} * h + {MINHASH_B[j]}) % {MINHASH_P}))"
        for j in range(MINHASH_K)
    ]
    return "[" + ", ".join(mins) + "]"


def _band_keys(sig: str, element_fn: str, cast_type: str, wrap: tuple[str, str]) -> str:
    keys = []
    for b in range(MINHASH_BANDS):
        parts = []
        for r in range(MINHASH_ROWS_PER_BAND):
            idx = b * MINHASH_ROWS_PER_BAND + r + 1
            parts.append(f"CAST({element_fn}({sig}, {idx}) AS {cast_type})")
        joined = ", '_', ".join(parts)
        keys.append(f"concat('{b}:', {joined})")
    return wrap[0] + ", ".join(keys) + wrap[1]


def band_keys_spark(sig: str) -> str:
    """array<string> of LSH band keys (band index baked into the key)."""
    return _band_keys(sig, "element_at", "STRING", ("array(", ")"))


def band_keys_duck(sig: str) -> str:
    return _band_keys(sig, "list_element", "VARCHAR", ("[", "]"))


def token_hashes_spark(tokens: str) -> str:
    """array<bigint> of H32 per token. Materialize this ONCE as a column,
    then feed :func:`simhash_from_hashes_spark` — md5 is the expensive part
    and must not be recomputed per fingerprint bit (60×)."""
    return f"transform({tokens}, t -> {h32_spark('t')})"


def token_hashes_duck(tokens: str) -> str:
    return f"list_transform({tokens}, t -> {h32_duck('t')})"


def simhash_from_hashes_spark(hashes: str) -> str:
    """SimHash fingerprint over a precomputed array<bigint> hash column:
    per bit, majority sign of the hash bits; 60 cheap int-only folds."""
    bits = []
    for i in range(SIMHASH_BITS):
        s = (
            f"aggregate({hashes}, 0L, (acc, h) -> acc + "
            f"(CASE WHEN (SHIFTRIGHT(h, {i}) & 1) = 1 THEN 1 ELSE -1 END))"
        )
        bits.append(f"(CASE WHEN {s} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def simhash_from_hashes_duck(hashes: str) -> str:
    bits = []
    for i in range(SIMHASH_BITS):
        s = (
            f"list_aggregate(list_transform({hashes}, h -> "
            f"CASE WHEN ((h >> {i}) & 1) = 1 THEN 1 ELSE -1 END), 'sum')"
        )
        bits.append(f"(CASE WHEN {s} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def simhash_band_keys_spark(fp: str) -> str:
    """array<string> of 15-bit band keys over a 60-bit fingerprint column.

    The fingerprint is cast to BIGINT before shifting: Java's shift uses
    only the low 5 bits of the amount on INT operands, so a 32-bit-typed
    fp would silently wrap ``>> 45`` into ``>> 13`` (hypothesis parity
    test finding) — the cast makes the width explicit."""
    mask = (1 << SIMHASH_BAND_BITS) - 1
    keys = [
        f"concat('{b}:', CAST(SHIFTRIGHT(CAST({fp} AS BIGINT), "
        f"{b * SIMHASH_BAND_BITS}) & {mask} AS STRING))"
        for b in range(SIMHASH_BANDS)
    ]
    return "array(" + ", ".join(keys) + ")"


def simhash_band_keys_duck(fp: str) -> str:
    mask = (1 << SIMHASH_BAND_BITS) - 1
    keys = [
        f"concat('{b}:', CAST((CAST({fp} AS BIGINT) >> {b * SIMHASH_BAND_BITS})"
        f" & {mask} AS VARCHAR))"
        for b in range(SIMHASH_BANDS)
    ]
    return "[" + ", ".join(keys) + "]"
