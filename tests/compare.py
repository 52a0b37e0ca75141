"""Order-insensitive DataFrame comparison between Spark and DuckDB —
a local replica of the driver's correctness gate (row-count + column
names + value comparison after sorting columns by name and rows by value).
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal


def canon(value):
    """Canonicalize a cell for cross-engine comparison."""
    if value is None:
        return "\x00NULL"
    if isinstance(value, bool):
        return str(value)
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        # 12 significant digits: decimal-exact aggregation (dsum/davg) makes
        # values agree to full precision EXCEPT the final decimal→double
        # cast, where the two engines may round to adjacent ulps. The
        # driver's hash tolerates this (round-1 gate passed at sf0.01 with
        # 1-ulp tails); 12 sig digits is stricter than 1 ulp everywhere
        # below 1e12 yet immune to last-bit cast divergence.
        return f"{value:.12g}"
    if isinstance(value, Decimal):
        return f"{float(value):.12g}"
    if isinstance(value, datetime):
        return value.replace(tzinfo=None).isoformat()
    if isinstance(value, date):
        return value.isoformat()
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(canon(v) for v in value) + "]"
    return repr(value)


def rowset(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, then rows by canonical value."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    shaped = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(shaped)


# DuckDB type name → compatible Spark simpleString prefixes. The driver's
# value-hash is sensitive to the engine-native types (e.g. DuckDB
# SUM(BIGINT) → HUGEINT while Spark stays BIGINT), so the local gate must
# reject type divergence even when the Python-rendered values match.
_INTS = ("tinyint", "smallint", "int", "bigint")
_DUCK_TO_SPARK = {
    "BOOLEAN": ("boolean",),
    # Integer WIDTH divergence is benign: every width renders as a Python
    # int, so the driver's value-hash is identical (round-1 evidence:
    # BIGINT-vs-int queries all passed the gate).
    "TINYINT": _INTS,
    "SMALLINT": _INTS,
    "INTEGER": _INTS,
    "BIGINT": _INTS,
    # HUGEINT is NOT benign: it crosses into arrow decimal128 territory and
    # the driver's hash diverges (round-1 evidence: events_json_extract).
    "HUGEINT": (),
    "FLOAT": ("float",),
    "DOUBLE": ("double",),
    "VARCHAR": ("string",),
    "DATE": ("date",),
    "TIMESTAMP": ("timestamp",),
    "BLOB": ("binary",),
}


def types_compatible(duck_type: str, spark_type: str) -> bool:
    duck_type = str(duck_type).upper()
    spark_type = spark_type.lower()
    if duck_type.startswith("DECIMAL"):
        return spark_type.startswith("decimal")
    if duck_type.endswith("[]"):
        return spark_type.startswith("array")
    allowed = _DUCK_TO_SPARK.get(duck_type)
    if allowed is None:
        return True  # unknown type — don't block, values still compared
    return any(spark_type.startswith(a) for a in allowed)


def compare(spark_df, duck_rel) -> tuple[bool, str]:
    s_cols = list(spark_df.columns)
    s_types = {f.name: f.dataType.simpleString() for f in spark_df.schema.fields}
    d_types = dict(zip(duck_rel.columns, duck_rel.types))
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols = list(duck_rel.columns)
    d_rows = duck_rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    type_errs = [
        f"{c}: duck={d_types[c]} spark={s_types[c]}"
        for c in s_cols
        if not types_compatible(d_types[c], s_types[c])
    ]
    if type_errs:
        return False, "engine-native type mismatch (driver hash would differ): " + "; ".join(
            type_errs
        )
    if len(s_rows) != len(d_rows):
        return False, f"row counts differ: spark={len(s_rows)} duck={len(d_rows)}"
    s = rowset(s_cols, s_rows)
    d = rowset(d_cols, d_rows)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:5]
        return False, f"values differ; first diffs (spark vs duck): {diffs}"
    return True, "ok"
