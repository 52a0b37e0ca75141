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
        # exact repr: our determinism contract promises bit-equality
        return repr(value)
    if isinstance(value, Decimal):
        return repr(float(value))
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


def compare(spark_df, duck_rel) -> tuple[bool, str]:
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols = list(duck_rel.columns)
    d_rows = duck_rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row counts differ: spark={len(s_rows)} duck={len(d_rows)}"
    s = rowset(s_cols, s_rows)
    d = rowset(d_cols, d_rows)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:5]
        return False, f"values differ; first diffs (spark vs duck): {diffs}"
    return True, "ok"
