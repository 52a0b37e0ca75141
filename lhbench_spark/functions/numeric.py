"""Engine-exact numeric aggregation helpers.

Floating-point SUM/AVG depend on accumulation order, which differs between
Spark (partitioned partial aggregation) and any single-threaded oracle —
and between two Spark runs with different partitioning. For results that
must hash-match an oracle AND stay stable under repartitioning at scale,
we aggregate through DECIMAL (exact, order-independent) and cast the final
value back to DOUBLE. The per-row cast double→decimal is deterministic
(round-half-up in both Spark and DuckDB), so both engines sum identical
exact values.

This also matters at 100 TB independent of any oracle: AQE and speculative
execution can change partitioning between runs, so decimal-summed metrics
are the only reproducible ones.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 18 digits holds ~1e14 at scale 4 — enough for per-group money sums at
# sf0.1; the SUM output precision is widened by Spark/DuckDB automatically.
_PREC, _SCALE = 18, 8


def dsum(col: Column | str, scale: int = _SCALE) -> Column:
    """Order-independent SUM of a double column, returned as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({_PREC},{scale})")).cast("double")


def davg(col: Column | str, scale: int = _SCALE) -> Column:
    """Order-independent AVG: exact decimal SUM divided by COUNT in double
    (one double division of identical operands is engine-exact)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({_PREC},{scale})")).cast("double") / F.count(c)


def dsum_sql(expr: str, scale: int = _SCALE) -> str:
    """Oracle-side (DuckDB) rendering of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({_PREC},{scale}))) AS DOUBLE)"


def davg_sql(expr: str, scale: int = _SCALE) -> str:
    """Oracle-side (DuckDB) rendering of :func:`davg`."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL({_PREC},{scale}))) AS DOUBLE)"
        f" / COUNT({expr})"
    )
