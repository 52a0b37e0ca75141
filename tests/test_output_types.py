"""Pre-gate output-type lint: no registered oracle may emit a column
type outside the externally-proven-green set.

Evidence (rounds 7+8): the only external gate failures in eight rounds
— tpcds_q12/q20/q37, rows+schema matching, value hash failing — were
exactly the gate-checked queries whose output schema contained a raw
DECIMAL column (i_current_price decimal(12,2)); q37's output has no
float at all, and all three matched the local DuckDB 1.0.0 bitwise at
the gate SF. The driver's hash realizes DECIMAL cells differently
under its own DuckDB build. Every other type below has at least one
externally-green carrier (VARCHAR/BIGINT/DOUBLE: hundreds; TIMESTAMP:
9 green carriers e.g. join_shipping_priority, sort_topk; DATE/BOOLEAN/
INTEGER: dozens).

This lint turns that lesson into an invariant: a query whose oracle
plans to a DECIMAL (or any other unproven) output type fails HERE,
before it can ever rotate into the external gate. Fix by casting the
output column (CAST(x AS DOUBLE) for decimals — value-exact for the
schema's decimal(12,2)/decimal(5,2) magnitudes, all < 2^53).

Only DuckDB PLANNING runs (relation .columns/.types) — the whole sweep
is sub-second; Spark-side schema agreement is already enforced by the
full oracle sweep's schema_match.
"""

from __future__ import annotations

import pytest

from lhbench_spark.queries import all_queries
from tests.conftest import SMOKE_SF

# Types with at least one externally-green carrier across rounds 1-8.
# Grow this set ONLY with external evidence (a green CORRECTNESS row
# whose query emits the type), never to make a new query pass.
PROVEN_GREEN_TYPES = {
    "VARCHAR",
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "DATE",
    "BOOLEAN",
    "TIMESTAMP",
}

WITH_ORACLE = sorted(n for n, q in all_queries().items() if q.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_no_hash_fragile_output_types(oracle, name):
    qd = all_queries()[name]
    rel = oracle(SMOKE_SF).sql(qd.oracle)
    offenders = [
        f"{c}:{t}"
        for c, t in zip(rel.columns, rel.types)
        if str(t).split("(")[0] not in PROVEN_GREEN_TYPES
    ]
    assert not offenders, (
        f"{name} emits hash-fragile output column(s) {offenders} — the "
        "r7/r8 external reds were all raw DECIMAL outputs; cast to a "
        "proven-green type (see module docstring) before this query can "
        "reach the gate."
    )
