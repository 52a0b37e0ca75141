"""Record the float-output inventory — which output columns of which
registered oracles are FLOAT/DOUBLE — to reports/float_outputs.json.

Why this exists: round 7's external gate ran the oracle under a
different DuckDB build and an unrounded float-division output
(tpcds_q12 revenueratio) failed the value hash on a last-ulp
realization difference. Round 8 hardened every such output (SCALE.md
"Float determinism discipline"); this inventory plus its companion test
(tests/test_oracle_queries.py::test_float_output_inventory_is_deliberate)
makes the set of float outputs a CONSCIOUS artifact: adding a query —
or adding a float column to an existing one — fails the test until the
recorded inventory is regenerated and the new column is reviewed
against the three-tier discipline.

Only DuckDB PLANNING runs (relation .columns/.types), so the sweep is
seconds, not minutes.

Usage: python tools/record_float_outputs.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


def compute_inventory(con) -> dict[str, list[str]]:
    from lhbench_spark.catalog import TABLES
    from lhbench_spark.queries import all_queries

    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    out: dict[str, list[str]] = {}
    for name, qd in sorted(all_queries().items()):
        if qd.oracle is None:
            continue
        rel = con.sql(qd.oracle)
        floats = sorted(
            c
            for c, t in zip(rel.columns, rel.types)
            if str(t) in ("DOUBLE", "FLOAT")
        )
        if floats:
            out[name] = floats
    return out


def main() -> int:
    import duckdb

    inv = compute_inventory(duckdb.connect())
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "reports",
        "float_outputs.json",
    )
    with open(path, "w") as f:
        json.dump(inv, f, indent=1, sort_keys=True)
        f.write("\n")
    n_cols = sum(len(v) for v in inv.values())
    print(f"wrote {path}: {len(inv)} queries, {n_cols} float output columns")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
