"""Row-count probe for every tpcds_q* oracle, DuckDB-only (fast).

Generator-retargeting loop support: the Spark and DuckDB renders come
from ONE spec (tpcds_data._specs), so while iterating on generator
changes the DuckDB side alone tells us each query's selectivity; the
Spark-vs-oracle value compare runs afterwards (tests +
tools/record_oracle_run.py).

Usage:
  python tools/tpcds_rowcounts.py                 # sf0.001 + sf0.01
  python tools/tpcds_rowcounts.py --sf 0.1        # one SF
  python tools/tpcds_rowcounts.py --save X.json   # write counts
  python tools/tpcds_rowcounts.py --diff X.json   # compare vs saved
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import duckdb

    from lhbench_spark.catalog import TABLES
    from lhbench_spark.queries import all_queries

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", action="append", default=None)
    ap.add_argument("--save", default=None)
    ap.add_argument("--diff", default=None)
    ap.add_argument("--only", default="tpcds_q")
    args = ap.parse_args()
    sfs = args.sf or ["0.001", "0.01"]

    con = duckdb.connect()
    counts: dict[str, dict[str, int]] = {}
    for sf in sfs:
        sf_dir = f"/root/testdata/sf{sf}"
        for t in TABLES:
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        res = {}
        for name, qd in sorted(all_queries().items()):
            if not name.startswith(args.only) or qd.oracle is None:
                continue
            try:
                res[name] = len(con.sql(qd.oracle).fetchall())
            except Exception as e:  # noqa: BLE001
                res[name] = f"ERROR: {e!r}"[:120]
        counts[sf] = res

    if args.diff:
        old = json.load(open(args.diff))
        for sf, res in counts.items():
            if sf not in old:
                continue
            changed = {
                n: (old[sf].get(n), v)
                for n, v in res.items()
                if old[sf].get(n) != v
            }
            newly_zero = sorted(
                n for n, (o, v) in changed.items() if v == 0 and o not in (0, None)
            )
            print(f"sf{sf}: {len(changed)} changed; NEWLY ZERO: {newly_zero}")
            for n, (o, v) in sorted(changed.items()):
                print(f"  {n}: {o} -> {v}")
        zero_now = {
            sf: sorted(n for n, v in res.items() if v == 0)
            for sf, res in counts.items()
        }
        for sf, z in zero_now.items():
            print(f"sf{sf} zero-row ({len(z)}): {z}")
    else:
        for sf, res in counts.items():
            zero = sorted(n for n, v in res.items() if v == 0)
            err = sorted(n for n, v in res.items() if isinstance(v, str))
            print(f"sf{sf}: {len(res)} queries, {len(zero)} zero-row: {zero}")
            if err:
                print(f"  ERRORS: {err}")
    if args.save:
        json.dump(counts, open(args.save, "w"), indent=1, sort_keys=True)
        print("saved", args.save)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
