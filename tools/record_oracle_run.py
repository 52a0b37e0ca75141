"""Record a FULL oracle sweep — every registered query vs its DuckDB
oracle at sf0.001 and sf0.01 — to reports/oracle_full_run.json.

Why this exists: the external correctness gate samples the first ~50
registry names alphabetically, so queries sorting after the cutoff
(tpcds_*, the later dedup/events/join entries) never get an external
row. This recorded run is the audit trail for those: same compare logic
as the gate replica (row count + column names + order-insensitive value
compare), every query, both SFs, with a git commit stamp.

Usage: python tools/record_oracle_run.py  (~8 min on local[8])
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import duckdb

    from lhbench_spark.catalog import TABLES
    from lhbench_spark.queries import all_queries
    from lhbench_spark.session import get_spark
    from tests.compare import compare

    spark = get_spark("oracle-full-run", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    out: dict = {
        "commit": subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True
        ).stdout.strip(),
        "started_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "results": {},
    }
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        sf = os.path.basename(sf_dir)
        for t in TABLES:
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        res: dict = {}
        for name, qd in sorted(all_queries().items()):
            t0 = time.time()
            try:
                sdf = qd.spark_fn(spark, sf_dir)
                if qd.oracle is None:
                    n = sdf.count()
                    res[name] = {"status": "rows_only", "rows": n}
                else:
                    ok, msg = compare(sdf, con.sql(qd.oracle))
                    res[name] = {
                        "status": "pass" if ok else "FAIL",
                        "rows": sdf.count(),
                    }
                    if not ok:
                        res[name]["msg"] = msg[:500]
            except Exception as e:  # noqa: BLE001 — recorded, not raised
                res[name] = {"status": "ERROR", "msg": repr(e)[:500]}
            res[name]["sec"] = round(time.time() - t0, 2)
        out["results"][sf] = res
        bad = [n for n, r in res.items() if r["status"] in ("FAIL", "ERROR")]
        print(f"{sf}: {len(res)} queries, {len(bad)} failing: {bad}")
    out["finished_utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "reports",
        "oracle_full_run.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", path)
    any_bad = any(
        r["status"] in ("FAIL", "ERROR")
        for sf in out["results"].values()
        for r in sf.values()
    )
    return 1 if any_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
