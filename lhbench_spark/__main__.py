"""Engine CLI — the in-process equivalent of the reference's remote
orchestration layer (run-benchmark.py:206-231 dispatching benchmark
names; no ssh layer is needed in local mode, SURVEY.md §3).

    python -m lhbench_spark smoke                 # TestBenchmark parity
    python -m lhbench_spark bench                 # full query suite
    python -m lhbench_spark merge_micro           # merge microbenchmark
    python -m lhbench_spark merge_grid            # CoW-vs-MoR × update-pct grid
    python -m lhbench_spark compare --configs cow,mor   # multi-config bench
    python -m lhbench_spark file_count            # file-count / planning
    python -m lhbench_spark refresh               # incremental refresh
    python -m lhbench_spark query <name> [--sf-dir DIR]   # one query
    python -m lhbench_spark table <op> --root DIR   # maintenance:
        history|detail|optimize|zorder --by a,b|vacuum [--retain N]|
        vacuum-orphans|restore --version N

Each workload prints its JSON report to stdout; `query` prints the
result rows.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="lhbench_spark")
    ap.add_argument(
        "command",
        choices=[
            "smoke", "bench", "merge_micro", "merge_grid", "compare",
            "file_count", "refresh", "query", "table",
        ],
    )
    ap.add_argument(
        "name", nargs="?",
        help="query name (for `query`) / table op (for `table`: "
        "history|detail|optimize|zorder|vacuum|vacuum-orphans|restore)",
    )
    ap.add_argument("--sf-dir", default=None, help="testdata dir (default $SPARK_GRAFT_SF_DIR)")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument(
        "--configs", default="cow,mor",
        help="comma-separated storage configs (for `compare`)",
    )
    ap.add_argument("--root", default=None, help="managed-table root (for `table`)")
    ap.add_argument("--version", type=int, default=None, help="target version (for `table restore`)")
    ap.add_argument("--retain", type=int, default=1, help="versions to retain (for `table vacuum`)")
    ap.add_argument("--by", default=None, help="two comma-separated columns (for `table zorder`)")
    args = ap.parse_args(argv)

    if args.command == "bench":
        # bench.py lives at the repo root (the driver's entry contract),
        # one level above this package — load it by path so the
        # subcommand works from any cwd, not only the repo root.
        import importlib.util
        import os

        bench_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
        )
        spec = importlib.util.spec_from_file_location("bench", bench_path)
        bench = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench)
        return bench.main()

    from lhbench_spark.catalog import DEFAULT_SF_DIR
    from lhbench_spark.session import get_spark

    spark = get_spark(f"lhbench_{args.command}", cpus=args.cpus)
    sf_dir = args.sf_dir or DEFAULT_SF_DIR

    if args.command == "query":
        if not args.name:
            ap.error("query requires a name (see lhbench_spark.queries)")
        from lhbench_spark.queries import all_queries

        qd = all_queries().get(args.name)
        if qd is None:
            print(f"unknown query {args.name!r}; known: {sorted(all_queries())}",
                  file=sys.stderr)
            return 2
        qd.spark_fn(spark, sf_dir).show(100, truncate=False)
        return 0

    if args.command == "table":
        import json

        from lhbench_spark.tables import ManagedTable

        if not args.root or not args.name:
            ap.error("table requires an op name and --root <table-root>")
        t = ManagedTable(spark, args.root)
        op = args.name
        if op == "history":
            t.history().show(100, truncate=False)
        elif op == "detail":
            t.detail().show(truncate=False)
        elif op == "optimize":
            print(json.dumps(t.optimize()))
        elif op == "zorder":
            if not args.by or len(args.by.split(",")) != 2:
                ap.error("table zorder requires --by colA,colB")
            print(json.dumps(t.zorder(tuple(args.by.split(",")))))
        elif op == "vacuum":
            print(json.dumps(t.vacuum(retain_versions=args.retain)))
        elif op == "vacuum-orphans":
            print(json.dumps(t.vacuum_orphans()))
        elif op == "restore":
            if args.version is None:
                ap.error("table restore requires --version N")
            print(json.dumps(t.restore(args.version)))
        else:
            ap.error(f"unknown table op {op!r}")
        return 0

    if args.command == "compare":
        from lhbench_spark.workloads import compare as cmp_mod

        print(cmp_mod.run(spark, configs=tuple(args.configs.split(","))).to_json())
        return 0
    if args.command == "merge_grid":
        from lhbench_spark.workloads.merge_micro import run_grid

        print(run_grid(spark).to_json())
        return 0

    import importlib

    mod = importlib.import_module(f"lhbench_spark.workloads.{args.command}")
    if args.command == "refresh":
        print(mod.run(spark, sf_dir).to_json())
    else:
        print(mod.run(spark).to_json())
    return 0


if __name__ == "__main__":
    sys.exit(main())
