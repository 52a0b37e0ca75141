"""Bench regression tripwire: diff two bench recordings' common query set.

The r9 merge-family regression (+44% on merge_micro_counts) was visible
only by manually diffing BENCH_r09 vs BENCH_r08 — this tool makes that a
one-liner in the end-of-round checklist. It accepts either the driver's
BENCH_r{N}.json wrapper (payload under "parsed") or bench.py's raw JSON
line, prints a ranked table of per-query ratios, and exits non-zero when
any common query regressed past the threshold (default 1.5x) — small
absolute times are noise-exempt below --min-sec.

Usage:
    python tools/bench_diff.py BENCH_r09.json BENCH_r10.json
    python tools/bench_diff.py BENCH_r09.json /tmp/bench_now.json --threshold 1.5
"""

from __future__ import annotations

import argparse
import json
import sys


def load_queries(path: str) -> dict[str, float]:
    d = json.load(open(path))
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    q = d.get("queries")
    if not isinstance(q, dict) or not q:
        raise SystemExit(f"{path}: no per-query map found")
    return {k: float(v) for k, v in q.items()}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument(
        "--threshold", type=float, default=1.5,
        help="fail on any common query slower than OLD*threshold (default 1.5)",
    )
    ap.add_argument(
        "--min-sec", type=float, default=0.5,
        help="ignore regressions whose NEW time is below this (noise floor)",
    )
    ap.add_argument("--top", type=int, default=15, help="rows to print")
    args = ap.parse_args()

    old, new = load_queries(args.old), load_queries(args.new)
    common = sorted(set(old) & set(new))
    if not common:
        raise SystemExit("no common queries between the two recordings")
    rows = [(n, old[n], new[n], new[n] / old[n] if old[n] > 0 else float("inf"))
            for n in common]
    rows.sort(key=lambda r: -r[3])
    regressed = [
        r for r in rows if r[3] > args.threshold and r[2] >= args.min_sec
    ]
    med = sorted(r[3] for r in rows)[len(rows) // 2]
    print(f"common queries: {len(common)}   median ratio new/old: {med:.3f}")
    print(f"{'query':<34}{'old_s':>8}{'new_s':>8}{'ratio':>8}")
    for n, o, v, r in rows[: args.top]:
        flag = "  <-- REGRESSED" if (r > args.threshold and v >= args.min_sec) else ""
        print(f"{n:<34}{o:>8.2f}{v:>8.2f}{r:>8.2f}{flag}")
    if regressed:
        print(
            f"\n{len(regressed)} quer{'y' if len(regressed) == 1 else 'ies'} "
            f"regressed past {args.threshold}x (new >= {args.min_sec}s)"
        )
        return 1
    print(f"\nno regression past {args.threshold}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
