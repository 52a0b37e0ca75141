"""Print the DRIVER_GREEN additions a new CORRECTNESS_r{N}.json earns.

The external gate's first-50 sample advances each round because
externally-green queries are renamed with the 'verified_' prefix
(lhbench_spark/queries/registry.py: DRIVER_GREEN / gate_queries). The
maintenance step each round is: take the driver's recorded green rows,
map gate names back to canonical, and add the new ones to DRIVER_GREEN
with the round number. This tool prints that diff as ready-to-paste
dict lines (it does not edit the file — review, paste, run the
gate-window test, and update tests/test_oracle_queries.py's
_GATE_WINDOW to the new first-50).

Usage: python tools/update_driver_green.py CORRECTNESS_r06.json 6
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from lhbench_spark.queries import all_queries
    from lhbench_spark.queries.registry import DRIVER_GREEN, GATE_VERIFIED_PREFIX

    path, rnd = sys.argv[1], int(sys.argv[2])
    rows = json.load(open(path))
    reg = set(all_queries())
    new, red, unknown = [], [], []
    for gate_name, r in rows.items():
        name = gate_name.removeprefix(GATE_VERIFIED_PREFIX)
        if name not in reg:
            unknown.append(gate_name)
            continue
        # Green = full value match, or a clean rows-only run for the
        # no-oracle queries (the driver records the weaker check there;
        # since r7 it marks those rows with err='no_oracle' rather than
        # err=None, so both spellings are accepted).
        green = (
            r.get("err") is None and r.get("hash_match") is True
        ) or (
            r.get("err") in (None, "no_oracle")
            and r.get("hash_match") is None
            and r.get("spark_rows") is not None
        )
        if not green:
            red.append((gate_name, r))
        elif name not in DRIVER_GREEN:
            new.append(name)
    for name, r in red:
        print(f"RED: {name}: {r}")
    for gate_name in unknown:
        print(f"UNKNOWN (not in registry): {gate_name}")
    print(f"# {len(new)} new green names for DRIVER_GREEN (round {rnd}):")
    for name in sorted(new):
        print(f'    "{name}": {rnd},')
    return 1 if red else 0


if __name__ == "__main__":
    raise SystemExit(main())
