"""Model-based random walk over the managed table's DML surface.

A seeded walk applies random APPEND / MERGE / DELETE / UPDATE / RESTORE /
OPTIMIZE ops to both the real table and a pure-Python dict model,
snapshotting the model at every committed version. After each op the row
count must match; at checkpoints (and at the end) the FULL row state and
a time-travel read of a random historical version must match the model's
snapshot. This is the interaction coverage single-op tests can't give —
e.g. restore-then-merge, update-after-evolve, optimize-then-delete.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from lhbench_spark.tables import ManagedTable

COLS = ("k", "v", "tag")


def _rows_df(spark, rows):
    return spark.createDataFrame(
        [(k, v, tag) for k, (v, tag) in sorted(rows.items())],
        "k BIGINT, v DOUBLE, tag STRING",
    )


def _table_state(t):
    return {
        r["k"]: (r["v"], r["tag"]) for r in t.read().select(*COLS).collect()
    }


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_dml_random_walk_matches_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    model = {k: (float(k), "base") for k in range(200)}
    t = ManagedTable.create(
        spark, str(tmp_path / f"walk{seed}"), _rows_df(spark, model),
        cluster_by=("k",), num_files=2, primary_keys=("k",),
    )
    snapshots = {0: dict(model)}
    next_key = 200

    def op_append():
        nonlocal next_key, model
        n = rng.randint(5, 30)
        new = {next_key + i: (float(next_key + i) * 2, "app") for i in range(n)}
        next_key += n
        t.append(_rows_df(spark, new))
        model.update(new)

    def op_merge():
        nonlocal next_key, model
        existing = rng.sample(sorted(model), min(len(model), rng.randint(3, 25)))
        fresh = [next_key + i for i in range(rng.randint(0, 10))]
        src = {k: (-1.0 * k, "mrg") for k in existing + fresh}
        if fresh:
            next_key = fresh[-1] + 1
        t.merge(_rows_df(spark, src), on=["k"], validate_unique=False)
        model.update(src)

    def op_delete():
        nonlocal model
        m = rng.choice([3, 5, 7])
        r = rng.randrange(m)
        t.delete(f"k % {m} = {r}")
        model = {k: v for k, v in model.items() if k % m != r}

    def op_update():
        nonlocal model
        m = rng.choice([2, 4, 9])
        r = rng.randrange(m)
        t.update({"v": "v + 100.0", "tag": "'upd'"}, f"k % {m} = {r}")
        model = {
            k: ((v + 100.0, "upd") if k % m == r else (v, tag))
            for k, (v, tag) in model.items()
        }

    def op_merge_delete():
        nonlocal next_key, model
        existing = rng.sample(sorted(model), min(len(model), rng.randint(2, 15)))
        fresh = [next_key + i for i in range(rng.randint(0, 5))]
        src = {k: (0.5 * k, "del") for k in existing + fresh}
        if fresh:
            next_key = fresh[-1] + 1
        t.merge(
            _rows_df(spark, src), on=["k"], validate_unique=False,
            when_matched="delete",
        )
        for k in existing:
            model.pop(k, None)
        model.update({k: src[k] for k in fresh})

    def op_restore():
        nonlocal model
        v = rng.choice(sorted(snapshots))
        if v == t.current.version:
            return
        t.restore(v)
        model = dict(snapshots[v])

    def op_optimize():
        t.optimize(target_file_rows=500)

    ops = [
        op_append, op_merge, op_merge_delete, op_delete, op_update,
        op_restore, op_optimize,
    ]
    for step in range(10):
        rng.choice(ops)()
        ver = t.current.version
        if ver not in snapshots:
            snapshots[ver] = dict(model)
        assert t.read().count() == len(model), f"seed {seed} step {step}"
        if step % 3 == 2:
            assert _table_state(t) == model, f"seed {seed} step {step}"
            # time travel to a random snapshot must reproduce it exactly
            hv = rng.choice(sorted(snapshots))
            hist = {
                r["k"]: (r["v"], r["tag"])
                for r in t.read(version=hv).select(*COLS).collect()
            }
            assert hist == snapshots[hv], f"seed {seed} step {step} v{hv}"
    assert _table_state(t) == model, f"seed {seed} final"

    # CDC epilogue: a replica built from the v0 snapshot and synced with
    # ONE apply_changes over the whole walk's feed must land on the same
    # final state — whatever sequence of merges/deletes/updates/restores
    # the walk produced, the feed replay is lossless.
    rep = ManagedTable.create(
        spark, str(tmp_path / f"rep{seed}"), _rows_df(spark, snapshots[0]),
        cluster_by=("k",), num_files=2, primary_keys=("k",),
    )
    rep.apply_changes(t.changes(from_version=0))
    assert _table_state(rep) == model, f"seed {seed} replica"
