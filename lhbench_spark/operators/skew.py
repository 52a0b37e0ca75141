"""Salted join for skewed keys.

AQE's skew-join split (on in this engine's session) handles moderate
skew by splitting oversized sort-merge partitions, but it only triggers
on sort-merge joins and only at shuffle-partition granularity. When one
key is pathologically hot (a boilerplate document bucket, a null-ish
default key, a celebrity user), the classic remedy is explicit salting:

- probe side: append a salt in [0, S) to the join key — deterministic
  here (hash of a unique row id modulo S) so results are reproducible
  and oracle-checkable; random salts have identical distribution
  properties at scale;
- build side: replicate each row S times, once per salt value;
- join on (key, salt): the hot key's rows now spread over S partitions
  instead of one straggler task.

Cost model: build-side replication ×S vs eliminating the straggler —
salt only the keys that need it. ``salted_join`` therefore takes a
``hot_keys`` DataFrame (typically from a cheap pre-aggregation or a
known-hot-keys table): only hot keys are salted/replicated; the cold
remainder joins normally and the two results union. At 100 TB the hot
set is tiny (it is, by definition, the head of the distribution), so
the replicated build stays broadcast-sized.

The reference delegates all join strategy to Catalyst/AQE
(SURVEY.md §2.3); this operator is the explicit escape hatch for the
skew AQE cannot fix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    build_on: str | None = None,
    salts: int = 8,
    salt_src: str | None = None,
    hot_keys: DataFrame | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``probe`` with ``build`` on ``probe[on] == build[build_on]``,
    spreading skewed keys over ``salts`` partitions.

    ``salt_src`` names a probe column whose hash drives the deterministic
    salt (default: the join key itself is NOT usable — every row of a hot
    key would land in one salt — so callers pass a unique/near-unique
    column, e.g. the probe's primary key). ``hot_keys`` (single column
    named like ``on``) restricts salting to those keys; when None, every
    key is salted (correct, but replicates the whole build side ×salts —
    only for small builds).
    """
    build_on = build_on or on
    salt_src = salt_src or on
    b = build.withColumnRenamed(build_on, on) if build_on != on else build

    probe_salted = probe.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(salts)).cast("int")
    )
    salt_values = F.array(*[F.lit(i) for i in range(salts)])
    build_replicated = b.withColumn("_salt", F.explode(salt_values))

    if hot_keys is None:
        return (
            probe_salted.join(build_replicated, [on, "_salt"], how).drop("_salt")
        )

    hot = hot_keys.select(on).dropDuplicates()
    # Hot slice: salted join; cold slice: plain join. Both joins carry the
    # same schema, so the union is by name. The hot set is broadcast for
    # the slice split (it is small by definition).
    probe_hot = probe_salted.join(F.broadcast(hot), on, "left_semi")
    probe_cold = probe.join(F.broadcast(hot), on, "left_anti")
    build_hot = build_replicated.join(F.broadcast(hot), on, "left_semi")
    build_cold = b.join(F.broadcast(hot), on, "left_anti")

    joined_hot = probe_hot.join(build_hot, [on, "_salt"], how).drop("_salt")
    joined_cold = probe_cold.join(build_cold, on, how)
    return joined_hot.unionByName(joined_cold)
