"""Connected components over near-duplicate pair graphs.

The dedup operators (operators/dedup.py) emit PAIRS; a curation pipeline
needs CLUSTERS — each group of transitively-connected near-dups collapses
to one keeper. That closure is connected components, computed here by
iterative min-label propagation (the Pregel/GraphX formulation, no GraphX
dependency):

1. every node starts labeled with its own id;
2. each round, a node adopts the minimum label among itself and its
   neighbors (one join edges→labels + one min-aggregate + one join back);
3. stop when a round changes no label.

Rounds needed = graph diameter. Near-dup clusters are band-collision
cliques or near-cliques, so diameter is tiny (2-4) regardless of corpus
size — the iteration count does NOT grow with data volume, only the
per-round join sizes do, and those are plain shuffles Catalyst/AQE
handle. Each round's result is ``localCheckpoint``-ed: without it the
lineage doubles per iteration and planning time explodes by round ~10
(checkpointing per round is exactly what GraphX's Pregel does).

The per-round convergence test is a driver-side ``count`` — a scalar
action per round (bounded by diameter), not a data collect; this is the
sanctioned pattern for iterative algorithms on Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """(id, cluster_id) for every node appearing in ``edges``;
    ``cluster_id`` = the minimum node id reachable from ``id`` (so the
    cluster label doubles as the deterministic keeper id).

    ``max_iter`` is a safety bound, not a tuning knob — propagation
    converges in O(diameter) rounds and raises if the bound is hit
    (a silent early stop would return wrong clusters).
    """
    # Materialize the edge list BEFORE symmetrizing: the two union
    # branches would otherwise each evaluate the (expensive) upstream
    # pair pipeline — checkpoint once, derive both directions from it.
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")).localCheckpoint(
        eager=True
    )
    # Right-size the round partitioning to the graph, not the session
    # default: each propagation round schedules its joins over this many
    # partitions, and a near-dup graph is orders of magnitude smaller than
    # the corpus that produced it (32-way task scheduling on a few
    # thousand edges costs more than the joins themselves). ~1M edges per
    # partition; grows with the graph at cluster scale.
    n_edges = e.count()
    if n_edges == 0:
        # No pairs → no clusters: skip the whole fixpoint machinery (a
        # tight-threshold run on a clean corpus otherwise pays several
        # rounds of join/checkpoint jobs to discover nothing).
        return e.select(
            F.col("_s").alias("id"), F.col("_s").alias("cluster_id")
        )
    parts = max(1, min(e.rdd.getNumPartitions(), n_edges // 1_000_000 + 1))
    sym = (
        e.unionByName(e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d")))
        .repartition(parts, "_s")
        .dropDuplicates(["_s", "_d"])
        .localCheckpoint(eager=True)
    )

    labels = (
        sym.select(F.col("_s").alias("id"))
        .dropDuplicates(["id"])
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["_s"] == labels["id"])
            .groupBy(F.col("_d").alias("id2"))
            .agg(F.min("label").alias("nmin"))
        )
        propagated = labels.join(
            neighbor_min, labels["id"] == neighbor_min["id2"], "left"
        ).select(
            "id",
            F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                "label"
            ),
            (F.coalesce(F.col("nmin"), F.col("label")) < F.col("label")).alias("_chg"),
        )
        # Pointer jumping: label(id) <- label(label(id)). One extra
        # self-join per round turns O(diameter) convergence into
        # O(log diameter) — chain-shaped components (A~B~C without A~C,
        # common at moderate Jaccard thresholds) would otherwise need a
        # round per hop. Every label is itself a node id, so the lookup
        # side is the same labels relation.
        lookup = propagated.select(
            F.col("id").alias("jid"), F.col("label").alias("jlabel")
        )
        jump = propagated.alias("a").join(
            lookup.alias("b"), F.col("a.label") == F.col("b.jid"), "left"
        )
        new_labels = jump.select(
            F.col("a.id").alias("id"),
            F.least(
                F.col("a.label"), F.coalesce(F.col("b.jlabel"), F.col("a.label"))
            ).alias("label"),
            (
                F.col("a._chg")
                | (F.coalesce(F.col("b.jlabel"), F.col("a.label")) < F.col("a.label"))
            ).alias("_chg"),
        ).localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("_chg")).limit(1).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            return labels.select("id", F.col("label").alias("cluster_id"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds the safety bound)"
    )
