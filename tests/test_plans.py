"""Physical-plan regression tests — the scale discipline, asserted.

Correctness tests prove the right ANSWER; these prove the right PLAN.
Each assertion encodes a property that silently eroding would not change
any result at sf0.01 but would sink a 100 TB run:

- filters/projections reach the parquet scan (PushedFilters/ReadSchema);
- dimension joins broadcast (no fact-sized shuffle for small sides);
- ORDER BY + LIMIT fuses to TakeOrderedAndProject (never a global sort);
- no Python row-UDF (BatchEvalPython) appears in any registered plan.
"""

from __future__ import annotations

import re

import pytest

from lhbench_spark.catalog import table
from lhbench_spark.queries import all_queries
from tests.conftest import SMOKE_SF


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# Per-query (physical-str, analyzed-str, optimized-JVM-node) plans, built once per
# session: the parametrized lints share the build (DML queries run a whole
# table lifecycle at DataFrame-construction time, so each avoided
# rebuild saves real suite seconds).
_PLAN_CACHE: dict[str, tuple[str, str, object]] = {}


def plans_for(spark, name: str) -> tuple[str, str]:
    p, a, _ = plans3_for(spark, name)
    return p, a


def plans3_for(spark, name: str) -> tuple[str, str, object]:
    if name not in _PLAN_CACHE:
        df = all_queries()[name].spark_fn(spark, SMOKE_SF)
        qe = df._jdf.queryExecution()
        _PLAN_CACHE[name] = (
            qe.executedPlan().toString(),
            qe.analyzed().toString(),
            # optimized (not analyzed): CTE definitions are inlined, so a
            # Window's reducing Aggregate is actually IN its subtree
            qe.optimizedPlan(),
        )
    return _PLAN_CACHE[name]


def _iter_plan_nodes(node):
    yield node
    ch = node.children()
    for i in range(ch.size()):
        yield from _iter_plan_nodes(ch.apply(i))


def unreduced_global_windows(analyzed_node) -> list[str]:
    """Logical Window nodes with an EMPTY partition spec whose subtree
    holds no Aggregate/GlobalLimit: a global window over unreduced data
    funnels the whole input into ONE task at execution (WindowExec warns
    exactly this). Over a pre-aggregated bounded frame (one row per
    month/lang/group) the single partition is metadata-sized and fine —
    which is why the lint demands the reducing node, not a blanket ban."""
    bad = []
    for n in _iter_plan_nodes(analyzed_node):
        if n.getClass().getSimpleName() != "Window":
            continue
        if not n.partitionSpec().isEmpty():
            continue
        reduced = any(
            c.getClass().getSimpleName() in ("Aggregate", "GlobalLimit")
            for c in _iter_plan_nodes(n.child())
        )
        if not reduced:
            bad.append(n.toString().splitlines()[0][:160])
    return bad


# ---- forced-broadcast lint (the r4/r5 scale-killer class) ----
# SF-scaled base relations, identified by their key column in the
# analyzed plan's Relation lines. nation/region (25/5 rows at every SF)
# are the only hint-safe bases.
_SF_MARKERS = (
    "l_orderkey#", "o_orderkey#", "c_custkey#", "s_suppkey#",
    "p_partkey#", "doc_id#", "vec_id#",
)
# Nodes that bound the broadcast side's cardinality below the base
# relation's: an aggregate/limit/distinct (hard reduction) or a literal
# filter/sample/semi-join (the caller selected a bounded slice). A bare
# full-table hint has none of these between the hint and the Relation.
_REDUCERS = (
    "Aggregate", "GlobalLimit", "Deduplicate", "Filter", "Sample",
    "Intersect", "Join LeftSemi",
)


def _tree_depth(line: str) -> int | None:
    m = re.search(r"[+:]- ", line)
    return m.start() if m else (0 if line.strip() else None)


def forced_sf_broadcasts(analyzed: str) -> list[str]:
    """ResolvedHint(broadcast) nodes whose subtree scans an SF-scaled
    base with no cardinality-reducing node in between."""
    lines = analyzed.splitlines()
    hits = []
    for i, ln in enumerate(lines):
        if "ResolvedHint" not in ln or "broadcast" not in ln.lower():
            continue
        depth = _tree_depth(ln) or 0
        subtree = []
        for j in range(i + 1, len(lines)):
            dj = _tree_depth(lines[j])
            if dj is None or dj <= depth:
                break
            subtree.append(lines[j])
        scans_sf = any(
            any(mk in s for mk in _SF_MARKERS)
            for s in subtree
            if "Relation" in s
        )
        reduced = any(any(r in s for r in _REDUCERS) for s in subtree)
        if scans_sf and not reduced:
            hits.append(ln.strip())
    return hits


def test_filter_pushdown_reaches_scan(spark):
    """A filtered scan must carry PushedFilters and a pruned ReadSchema."""
    df = table(spark, SMOKE_SF, "orders").filter(
        "o_orderpriority = '1-URGENT'"
    ).select("o_orderkey", "o_totalprice")
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(o_orderpriority)" in plan or (
        "PushedFilters" in plan and "o_orderpriority" in plan
    ), plan
    # column pruning: the scan schema must not include unprojected cols
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_comment" not in read_schema, read_schema


def test_dimension_join_broadcasts(spark):
    """join_shipping_priority: both dimension sides broadcast — the fact
    table is never shuffled for them."""
    q = all_queries()["join_shipping_priority"]
    plan = plan_of(q.spark_fn(spark, SMOKE_SF))
    assert "BroadcastHashJoin" in plan, plan


def test_topk_fuses_to_take_ordered(spark):
    """sort_topk: ORDER BY + LIMIT must plan as TakeOrderedAndProject,
    not a global Sort."""
    q = all_queries()["sort_topk"]
    plan = plan_of(q.spark_fn(spark, SMOKE_SF))
    assert "TakeOrderedAndProject" in plan, plan


# Query CONSTRUCTION for the lifecycle families executes the whole DML/
# stream/refresh pipeline just to hand back the final frame to explain —
# ~85 s of the verify gate for a lint those families can barely trip
# (their plans come from tables.py/streaming machinery, not query-authored
# Python). The default gate lints every cheap-to-construct query (all the
# relational + every pandas-capable family: similarity, dedup, text,
# multimodal, training); the lifecycle constructions run under -m slow.
_LIFECYCLE_TAGS = {"dml", "managed-table", "streaming", "refresh", "workload"}


def _lint_params():
    for name, qd in sorted(all_queries().items()):
        if name == "multimodal_features":
            continue
        if _LIFECYCLE_TAGS & set(qd.tags):
            yield pytest.param(name, marks=pytest.mark.slow)
        else:
            yield pytest.param(name)


@pytest.mark.parametrize("name", _lint_params())
def test_no_python_row_udf(spark, name):
    """No registered query may contain a row-at-a-time Python UDF
    (BatchEvalPython). multimodal_features is excluded: it uses
    MapInPandas, the sanctioned Arrow-batched path, which this test
    verifies by its absence of BatchEvalPython too."""
    plan, _ = plans_for(spark, name)
    assert "BatchEvalPython" not in plan, f"{name} uses a row Python UDF"


def test_mapinpandas_is_arrow_batched(spark):
    """The one Python hot path is MapInPandas (Arrow), not BatchEvalPython."""
    q = all_queries()["multimodal_features"]
    plan = plan_of(q.spark_fn(spark, SMOKE_SF))
    assert "MapInPandas" in plan, plan
    assert "BatchEvalPython" not in plan, plan


# Queries whose CartesianProduct is in the OFFICIAL query text and whose
# product is provably bounded: q77's catalog branch is `FROM cs, cr`
# with NO join condition (the well-known q77 quirk; the reference runs
# the same text) where cs and cr are both GROUP BY cs_call_center_sk
# aggregates — ≤ call-center-count rows per side at ANY scale factor, so
# the product is dim×dim-sized and AQE re-plans it from runtime stats.
# The static planner sees only the pre-aggregation size estimate, hence
# CartesianProduct in the initial plan. Each entry must justify itself
# here; an unlisted CartesianProduct is still a failure.
_BOUNDED_OFFICIAL_CARTESIANS = {"tpcds_q77"}


def unaggregated_cross_sides(optimized_node) -> list[str]:
    """For every condition-less logical Join (the cross-product shape),
    return the sides whose subtree holds NO Aggregate — i.e. sides whose
    cardinality scales with the data instead of with a GROUP BY domain.
    The bounded-cartesian exemption is valid only when this is empty:
    agg × agg is domain² rows at any SF; raw × anything is the 100 TB
    product this lint exists to ban."""
    bad = []
    for n in _iter_plan_nodes(optimized_node):
        if n.getClass().getSimpleName() != "Join":
            continue
        if not n.condition().isEmpty():
            continue
        for label, side in (("left", n.left()), ("right", n.right())):
            reduced = any(
                c.getClass().getSimpleName() == "Aggregate"
                for c in _iter_plan_nodes(side)
            )
            if not reduced:
                bad.append(f"{label}: {side.toString().splitlines()[0][:120]}")
    return bad


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_no_unbroadcast_cartesian(spark, name):
    """No registered query may plan a CartesianProduct: an intentional
    cross join of bounded frames plans as BroadcastNestedLoopJoin (tiny
    side broadcast); a CartesianProduct means a full n×m shuffle product
    slipped in — fine at sf0.01, fatal at 100 TB."""
    plan, _ = plans_for(spark, name)
    if name in _BOUNDED_OFFICIAL_CARTESIANS:
        # Both sides of every condition-less join must still be
        # aggregates (the bounded-cardinality justification above); a
        # text edit that drops either GROUP BY turns this back into a
        # hard failure even though CartesianProduct stays in the plan.
        _, _, node = plans3_for(spark, name)
        raw_sides = unaggregated_cross_sides(node)
        assert not raw_sides, f"{name} cross-joins unaggregated data: {raw_sides}"
        return
    assert "CartesianProduct" not in plan, f"{name} plans a CartesianProduct"


def test_cross_side_lint_fires(spark):
    """Self-check: a cross join with one raw side must be flagged; the
    agg × agg shape (q77's justification) must pass."""
    orders = table(spark, SMOKE_SF, "orders")
    nation_agg = table(spark, SMOKE_SF, "nation").groupBy("n_regionkey").count()

    raw = orders.crossJoin(nation_agg)
    hits = unaggregated_cross_sides(raw._jdf.queryExecution().optimizedPlan())
    assert hits and hits[0].startswith("left"), hits

    both_agg = orders.groupBy("o_orderstatus").count().crossJoin(nation_agg)
    assert not unaggregated_cross_sides(
        both_agg._jdf.queryExecution().optimizedPlan()
    )


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_no_forced_broadcast_of_sf_scaled_base(spark, name):
    """No registered query may put a broadcast hint on an unreduced
    SF-scaled base relation (lineitem/orders/customer/supplier/part/
    documents/embeddings): the hint bypasses autoBroadcastJoinThreshold,
    so a side that fits at sf0.1 OOMs every executor at the reference's
    3 TB. Fixed-cardinality dims (nation/region) and bounded slices
    (aggregated / limited / literal-filtered frames) stay hintable; full
    tables belong to AQE. This is the lint that would have caught the
    r4 (joins/complex/merge) and r5 (windows/refresh) regressions when
    they were introduced."""
    _, analyzed = plans_for(spark, name)
    hits = forced_sf_broadcasts(analyzed)
    assert not hits, f"{name} force-broadcasts an SF-scaled base: {hits}"


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_global_window_only_over_reduced_child(spark, name):
    """A partition-less window is allowed ONLY over a subtree that an
    Aggregate (or LIMIT) has already collapsed to bounded cardinality —
    over raw data it moves everything to one task (SCALE.md, 'Joins /
    aggregation / window')."""
    _, _, node = plans3_for(spark, name)
    hits = unreduced_global_windows(node)
    assert not hits, f"{name} global-windows unreduced data: {hits}"


def test_global_window_lint_fires(spark):
    """Self-check: a global row_number over raw orders must be flagged;
    the same window over a groupBy'd frame must pass."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    orders = table(spark, SMOKE_SF, "orders")
    bad = orders.select(
        F.row_number().over(W.orderBy("o_orderkey")).alias("rn")
    )
    assert unreduced_global_windows(bad._jdf.queryExecution().optimizedPlan())
    ok = (
        orders.groupBy("o_orderpriority")
        .count()
        .select(F.row_number().over(W.orderBy("o_orderpriority")).alias("rn"))
    )
    assert not unreduced_global_windows(ok._jdf.queryExecution().optimizedPlan())


def test_forced_broadcast_lint_fires(spark):
    """Self-check: the lint must actually flag the bug class it guards —
    a bare F.broadcast(supplier) joined to lineitem."""
    from pyspark.sql import functions as F

    li = table(spark, SMOKE_SF, "lineitem")
    supp = F.broadcast(table(spark, SMOKE_SF, "supplier"))
    bad = li.join(supp, li.l_suppkey == supp.s_suppkey)
    analyzed = bad._jdf.queryExecution().analyzed().toString()
    assert forced_sf_broadcasts(analyzed), analyzed


def test_fan_out_is_conditional(spark):
    """fan_out must repartition a narrow input but leave an
    already-parallel input untouched (no Exchange node) — at 100 TB every
    scan is wide and an unconditional repartition is a full-corpus
    shuffle for nothing."""
    from lhbench_spark.operators import fan_out

    narrow = spark.range(0, 1000, 1, 1).toDF("id")
    assert "Exchange" in plan_of(fan_out(narrow)), plan_of(fan_out(narrow))
    wide = spark.range(0, 1000, 1, 64).toDF("id")
    assert "Exchange" not in plan_of(fan_out(wide)), plan_of(fan_out(wide))


def test_ivf_assignment_has_no_exchange(spark):
    """IVF cell assignment is an inline per-row argmin over the centroid
    literal — scan → project, no join/window: an Exchange here meant the
    old corpus × centroids shuffle (1e11 rows at 1e9 × 100) crept back."""
    from pyspark.sql import functions as F

    from lhbench_spark.operators import similarity as sim

    emb = table(spark, SMOKE_SF, "embeddings")
    cents = sim.ivf_centroids(emb)
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        sim.as_double("embedding").alias("_cv"),
    )
    assigned = sim.ivf_assign(c, cents, 1, "neighbor_id", "_cv")
    assert "Exchange" not in plan_of(assigned), plan_of(assigned)


def test_dpp_partition_filter_in_plan(spark):
    """catalog_dpp_partition_prune must plan a DynamicPruningExpression
    on the fact scan's PartitionFilters — the runtime dim-driven pruning
    the partitioned layout exists for (SURVEY §4 row 2)."""
    q = all_queries()["catalog_dpp_partition_prune"]
    plan = plan_of(q.spark_fn(spark, SMOKE_SF))
    assert "dynamicpruning" in plan.lower(), plan


def test_tpcds_dpp_partition_filter_in_plan(spark):
    """tpcds_dpp_store_sales must plan a DynamicPruningExpression on the
    daily-partitioned store_sales scan — the reference's fact layout
    (TPCDSDataLoad.scala:676-702 PARTITIONED BY ss_sold_date_sk) pruned
    at runtime by the month-filtered dim."""
    q = all_queries()["tpcds_dpp_store_sales"]
    plan = plan_of(q.spark_fn(spark, SMOKE_SF))
    assert "dynamicpruning" in plan.lower(), plan


def test_tpcds_bloom_runtime_filter_in_plan(spark):
    """tpcds_bloom_semijoin's join (with its scoped confs set) must get a
    runtime bloom filter injected: bloom_filter_agg built over the
    filtered item dim's join keys, might_contain pushed below the
    store_sales shuffle — the semi-join reduction that keeps a 100 TB
    fact's SMJ from shuffling rows the dim filter will discard."""
    from lhbench_spark.queries.tpcds_queries import (
        _BLOOM_CONFS,
        _bloom_join_frame,
    )

    saved = {k: spark.conf.get(k) for k in _BLOOM_CONFS}
    try:
        for k, v in _BLOOM_CONFS.items():
            spark.conf.set(k, v)
        opt = (
            _bloom_join_frame(spark, SMOKE_SF)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    assert "bloom_filter_agg" in opt, opt
    assert "might_contain" in opt, opt


def test_aqe_skew_join_splits_hot_partition(spark):
    """SCALE.md's skew posture says AQE's skew-join split handles
    moderate skew (the salted join covers the extreme case). Enforce
    that the split actually fires in this session's configuration: a
    90%-hot key must execute as SortMergeJoin(skew=true) with an
    AQEShuffleRead 'skewed' on the fact side. Thresholds are lowered to
    bench scale within the test's scope (at 100 TB the defaults — 256MB
    threshold, 5x median — trigger on real skew); the split works by
    re-reading map-output ranges, so the fact side needs >1 mapper."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "100KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.range(0, 2_000_000, 1, 16).select(
            F.when(F.col("id") % 100 < 90, 0)
            .otherwise(F.col("id") % 97 + 1)
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        dim = spark.range(0, 98, 1, 8).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        df = fact.join(dim, "k").groupBy().agg(F.count(F.lit(1)).alias("c"))
        assert df.collect()[0]["c"] == 2_000_000
        executed = df._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    assert "skew=true" in executed, executed
    assert "AQEShuffleRead skewed" in executed, executed


def test_ivf_partitioned_probe_prunes_partitions(spark):
    """ann_ivf_partitioned's probe scan must carry the probe cells as
    PartitionFilters on the cell-partitioned corpus — the read path that
    makes IVF an index (scan probes/num_cells of the data) rather than a
    full-corpus filter."""
    import tempfile

    from lhbench_spark.catalog import table
    from lhbench_spark.operators import similarity as sim
    from lhbench_spark.queries.similarity import _ivf_cents

    emb = table(spark, SMOKE_SF, "embeddings")
    cents = _ivf_cents(spark, SMOKE_SF)
    out = tempfile.mkdtemp(prefix="lhbench_ivfp_") + "/by_cell"
    sim.ivf_write_partitioned(emb, cents, out)
    df = sim.ivf_partitioned_topk(
        spark, out, emb.filter(emb.vec_id < 3), k=5, probes=2, cents=cents
    )
    plan = plan_of(df)
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "_cell" in pf and ("IN" in pf or "In(" in pf or "EqualTo" in pf), pf


def test_q64_shape_broadcasts_fixed_dims(spark):
    """complex_q64_bigjoin: the fixed-cardinality dims (nation ×2 roles,
    region — hinted) must broadcast in both fact passes (>= 6
    BroadcastHashJoins), and no SortMergeJoin may appear against a
    nation/region scan. SF-scaled dims (customer/supplier/part) are
    deliberately NOT asserted broadcast: their strategy belongs to AQE —
    a forced hint would OOM at 100× even though it is fast at sf0.01."""
    q = all_queries()["complex_q64_bigjoin"]
    plan = plan_of(q.spark_fn(spark, SMOKE_SF))
    assert plan.count("BroadcastHashJoin") >= 6, plan
    # every SortMergeJoin key in this tree joins fact-to-fact or
    # fact-to-SF-scaled-dim; nation/region keys must never appear there
    for line in plan.splitlines():
        if "SortMergeJoin" in line:
            assert "n_nationkey" not in line and "r_regionkey" not in line, line


def test_aqe_skew_split_on_tpcds_q03_plan(spark):
    """VERDICT r6 #4: dsdgen's real data skews fact join keys, which the
    uniform generator never shows AQE. Run the actual tpcds_q03 text
    over the Zipf-head store_sales variant (55/20/10% hot items, the
    top two passing q03's manufact filter so the join output is
    non-empty; tpcds_data.materialize_skewed_store_sales) and assert the skew
    split fires on an executed TPC-DS plan — SortMergeJoin(skew=true)
    with a skewed AQEShuffleRead. Broadcast is disabled in-scope so the
    dim join shuffles (at 100 TB the same split protects the fact-fact
    SMJs); thresholds are lowered to bench scale exactly as in
    test_aqe_skew_join_splits_hot_partition above."""
    from lhbench_spark import tpcds_data as td
    from lhbench_spark.queries.tpcds_queries import _TEXTS

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "30KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "30KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    # sf0.1: q03's d_moy filter passes ~8% of store_sales, so smaller
    # SFs leave the hot partition under any sane skew threshold.
    sf_dir = "/root/testdata/sf0.1"
    saved = {k: spark.conf.get(k) for k in confs}
    td.register_views(spark, sf_dir)
    skew_out = td.materialize_skewed_store_sales(spark, sf_dir)
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        spark.read.parquet(f"{skew_out}/store_sales").createOrReplaceTempView(
            "store_sales"
        )
        df = spark.sql(_TEXTS["tpcds_q03"][0])
        df.collect()
        executed = df._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
        # restore the uniform view so later tests see the default tables
        out = td.materialize(spark, sf_dir)
        spark.read.parquet(f"{out}/store_sales").createOrReplaceTempView(
            "store_sales"
        )
    assert "skew=true" in executed, executed
    assert "AQEShuffleRead skewed" in executed, executed


def test_domain_caps_rank_limit_pushes_map_side(spark):
    """train_domain_caps relies on Spark's rank-limit pushdown for its
    100 TB posture: the row_number <= K filter must compile to a
    WindowGroupLimit in Partial mode BELOW the exchange (each map task
    forwards at most K rows per source), so no task ever sorts a whole
    domain. If a regression drops the pushdown, the scale story in
    queries/training.py is void — fail loudly."""
    from lhbench_spark.queries import get_query

    df = get_query("train_domain_caps").spark_fn(spark, SMOKE_SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    assert "Partial" in plan, plan
