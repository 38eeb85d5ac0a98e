"""Plan-shape guards for the second round-5 batch (graph / ranking /
CMS / schema evolution): pin the execution shapes the 100 TB story
depends on."""

from pyspark.sql import functions as F

from ksql_streams_from_schema_converter_spark.workload import WORKLOAD

SF = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()  # finalize AQE
    return df._jdf.queryExecution().executedPlan().toString()


def test_global_ntile_has_no_single_partition_window(spark):
    """The whole point of operators/ranking.py: the rank window must be
    keyed on the range-partition id, never an empty partition spec
    (which would serialize 100 TB through one reducer)."""
    from ksql_streams_from_schema_converter_spark.operators.ranking import (
        global_ntile,
    )
    from ksql_streams_from_schema_converter_spark.sources.parquet import load_table

    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    df = global_ntile(orders, ["o_totalprice", "o_orderkey"], k=8)
    plan = _executed_plan(df)
    assert "Window" in plan, plan
    # every Window operator line must carry a non-empty partition spec
    for line in plan.splitlines():
        if "Window [" in line:
            assert "__pid" in line, f"unpartitioned global window: {line}"
    # the offsets side is a broadcast, not a shuffle join
    assert "BroadcastHashJoin" in plan, plan


def test_triangle_closure_is_hash_join_not_nested_loop(spark):
    """The wedge-closing probe must stay a two-column equi-join — an
    OR-of-conjunctions condition silently degrades to
    BroadcastNestedLoopJoin, which is quadratic at scale.  Built with
    release=False: the shipped operator eager-checkpoints its result
    (cache hygiene), which would hide the join plan from inspection."""
    from ksql_streams_from_schema_converter_spark.operators.graph import (
        triangle_participation,
    )
    from ksql_streams_from_schema_converter_spark.workload import _triangle_pairs

    plan = _executed_plan(
        triangle_participation(_triangle_pairs(spark, SF), release=False)
    )
    assert "NestedLoop" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_pagerank_plan_is_one_job_no_python(spark):
    """3 fixed rounds must compile into one lazy JVM plan: no Python
    evaluation anywhere, edge inputs reused via persisted
    InMemoryRelation (not recomputed per round).  release=False gives
    the lazy plan (the shipped operator eager-checkpoints and
    unpersists — ADVICE r5 — which would hide both properties); the
    shipped path is additionally asserted to return a truncated-
    lineage checkpoint scan."""
    from ksql_streams_from_schema_converter_spark.operators.graph import (
        pagerank_fixed_point,
    )
    from ksql_streams_from_schema_converter_spark.workload import _pagerank_edges

    lazy = pagerank_fixed_point(_pagerank_edges(spark, SF), n_iter=3, release=False)
    plan = _executed_plan(lazy)
    assert "Python" not in plan, plan
    assert "InMemoryTableScan" in plan, plan

    shipped = WORKLOAD["pagerank_supplier_customer"][0](spark, SF)
    shipped_plan = shipped._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in shipped_plan, shipped_plan  # checkpointed
    assert "InMemoryTableScan" not in shipped_plan, shipped_plan  # released


def test_cms_sketch_shuffle_is_map_side_combined(spark):
    """The CMS build must partial-aggregate before its shuffle — the
    depth×width key space collapses each map task to ≤256 rows."""
    from ksql_streams_from_schema_converter_spark.operators.sketch import (
        count_min_sketch,
    )
    from ksql_streams_from_schema_converter_spark.sources.parquet import load_table

    orders = load_table(spark, SF, "orders")
    plan = _executed_plan(count_min_sketch(orders.select("o_custkey"), "o_custkey"))
    assert "partial_count" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_schema_evolution_read_prunes_columns(spark):
    """The merged read must still push column pruning into both file
    schemas (ReadSchema carries only the referenced columns)."""
    import tempfile

    from ksql_streams_from_schema_converter_spark.sources.parquet import load_table

    orders = load_table(spark, SF, "orders")
    root = tempfile.mkdtemp(prefix="evo_plan_")
    orders.select("o_orderkey", "o_orderstatus").write.mode("overwrite").parquet(
        f"{root}/batch=1"
    )
    orders.select(
        "o_orderkey", "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("total"),
    ).write.mode("overwrite").parquet(f"{root}/batch=2")
    merged = (
        spark.read.option("mergeSchema", "true")
        .option("basePath", root)
        .parquet(root)
        .select("o_orderstatus")
    )
    scan = merged._jdf.queryExecution().executedPlan().toString()
    assert "o_orderkey" not in scan.split("ReadSchema")[-1], scan


def test_dynamic_partition_overwrite_preserves_untouched_partitions(spark, tmp_path):
    """Backfill contract: a dynamic-mode overwrite carrying only
    lang=de must leave lang=en/fr files byte-identical and visible,
    where static mode would truncate the table root first."""
    import os

    from ksql_streams_from_schema_converter_spark.sources.files import (
        overwrite_partitions_dynamic,
        write_partitioned_parquet,
    )

    path = str(tmp_path / "dyn")
    full = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "fr"), (4, "de")], "id long, lang string"
    )
    write_partitioned_parquet(full, path, ["lang"])
    before = sorted(os.listdir(os.path.join(path, "lang=en")))
    patch = spark.createDataFrame([(40, "de"), (41, "de")], "id long, lang string")
    overwrite_partitions_dynamic(patch, path, ["lang"])
    after = sorted(os.listdir(os.path.join(path, "lang=en")))
    assert before == after  # untouched partition's files not rewritten
    got = {(r.id, r.lang) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "en"), (2, "en"), (3, "fr"), (40, "de"), (41, "de")}


def test_join_strategy_hints_are_honored(spark):
    """The engine's join-hardening toolkit assumes Catalyst honors
    explicit strategy hints (the manual override when AQE's stats
    mislead at 100 TB): broadcast/merge/shuffle_hash each must surface
    as the corresponding physical join."""
    from ksql_streams_from_schema_converter_spark.sources.parquet import load_table

    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    cases = {
        "broadcast": "BroadcastHashJoin",
        "merge": "SortMergeJoin",
        "shuffle_hash": "ShuffledHashJoin",
    }
    for hint, op in cases.items():
        j = o.join(c.hint(hint), o.o_custkey == c.c_custkey)
        plan = _executed_plan(j.select("o_orderkey", "c_name"))
        assert op in plan, f"{hint}: expected {op} in plan\n{plan}"


def test_scd2_point_in_time_join_is_keyed_hash_join(spark):
    """The validity-interval lookup must hash-join on user_id with the
    range bounds as residual predicates — a nested-loop plan would be
    quadratic over facts × versions at scale."""
    plan = _executed_plan(WORKLOAD["scd2_point_in_time_join"][0](spark, SF))
    assert "NestedLoop" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_sliding_window_aggregation_is_partial_agged(spark):
    """The 4× window explode must happen below a map-side-combining
    aggregate — the shuffle carries (window, type) groups."""
    plan = _executed_plan(WORKLOAD["events_sliding_window_rates"][0](spark, SF))
    assert "partial_count" in plan or "partial_sum" in plan, plan


def test_entity_resolution_no_python_in_plan(spark):
    """Blocking, clustering, and survivorship are all JVM-side."""
    plan = _executed_plan(WORKLOAD["entity_resolution_golden"][0](spark, SF))
    assert "Python" not in plan, plan


def test_winsorize_bounds_broadcast_not_shuffled(spark):
    """The 1-row percentile bounds must broadcast into the clamp —
    re-shuffling the fact table for a 1-row join is the anti-shape."""
    plan = _executed_plan(WORKLOAD["winsorize_order_prices"][0](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
