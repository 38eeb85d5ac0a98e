"""Plan-shape guards for the round-6 operators (span dedup, DSIR,
mixture, Bradley-Terry, GRPO): pin the execution shapes the 100 TB
story depends on."""

from pyspark.sql import functions as F

from ksql_streams_from_schema_converter_spark.workload import WORKLOAD

SF = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()  # finalize AQE
    return df._jdf.queryExecution().executedPlan().toString()


def test_span_dedup_has_no_self_join(spark):
    """Repeat detection must be ONE window over the gram key (hot
    grams cost O(df)) — a gram-keyed self-join would reintroduce the
    O(df^2) blowup the operator exists to avoid, and any join in this
    plan at all would be a regression (the doc_spans attach is the
    single legitimate join)."""
    fn, _ = WORKLOAD["dedup_span_exact_substr"]
    plan = _executed_plan(fn(spark, SF))
    assert "Window" in plan
    joins = [
        ln
        for ln in plan.splitlines()
        if "Join" in ln and "BroadcastNestedLoop" not in ln
    ]
    # exactly the doc_spans left-join back onto the token table
    assert len(joins) == 1, joins
    assert "CartesianProduct" not in plan


def test_dsir_rank_is_distributed_not_single_partition(spark):
    """The top-quartile keep must run on the range-partitioned global
    rank: a Window keyed by the range-partition id, and NO Window with
    an empty partition spec (which would serialize the corpus through
    one reducer at 100 TB)."""
    fn, _ = WORKLOAD["dsir_importance_selection"]
    plan = _executed_plan(fn(spark, SF))
    # the range-partitioned layout is materialized (localCheckpoint)
    # inside global_row_number, so the final plan scans it as an
    # ExistingRDD carrying the partition id — and every Window must be
    # keyed by that id, never an empty partition spec
    wins = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert wins, plan
    for line in wins:
        assert "__pid" in line, f"unpartitioned global window: {line}"
    assert "__pid" in plan.split("Scan ExistingRDD", 1)[1], plan


def test_mixture_broadcasts_the_domain_tables(spark):
    """Every join against the per-domain weight/allocation tables (one
    row per domain) must broadcast; the only data-sized shuffle is the
    per-domain cumulative-sum window."""
    fn, _ = WORKLOAD["domain_mixture_allocation"]
    plan = _executed_plan(fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan


def test_bradley_terry_pair_extraction_shape(spark):
    """The data-sized stage: part joins lineitem by broadcast (hinted —
    constant-ish dimension), the per-order self-join is an equi-join on
    the order key (never nested-loop), and the residual pair filters
    stay post-join predicates."""
    from ksql_streams_from_schema_converter_spark.operators.preference import (
        pairwise_wins,
    )
    from ksql_streams_from_schema_converter_spark.sources.parquet import load_table

    li = (
        load_table(spark, SF, "lineitem")
        .join(
            F.broadcast(load_table(spark, SF, "part")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_orderkey", "l_linenumber", "p_brand", "l_extendedprice")
    )
    wins = pairwise_wins(
        li, "l_orderkey", "l_linenumber", "p_brand", "l_extendedprice"
    )
    plan = _executed_plan(wins)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # partial aggregation on the win counts (map-side combine)
    assert plan.count("HashAggregate") >= 2, plan


def test_grpo_uses_partial_aggregation_and_one_group_shuffle(spark):
    """Group stats partial-aggregate map-side; the join back to rows
    and the rank window share the user_id key."""
    fn, _ = WORKLOAD["grpo_group_advantage"]
    plan = _executed_plan(fn(spark, SF))
    assert plan.count("HashAggregate") >= 2, plan
    assert "CartesianProduct" not in plan
