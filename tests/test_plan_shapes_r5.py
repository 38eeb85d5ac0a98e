"""Plan-shape guards for the round-5 operators: pin the execution
shapes the 100 TB story depends on, so a refactor cannot silently
reintroduce a recomputation or an extra corpus pass."""

from pyspark.sql import functions as F

from ksql_streams_from_schema_converter_spark.workload import WORKLOAD

SF = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()  # finalize AQE
    return df._jdf.queryExecution().executedPlan().toString()


def test_heavy_hitters_single_sketch_pass(spark):
    """The MG verdict query must run the sketch's mapInPandas exactly
    once and broadcast it — a self-join shape would re-run the corpus
    pass per reference (4× was the first cut)."""
    plan = _executed_plan(WORKLOAD["heavy_hitters_misra_gries"][0](spark, SF))
    assert plan.count("MapInPandas") == 1, plan
    assert "BroadcastHashJoin" in plan


def test_bigram_counts_single_exchange_topk(spark):
    """One count shuffle with map-side partial aggregation, then
    TakeOrdered — no global sort of the distinct-bigram space."""
    plan = _executed_plan(WORKLOAD["bigram_counts_top"][0](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan  # map-side combine before the shuffle
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_cogroup_is_one_shuffle_per_side(spark):
    """Cogroup co-partitions both sides on the key: exactly one
    hash-partitioning Exchange per input, one FlatMapCoGroups."""
    plan = _executed_plan(WORKLOAD["cogroup_reconcile_orders"][0](spark, SF))
    assert "FlatMapCoGroupsInPandas" in plan
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_planted_corpus_is_two_branch_union(spark):
    """planted_corpus must stay base ∪ ONE exploded branch (the
    copies-way-union first cut multiplied plan size and codegen)."""
    from ksql_streams_from_schema_converter_spark.operators.similarity import (
        planted_corpus,
    )
    from ksql_streams_from_schema_converter_spark.sources.parquet import load_table

    emb = load_table(spark, SF, "embeddings")
    corpus = planted_corpus(emb, list(range(5)), copies=5)
    plan = corpus._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Union") == 1, plan
    assert plan.lower().count("generate explode") + plan.count("Generate explode") >= 1
    # value identity with the per-copy definition: 25 planted rows,
    # copy j of query q gets id q + 100000*j
    planted = corpus.where(F.col("vec_id") >= 100_000)
    assert planted.count() == 25
    ids = {r.vec_id for r in planted.select("vec_id").collect()}
    assert ids == {q + 100_000 * j for q in range(5) for j in range(1, 6)}


def test_salted_join_spreads_hot_key_and_matches_plain(spark):
    """Salted join: output identical to the plain join, and the big
    side's shuffle spreads a single hot key over multiple partitions
    (the plain shuffle pins it to one)."""
    from ksql_streams_from_schema_converter_spark.operators.skew import salted_join

    big = spark.range(20_000).select(F.lit(3).alias("k"), F.col("id").alias("v"))
    small = spark.createDataFrame([(3, "three"), (4, "four")], "k long, name string")
    plain = big.join(small.withColumnRenamed("k", "sk"), F.col("k") == F.col("sk")) \
        .select("v", "name").collect()
    salted = salted_join(big, small.withColumnRenamed("k", "sk"), "k", "sk", n_salts=8) \
        .select("v", "name").collect()
    assert sorted(map(tuple, salted)) == sorted(map(tuple, plain))
    # the join key is (key, salt): one hot key occupies up to 8 buckets
    from ksql_streams_from_schema_converter_spark.operators.skew import F as _F  # noqa: F401
    salts = (
        big.withColumn(
            "__salt",
            F.pmod(F.hash(F.col("k"), F.monotonically_increasing_id()), 8),
        )
        .select("__salt").distinct().count()
    )
    assert salts == 8
