"""Bloom-filter semi-join pruning: no false negatives (join identity),
real pruning power, codegen-only probe."""

from pyspark.sql import functions as F

from ksql_streams_from_schema_converter_spark.operators.bloom import (
    bloom_build,
    bloom_pruned_join,
    might_contain,
)


def test_no_false_negatives_and_join_identity(spark):
    dim = spark.range(0, 1000, 7).select(F.col("id").alias("k"))  # 143 keys
    fact = spark.range(10_000).select(F.col("id").alias("fk"), (F.col("id") * 2).alias("v"))
    plain = fact.join(dim, fact.fk == dim.k).select("fk", "v").collect()
    pruned = bloom_pruned_join(fact, dim, "fk", "k").select("fk", "v").collect()
    assert sorted(map(tuple, pruned)) == sorted(map(tuple, plain))


def test_pruning_actually_drops_most_rows(spark):
    dim = spark.range(0, 100).select(F.col("id").alias("k"))
    sketch = bloom_build(dim, "k", m_bits=8192, k=4)
    fact = spark.range(100_000).select(F.col("id").alias("fk"))
    kept = fact.where(might_contain(sketch, F.col("fk"))).count()
    # 100 true members + false positives; fp rate at n=100,m=8192,k=4
    # is ~1e-5 — allow generous slack
    assert 100 <= kept < 400, kept


def test_probe_is_codegen_only(spark):
    """The membership test must be a plain Filter over the scan — no
    Python, no join, no shuffle on the probe side."""
    dim = spark.range(0, 50).select(F.col("id").alias("k"))
    sketch = bloom_build(dim, "k")
    probe = spark.range(1000).select(F.col("id").alias("fk")).where(
        might_contain(sketch, F.col("fk"))
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "Filter" in plan
    for bad in ("Exchange", "MapInPandas", "BatchEvalPython", "Join"):
        assert bad not in plan, plan


def test_sketch_is_small_and_deterministic(spark):
    dim = spark.range(0, 500).select(F.col("id").alias("k"))
    s1 = bloom_build(dim, "k", m_bits=4096, k=3)
    s2 = bloom_build(dim.repartition(13), "k", m_bits=4096, k=3)
    assert s1 == s2  # partitioning-independent
    assert len(s1) == 4096 // 64
