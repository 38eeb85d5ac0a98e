"""Cache-lifecycle helper (operators/lifecycle.py): the result is
materialized with truncated lineage and the static inputs' cache
entries are actually released."""

from pyspark import StorageLevel

from ksql_streams_from_schema_converter_spark.operators.lifecycle import (
    eager_release,
)


def test_eager_release_materializes_and_unpersists(spark):
    a = spark.range(100).persist(StorageLevel.MEMORY_AND_DISK)
    a.count()
    assert a.storageLevel.useMemory  # cached going in
    out = eager_release(a.selectExpr("sum(id) AS s"), a)
    # input cache released the moment the helper returns
    assert not a.storageLevel.useMemory
    # result still correct and re-usable (checkpointed, not lazy over
    # the now-unpersisted input)
    assert out.head().s == 4950
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan, plan
