"""Bucketed tables: pre-shuffled storage so repeated equi-joins on the
bucket key need NO exchange — the co-located-join strategy for the
tables a 100 TB deployment joins constantly (orders ⋈ lineitem)."""

import uuid

from pyspark.sql import functions as F

from ksql_streams_from_schema_converter_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark):
    suffix = uuid.uuid4().hex[:8]
    orders_t, lineitem_t = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    # at test scale the dimension fits the broadcast threshold and Spark
    # would (correctly) broadcast; disable it to exercise the co-located
    # bucket join that big-big joins rely on
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        (
            load_table(spark, SF_DIR, "orders")
            .write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable(orders_t)
        )
        (
            load_table(spark, SF_DIR, "lineitem")
            .write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable(lineitem_t)
        )
        o = spark.table(orders_t)
        li = spark.table(lineitem_t)
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # both sides pre-bucketed on the join key: the join itself
        # requires no Exchange (only the tiny post-join agg shuffles)
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in join_part, join_part[:2000]
        # sanity: result matches the plain-parquet join
        plain = (
            load_table(spark, SF_DIR, "lineitem")
            .join(
                load_table(spark, SF_DIR, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .count()
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {orders_t}")
        spark.sql(f"DROP TABLE IF EXISTS {lineitem_t}")
