"""range_join semantics + plan shape."""

import datetime

from pyspark.sql import functions as F

from ksql_streams_from_schema_converter_spark.operators.rangejoin import range_join


def ts(s):
    return datetime.datetime.fromisoformat(s)


def test_range_join_boundaries(spark):
    left = spark.createDataFrame(
        [(1, 10, ts("2024-01-01T10:00:00"))], "lid int, k int, lts timestamp"
    )
    right = spark.createDataFrame(
        [
            (100, 10, ts("2024-01-01T09:59:59")),  # before -> out
            (101, 10, ts("2024-01-01T10:00:00")),  # inclusive start -> in
            (102, 10, ts("2024-01-01T10:09:59")),  # inside -> in
            (103, 10, ts("2024-01-01T10:10:00")),  # exclusive end -> out
            (104, 99, ts("2024-01-01T10:05:00")),  # wrong key -> out
        ],
        "rid int, k int, rts timestamp",
    )
    got = sorted(
        r.rid for r in range_join(left, right, "k", "lts", "rts", 600).collect()
    )
    assert got == [101, 102]


def test_range_join_crosses_bucket_boundary(spark):
    # left at 09:55, window 10min -> right at 10:02 is in the NEXT bucket
    left = spark.createDataFrame([(1, 1, ts("2024-01-01T09:55:00"))], "lid int, k int, lts timestamp")
    right = spark.createDataFrame([(2, 1, ts("2024-01-01T10:02:00"))], "rid int, k int, rts timestamp")
    assert range_join(left, right, "k", "lts", "rts", 600).count() == 1


def test_range_join_no_nested_loop(spark):
    left = spark.createDataFrame([(1, 1, ts("2024-01-01T09:55:00"))], "lid int, k int, lts timestamp")
    right = spark.createDataFrame([(2, 1, ts("2024-01-01T10:02:00"))], "rid int, k int, rts timestamp")
    plan = range_join(left, right, "k", "lts", "rts", 600)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_range_join_subsecond_boundary(spark):
    # exact diff 599.2s < 600 -> must match; unix_timestamp()-based
    # (whole-second) arithmetic would wrongly drop it
    left = spark.createDataFrame(
        [(1, 1, ts("2024-01-01T10:00:00.900"))], "lid int, k int, lts timestamp"
    )
    right = spark.createDataFrame(
        [(2, 1, ts("2024-01-01T10:10:00.100")),   # 599.2s -> in
         (3, 1, ts("2024-01-01T10:10:00.900"))],  # exactly 600.0s -> out
        "rid int, k int, rts timestamp",
    )
    got = sorted(r.rid for r in range_join(left, right, "k", "lts", "rts", 600).collect())
    assert got == [2]
