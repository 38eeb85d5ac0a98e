"""Distributed exact global ranking: row_number / NTILE without a
single-partition sort.

``Window.orderBy(...)`` with no partition key collapses the whole
dataset onto ONE reducer — the classic scale-killer for global ranks.
The standard distributed alternative (TeraSort-style ranking): range-
partition on the sort key, count rows per partition, prefix-sum those
counts into per-partition offsets (a driver-side array of
``n_partitions`` integers — KBs, not data), then each partition's
local row_number plus its offset IS the exact global row_number.

The local row_number still needs a per-partition sort, expressed here
as a window keyed on ``spark_partition_id()`` — Catalyst inserts one
hash exchange on the partition id (a 1:1 re-bucketing, not a data
reduction), so the total cost is two full shuffles of the ranked
columns and NO single-reducer stage.  At 100 TB the range partitioner
is what makes this work: every partition sorts only its slice, and the
offset join is a broadcast of ``n_partitions`` rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    n_partitions: int = 32,
    out_col: str = "rn",
) -> tuple[DataFrame, int]:
    """Exact 1-based global row_number under ``ORDER BY order_cols``
    (which must be a total order — include a tie-break key).  Returns
    ``(df_with_rank, total_rows)``; the total falls out of the offset
    prefix-sum for free.

    The ranged layout is ``localCheckpoint``-ed so the offset count
    pass and the final pass see the SAME partitioning (range
    partitioning samples its bounds; two independent executions could
    split ties differently — checkpointing pins one materialized
    answer, the same determinism discipline the CC/PageRank loops
    use)."""
    cols = [F.col(c) for c in order_cols]
    ranged = (
        df.repartitionByRange(n_partitions, *cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    sizes = {
        r["__pid"]: r["n"]
        for r in ranged.groupBy("__pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "__pid int, __off long"
    )
    w = Window.partitionBy("__pid").orderBy(*cols)
    out = (
        ranged.join(F.broadcast(off_df), "__pid")
        .withColumn(out_col, F.row_number().over(w) + F.col("__off"))
        .drop("__pid", "__off")
    )
    return out, acc


def ntile_from_row_number(rn: Column, n: int, k: int) -> Column:
    """SQL ``NTILE(k)`` bucket from an exact global row_number ``rn``
    over ``n`` total rows: the first ``n % k`` buckets hold
    ``n div k + 1`` rows, the rest ``n div k`` — reproduced as a pure
    arithmetic expression (no second window pass).  ``n`` and ``k``
    are Python ints, so the whole thing folds into codegen."""
    small = n // k
    r = n % k
    if small == 0:
        return rn.cast("int")
    big_span = r * (small + 1)
    # floor(a/b) on positive operands == integer division; ranks are
    # < 2^53 so the double quotient is exact where it matters
    return (
        F.when(
            rn <= F.lit(big_span), F.floor((rn - 1) / F.lit(small + 1))
        )
        .otherwise(F.lit(r) + F.floor((rn - F.lit(big_span) - 1) / F.lit(small)))
        .cast("int")
        + F.lit(1)
    ).alias("ntile")


def global_ntile(
    df: DataFrame,
    order_cols: list[str],
    k: int,
    n_partitions: int = 32,
    out_col: str = "bin",
) -> DataFrame:
    """Exact distributed ``NTILE(k) OVER (ORDER BY order_cols)``."""
    ranked, n = global_row_number(df, order_cols, n_partitions)
    return ranked.withColumn(
        out_col, ntile_from_row_number(F.col("rn"), n, k)
    ).drop("rn")


def global_prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    weight_col: str,
    n_partitions: int = 32,
    out_col: str = "psum",
) -> DataFrame:
    """Exact EXCLUSIVE prefix sum of ``weight_col`` under ``ORDER BY
    order_cols`` — ``order_cols`` MUST be a total order (no two rows
    may tie on it): rows tying within a range partition get arbitrary
    relative window positions, so their prefix sums would be
    nondeterministic across runs.  Callers that rank raw rows must
    pre-collapse to unique keys first (the :func:`~.quality._avg_ranks2`
    / ``auc_ranksum`` discipline: groupBy the order key, sum the
    weights, prefix-sum the collapsed table, join back) or append a
    deterministic tie-break column.  This is the weighted
    generalization of
    :func:`global_row_number`, same TeraSort shape: range partition,
    per-partition weight totals prefix-summed into offsets on the
    driver (``n_partitions`` integers — KBs), then a per-partition
    running sum keyed on ``spark_partition_id()``.  No single-reducer
    window at any size; the rank-sum statistics (AUC / Mann-Whitney)
    are built on this."""
    cols = [F.col(c) for c in order_cols]
    ranged = (
        df.repartitionByRange(n_partitions, *cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    sizes = {
        r["__pid"]: r["w"]
        for r in ranged.groupBy("__pid")
        .agg(F.sum(weight_col).alias("w"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid] or 0
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "__pid int, __off long"
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ranged.join(F.broadcast(off_df), "__pid")
        .withColumn(
            out_col,
            F.coalesce(F.sum(weight_col).over(w), F.lit(0)) + F.col("__off"),
        )
        .drop("__pid", "__off")
    )
