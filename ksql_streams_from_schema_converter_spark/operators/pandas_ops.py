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


def customer_order_gaps(orders: DataFrame) -> DataFrame:
    """Per-customer order-gap accounting: number of gaps and total gap
    days between consecutive orders (by date, ties broken by order key).

    Outputs are integers so the result is exactly comparable to a SQL
    lag()-window oracle — the correctness gate for the Pandas path."""

    def gaps(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["o_orderdate", "o_orderkey"])
        deltas = pdf["o_orderdate"].diff().dropna()
        return pd.DataFrame(
            {
                "o_custkey": [pdf["o_custkey"].iloc[0]],
                "n_orders": [len(pdf)],
                "n_gaps": [len(deltas)],
                "total_gap_days": [int(deltas.dt.days.sum())],
            }
        )

    return orders.select("o_custkey", "o_orderkey", "o_orderdate").groupBy(
        "o_custkey"
    ).applyInPandas(
        gaps,
        schema="o_custkey bigint, n_orders bigint, n_gaps bigint, total_gap_days bigint",
    )
