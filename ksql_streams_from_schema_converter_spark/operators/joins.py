"""Join operators Spark lacks natively: as-of join (and its building
blocks). SURVEY.md §2.5 / build-plan extension.

An as-of join matches each left row with the latest right row whose
timestamp is ≤ the left timestamp, per key — the standard operation for
enriching events with the prevailing reference data (rates, prices,
account snapshots) in CDC land.

Implementation: NOT a non-equi join (a ``l.ts >= r.ts`` theta join
degenerates to a per-key cross product — quadratic in hot keys). We
union both sides tagged, sort once per key, and carry the latest right
payload forward with ``last(..., ignorenulls=True)`` over an ordered
window. Cost: one shuffle on the key + one sort — the plan a
SortMergeJoin would need anyway, but linear in rows. This is the shape
that survives 100 TB with skewed keys (AQE salting applies to the
shuffle like any other).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    how: str = "left",
) -> DataFrame:
    """For each left row: the latest right row with
    ``right_ts <= left_ts`` and equal ``on`` key (ties: equal timestamps
    match, like DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``).

    Right's non-key, non-timestamp columns are appended to the left
    row (NULL when no match and ``how='left'``; unmatched left rows are
    dropped when ``how='inner'``)."""
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join supports how='left'|'inner', got {how!r}")
    payload_cols = [c for c in right.columns if c not in (on, right_ts)]

    lt = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in payload_cols],
        F.lit(None).cast("boolean").alias("__r___match"),
    )
    rt = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(lt.schema["__l"].dataType).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in payload_cols],
        F.lit(True).alias("__r___match"),
    )
    # right rows sort before left rows at the same timestamp, so an
    # equal-timestamp right row IS visible to the left row (>= semantics)
    unioned = lt.unionByName(rt)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.asc("__ts"), F.asc("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__side",
        "__l",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__c_{c}")
            for c in payload_cols
        ],
        F.last("__r___match", ignorenulls=True).over(w).alias("__matched"),
    ).where(F.col("__side") == 1)
    if how == "inner":
        carried = carried.where(F.col("__matched"))
    return carried.select(
        *[F.col("__l")[c].alias(c) for c in left.columns],
        *[F.col(f"__c_{c}").alias(c) for c in payload_cols],
    )
