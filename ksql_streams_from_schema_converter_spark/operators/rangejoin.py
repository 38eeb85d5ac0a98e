"""Interval / range join: pair left rows with right rows whose
timestamp falls in [left_ts, left_ts + window).

A naive theta join (``r.ts BETWEEN l.ts AND l.ts + w``) forces Spark
into BroadcastNestedLoopJoin or a per-key cross product — quadratic on
hot keys. The scalable formulation buckets both sides by
``floor(ts / window)``: a right row in [l.ts, l.ts+w) can only live in
the left row's bucket or the next one, so we explode the left side into
those two bucket keys and equi-join on (key, bucket) before applying
the exact interval predicate. Cost: 2× left shuffle volume, but the
join is a plain hash/sort-merge equi-join that AQE can split on skew —
the shape that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
) -> DataFrame:
    """Inner-join rows with equal ``on`` key and
    ``left_ts <= right_ts < left_ts + window_seconds``. Right's non-key
    columns are appended to the left row (one output row per match)."""
    # all arithmetic in integer MICROSECONDS: unix_timestamp() truncates
    # sub-second precision and would wrongly drop in-window pairs near
    # the boundary (e.g. 10:00:00.9 + 600s vs 10:10:00.1)
    window_us = window_seconds * 1_000_000

    # unix_micros only accepts TIMESTAMP (with local timezone); parquet
    # TIMESTAMP(micros) loads as TIMESTAMP_NTZ and would throw
    # DATATYPE_MISMATCH. The session TZ is pinned to UTC (session.py),
    # so the NTZ→LTZ cast is lossless.
    def _us(col: str) -> F.Column:
        return F.unix_micros(F.col(col).cast("timestamp"))

    lb = F.floor(_us(left_ts) / window_us)

    # rename the right side up front: self-joins (left and right derived
    # from the same source) would otherwise hit ambiguous-column errors
    payload = [c for c in right.columns if c != on]
    rt = right.select(
        F.col(on).alias("__rk"),
        *[F.col(c).alias(f"__r_{c}") for c in payload],
    ).withColumn("__b", F.floor(_us(f"__r_{right_ts}") / window_us))
    lt = left.withColumn("__b", F.explode(F.array(lb, lb + 1)))

    cond = (
        (lt["__b"] == rt["__b"])
        & (F.col(on) == F.col("__rk"))
        & (F.col(f"__r_{right_ts}") >= F.col(left_ts))
        & (_us(f"__r_{right_ts}") < _us(left_ts) + window_us)
    )
    joined = lt.join(rt, cond, "inner")
    return joined.select(
        *left.columns,
        *[F.col(f"__r_{c}").alias(c) for c in payload],
    )
