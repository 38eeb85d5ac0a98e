"""Batch sources over the driver-generated parquet tables (TESTDATA.md).

At cluster scale these reads benefit from Parquet predicate pushdown and
column pruning automatically — queries should select/filter on the
DataFrames returned here and let Catalyst push into the scan (verify
with ``.explain``: ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def ensure_session_confs(spark: SparkSession) -> None:
    """Runtime-settable confs the engine's semantics depend on — applied
    defensively because a caller (e.g. the verification driver) may hand
    us a session built without session.py:

    - nanosAsLong: events.parquet stores TIMESTAMP(NANOS), which the
      vectorized reader otherwise rejects;
    - ANSI off: ksqlDB null-on-error parity (NULL out-of-range index /
      bad cast instead of an exception);
    - UTC session timezone: collected timestamp values must not shift
      with the host timezone (the DuckDB oracle reads naive UTC).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts is parquet TIMESTAMP(NANOS); with nanosAsLong it arrives
    # as bigint nanoseconds — truncate to microseconds (what DuckDB's
    # TIMESTAMP cast does too) and restore the timestamp type.
    from pyspark.sql import types as T

    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views so ``spark.sql`` works on them
    (the engine's equivalent of the reference's raw query passthrough,
    src/services/index.js:82-90 — Catalyst parses/plans natively)."""
    for n in TABLE_NAMES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
