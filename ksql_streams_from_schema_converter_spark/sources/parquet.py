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


def _normalize_events_ts(df: DataFrame) -> DataFrame:
    """Defensive only: the current testdata stores events.ts as parquet
    TIMESTAMP(micros) (reads as TIMESTAMP_NTZ), so this branch never
    fires. It is kept for a driver regeneration that switches to
    TIMESTAMP(NANOS), which the nanosAsLong conf surfaces as bigint
    nanoseconds — truncate to micros (DuckDB's TIMESTAMP cast does the
    same) and restore the timestamp type."""
    from pyspark.sql import types as T

    if "ts" in df.columns and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _normalize_events_ts(df)
    return df


def stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Streaming file source over one table. The schema is derived from
    the batch read of the same file, so it always matches the parquet
    footer — a hardcoded schema silently yields NULL columns when it
    disagrees with the file (streaming sources don't validate)."""
    ensure_session_confs(spark)
    schema = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet")).schema
    df = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", f"{name}.parquet")
        .parquet(sf_dir)  # streaming file source requires a directory
    )
    if name == "events":
        df = _normalize_events_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views so ``spark.sql`` works on them
    (the engine's equivalent of the reference's raw query passthrough,
    src/services/index.js:82-90 — Catalyst parses/plans natively)."""
    for n in TABLE_NAMES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
