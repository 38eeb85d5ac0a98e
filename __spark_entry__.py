"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``ksql_streams_from_schema_converter_spark.workload``
(one registry powers this contract, the tests, and bench.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from ksql_streams_from_schema_converter_spark.canon import (
    canonicalize_oracle_sql,
    canonicalize_spark_output,
)
from ksql_streams_from_schema_converter_spark.workload import WORKLOAD


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full T24 ETL pipeline (RAW → MAPPED → MULTIVALUE →
    SINK) with VM/VS explosion, over sf0.001. Driver checks rows>0."""
    fn, _ = WORKLOAD["t24_multivalue_explode"]
    return fn(spark, "/root/testdata/sf0.001")


def _canon(fn: Callable[[SparkSession, str], DataFrame]):
    """Driver-boundary canonicalization (canon.py): DECIMAL/DATE result
    columns become strings so both engines hash identically. Applied
    here — not in the queries — so the engine keeps exact decimal
    arithmetic and bench.py times the un-retyped plans."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        return canonicalize_spark_output(fn(spark, sf_dir))

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    north-star extension operators)."""
    return {name: _canon(fn) for name, (fn, _) in WORKLOAD.items()}


def oracle_sql() -> dict[str, str]:
    """Equivalent ANSI SQL per query, runnable by DuckDB on the same
    parquet views. Entries without SQL-expressible semantics are omitted
    (driver records a rows-only check for those)."""
    return {
        name: canonicalize_oracle_sql(sql)
        for name, (_, sql) in WORKLOAD.items()
        if sql is not None
    }
