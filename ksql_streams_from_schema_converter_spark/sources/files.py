"""File-format sources/sinks beyond parquet: JSONL and CSV.

JSONL (one JSON object per line) is the de-facto interchange format for
LLM training corpora; CSV covers tabular exports. Both readers take an
EXPLICIT schema — schema inference would trigger an extra full scan of
the input (at 100 TB, a second pass over the corpus) and can silently
widen/narrow types between runs. The writers shard into one file per
partition, so write parallelism is the DataFrame's partitioning and a
downstream read parallelizes across shards for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write as JSONL (Spark's json sink: one object per line, one file
    per partition)."""
    df.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Schema-explicit JSONL read. ``mode=FAILFAST`` surfaces corrupt
    lines loudly instead of nulling them (a silently-nulled corpus is
    the worst failure mode a training pipeline can have)."""
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write as headered CSV, one file per partition. Quoting/escaping
    is Spark's RFC-4180 default, so values containing the delimiter or
    quotes round-trip."""
    df.write.mode(mode).option("header", True).csv(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Schema-explicit headered CSV read (FAILFAST, as for JSONL)."""
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "FAILFAST")
        .csv(path)
    )
