"""File-format sources/sinks beyond parquet: JSONL, CSV, ORC, and
hive-partitioned parquet.

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


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write as ORC (the columnar interchange format for Hive/Presto
    estates). Like parquet, ORC carries types, column statistics, and
    predicate-pushdown indexes, so a downstream read prunes columns and
    row groups the same way."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Schema-explicit ORC read. ORC files embed their schema; passing
    ours pins the column order and types so a file written by another
    engine cannot silently reorder or widen the contract."""
    return spark.read.schema(schema).orc(path)


def write_xml(
    df: DataFrame, path: str, row_tag: str = "row", mode: str = "overwrite"
) -> None:
    """Write as XML (Spark 4's built-in xml source — the spark-xml
    package folded into core).  One ``<row>`` element per record;
    values are XML-escaped, so text containing ``&``/``<`` round-trips.
    The format the reference's T24 CDC payloads arrive in
    (src/services/index.js XML column handling), here as a first-class
    file source/sink."""
    df.write.mode(mode).format("xml").option("rowTag", row_tag).save(path)


def read_xml(
    spark: SparkSession, path: str, schema: T.StructType, row_tag: str = "row"
) -> DataFrame:
    """Schema-explicit XML read (FAILFAST, as for JSONL/CSV: corrupt
    elements fail loudly rather than nulling a corpus silently)."""
    return (
        spark.read.schema(schema)
        .option("rowTag", row_tag)
        .option("mode", "FAILFAST")
        .format("xml")
        .load(path)
    )


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-partitioned parquet layout (``col=value`` directories): the
    storage arrangement that turns a partition-key filter into directory
    pruning — at 100 TB a ``lang='en'`` read touches only the ``en``
    subtree, no footer of any other partition is opened. Keep partition
    cardinality bounded (lang/source/date, never a high-cardinality id:
    one directory per value)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned_parquet(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Schema-explicit partitioned-parquet read; partition columns come
    back typed from the directory names via the supplied schema (no
    inference pass over the directory tree)."""
    return spark.read.schema(schema).parquet(path)


def overwrite_partitions_dynamic(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Partition-scoped overwrite (``partitionOverwriteMode=dynamic``,
    as a WRITE option — session conf untouched): replaces ONLY the
    ``col=value`` directories present in ``df``, leaving every other
    partition's files in place.  This is the backfill shape at 100 TB —
    re-running one day/language re-writes one subtree; the default
    static mode would first truncate the whole table root.  The write
    option scopes the behavior to this writer, so concurrent static
    writers elsewhere in the session keep their semantics."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
