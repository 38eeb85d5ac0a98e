"""Kafka CDC source: the engine's equivalent of the reference's RAW /
BLOB_RAW streams over T24 CDC topics (src/controllers/index.js:574,583).

The parse step (Kafka value bytes → the pipeline's raw schema) is a pure
Column transformation, so it is unit-testable without a broker; the
broker-facing builders just attach it to ``readStream.format("kafka")``.

Message contract (reconstructed from the generated statements' reads):
the XML-path value is JSON ``{"RECID": ..., "XMLRECORD": {field: value}}``
(map access ``DATA.XMLRECORD['F']``, :74); the BLOB-path value carries a
hex payload under ``XMLRECORD.VALUE`` (struct access
``DATA.XMLRECORD->VALUE``, :307).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

XML_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("RECID", T.StringType()),
        T.StructField("XMLRECORD", T.MapType(T.StringType(), T.StringType())),
    ]
)

BLOB_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("RECID", T.StringType()),
        T.StructField(
            "XMLRECORD", T.StructType([T.StructField("VALUE", T.StringType())])
        ),
    ]
)


def parse_xml_cdc(value: Column) -> list[Column]:
    """Kafka value (JSON bytes) → (recid, xmlrecord) columns."""
    parsed = F.from_json(value.cast("string"), XML_VALUE_SCHEMA)
    return [
        parsed["RECID"].alias("recid"),
        parsed["XMLRECORD"].alias("xmlrecord"),
    ]


def parse_blob_cdc(value: Column) -> list[Column]:
    """Kafka value (JSON bytes) → (recid, value_hex) columns."""
    parsed = F.from_json(value.cast("string"), BLOB_VALUE_SCHEMA)
    return [
        parsed["RECID"].alias("recid"),
        parsed["XMLRECORD"]["VALUE"].alias("value_hex"),
    ]


#: The exact output schema of Spark's ``format("kafka")`` source
#: (spark-sql-kafka's KafkaRecordToRowConverter): the file-backed
#: contract stream below reproduces it so everything downstream of the
#: source — parse, pipeline, sink — runs the same plan it would run
#: against a broker.
KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def kafka_wire_file_stream(
    spark: SparkSession, path: str, blob: bool = False
) -> DataFrame:
    """Broker-free stand-in for :func:`kafka_raw_stream`: a streaming
    read over parquet files laid out in ``KAFKA_WIRE_SCHEMA``. The
    select is byte-for-byte the one `kafka_raw_stream` attaches to the
    real source, so a contract test over this stream exercises the full
    RAW → MAPPED → SINK streaming topology the broker path would run
    (this sandbox has no spark-sql-kafka package)."""
    raw = spark.readStream.schema(KAFKA_WIRE_SCHEMA).parquet(path)
    cols = parse_blob_cdc(F.col("value")) if blob else parse_xml_cdc(F.col("value"))
    return raw.select(*cols)


def kafka_raw_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    blob: bool = False,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """``CREATE STREAM <schema>_RAW`` equivalent: subscribe + parse.

    ``maxOffsetsPerTrigger`` is the backpressure knob for large topics —
    at 100 TB scale you bound each micro-batch so state and shuffle
    stay within executor memory. Requires the spark-sql-kafka package
    on the cluster (not present in this container; the parse functions
    above carry all the logic and are tested against literal bytes)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    raw = reader.load()
    cols = parse_blob_cdc(F.col("value")) if blob else parse_xml_cdc(F.col("value"))
    return raw.select(*cols)
