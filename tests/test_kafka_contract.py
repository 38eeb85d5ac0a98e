"""Kafka wire-format contract test (file-backed; no broker in sandbox).

Messages are written with the EXACT schema spark-sql-kafka's source
emits (key/value/topic/partition/offset/timestamp/timestampType), then
streamed through the same parse + EtlPipeline stages the broker path
(`kafka_raw_stream`) would run, and the streaming result is compared
row-for-row against the batch pipeline over the same payloads — the
executable evidence for the RAW / BLOB_RAW source streams
(reference src/controllers/index.js:574,583) that parser unit tests
alone don't provide.
"""

import datetime
import json
import os
import tempfile
import uuid

from pyspark.sql import functions as F

from ksql_streams_from_schema_converter_spark.operators.compiler import FieldSpec
from ksql_streams_from_schema_converter_spark.plans.pipeline import (
    EtlPipeline,
    PipelineSpec,
)
from ksql_streams_from_schema_converter_spark.sources.kafka import (
    KAFKA_WIRE_SCHEMA,
    kafka_wire_file_stream,
    parse_xml_cdc,
)


def _write_wire_fixture(spark, n=25):
    """n XML-CDC messages in Kafka wire layout, in a temp dir."""
    rows = []
    t0 = datetime.datetime(2024, 1, 1)
    for i in range(n):
        payload = {
            "RECID": f"ORD{i}",
            "XMLRECORD": {
                "STATUS": "O" if i % 2 else "F",
                "TOTAL": f"{100 + i}.25",
                "PART_multivalue": f"1:P{i}A#2:P{i}B",
            },
        }
        rows.append(
            (
                f"ORD{i}".encode(),
                json.dumps(payload).encode(),
                "t24-orders-cdc",
                i % 4,
                i,
                t0 + datetime.timedelta(seconds=i),
                0,
            )
        )
    path = os.path.join(tempfile.gettempdir(), f"kwire_{uuid.uuid4().hex}")
    spark.createDataFrame(rows, KAFKA_WIRE_SCHEMA).write.parquet(path)
    return path


_SPEC = PipelineSpec(
    schema_name="FBNK_ORDERS",
    fields=[
        FieldSpec(name="RECID", transformation="UCASE($)"),
        FieldSpec(name="STATUS"),
        FieldSpec(name="TOTAL", type=("string", "decimal(18,2)")),
        FieldSpec(name="PART", should_parse_sv=False, should_parse_vm=True),
    ],
)


def test_wire_stream_matches_batch_pipeline(spark):
    path = _write_wire_fixture(spark)

    # batch path: same bytes, same parse, same pipeline
    batch_raw = spark.read.schema(KAFKA_WIRE_SCHEMA).parquet(path).select(
        *parse_xml_cdc(F.col("value"))
    )
    expected = sorted(
        tuple(r) for r in EtlPipeline(_SPEC).apply(batch_raw).sink.collect()
    )
    assert len(expected) == 50  # 25 messages × 2 multivalue elements

    # streaming path: wire-schema source → pipeline → memory sink
    stream_sink = EtlPipeline(_SPEC).apply(kafka_wire_file_stream(spark, path)).sink
    name = f"kwire_{uuid.uuid4().hex[:8]}"
    q = (
        stream_sink.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.table(name).collect())
    assert got == expected


def test_wire_stream_malformed_message_yields_null_not_crash(spark):
    rows = [
        (
            b"k",
            b"this is not json",
            "t24-orders-cdc",
            0,
            0,
            datetime.datetime(2024, 1, 1),
            0,
        )
    ]
    path = os.path.join(tempfile.gettempdir(), f"kwire_{uuid.uuid4().hex}")
    spark.createDataFrame(rows, KAFKA_WIRE_SCHEMA).write.parquet(path)
    name = f"kwire_{uuid.uuid4().hex[:8]}"
    q = (
        kafka_wire_file_stream(spark, path)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table(name).collect()
    assert len(rows) == 1 and rows[0]["recid"] is None
