"""Kafka parse functions (no broker needed) + stateful streaming dedup."""

import json
import os
import tempfile
import uuid

from pyspark.sql import functions as F

from ksql_streams_from_schema_converter_spark.sources.kafka import (
    parse_blob_cdc,
    parse_xml_cdc,
)
from ksql_streams_from_schema_converter_spark.streaming.stateful import (
    batch_first_seen_dedup,
    streaming_first_seen_dedup,
)


def test_parse_xml_cdc(spark):
    msg = json.dumps(
        {"RECID": "R1", "XMLRECORD": {"F": "v", "G_multivalue": "1:a#2:b"}}
    ).encode()
    df = spark.createDataFrame([(msg,)], "value binary")
    row = df.select(*parse_xml_cdc(F.col("value"))).head()
    assert row["recid"] == "R1"
    assert row["xmlrecord"]["G_multivalue"] == "1:a#2:b"


def test_parse_blob_cdc(spark):
    msg = json.dumps({"RECID": "R2", "XMLRECORD": {"VALUE": "48656C6C6F"}}).encode()
    df = spark.createDataFrame([(msg,)], "value binary")
    row = df.select(*parse_blob_cdc(F.col("value"))).head()
    assert (row["recid"], row["value_hex"]) == ("R2", "48656C6C6F")


def test_parse_xml_cdc_malformed_is_null(spark):
    df = spark.createDataFrame([(b"not json",)], "value binary")
    row = df.select(*parse_xml_cdc(F.col("value"))).head()
    assert row["recid"] is None  # from_json null-on-error, not crash


def test_streaming_first_seen_dedup(spark):
    src_dir = os.path.join(tempfile.gettempdir(), f"dedup_src_{uuid.uuid4().hex}")
    out_dir = os.path.join(tempfile.gettempdir(), f"dedup_out_{uuid.uuid4().hex}")
    ckpt = os.path.join(tempfile.gettempdir(), f"dedup_ckpt_{uuid.uuid4().hex}")
    rows = [("A", 1), ("A", 2), ("B", 3), ("B", 4), ("C", 5)]
    spark.createDataFrame(rows, "recid string, seq int").write.parquet(src_dir)

    stream = spark.readStream.schema("recid string, seq int").parquet(src_dir)
    deduped = streaming_first_seen_dedup(stream, "recid")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir).collect()
    assert sorted(r["recid"] for r in got) == ["A", "B", "C"]  # one per key


def test_batch_first_seen_dedup_ordered(spark):
    df = spark.createDataFrame(
        [("A", 2, "x"), ("A", 1, "first"), ("B", 1, "only")],
        "recid string, seq int, payload string",
    )
    out = {r["recid"]: r["payload"] for r in batch_first_seen_dedup(df, "recid", "seq").collect()}
    assert out == {"A": "first", "B": "only"}


def test_streaming_running_totals_across_restart(spark):
    """Keyed running totals accumulate within a run AND survive a
    checkpointed restart (state store recovery)."""
    from ksql_streams_from_schema_converter_spark.streaming.stateful import (
        streaming_running_totals,
    )

    src = tempfile.mkdtemp()
    ckpt = tempfile.mkdtemp()
    out = tempfile.mkdtemp()
    schema = "k string, v double"
    spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0)], schema
    ).write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).parquet(src)
        q = (
            streaming_running_totals(stream, "k", "v")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = {r["key"]: (r["n"], r["total"]) for r in spark.read.parquet(out).collect()}
    assert first == {"a": (2, 3.0), "b": (1, 5.0)}

    # restart with new data: totals continue from recovered state
    spark.createDataFrame([("a", 10.0), ("c", 7.0)], schema).write.mode(
        "append"
    ).parquet(src)
    run_once()
    rows = spark.read.parquet(out).collect()
    latest = {}
    for r in rows:  # keep the max-n row per key (latest emission)
        if r["key"] not in latest or r["n"] > latest[r["key"]][0]:
            latest[r["key"]] = (r["n"], r["total"])
    assert latest == {"a": (3, 13.0), "b": (1, 5.0), "c": (1, 7.0)}


def test_transform_with_state_running_totals(spark):
    """The Spark-4 transformWithStateInPandas twin of the running-totals
    operator must agree with the batch aggregate. Skipped where the
    protobuf package (the TWS state-protocol dependency) is absent —
    this sandbox — in which case the 3.x applyInPandasWithState twin
    carries the gate."""
    import pytest

    pytest.importorskip("google.protobuf")
    from ksql_streams_from_schema_converter_spark.sources.parquet import stream_table
    from ksql_streams_from_schema_converter_spark.streaming.stateful import (
        streaming_tws_running_totals,
    )

    saved = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src = stream_table(spark, "/root/testdata/sf0.001", "events").select(
            "event_type", F.col("value").cast("double").alias("v")
        )
        name = f"tws_{uuid.uuid4().hex[:8]}"
        q = (
            streaming_tws_running_totals(src, "event_type", "v")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r.key: r.n
            for r in spark.table(name)
            .groupBy("key")
            .agg(F.max("n").alias("n"))
            .collect()
        }
        want = {
            r.event_type: r.n
            for r in spark.read.parquet("/root/testdata/sf0.001/events.parquet")
            .groupBy("event_type")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert got == want
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", saved)
