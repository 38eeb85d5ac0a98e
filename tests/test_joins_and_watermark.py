"""as-of join semantics + watermark late-data behavior."""

import datetime
import os
import tempfile
import uuid

from pyspark.sql import functions as F

from ksql_streams_from_schema_converter_spark.operators.joins import asof_join


def ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_join_left(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01T10:00")), (1, ts("2024-01-01T12:00")), (2, ts("2024-01-01T08:00"))],
        "k int, lts timestamp",
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01T09:00"), 7), (1, ts("2024-01-01T11:00"), 9)],
        "k int, rts timestamp, v int",
    )
    got = {
        (r.k, r.lts.isoformat()): r.v
        for r in asof_join(left, right, "k", "lts", "rts").collect()
    }
    # matches DuckDB ASOF LEFT JOIN on l.ts >= r.ts
    assert got == {
        (1, "2024-01-01T10:00:00"): 7,
        (1, "2024-01-01T12:00:00"): 9,
        (2, "2024-01-01T08:00:00"): None,
    }


def test_asof_join_equal_ts_matches(spark):
    left = spark.createDataFrame([(1, ts("2024-01-01T09:00"))], "k int, lts timestamp")
    right = spark.createDataFrame(
        [(1, ts("2024-01-01T09:00"), 42)], "k int, rts timestamp, v int"
    )
    assert asof_join(left, right, "k", "lts", "rts").head().v == 42


def test_asof_join_inner_drops_unmatched(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01T10:00")), (2, ts("2024-01-01T08:00"))], "k int, lts timestamp"
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01T09:00"), None)], "k int, rts timestamp, v int"
    )
    rows = asof_join(left, right, "k", "lts", "rts", how="inner").collect()
    # key 2 has no match -> dropped; key 1 matches a row whose PAYLOAD is
    # NULL but the match itself counts (marker-based, not value-based)
    assert [(r.k, r.v) for r in rows] == [(1, None)]


def test_watermark_drops_late_data(spark):
    """Streaming tumbling window with a 10-minute watermark: an event
    older than (max_seen - watermark) after state cleanup is dropped."""
    src_dir = os.path.join(tempfile.gettempdir(), f"wm_src_{uuid.uuid4().hex}")
    out_dir = os.path.join(tempfile.gettempdir(), f"wm_out_{uuid.uuid4().hex}")
    ckpt = os.path.join(tempfile.gettempdir(), f"wm_ckpt_{uuid.uuid4().hex}")
    os.makedirs(src_dir)

    # three sequential micro-batch runs so the watermark advance is
    # deterministic: (1) two events in the 10:00 window, (2) an 11:00
    # event that advances the watermark to 10:50 and closes the window,
    # (3) a LATE 10:01 event arriving behind the watermark
    batches = [
        [(1, ts("2024-01-01T10:00")), (2, ts("2024-01-01T10:05"))],
        [(3, ts("2024-01-01T11:00"))],
        [(4, ts("2024-01-01T10:01"))],
    ]

    stream = spark.readStream.schema("id int, ts timestamp").parquet(f"{src_dir}/*")
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "id int, ts timestamp").coalesce(1).write.parquet(
            f"{src_dir}/b{i}"
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    out = spark.read.parquet(out_dir).collect()
    got = {}
    for r in out:
        got[r.ws.isoformat()] = got.get(r.ws.isoformat(), 0) + r.n
    # the 10:00 window closed with exactly 2 events; the late 10:01
    # event was dropped (never re-emitted or double-counted)
    assert got.get("2024-01-01T10:00:00") == 2, got
