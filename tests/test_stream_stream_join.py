"""Stream-stream interval join with watermarks — the streaming analogue
of operators/rangejoin.py, using Structured Streaming's native
time-range join (both sides watermarked so state is bounded)."""

import datetime
import os
import tempfile
import uuid

from pyspark.sql import functions as F


def ts(s):
    return datetime.datetime.fromisoformat(s)


def test_stream_stream_interval_join(spark):
    base = os.path.join(tempfile.gettempdir(), f"ssj_{uuid.uuid4().hex}")
    errors_dir, all_dir, out_dir, ckpt = (
        f"{base}/errors", f"{base}/all", f"{base}/out", f"{base}/ckpt"
    )
    errors = [(1, 10, ts("2024-01-01T10:00:00"))]
    follow = [
        (100, 10, ts("2024-01-01T10:03:00")),  # within 10 min -> match
        (101, 10, ts("2024-01-01T10:20:00")),  # outside -> no match
        (102, 99, ts("2024-01-01T10:01:00")),  # other key -> no match
    ]
    spark.createDataFrame(errors, "eid int, user_id int, ets timestamp").write.parquet(errors_dir)
    spark.createDataFrame(follow, "fid int, user_id int, fts timestamp").write.parquet(all_dir)

    es = (
        spark.readStream.schema("eid int, user_id int, ets timestamp")
        .parquet(errors_dir)
        .withWatermark("ets", "1 hour")
    )
    fs = (
        spark.readStream.schema("fid int, user_id int, fts timestamp")
        .parquet(all_dir)
        .withWatermark("fts", "1 hour")
        .withColumnRenamed("user_id", "f_user_id")
    )
    joined = es.join(
        fs,
        (F.col("user_id") == F.col("f_user_id"))
        & (F.col("fts") >= F.col("ets"))
        & (F.col("fts") < F.col("ets") + F.expr("INTERVAL 10 MINUTES")),
        "inner",
    ).select("eid", "fid")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [(r.eid, r.fid) for r in spark.read.parquet(out_dir).collect()]
    assert got == [(1, 100)]
