"""Batch/stream parity: the same compiled pipeline under readStream
(SURVEY.md §5 item 4)."""

import os
import tempfile
import uuid

import pytest

from ksql_streams_from_schema_converter_spark.operators.compiler import FieldSpec
from ksql_streams_from_schema_converter_spark.plans.pipeline import EtlPipeline, PipelineSpec
from ksql_streams_from_schema_converter_spark.streaming.runner import stream_to_batch

SPEC = PipelineSpec(
    schema_name="FBNK_STREAM",
    fields=[
        FieldSpec(name="RECID", transformation="UCASE($)"),
        FieldSpec(name="CUSTOMER_NO"),
        FieldSpec(name="ACCT_NO", should_parse_sv=False, should_parse_vm=True),
    ],
)

ROWS = [
    ("c-1", {"CUSTOMER_NO": "1", "ACCT_NO_multivalue": "1:A#2:B"}),
    ("c-2", {"CUSTOMER_NO": "2", "ACCT_NO_multivalue": "1:C"}),
]
SCHEMA = "recid string, xmlrecord map<string,string>"


def test_stream_matches_batch(spark):
    tmp = os.path.join(tempfile.gettempdir(), f"t24_src_{uuid.uuid4().hex}")
    spark.createDataFrame(ROWS, SCHEMA).write.parquet(tmp)

    batch_out = EtlPipeline(SPEC).apply(spark.read.parquet(tmp)).sink
    stream_src = spark.readStream.schema(SCHEMA).parquet(tmp)
    stream_out = stream_to_batch(spark, SPEC, stream_src)

    key = lambda r: (r["RECID"], r["ACCT_NO"] or "")
    assert sorted(map(key, batch_out.collect())) == sorted(map(key, stream_out.collect()))
    assert set(batch_out.columns) == set(stream_out.columns)


def test_restart_from_checkpoint_never_reprocesses(spark):
    """Exactly-once across restarts: a second run over the same
    checkpoint must only pick up NEW input files — the already-committed
    micro-batch is not re-emitted into the sink."""
    from ksql_streams_from_schema_converter_spark.streaming.runner import (
        run_pipeline_stream,
    )

    base = os.path.join(tempfile.gettempdir(), f"restart_{uuid.uuid4().hex}")
    src_dir, out_dir = os.path.join(base, "src"), os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src_dir)

    def write_input(rows, name):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(os.path.join(src_dir))
        del name

    write_input(ROWS, "batch1")
    source = spark.readStream.schema(SCHEMA).parquet(src_dir)
    q = run_pipeline_stream(spark, SPEC, source, out_dir, checkpoint=ckpt)
    q.awaitTermination(120)
    first = spark.read.parquet(out_dir)
    # c-1 explodes to two multivalue rows, c-2 to one
    assert sorted(r.RECID for r in first.collect()) == ["C-1", "C-1", "C-2"]

    write_input([("c-3", {"CUSTOMER_NO": "3", "ACCT_NO_multivalue": "1:D"})], "batch2")
    source2 = spark.readStream.schema(SCHEMA).parquet(src_dir)
    q2 = run_pipeline_stream(spark, SPEC, source2, out_dir, checkpoint=ckpt)
    q2.awaitTermination(120)
    after = spark.read.parquet(out_dir)
    # batch-1 rows appear exactly once; only c-3 was processed on restart.
    assert sorted(r.RECID for r in after.collect()) == ["C-1", "C-1", "C-2", "C-3"]


def test_statestore_reader_exposes_aggregation_state(spark, tmp_path):
    """The state-store data source (Spark 4 `statestore` format) must
    read a checkpointed streaming aggregation's live state: per-key
    counts in the store equal the batch groupBy — the observability
    surface for debugging stateful streams without replaying them."""
    from pyspark.sql import functions as F

    from ksql_streams_from_schema_converter_spark.sources.parquet import (
        load_table,
        stream_table,
    )

    ck = str(tmp_path / "ckpt")
    q = (
        stream_table(spark, "/root/testdata/sf0.001", "events")
        .groupBy("event_type")
        .count()
        .writeStream.format("memory")
        .queryName("ss_agg_probe")
        .outputMode("complete")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    state = spark.read.format("statestore").load(ck)
    got = {
        r["key"]["event_type"]: r["value"]["count"]
        for r in state.collect()
    }
    want = {
        r.event_type: r.n
        for r in load_table(spark, "/root/testdata/sf0.001", "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_rocksdb_state_store_backs_streaming_aggregation(spark, tmp_path):
    """The 100 TB state-store choice proven live: the same stateful
    aggregation runs with RocksDB-backed state (off-heap, spill-to-
    disk — the provider large state must use; HDFS-backed default
    keeps every key on the JVM heap) and reports rocksdb* commit
    metrics in the query progress.  Values are gated against the
    deterministic CDC derivation, so the provider swap changes the
    state engine, never the answer."""
    from pyspark.sql import functions as F

    from ksql_streams_from_schema_converter_spark.sources.pydatasource import (
        cdc_row,
        register,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    saved = spark.conf.get(key, None)
    try:
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        register(spark)
        src = spark.readStream.format("t24_synth_cdc").option("rows", "1000").load()
        agg = src.groupBy("op").agg(
            F.count("*").alias("n"), F.sum("amount").alias("total")
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("rocks_gate")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {r.op: (r.n, r.total) for r in spark.table("rocks_gate").collect()}
        want: dict = {}
        for i in range(1000):
            _, _, op, amount = cdc_row(i)
            n, t = want.get(op, (0, 0))
            want[op] = (n + 1, t + amount)
        assert got == want
        metrics = (q.lastProgress or {}).get("stateOperators", [{}])[0].get(
            "customMetrics", {}
        )
        assert any("rocksdb" in k.lower() for k in metrics), metrics
    finally:
        if saved is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, saved)
