"""The custom Python Data Source connector: pushdown bounds, partition
planning, Arrow batch content, and end-to-end reads."""

import re

from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    LessThan,
    LessThanOrEqual,
)

from ksql_streams_from_schema_converter_spark.sources.pydatasource import (
    SyntheticCdcReader,
    cdc_row,
    register,
)


def test_pushdown_absorbs_seq_bounds_yields_rest():
    r = SyntheticCdcReader({"rows": "1000"})
    other = EqualTo(("op",), "INSERT")
    rest = list(
        r.pushFilters(
            [
                GreaterThan(("seq",), 99),
                LessThanOrEqual(("seq",), 800),
                other,
            ]
        )
    )
    assert r.lo == 100 and r.hi == 801
    assert rest == [other]  # non-seq filters go back to Spark


def test_partitions_tile_the_filtered_range_exactly():
    r = SyntheticCdcReader({"rows": "1000", "numpartitions": "7"})
    list(r.pushFilters([GreaterThanOrEqual(("seq",), 500), LessThan(("seq",), 930)]))
    parts = r.partitions()
    assert len(parts) <= 7
    covered = []
    for p in parts:
        covered.extend(range(p.start, p.end))
    assert covered == list(range(500, 930))  # disjoint, ordered, complete


def test_empty_range_yields_no_rows():
    r = SyntheticCdcReader({"rows": "100"})
    list(r.pushFilters([GreaterThanOrEqual(("seq",), 100)]))
    parts = r.partitions()
    assert sum(p.end - p.start for p in parts) == 0


def test_end_to_end_read_matches_derivation(spark):
    register(spark)
    rows = (
        spark.read.format("t24_synth_cdc")
        .option("rows", "50")
        .option("numpartitions", "3")
        .load()
        .orderBy("seq")
        .collect()
    )
    assert len(rows) == 50
    for r in rows[:10]:
        assert (r.seq, r.recid, r.op, r.amount) == cdc_row(r.seq)


def test_filter_prunes_at_source_not_after(spark):
    """The seq filter must reach the source: generated partitions cover
    only the filtered range (total planned rows == result rows)."""
    register(spark)
    df = (
        spark.read.format("t24_synth_cdc")
        .option("rows", "2000")
        .load()
        .where((F.col("seq") >= 1500) & (F.col("op") == "DELETE"))
    )
    # the seq bound is absorbed by the source; the op filter remains
    # Spark-side — result is the python-derived truth either way
    expected = [cdc_row(i) for i in range(1500, 2000)]
    expected = [t for t in expected if t[2] == "DELETE"]
    assert sorted((r.seq for r in df.collect())) == [t[0] for t in expected]
    plan = df._jdf.queryExecution().executedPlan().toString()
    # proof of absorption: the post-scan Filter keeps the op equality
    # but contains NO seq comparison — the source consumed the bound
    # during pushFilters.  (Asserting on the Filter node's condition,
    # not the whole plan text: a bare "1500" can collide with plan ids.)
    filter_cond = plan.split("Filter", 1)[1].split("BatchScan", 1)[0]
    assert "op#" in filter_cond
    # isnotnull(seq#..) may legitimately remain; a seq COMPARISON means
    # the bound was not absorbed
    assert not re.search(r"seq#\d+L?\s*(>=|<=|>|<|=)", filter_cond), filter_cond


def test_stream_reader_advances_offsets_across_restarts(spark, tmp_path):
    """Successive availableNow runs against ONE checkpoint must resume
    from the committed offset: each run drains exactly the next
    batchrows-sized range, no row is duplicated or skipped, and the
    union after three runs is the full prefix — the Kafka-style
    exactly-once offset contract, held by a Python connector.

    Pinned to the SIMPLE stream reader: per-trigger throttling
    (batchrows) is its contract; the partitioned reader drains to
    log-end each batch (see the restart test below)."""
    register(spark)
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    for expected_total in (40, 80, 100):  # rows=100, batchrows=40
        src = (
            spark.readStream.format("t24_synth_cdc")
            .option("streamreader", "simple")
            .option("rows", "100")
            .option("batchrows", "40")
            .load()
        )
        q = (
            src.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.read.parquet(out)
        assert got.count() == expected_total
    seqs = sorted(r.seq for r in spark.read.parquet(out).select("seq").collect())
    assert seqs == list(range(100))
    rows = {r.seq: (r.seq, r.recid, r.op, r.amount)
            for r in spark.read.parquet(out).collect()}
    for i in (0, 39, 40, 99):
        assert rows[i] == cdc_row(i)


def test_partitioned_stream_reader_runs_on_executors(spark, tmp_path):
    """The partition-planned stream reader (the default): record
    production must happen in executor-side Python workers, NOT on the
    driver — each output row carries its producing PID, and none may
    equal the driver's.  Also proves the batch is split across
    partitions (multiple distinct worker PIDs for 4 planned chunks is
    not guaranteed on a small pool, but partition count is)."""
    import os

    from pyspark.sql import types as T

    register(spark)
    src = (
        spark.readStream.format("t24_synth_cdc")
        .option("rows", "400")
        .option("numpartitions", "4")
        .load()
    )

    def tag_pid(batch_iter):
        import os as _os

        for pdf in batch_iter:
            pdf["pid"] = _os.getpid()
            yield pdf

    schema = T.StructType(
        src.schema.fields + [T.StructField("pid", T.LongType())]
    )
    tagged = src.mapInPandas(tag_pid, schema=schema)
    name = "pds_pid_probe"
    q = (
        tagged.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table(name).collect()
    assert len(rows) == 400
    pids = {r.pid for r in rows}
    assert os.getpid() not in pids, "stream records were produced on the driver"
    assert sorted(r.seq for r in rows) == list(range(400))


def test_partitioned_stream_resumes_from_checkpoint_when_log_grows(
    spark, tmp_path
):
    """Partitioned-reader restart contract: run 1 drains the log end
    (rows=60); after the 'log grows' to 100, a restart against the
    same checkpoint drains EXACTLY seq 60..99 — resume comes from the
    checkpointed offset alone (the reader is stateless), and
    deterministic generation makes the union gap- and dup-free."""
    register(spark)
    out = str(tmp_path / "psink")
    ckpt = str(tmp_path / "pckpt")
    for log_end, expected_total in ((60, 60), (100, 100)):
        src = (
            spark.readStream.format("t24_synth_cdc")
            .option("rows", str(log_end))
            .load()
        )
        q = (
            src.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert spark.read.parquet(out).count() == expected_total
    seqs = sorted(r.seq for r in spark.read.parquet(out).select("seq").collect())
    assert seqs == list(range(100))


def test_manifest_sink_batch_write_publishes_atomically(spark, tmp_path):
    """The batch manifest sink: committed part files are listed in
    manifest.json; an orphan file planted next to them stays invisible
    to a manifest-resolved read (task-retry debris can't duplicate
    rows)."""
    import json
    import os

    from ksql_streams_from_schema_converter_spark.sources.files import read_jsonl
    from ksql_streams_from_schema_converter_spark.sources.parquet import load_table
    from ksql_streams_from_schema_converter_spark.sources.pydatasource import (
        manifested_files,
    )

    out = str(tmp_path / "msink")
    nation = load_table(spark, "/root/testdata/sf0.001", "nation").select(
        "n_nationkey", "n_name"
    )
    register(spark)
    nation.write.format("manifest_jsonl").option("path", out).mode("append").save()
    files = manifested_files(out)
    assert files and all(os.path.exists(f) for f in files)
    # plant retry debris: a part file NOT in any manifest
    orphan = os.path.join(out, "data", "part-orphan.jsonl")
    with open(orphan, "w") as fh:
        fh.write(json.dumps({"n_nationkey": 999, "n_name": "GHOST"}) + "\n")
    back = read_jsonl(spark, manifested_files(out), nation.schema)
    assert back.count() == nation.count()
    assert back.where(F.col("n_nationkey") == 999).count() == 0
    rows = {r.n_nationkey: r.n_name for r in back.collect()}
    want = {r.n_nationkey: r.n_name for r in nation.collect()}
    assert rows == want


def test_vacuum_removes_only_unreferenced_parts(spark, tmp_path):
    """vacuum_manifest deletes orphan debris and nothing else; a
    manifest-resolved read is identical before and after."""
    import json
    import os

    from ksql_streams_from_schema_converter_spark.sources.files import read_jsonl
    from ksql_streams_from_schema_converter_spark.sources.parquet import load_table
    from ksql_streams_from_schema_converter_spark.sources.pydatasource import (
        manifested_files,
        vacuum_manifest,
    )

    out = str(tmp_path / "vac")
    register(spark)
    nation = load_table(spark, "/root/testdata/sf0.001", "nation").select(
        "n_nationkey", "n_name"
    )
    nation.write.format("manifest_jsonl").option("path", out).mode("append").save()
    orphan = os.path.join(out, "data", "part-orphan.jsonl")
    with open(orphan, "w") as fh:
        fh.write(json.dumps({"n_nationkey": 999, "n_name": "GHOST"}) + "\n")
    removed = vacuum_manifest(out)
    assert removed == [orphan]
    assert not os.path.exists(orphan)
    visible = manifested_files(out)
    assert all(os.path.exists(f) for f in visible)
    assert read_jsonl(spark, visible, nation.schema).count() == nation.count()
    assert vacuum_manifest(out) == []  # idempotent


def test_manifest_sink_honors_append_and_overwrite_modes(spark, tmp_path):
    """ADVICE r3: append must UNION prior committed rows (merge the
    previous manifest's file list), and overwrite must replace them
    AND delete the now-unreferenced old part files (no orphans)."""
    import os

    from ksql_streams_from_schema_converter_spark.sources.files import read_jsonl
    from ksql_streams_from_schema_converter_spark.sources.parquet import load_table
    from ksql_streams_from_schema_converter_spark.sources.pydatasource import (
        manifested_files,
    )

    out = str(tmp_path / "modes")
    register(spark)
    nation = load_table(spark, "/root/testdata/sf0.001", "nation").select(
        "n_nationkey", "n_name"
    )
    first = nation.where(F.col("n_nationkey") < 10)
    second = nation.where(F.col("n_nationkey") >= 10)
    first.write.format("manifest_jsonl").option("path", out).mode("append").save()
    first_files = set(manifested_files(out))
    second.write.format("manifest_jsonl").option("path", out).mode("append").save()
    # append: union of both writes is visible
    back = read_jsonl(spark, manifested_files(out), nation.schema)
    assert back.count() == nation.count()
    assert first_files < set(manifested_files(out))
    # overwrite: only the new rows visible, prior parts deleted
    first.write.format("manifest_jsonl").option("path", out).mode(
        "overwrite"
    ).save()
    visible = manifested_files(out)
    back = read_jsonl(spark, visible, nation.schema)
    assert back.count() == first.count()
    data_dir = os.path.join(out, "data")
    on_disk = {
        os.path.join(data_dir, f) for f in os.listdir(data_dir)
    }
    assert on_disk == set(visible), "overwrite left orphan part files"


def test_manifest_sink_stream_commits_per_batch(spark, tmp_path):
    """The streaming manifest sink: each micro-batch publishes its own
    manifest-<batchId>.json; draining the synthetic CDC stream in two
    checkpointed availableNow runs yields two batch manifests whose
    union is exactly the generated prefix — no duplicates on restart."""
    import glob

    from ksql_streams_from_schema_converter_spark.sources.files import read_jsonl
    from ksql_streams_from_schema_converter_spark.sources.pydatasource import (
        cdc_row,
        manifested_files,
    )
    from pyspark.sql import types as T

    register(spark)
    out = str(tmp_path / "stream_msink")
    ckpt = str(tmp_path / "ckpt")
    for _ in range(2):  # rows=80, batchrows=40 → one batch per run
        src = (
            spark.readStream.format("t24_synth_cdc")
            .option("streamreader", "simple")  # throttled: one 40-row batch/run
            .option("rows", "80")
            .option("batchrows", "40")
            .load()
        )
        q = (
            src.writeStream.format("manifest_jsonl")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    assert len(glob.glob(f"{out}/manifest-*.json")) == 2
    schema = T.StructType(
        [
            T.StructField("seq", T.LongType()),
            T.StructField("recid", T.StringType()),
            T.StructField("op", T.StringType()),
            T.StructField("amount", T.LongType()),
        ]
    )
    back = read_jsonl(spark, manifested_files(out), schema)
    got = sorted((r.seq, r.recid, r.op, r.amount) for r in back.collect())
    assert got == [cdc_row(i) for i in range(80)]


def test_manifest_batch_commit_consolidates_streaming_manifests(spark, tmp_path):
    """ADVICE r4: a path that received BOTH streaming and batch commits
    must stay consistent. A batch append merges the streaming batches'
    files into manifest.json (still visible, exactly once); a batch
    overwrite supersedes them (rows gone, parts deleted). Either way no
    manifest-<batch>.json survives to double-count files."""
    import glob
    import os

    from ksql_streams_from_schema_converter_spark.sources.files import read_jsonl
    from ksql_streams_from_schema_converter_spark.sources.parquet import load_table
    from ksql_streams_from_schema_converter_spark.sources.pydatasource import (
        manifested_files,
    )

    register(spark)
    out = str(tmp_path / "mixed")
    ckpt = str(tmp_path / "mixed_ckpt")
    # one streaming commit: 40 CDC rows into manifest-0.json
    src = (
        spark.readStream.format("t24_synth_cdc")
        .option("streamreader", "simple")
        .option("rows", "40")
        .option("batchrows", "40")
        .load()
    )
    q = (
        src.writeStream.format("manifest_jsonl")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert glob.glob(f"{out}/manifest-*.json")
    stream_schema = src.schema
    batch_df = spark.createDataFrame(
        [(10_000, "RBATCH01", "INSERT", 7)], schema=stream_schema
    )
    # batch APPEND: streaming rows remain visible exactly once
    batch_df.write.format("manifest_jsonl").option("path", out).mode(
        "append"
    ).save()
    assert glob.glob(f"{out}/manifest-*.json") == []  # consolidated
    visible = manifested_files(out)
    assert len(visible) == len(set(visible))
    back = read_jsonl(spark, visible, stream_schema)
    assert back.count() == 41
    assert back.where(F.col("recid") == "RBATCH01").count() == 1
    # batch OVERWRITE: only the new rows visible, every old part deleted
    batch_df.write.format("manifest_jsonl").option("path", out).mode(
        "overwrite"
    ).save()
    back = read_jsonl(spark, manifested_files(out), stream_schema)
    assert back.count() == 1
    data_dir = os.path.join(out, "data")
    on_disk = {os.path.join(data_dir, f) for f in os.listdir(data_dir)}
    assert on_disk == set(manifested_files(out))


def test_kafka_xml_wire_payload_batch_and_stream(spark):
    """payload=kafka_xml: the connector emits Spark's Kafka wire schema
    with the XML-CDC JSON contract in value — batch and partitioned
    stream agree, and parse_xml_cdc unpacks it like the broker path."""
    import json

    from ksql_streams_from_schema_converter_spark.sources.kafka import parse_xml_cdc
    from ksql_streams_from_schema_converter_spark.sources.pydatasource import (
        cdc_row,
        cdc_xml_value,
    )

    register(spark)
    batch = (
        spark.read.format("t24_synth_cdc")
        .option("rows", "50")
        .option("payload", "kafka_xml")
        .load()
    )
    assert [f.name for f in batch.schema.fields] == [
        "key", "value", "topic", "partition", "offset", "timestamp", "timestampType",
    ]
    rows = {r.offset: bytes(r.value) for r in batch.collect()}
    assert len(rows) == 50
    assert rows[7] == cdc_xml_value(7)
    rec = json.loads(rows[7])
    assert rec["RECID"] == cdc_row(7)[1]
    assert "PART_multivalue" in rec["XMLRECORD"]

    parsed = batch.select(*parse_xml_cdc(F.col("value")))
    got = {r.recid: r.xmlrecord for r in parsed.collect()}
    assert got[cdc_row(7)[1]]["STATUS"] == cdc_row(7)[2]

    import uuid

    name = f"wire_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("t24_synth_cdc")
        .option("rows", "50")
        .option("payload", "kafka_xml")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    stream_rows = {r.offset: bytes(r.value) for r in spark.table(name).collect()}
    assert stream_rows == rows  # stream == batch, byte for byte


def test_simple_reader_rejects_wire_payload():
    """The throttled driver-side reader serves only the cdc payload —
    the guard fires at reader construction (stream start)."""
    import pytest as _pytest

    from ksql_streams_from_schema_converter_spark.sources.pydatasource import (
        SyntheticCdcStreamReader,
    )

    with _pytest.raises(ValueError, match="simple"):
        SyntheticCdcStreamReader({"payload": "kafka_xml"})
