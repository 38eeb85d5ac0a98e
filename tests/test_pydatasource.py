"""The custom Python Data Source connector: pushdown bounds, partition
planning, Arrow batch content, and end-to-end reads."""

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
    # proof of absorption: the seq >= 1500 comparison is GONE from the
    # Spark-side Filter (only the op equality and null checks remain) —
    # the source consumed it during pushFilters
    assert "1500" not in plan
    assert "op#" in plan.split("Filter", 1)[1].split("BatchScan", 1)[0]


def test_stream_reader_advances_offsets_across_restarts(spark, tmp_path):
    """Successive availableNow runs against ONE checkpoint must resume
    from the committed offset: each run drains exactly the next
    batchrows-sized range, no row is duplicated or skipped, and the
    union after three runs is the full prefix — the Kafka-style
    exactly-once offset contract, held by a Python connector."""
    register(spark)
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    for expected_total in (40, 80, 100):  # rows=100, batchrows=40
        src = (
            spark.readStream.format("t24_synth_cdc")
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
