"""Plan-shape regression guards: the scale properties the engine
promises (pushdown, broadcast, no nested-loop joins, partial
aggregation) asserted against the actual physical plans — plus sink
writer and salted-agg behavior."""

import os
import tempfile
import uuid

from pyspark.sql import functions as F

from ksql_streams_from_schema_converter_spark.operators.skew import salted_agg
from ksql_streams_from_schema_converter_spark.plans.sink import write_keyed_parquet
from ksql_streams_from_schema_converter_spark.sources.parquet import load_table
from ksql_streams_from_schema_converter_spark.workload import WORKLOAD

SF_DIR = "/root/testdata/sf0.001"


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    df = load_table(spark, SF_DIR, "orders").where(F.col("o_custkey") < 100).select(
        "o_orderkey", "o_custkey"
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    scan = physical_plan(df)
    assert "PushedFilters: [IsNotNull(o_custkey), LessThan(o_custkey,100)" in scan
    # column pruning: only the two selected columns in ReadSchema
    assert "ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint>" in scan


def test_q5_broadcasts_dimensions(spark):
    fn, _ = WORKLOAD["q5_revenue_by_region"]
    plan = physical_plan(fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_asof_join_has_no_nested_loop(spark):
    fn, _ = WORKLOAD["asof_join_latest_event"]
    plan = physical_plan(fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q6_all_predicates_pushed(spark):
    import contextlib
    import io

    fn, _ = WORKLOAD["q6_forecast_revenue"]
    # toString() elides long expression lists; formatted explain doesn't
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fn(spark, SF_DIR).explain("formatted")
    plan = buf.getvalue()
    for pushed in (
        "GreaterThanOrEqual(l_shipdate,",
        "LessThan(l_shipdate,",
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)",
    ):
        assert pushed in plan, f"predicate not pushed to scan: {pushed}"
    # only the 4 referenced columns are read
    assert (
        "ReadSchema: struct<l_quantity:double,l_extendedprice:double,"
        "l_discount:double,l_shipdate:timestamp" in plan
    )


def test_q10_and_q14_broadcast_dimensions(spark):
    for name in ("q10_returned_item_customers", "q14_promo_revenue"):
        plan = physical_plan(WORKLOAD[name][0](spark, SF_DIR))
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name


def test_q1_partial_aggregation(spark):
    fn, _ = WORKLOAD["q1_pricing_summary"]
    plan = physical_plan(fn(spark, SF_DIR))
    # map-side combine before the shuffle
    assert "partial_sum" in plan or "partial_count" in plan


def test_minhash_partial_min(spark):
    from ksql_streams_from_schema_converter_spark.operators.dedup import minhash_signatures
    from ksql_streams_from_schema_converter_spark.workload import dedup_corpus

    plan = physical_plan(minhash_signatures(dedup_corpus(spark, SF_DIR)))
    assert "partial_min" in plan


def test_salted_agg_matches_plain(spark):
    ev = load_table(spark, SF_DIR, "events")
    plain = {
        r["event_type"]: (r["n"], r["total"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total"),
        )
        .collect()
    }
    salted = {
        r["event_type"]: (r["n"], r["total"])
        for r in salted_agg(
            ev,
            ["event_type"],
            {
                "n": ("sum", F.count("*")),
                "total": ("sum", F.sum(F.col("value").cast("decimal(18,2)"))),
            },
        ).collect()
    }
    assert plain == salted


def test_write_keyed_parquet_roundtrip(spark):
    fn, _ = WORKLOAD["t24_mapped_projection"]
    df = fn(spark, SF_DIR)
    out = os.path.join(tempfile.gettempdir(), f"sink_{uuid.uuid4().hex}")
    write_keyed_parquet(df, out, key="RECID", num_files=4)
    back = spark.read.parquet(out)
    assert back.count() == df.count()
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == 4


def test_partitioned_write_prunes_partitions(spark):
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    out = os.path.join(tempfile.gettempdir(), f"part_{uuid.uuid4().hex}")
    write_keyed_parquet(
        ev, out, key="user_id", num_files=2, partition_by=["event_date"]
    )
    dates = sorted(
        d.split("=")[1] for d in os.listdir(out) if d.startswith("event_date=")
    )
    assert len(dates) > 1  # data spans multiple partitions
    # Plant an unreadable "data file" in every OTHER partition: the
    # filtered read below only succeeds if pruning never touches them.
    for d in dates[1:]:
        with open(
            os.path.join(out, f"event_date={d}", "part-junk.snappy.parquet"), "wb"
        ) as fh:
            fh.write(b"not a parquet file")
    back = spark.read.parquet(out).where(F.col("event_date") == dates[0])
    plan = physical_plan(back)
    # The date predicate must land in PartitionFilters (metadata-only
    # pruning: untouched partitions are never listed or read)...
    assert "PartitionFilters: [" in plan
    assert "event_date" in plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    # ...and the pruned scan still computes the right answer without
    # ever opening the corrupt files in the excluded partitions.
    expected = ev.where(F.to_date("ts") == dates[0]).count()
    assert back.count() == expected


def test_q7_q8_broadcast_dimension_chains(spark):
    for name in ("q7_volume_shipping", "q8_market_share"):
        plan = physical_plan(WORKLOAD[name][0](spark, SF_DIR))
        # every dimension chain broadcasts; never a cartesian fallback
        assert plan.count("BroadcastHashJoin") >= 2, name
        assert "CartesianProduct" not in plan, name


def test_q17_threshold_join_broadcasts(spark):
    plan = physical_plan(WORKLOAD["q17_small_quantity_revenue"][0](spark, SF_DIR))
    # part filter AND the per-part aggregate both broadcast back onto
    # lineitem — no shuffle (sort-merge) join anywhere in the plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_q19_or_predicate_pushed_to_scan(spark):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        WORKLOAD["q19_disjunctive_predicates"][0](spark, SF_DIR).explain("formatted")
    plan = buf.getvalue()
    # the explicit quantity envelope reaches the lineitem scan...
    assert "GreaterThanOrEqual(l_quantity,1.0)" in plan
    assert "LessThanOrEqual(l_quantity,30.0)" in plan
    # ...and the OR-of-ANDs is pushed (parquet row-group pruning)
    assert "Or(Or(" in plan


def test_foreach_batch_upsert_merges_by_key(spark):
    """The foreachBatch sink shape: write_fn receives each micro-batch;
    an idempotent keyed merge yields latest-wins state exactly once."""
    from ksql_streams_from_schema_converter_spark.streaming.runner import (
        foreach_batch_upsert,
    )

    base = os.path.join(tempfile.gettempdir(), f"upsert_{uuid.uuid4().hex}")
    src_dir, ckpt = os.path.join(base, "src"), os.path.join(base, "ckpt")
    os.makedirs(src_dir)
    spark.createDataFrame(
        [("r-1", "v1"), ("r-2", "v1")], "RECID string, VAL string"
    ).coalesce(1).write.mode("append").parquet(src_dir)

    state: dict[str, str] = {}
    seen_batches: list[int] = []

    def merge(batch_df, batch_id):
        seen_batches.append(batch_id)
        for row in batch_df.collect():  # tiny test batches only
            state[row.RECID] = row.VAL

    src = spark.readStream.schema("RECID string, VAL string").parquet(src_dir)
    q = foreach_batch_upsert(src, merge, ckpt).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert state == {"r-1": "v1", "r-2": "v1"}

    # second run over the same checkpoint: only the NEW file is merged
    spark.createDataFrame(
        [("r-1", "v2"), ("r-3", "v1")], "RECID string, VAL string"
    ).coalesce(1).write.mode("append").parquet(src_dir)
    src2 = spark.readStream.schema("RECID string, VAL string").parquet(src_dir)
    q2 = foreach_batch_upsert(src2, merge, ckpt).trigger(availableNow=True).start()
    q2.awaitTermination(120)
    assert state == {"r-1": "v2", "r-2": "v1", "r-3": "v1"}
    assert len(seen_batches) == 2  # one batch per run, none re-applied


def test_jdbc_upsert_batch_stages_with_stable_name(spark, monkeypatch):
    """jdbc_upsert_batch must stage to ONE fixed overwrite table (not a
    per-batch name that leaks into the target catalog)."""
    from ksql_streams_from_schema_converter_spark.plans.sink import jdbc_upsert_batch

    from pyspark.sql.readwriter import DataFrameWriter

    captured = {}
    orig_option = DataFrameWriter.option

    def spy_option(self, key, value):
        captured[key.lower()] = str(value)
        return orig_option(self, key, value)

    def fake_save(self, path=None):
        captured["saved"] = True

    monkeypatch.setattr(DataFrameWriter, "option", spy_option)
    monkeypatch.setattr(DataFrameWriter, "save", fake_save)
    df = spark.createDataFrame([("r-1", "v1")], "RECID string, VAL string")
    for batch_id in (7, 8):
        captured.clear()
        jdbc_upsert_batch(
            df, batch_id, url="jdbc:oracle:thin:@host/db", table="FBNK_SINK"
        )
        assert captured.get("saved")
        assert captured.get("dbtable") == "FBNK_SINK_staging"
        assert captured.get("url") == "jdbc:oracle:thin:@host/db"


def test_adapted_tpch_q2_q9_q20_plan_shapes(spark):
    """The three adapted shapes keep the plans the originals want:
    dimension broadcasts, no cartesian/nested-loop joins."""
    for name in (
        "q2_min_cost_supplier",
        "q9_profit_by_nation_year",
        "q20_dominant_suppliers",
    ):
        fn, _ = WORKLOAD[name]
        plan = physical_plan(fn(spark, SF_DIR))
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_pii_scrub_is_scan_only(spark):
    """The every-byte corpus pass must not shuffle: a pure projection
    over the scan (zero Exchange nodes)."""
    fn, _ = WORKLOAD["text_pii_redact"]
    plan = physical_plan(fn(spark, SF_DIR))
    assert "Exchange" not in plan
    assert "Python" not in plan  # all-native regexp chain


def test_sequence_packing_single_shuffle(spark):
    """Packing is exactly one hash-partitioned exchange (the per-shard
    window) — no global single-partition sort."""
    fn, _ = WORKLOAD["sequence_packing"]
    plan = physical_plan(fn(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan


def test_aqe_broadcasts_dehinted_customer_chain(spark):
    """q5's customer chain carries no broadcast hint (SF-proportional
    side — a hard hint would not survive 100×). Prove the claim that
    AQE still broadcasts it when it measures small: after execution,
    the adaptive final plan must contain a broadcast join."""
    fn, _ = WORKLOAD["q5_revenue_by_region"]
    df = fn(spark, SF_DIR)
    df.collect()  # AQE finalizes the plan during execution
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in final
    assert "AdaptiveSparkPlan isFinalPlan=true" in final


def test_chunk_dedup_single_scan_single_shuffle(spark):
    """paragraph_exact_dedup's first-occurrence decision is a window
    over the chunk digest: exactly one hash exchange, no self-join
    (a groupBy+join form would scan the chunk stage twice)."""
    fn, _ = WORKLOAD["paragraph_exact_dedup"]
    plan = physical_plan(fn(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert "Exchange SinglePartition" not in plan


def test_gopher_filter_is_scan_only(spark):
    """The rule filter is a pure scan→project stage: zero exchanges,
    no Python workers (all-native expressions)."""
    fn, _ = WORKLOAD["quality_filter_gopher"]
    plan = physical_plan(fn(spark, SF_DIR))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_range_sorted_write_enables_row_group_skipping(spark, tmp_path):
    """write_range_sorted_parquet must produce parquet whose row-group
    min/max footer stats are narrow and non-overlapping on the sort
    column — the property that lets a range predicate prune row groups
    at the footer. Proven from the file footers via pyarrow, and
    contrasted with a shuffled write of the same rows where every row
    group spans ~the whole domain."""
    import glob

    import pyarrow.parquet as pq

    from ksql_streams_from_schema_converter_spark.plans.sink import (
        write_range_sorted_parquet,
    )

    ev = load_table(spark, SF_DIR, "events").select("event_id", "ts")
    lo, hi = ev.agg(F.min("event_id"), F.max("event_id")).head()
    domain = hi - lo

    sorted_dir = str(tmp_path / "sorted")
    write_range_sorted_parquet(
        ev, sorted_dir, "event_id", num_files=4, max_records_per_file=100
    )
    # baseline: same rows in hash-random order (a repartition alone keeps
    # scan order within tasks, leaving accidental id locality per file —
    # the md5 sort destroys it) so each row group spans the domain
    shuffled_dir = str(tmp_path / "shuffled")
    ev.repartition(4, F.col("ts")).sortWithinPartitions(
        F.md5(F.col("event_id").cast("string"))
    ).write.mode("overwrite").option(
        "maxRecordsPerFile", 100
    ).parquet(shuffled_dir)

    def rg_spans(d):
        spans = []
        for f in glob.glob(f"{d}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index("event_id")
            for i in range(md.num_row_groups):
                st = md.row_group(i).column(idx).statistics
                spans.append((st.min, st.max))
        return spans

    srt, shf = rg_spans(sorted_dir), rg_spans(shuffled_dir)
    assert len(srt) > 4 and len(shf) > 4  # multiple row groups each
    # sorted: each row group covers a small slice of the domain…
    assert max(b - a for a, b in srt) < domain * 0.5
    # …and row groups don't overlap (pairwise disjoint when sorted)
    srt.sort()
    assert all(srt[i][1] <= srt[i + 1][0] for i in range(len(srt) - 1))
    # shuffled baseline: the typical row group spans most of the domain
    # (tiny remainder files can be narrow by chance — compare medians)
    med = sorted(b - a for a, b in shf)[len(shf) // 2]
    assert med > domain * 0.8
    # consequence: a 10%-of-domain predicate touches few sorted row
    # groups but nearly all shuffled ones
    cut_lo, cut_hi = lo, lo + domain // 10
    hit = lambda spans: sum(1 for a, b in spans if not (b < cut_lo or a > cut_hi))
    assert hit(srt) <= max(2, len(srt) // 4)
    assert hit(shf) >= int(0.8 * len(shf))


def test_aqe_splits_skewed_join_partition(spark):
    """The engine's skew answer for JOINS is AQE's runtime skew-join
    split (salting covers aggregations): with one key owning ~95% of a
    fact side, the final adaptive plan must mark the join skew-handled
    (``SortMergeJoin(skew=true)``) — the hot partition is split into
    advisory-sized chunks instead of serializing one reducer."""
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        right = spark.range(0, 10_000).select(
            F.col("id").alias("k"), F.lit("dim").alias("d")
        )
        j = left.join(right, "k")
        assert len(j.collect()) == 190_500  # 190k hot-key + 500 tail matches
        plan = physical_plan(j)
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_file_readers_fail_fast_on_corrupt_input(spark, tmp_path):
    """sources/files.py readers are FAILFAST by contract: a corrupt
    line must raise, not silently null-fill (a silently-nulled corpus
    is the worst failure mode a training pipeline can have)."""
    import pytest

    from ksql_streams_from_schema_converter_spark.sources.files import (
        read_jsonl,
        write_jsonl,
    )

    docs = load_table(spark, SF_DIR, "documents").limit(10)
    d = str(tmp_path / "docs")
    write_jsonl(docs, d)
    with open(f"{d}/part-junk.json", "w") as fh:
        fh.write('{"doc_id": "not-a-number", "text": 42, otherwise broken\n')
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        read_jsonl(spark, d, docs.schema).count()


def test_model_inference_ships_features_not_text(spark):
    """The inference stage's Python boundary must receive only the
    numeric feature columns — the text stays JVM-side (at 100 TB this
    is the difference between ~10 bytes/row and the corpus crossing
    into Arrow)."""
    fn, _ = WORKLOAD["model_inference_scores"]
    plan = physical_plan(fn(spark, SF_DIR))
    pandas_line = next(l for l in plan.splitlines() if "MapInPandas" in l)
    assert "f_tokens" in pandas_line and "f_stopwords" in pandas_line
    assert "text" not in pandas_line


def test_partitioned_read_prunes_directories(spark):
    """The lang=en filter over the hive-partitioned layout must touch
    ONLY lang=en/ files — directory-level pruning, no other
    partition's footer opened (the property that makes a 1%-partition
    query cost 1% at 100 TB)."""
    fn, _ = WORKLOAD["partitioned_parquet_pruning"]
    df = fn(spark, SF_DIR)
    # inputFiles() lists the relation pre-pruning; input_file_name() at
    # runtime names only the files the pruned scan actually opened
    files = [
        r[0] for r in df.select(F.input_file_name()).distinct().collect()
    ]
    assert files, "expected at least one scanned file"
    assert all("lang=en" in f for f in files), files
    plan = physical_plan(df)
    assert "PartitionFilters: [isnotnull(lang" in plan


def test_bm25_single_scan_broadcast_globals(spark):
    """BM25's corpus statistics (N, avgdl, per-term df) must come back
    as a broadcast 1-row join, never a shuffle join, and term
    frequencies must be higher-order-filter counts (no explode → no
    Generate node)."""
    fn, _ = WORKLOAD["bm25_top_docs"]
    plan = physical_plan(fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Generate" not in plan
    assert "SortMergeJoin" not in plan


def test_orc_roundtrip_preserves_types(spark):
    """ORC write→read must hand back the exact schema including
    timestamp semantics (the NTZ/LTZ distinction that broke round 1's
    range join)."""
    from ksql_streams_from_schema_converter_spark.sources.files import (
        read_orc,
        write_orc,
    )

    orders = load_table(spark, SF_DIR, "orders")
    path = os.path.join(tempfile.gettempdir(), f"orc_types_{uuid.uuid4().hex[:8]}")
    write_orc(orders, path)
    back = read_orc(spark, path, orders.schema)
    assert back.schema == orders.schema
    assert back.count() == orders.count()


def test_zorder_write_skips_on_both_dims(spark, tmp_path):
    """write_zordered_parquet must shrink row-group min/max spans on
    BOTH clustered columns (each row group covers a small axis-aligned
    rectangle), where a linear sort on dim A leaves dim B's spans ~the
    whole domain. Proven from the written parquet footers, plus the
    consequence: a 10%-of-domain predicate on the NON-leading dim
    prunes most z-ordered row groups and almost no linearly-sorted
    ones."""
    import glob

    import pyarrow.parquet as pq

    from ksql_streams_from_schema_converter_spark.plans.sink import (
        write_range_sorted_parquet,
        write_zordered_parquet,
    )

    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id")
    lo_e, hi_e, lo_u, hi_u = ev.agg(
        F.min("event_id"), F.max("event_id"), F.min("user_id"), F.max("user_id")
    ).head()
    dom_e, dom_u = hi_e - lo_e, hi_u - lo_u

    z_dir = str(tmp_path / "zordered")
    write_zordered_parquet(
        ev, z_dir, ["event_id", "user_id"], num_files=4, max_records_per_file=100
    )
    lin_dir = str(tmp_path / "linear")
    write_range_sorted_parquet(
        ev, lin_dir, "event_id", num_files=4, max_records_per_file=100
    )

    def rg_spans(d, col):
        spans = []
        for f in glob.glob(f"{d}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            for i in range(md.num_row_groups):
                st = md.row_group(i).column(idx).statistics
                spans.append((st.min, st.max))
        return spans

    z_u = rg_spans(z_dir, "user_id")
    lin_u = rg_spans(lin_dir, "user_id")
    assert len(z_u) > 4 and len(lin_u) > 4
    med = lambda xs: sorted(xs)[len(xs) // 2]
    # z-order: the median row group covers a minority of BOTH domains;
    # linear sort: user_id spans stay ~the full domain
    assert med([b - a for a, b in z_u]) < dom_u * 0.6
    assert med([b - a for a, b in rg_spans(z_dir, "event_id")]) < dom_e * 0.6
    assert med([b - a for a, b in lin_u]) > dom_u * 0.8
    # consequence: a 10% user_id slice prunes most z-ordered row groups
    cut_lo, cut_hi = lo_u, lo_u + dom_u // 10
    hit = lambda spans: sum(1 for a, b in spans if not (b < cut_lo or a > cut_hi))
    assert hit(z_u) <= len(z_u) // 2
    assert hit(lin_u) >= int(0.8 * len(lin_u))


def test_c4_cleaning_is_scan_only(spark):
    """C4 line cleaning is a pure scan→project stage: zero exchanges,
    no Python workers (split/filter/rebuild all in codegen)."""
    fn, _ = WORKLOAD["c4_line_cleaning"]
    plan = physical_plan(fn(spark, SF_DIR))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_vocab_coverage_windows_after_topk(spark):
    """The rank/cumsum window must run AFTER the distributed top-k
    (TakeOrderedAndProject), never over the full vocabulary on one
    partition."""
    fn, _ = WORKLOAD["vocab_coverage_top100"]
    plan = physical_plan(fn(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    # exactly one window, above the TakeOrdered in the tree (appears
    # earlier in the printed plan = closer to the root)
    assert plan.count("Window") >= 1
    assert plan.index("Window") < plan.index("TakeOrderedAndProject")


def test_compact_parquet_hits_target_file_count(spark, tmp_path):
    """compact_parquet must fold a many-tiny-files directory into the
    byte-sized target count with all rows intact."""
    from ksql_streams_from_schema_converter_spark.plans.sink import compact_parquet

    ev = load_table(spark, SF_DIR, "events")
    frag = str(tmp_path / "fragmented")
    ev.repartition(64).write.parquet(frag)
    import glob

    assert len(glob.glob(f"{frag}/*.parquet")) == 64
    total = sum(os.path.getsize(f) for f in glob.glob(f"{frag}/*.parquet"))
    out = str(tmp_path / "compacted")
    n = compact_parquet(spark, frag, out, target_file_bytes=total // 4 + 1)
    files = glob.glob(f"{out}/*.parquet")
    assert n == 4 and len(files) == 4
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    # compaction actually equalizes: no output file smaller than half
    # the mean (round-robin repartition, not coalesce)
    sizes = [os.path.getsize(f) for f in files]
    assert min(sizes) > (sum(sizes) / len(sizes)) / 2


def test_quantile_bucketing_spreads_skewed_column(spark, tmp_path):
    """On a heavily skewed column, linear min/max bucketing collapses
    ~all rows into one bucket (the dim stops contributing skip bits);
    quantile bucketing spreads the same rows across ~equal-depth
    buckets. Verified via the bucketizer itself, then end-to-end: the
    quantile z-ordered layout prunes row groups for a dense-range
    predicate the linear layout cannot."""
    from ksql_streams_from_schema_converter_spark.plans.sink import (
        _bucketize,
        write_zordered_parquet,
    )

    # 95% of values in [0, 10), a long tail to 10^6
    rows = [(i, i % 10 if i % 20 != 0 else (i * 997) % 1_000_000, i % 100)
            for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, skewed long, uniform long")

    lin = _bucketize(df, ["skewed"], bits=8, bucketing="linear")
    qnt = _bucketize(df, ["skewed"], bits=8, bucketing="quantile")
    # linear: the dense 95% of rows collapse into ONE bucket (values
    # 0..9 over a 10^6 domain all floor to bucket 0) — that dim then
    # contributes no skip bits for most of the data
    lin_top = lin.groupBy("__z_skewed").count().agg(F.max("count")).head()[0]
    assert lin_top >= 2000 * 0.9, f"expected dense collapse, top={lin_top}"
    # quantile: equal-depth — no bucket holds even half the rows
    qnt_top = qnt.groupBy("__z_skewed").count().agg(F.max("count")).head()[0]
    assert qnt_top < 2000 * 0.5, f"quantile bucket too heavy: {qnt_top}"

    # end-to-end: quantile bucketing subdivides the DENSE region, so a
    # predicate inside it (skewed <= 2) prunes dense row groups; under
    # linear bucketing every dense row maps to bucket 0 and each dense
    # row group spans the whole 0..9 mass — nothing inside it prunes
    import glob

    import pyarrow.parquet as pq

    def dense_spans(d):
        spans = []
        for f in glob.glob(f"{d}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index("skewed")
            for i in range(md.num_row_groups):
                st = md.row_group(i).column(idx).statistics
                if st.max < 10:  # dense-only row group
                    spans.append((st.min, st.max))
        return spans

    qdir, ldir = str(tmp_path / "qz"), str(tmp_path / "lz")
    for d, mode_ in ((qdir, "quantile"), (ldir, "linear")):
        write_zordered_parquet(
            df, d, ["skewed", "uniform"], bits=8, num_files=4,
            max_records_per_file=200, bucketing=mode_,
        )
    q_spans, l_spans = dense_spans(qdir), dense_spans(ldir)
    # >=3, not a tighter bound: repartitionByRange samples boundaries
    # with a run-dependent seed, so the file split (and with it the
    # number of dense-only row groups) jitters by one across runs
    assert len(q_spans) >= 3 and len(l_spans) >= 3
    # linear: dense row groups span ~the full dense mass
    assert sorted(b - a for a, b in l_spans)[len(l_spans) // 2] >= 8
    # quantile: dense row groups are subdivided — narrower spans, and
    # some groups sit entirely above the skewed<=2 predicate (prunable)
    assert sorted(b - a for a, b in q_spans)[len(q_spans) // 2] < 8
    assert any(a > 2 for a, _ in q_spans)


def test_cbo_statistics_drive_join_reordering(spark):
    """Cost-based optimization: with ANALYZE'd column statistics and
    CBO on, Catalyst rewrites a badly-written join order (fact ⋈ dim
    first, selective filter last) so the filtered nation dim joins
    customer BEFORE the orders fact — the stats-driven reorder that
    decides petabytes of intermediate size at 100 TB.  Causality is
    proven by the control: same query, same stats, CBO off → written
    order kept."""
    import uuid

    sfx = uuid.uuid4().hex[:6]
    tables = [f"{t}_{sfx}" for t in ("customer", "orders", "nation")]
    saved = {
        k: spark.conf.get(k)
        for k in ("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    }
    try:
        for t, tn in zip(("customer", "orders", "nation"), tables):
            load_table(spark, "/root/testdata/sf0.001", t).write.saveAsTable(tn)
            spark.sql(f"ANALYZE TABLE {tn} COMPUTE STATISTICS FOR ALL COLUMNS")
        sql = f"""
        SELECT count(*) FROM orders_{sfx} o
        JOIN customer_{sfx} c ON o.o_custkey = c.c_custkey
        JOIN nation_{sfx} n ON c.c_nationkey = n.n_nationkey
        WHERE n.n_name = 'FRANCE'
        """
        orders_first = {}
        for cbo in ("false", "true"):
            spark.conf.set("spark.sql.cbo.enabled", cbo)
            spark.conf.set("spark.sql.cbo.joinReorder.enabled", cbo)
            opt = spark.sql(sql)._jdf.queryExecution().optimizedPlan().toString()
            orders_first[cbo] = opt.index(f"orders_{sfx}") < opt.index(
                f"nation_{sfx}"
            )
        assert orders_first["false"], "control: written order should be kept"
        assert not orders_first["true"], "CBO should join the filtered dim first"
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
        for tn in tables:
            spark.sql(f"DROP TABLE IF EXISTS {tn}")


def test_runtime_bloom_filter_prunes_probe_side(spark, tmp_path):
    """Runtime join pruning, the third leg of the 100 TB join story
    (beside broadcast and AQE skew-split, proven above): when a
    selective filter sits on the build side of a shuffle join,
    Catalyst injects a Bloom filter (``might_contain``) into the
    probe-side scan so non-joining rows die at the scan instead of
    crossing the shuffle.  Thresholds are scaled down to test size
    (the 10 GB probe-side default exists precisely because this only
    pays off at scale)."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        big_dir, small_dir = str(tmp_path / "big"), str(tmp_path / "small")
        spark.range(200_000).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("v")
        ).write.parquet(big_dir)
        spark.range(1000).select(F.col("id").alias("k")).write.parquet(small_dir)
        big = spark.read.parquet(big_dir)
        small = spark.read.parquet(small_dir).where(F.col("k") % 7 == 0)
        j = big.join(small, "k")
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan.lower(), plan[:1500]
        # and the filtered join still returns exactly the right rows
        assert j.count() == 143  # multiples of 7 in [0, 1000)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bucketize_maps_nulls_to_bucket_zero_in_both_modes(spark):
    """ADVICE r3: NULL clustering values must land in a DEFINED bucket
    consistently — linear used to emit a NULL bucket (→ NULL Morton
    key, one unsorted range) while quantile folded NULLs to 0. Both
    modes now agree on bucket 0."""
    from ksql_streams_from_schema_converter_spark.plans.sink import _bucketize

    df = spark.createDataFrame(
        [(1, 100), (2, 500), (3, None), (4, 900)], "id long, v long"
    )
    for mode_ in ("linear", "quantile"):
        out = _bucketize(df, ["v"], bits=4, bucketing=mode_)
        got = {r.id: r["__z_v"] for r in out.collect()}
        assert got[3] == 0, f"{mode_}: NULL bucket = {got[3]!r}"
        assert all(v is not None for v in got.values()), mode_


def test_semantic_dedup_pair_join_is_bucketed_not_all_pairs(spark):
    """semantic_dedup_keep's pair discovery must join on the hyperplane
    bucket (equi-join → hash/sort-merge), never a cartesian or
    nested-loop all-pairs plan, and the final keep filter must be a
    left-anti join."""
    fn, _ = WORKLOAD["semantic_dedup_keep"]
    plan = physical_plan(fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan


def test_lateral_join_decorrelates_to_window(spark):
    """The correlated LATERAL top-k must decorrelate into a window-rank
    + hash-join plan — never a per-outer-row nested-loop re-execution."""
    fn, _ = WORKLOAD["lateral_top_orders_per_nation"]
    plan = physical_plan(fn(spark, SF_DIR))
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_anomaly_zscore_flags_tail_not_bulk(spark):
    """The exact z-test must flag the distribution's tail (values far
    above the mean) and nothing near it — non-vacuous on the
    exponential-ish synthetic values."""
    fn, _ = WORKLOAD["anomaly_zscore_events"]
    out = fn(spark, SF_DIR)
    flagged = out.where("is_anomaly")
    assert flagged.count() > 0
    # every flagged value sits above every unflagged value's |dev|:
    # with a right-skewed positive distribution the flags are the max tail
    min_flagged = flagged.agg(F.min("v2")).head()[0]
    max_unflagged = out.where(~F.col("is_anomaly")).agg(F.max("v2")).head()[0]
    assert min_flagged > max_unflagged


def test_profile_is_one_scan_one_shuffle(spark):
    """The profiler must fold all per-column stats into a single
    aggregate: one scan, one exchange — never a pass per column."""
    fn, _ = WORKLOAD["dataset_profile_orders"]
    plan = physical_plan(fn(spark, SF_DIR))
    assert plan.count("Exchange") == 1
    assert plan.count("FileScan") == 1


def test_zorder_rejects_bit_overflow(spark):
    """bits × columns beyond a long's 63 usable bits must raise, not
    silently wrap (JVM shiftleft is mod-64) into a corrupt key."""
    import pytest

    from ksql_streams_from_schema_converter_spark.plans.sink import zorder_key

    with pytest.raises(ValueError, match="63"):
        zorder_key(["a", "b", "c", "d", "e", "f"], bits=12)
    # within budget is fine
    zorder_key(["a", "b", "c"], bits=21)
