"""Bucketed keyed-MERGE state table (operators/merge.py): correctness,
partition-pruned writes, replay idempotence, tombstone semantics."""

import glob
import os

from pyspark.sql import functions as F

from ksql_streams_from_schema_converter_spark.operators.merge import (
    bucket_expr,
    merge_into,
    read_state,
    resolve_bucket_paths,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_upsert_then_read(spark, tmp_path):
    tgt = str(tmp_path / "state")
    base = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    merge_into(base, tgt, key="k", version=0, num_buckets=16)
    # update 3 keys, insert 2 new ones
    src = spark.createDataFrame(
        [(5, 999), (50, 999), (99, 999), (1000, 1), (1001, 2)], "k long, v long"
    )
    touched = merge_into(src, tgt, key="k", version=1, num_buckets=16)
    assert touched == sorted(
        r[0] for r in src.select(bucket_expr(["k"], 16)).distinct().collect()
    )
    got = {r.k: r.v for r in read_state(spark, tgt).collect()}
    assert len(got) == 102
    assert got[5] == got[50] == got[99] == 999
    assert got[1000] == 1 and got[1001] == 2
    assert got[7] == 70  # untouched key intact


def test_merge_rewrites_only_touched_buckets(spark, tmp_path):
    """The 100 TB property (VERDICT r4 #2): a batch touching one bucket
    leaves every other bucket's files byte-untouched — carried by
    reference, not rewritten."""
    tgt = str(tmp_path / "state")
    base = spark.range(1000).select(F.col("id").alias("k"), F.lit(0).cast("long").alias("v"))
    merge_into(base, tgt, key="k", version=0, num_buckets=16)
    v0_files = {
        p: os.stat(p).st_mtime_ns
        for p in glob.glob(f"{tgt}/v-0/**/*.parquet", recursive=True)
    }
    assert len(resolve_bucket_paths(tgt)) == 16  # all buckets present in v0

    one = spark.createDataFrame([(42, 7)], "k long, v long")
    touched = merge_into(one, tgt, key="k", version=1, num_buckets=16)
    assert len(touched) == 1
    # v-1 contains exactly the touched bucket, nothing else
    v1_buckets = glob.glob(f"{tgt}/v-1/__bucket=*")
    assert len(v1_buckets) == 1
    assert v1_buckets[0].endswith(f"__bucket={touched[0]}")
    # v-0 bytes untouched
    assert v0_files == {
        p: os.stat(p).st_mtime_ns
        for p in glob.glob(f"{tgt}/v-0/**/*.parquet", recursive=True)
    }
    # reader resolves 15 buckets from v0 + 1 from v1
    resolved = resolve_bucket_paths(tgt)
    assert sum("/v-1/" in p for p in resolved.values()) == 1
    got = {r.k: r.v for r in read_state(spark, tgt).collect()}
    assert got[42] == 7 and got[41] == 0 and len(got) == 1000


def test_merge_replay_is_idempotent(spark, tmp_path):
    """Re-running a merge version (foreachBatch at-least-once retry)
    reads from versions BELOW it and overwrites its own directory —
    state is identical after the replay."""
    tgt = str(tmp_path / "state")
    merge_into(
        spark.range(50).select(F.col("id").alias("k"), F.lit(0).cast("long").alias("v")),
        tgt, key="k", version=0,
    )
    src = spark.createDataFrame([(1, 11), (2, 22)], "k long, v long")
    merge_into(src, tgt, key="k", version=1)
    before = _rows(read_state(spark, tgt))
    merge_into(src, tgt, key="k", version=1)  # replay
    assert _rows(read_state(spark, tgt)) == before


def test_merge_latest_wins_and_tombstones_block_resurrection(spark, tmp_path):
    """Ordering by order_col with kept tombstones: a late out-of-order
    event (lower seq) arriving AFTER a delete cannot resurrect the key,
    because the tombstone row stays in state and still wins by seq."""
    tgt = str(tmp_path / "state")
    base = spark.createDataFrame(
        [(1, 0, "INSERT", 100), (2, 0, "INSERT", 200)],
        "k long, seq long, op string, amount long",
    )
    merge_into(base, tgt, key="k", version=0, order_col="seq")
    merge_into(
        spark.createDataFrame([(1, 10, "DELETE", 0)], base.schema),
        tgt, key="k", version=1, order_col="seq",
    )
    merge_into(  # late event: seq 5 < the tombstone's 10
        spark.createDataFrame([(1, 5, "UPDATE", 150)], base.schema),
        tgt, key="k", version=2, order_col="seq",
    )
    live = read_state(spark, tgt, drop_where=F.col("op") == "DELETE")
    assert {r.k for r in live.collect()} == {2}
    # the tombstone itself is still in raw state (not silently dropped)
    raw = {r.k: r.op for r in read_state(spark, tgt).collect()}
    assert raw[1] == "DELETE"


def test_read_state_as_of_version(spark, tmp_path):
    tgt = str(tmp_path / "state")
    merge_into(
        spark.createDataFrame([(1, 10)], "k long, v long"), tgt, "k", version=0
    )
    merge_into(
        spark.createDataFrame([(1, 20)], "k long, v long"), tgt, "k", version=1
    )
    assert read_state(spark, tgt, max_version=0).head().v == 10
    assert read_state(spark, tgt).head().v == 20


def test_vacuum_versions_removes_superseded_buckets(spark, tmp_path):
    """Vacuum deletes only bucket dirs shadowed by newer versions; the
    visible state is identical before and after, and time-travel depth
    honors keep_latest."""
    from ksql_streams_from_schema_converter_spark.operators.merge import (
        vacuum_versions,
    )

    tgt = str(tmp_path / "state")
    merge_into(
        spark.range(200).select(F.col("id").alias("k"), F.col("id").alias("v")),
        tgt, key="k", version=0, num_buckets=8,
    )
    merge_into(  # rewrites every bucket => v0 fully superseded
        spark.range(200).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v")),
        tgt, key="k", version=1, num_buckets=8,
    )
    merge_into(  # touches one bucket
        spark.createDataFrame([(7, 777)], "k long, v long"),
        tgt, key="k", version=2, num_buckets=8,
    )
    before = _rows(read_state(spark, tgt))
    deleted = vacuum_versions(tgt, keep_latest=1)
    # all 8 v0 buckets superseded by v1; the one v1 bucket shadowed by
    # v2 is superseded too
    assert len(deleted) == 9
    assert all("/v-0/" in p or "/v-1/" in p for p in deleted)
    assert _rows(read_state(spark, tgt)) == before
    assert not os.path.exists(os.path.join(tgt, "v-0"))  # fully emptied
    assert vacuum_versions(tgt, keep_latest=1) == []  # idempotent


def test_merge_batch_split_is_associative(spark, tmp_path):
    """State-machine property: merging a CDC log as ANY partition into
    ordered batches yields the same final state as one big merge —
    the guarantee that lets a streaming job's batch boundaries (which
    depend on trigger timing) never change the answer. Seeded rows,
    three splits compared cell-for-cell."""
    from pyspark.sql import functions as F

    from ksql_streams_from_schema_converter_spark.operators.merge import (
        merge_into,
        read_state,
    )

    rows = []
    x = 99
    for seq in range(120):
        x = (x * 1103515245 + 12345) % (2**31)
        recid = f"R{x % 17}"
        op = "DELETE" if x % 11 == 0 else "UPSERT"
        rows.append((recid, seq, op, float(x % 1000)))
    src = spark.createDataFrame(
        rows, "recid string, seq long, op string, amount double"
    )

    def run(split_points, name):
        d = str(tmp_path / name)
        bounds = [0, *split_points, 120]
        for v, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
            batch = src.where((F.col("seq") >= lo) & (F.col("seq") < hi))
            merge_into(batch, d, key="recid", version=v, order_col="seq")
        final = read_state(spark, d, drop_where=F.col("op") == "DELETE")
        return sorted(map(tuple, final.collect()))

    whole = run([], "whole")
    halves = run([60], "halves")
    uneven = run([7, 30, 31, 100], "uneven")
    assert whole == halves == uneven
    assert len(whole) > 0


def test_torn_write_invisible_then_replay_converges(spark, tmp_path):
    """Failure injection (VERDICT r5 #6): kill a merge BETWEEN part-file
    write and version publish — part files on disk, no ``_SUCCESS``
    marker — and assert (a) readers never see the torn version (the
    marker is the publish point: snapshot isolation for a crashed
    writer), and (b) replaying the same version converges to the exact
    state a never-crashed run produces, byte-for-byte at the row level."""
    import shutil

    base = spark.range(300).select(
        F.col("id").alias("k"), F.lit(0).cast("long").alias("v")
    )
    batch = spark.createDataFrame(
        [(5, 55), (77, 777), (123, 1), (2000, 9)], "k long, v long"
    )

    # reference: a clean, never-crashed run
    clean = str(tmp_path / "clean")
    merge_into(base, clean, key="k", version=0, num_buckets=8)
    merge_into(batch, clean, key="k", version=1, num_buckets=8)
    want = _rows(read_state(spark, clean))

    # crash run: v1 lands fully...
    torn = str(tmp_path / "torn")
    merge_into(base, torn, key="k", version=0, num_buckets=8)
    merge_into(batch, torn, key="k", version=1, num_buckets=8)
    v0_rows = _rows(read_state(spark, torn, max_version=0))
    # ...then the crash is injected: roll the manifest back to the
    # pre-commit state (part files present, publish never happened —
    # the torn state a kill between data write and manifest commit
    # leaves), with one bucket also half-missing
    from ksql_streams_from_schema_converter_spark.operators.indexstore import (
        read_manifest,
        write_manifest_entries,
    )

    write_manifest_entries(
        torn, [e for e in read_manifest(torn) if e["version"] != 1]
    )
    some_bucket = sorted(glob.glob(os.path.join(torn, "v-1", "__bucket=*")))[0]
    shutil.rmtree(some_bucket)

    # (a) torn version is invisible: readers resolve the v0 snapshot
    assert _rows(read_state(spark, torn)) == v0_rows
    assert all(
        "/v-1/" not in p for p in resolve_bucket_paths(torn).values()
    )

    # (b) the at-least-once replay overwrites the torn directory from
    # v0 inputs only and republishes — state equals the clean run
    merge_into(batch, torn, key="k", version=1, num_buckets=8)
    assert _rows(read_state(spark, torn)) == want


def test_unmanifested_legacy_state_fails_loudly_and_adopts(spark, tmp_path):
    """VERDICT r7 #5 / ADVICE r7: a state table written by the
    pre-manifest (glob + _SUCCESS) layout must raise on read — never
    silently resolve as empty — and adopt_unmanifested_state()
    migrates it one-shot, after which reads and further merges work."""
    import pytest

    from ksql_streams_from_schema_converter_spark.operators.indexstore import (
        UnmanifestedIndexError,
    )
    from ksql_streams_from_schema_converter_spark.operators.merge import (
        adopt_unmanifested_state,
    )

    tgt = str(tmp_path / "legacy")
    base = spark.range(100).select(
        F.col("id").alias("k"), F.lit(1).cast("long").alias("v")
    )
    merge_into(base, tgt, key="k", version=0, num_buckets=8)
    want = _rows(read_state(spark, tgt))
    os.remove(os.path.join(tgt, "manifest.json"))  # the legacy shape
    # ADVICE r8: a LONE v-0 is most likely a torn first merge — the
    # error must steer the operator to replaying the merge, and only
    # secondarily to adoption
    with pytest.raises(UnmanifestedIndexError, match="REPLAY"):
        read_state(spark, tgt)
    # with multiple versions the table is unambiguously pre-manifest:
    # the error steers straight to adoption, no replay advice
    os.makedirs(os.path.join(tgt, "v-1"), exist_ok=True)
    with pytest.raises(UnmanifestedIndexError, match="pre-manifest"):
        read_state(spark, tgt)
    os.rmdir(os.path.join(tgt, "v-1"))
    assert adopt_unmanifested_state(tgt) == [0]
    assert _rows(read_state(spark, tgt)) == want
    merge_into(
        spark.createDataFrame([(7, 777)], "k long, v long"),
        tgt, key="k", version=1, num_buckets=8,
    )
    got = {r.k: r.v for r in read_state(spark, tgt).collect()}
    assert got[7] == 777 and got[8] == 1
    with pytest.raises(ValueError, match="already has a manifest"):
        adopt_unmanifested_state(tgt)
