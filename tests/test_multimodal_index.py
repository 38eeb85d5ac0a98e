"""Persisted multimodal signature index (multimodal/index.py —
VERDICT r10 #2): governance parity with the dedup/ANN stacks.
Lifecycle invariants (torn saves invisible, replay idempotent, as-of
snapshots, tombstone subtraction above the band-pruned scan) plus the
plan guard that retraction never costs the store its partition
pruning."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ksql_streams_from_schema_converter_spark.multimodal import (
    attach_fake_media,
)
from ksql_streams_from_schema_converter_spark.multimodal.index import (
    SIG_SUB,
    build_dhash_index,
    index_near_dup_pairs,
    read_dhash_band_rows,
    read_dhash_signatures,
    refresh_dhash_index,
    retract_from_dhash_index,
    search_dhash_index,
)


def _media(spark, lo, hi, tag=""):
    # per-id pseudo-random payloads: the fake-pixel decode samples 72
    # proportional byte offsets, so texts must differ THROUGHOUT to
    # keep unrelated docs off each other's Hamming-0 bucket
    rows = [
        (
            i,
            f"payload {tag} {i} "
            + "".join(chr(97 + (i * 7 + j * j) % 26) for j in range(80)),
        )
        for i in range(lo, hi)
    ]
    return attach_fake_media(
        spark.createDataFrame(rows, "doc_id long, text string")
    )


def test_mm_index_build_refresh_retract_counts(spark, tmp_path):
    """End-to-end sequence: membership counts track the manifest, an
    exact copy pairs with its original at Hamming 0, and retraction
    removes the copy from pairing and membership."""
    idx = str(tmp_path / "mm")
    build_dhash_index(_media(spark, 0, 50), idx)
    assert read_dhash_signatures(spark, idx).count() == 50
    # refresh with exact copies of docs 0..4 under shifted ids
    copies = _media(spark, 0, 5).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "payload"
    )
    refresh_dhash_index(spark, idx, copies, ingest_label="b1")
    assert read_dhash_signatures(spark, idx).count() == 55
    pairs = index_near_dup_pairs(spark, idx)
    exact = {
        (r.id_a, r.id_b) for r in pairs.where("hamming = 0").collect()
    }
    assert {(i, i + 1000) for i in range(5)} <= exact
    retract_from_dhash_index(spark, idx, [1000, 1001], label="t1")
    assert read_dhash_signatures(spark, idx).count() == 53
    left = {
        (r.id_a, r.id_b)
        for r in index_near_dup_pairs(spark, idx).where("hamming = 0").collect()
    }
    assert not any(1000 in pr or 1001 in pr for pr in left)
    assert {(i, i + 1000) for i in (2, 3, 4)} <= left


def test_mm_index_torn_refresh_invisible_and_replay_converges(spark, tmp_path):
    """Data landing without a manifest commit is invisible; replaying
    the same ingest label overwrites and converges (the foreachBatch
    at-least-once contract)."""
    idx = str(tmp_path / "mm")
    build_dhash_index(_media(spark, 0, 10), idx)
    # torn: band rows land for b1 but no commit
    torn_dir = os.path.join(idx, SIG_SUB, "ingest=b1")
    from ksql_streams_from_schema_converter_spark.multimodal.index import (
        _sig_band_rows,
        _write_sigs,
    )

    _write_sigs(_sig_band_rows(_media(spark, 100, 105)), idx, "b1")
    assert os.path.exists(torn_dir)
    assert read_dhash_signatures(spark, idx).count() == 10
    # replayed commit of the same label converges to one copy
    refresh_dhash_index(spark, idx, _media(spark, 100, 105), ingest_label="b1")
    refresh_dhash_index(spark, idx, _media(spark, 100, 105), ingest_label="b1")
    assert read_dhash_signatures(spark, idx).count() == 15


def test_mm_index_as_of_is_a_true_snapshot(spark, tmp_path):
    """as_of=label: later ingests AND later tombstones are invisible;
    unknown labels fail loudly; empty index fails loudly."""
    idx = str(tmp_path / "mm")
    build_dhash_index(_media(spark, 0, 10), idx)
    refresh_dhash_index(spark, idx, _media(spark, 100, 110), ingest_label="b1")
    retract_from_dhash_index(spark, idx, [0, 1, 100], label="t1")
    base_ids = {
        r.doc_id for r in read_dhash_signatures(spark, idx, as_of="base").collect()
    }
    assert base_ids == set(range(10))  # b1 and t1 both invisible
    b1_ids = {
        r.doc_id for r in read_dhash_signatures(spark, idx, as_of="b1").collect()
    }
    assert b1_ids == set(range(10)) | set(range(100, 110))
    latest = {
        r.doc_id for r in read_dhash_signatures(spark, idx).collect()
    }
    assert latest == (set(range(2, 10)) | set(range(101, 110)))
    with pytest.raises(ValueError):
        read_dhash_signatures(spark, idx, as_of="nope")


def test_mm_retraction_antijoin_preserves_band_pruning(spark, tmp_path):
    """The tombstone anti-join sits ABOVE the signature scan; Catalyst
    must still push the band partition filter through it — retraction
    cannot cost the store its partition pruning (the dedup-index
    VERDICT r6 #1 guard, applied to the multimodal family)."""
    idx = str(tmp_path / "mm")
    build_dhash_index(_media(spark, 0, 50), idx)
    retract_from_dhash_index(spark, idx, [0, 1, 2], label="t1")
    sigs = read_dhash_signatures(spark, idx)  # band = 0 partition only
    plan = sigs._jdf.queryExecution().executedPlan().toString()
    part = plan.split("PartitionFilters")[1].split("]")[0]
    assert "band" in part, plan
    ids = {r.doc_id for r in sigs.collect()}
    assert ids == set(range(3, 50))


def test_mm_search_excludes_self_and_respects_tombstones(spark, tmp_path):
    """A probe that is already stored never matches itself; retracted
    media vanish from search results."""
    idx = str(tmp_path / "mm")
    build_dhash_index(_media(spark, 0, 10), idx)
    copies = _media(spark, 0, 3).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "payload"
    )
    refresh_dhash_index(spark, idx, copies, ingest_label="b1")
    probe = _media(spark, 0, 3)  # stored ids 0..2
    hits = search_dhash_index(spark, idx, probe).collect()
    assert all(r.probe_id != r.stored_id for r in hits)
    assert {(i, i + 1000) for i in range(3)} <= {
        (r.probe_id, r.stored_id) for r in hits if r.hamming == 0
    }
    retract_from_dhash_index(spark, idx, [1000], label="t1")
    hits2 = {
        (r.probe_id, r.stored_id)
        for r in search_dhash_index(spark, idx, probe).collect()
    }
    assert (0, 1000) not in hits2
    assert (1, 1001) in hits2


def test_mm_index_compaction_physical_removal(spark, tmp_path):
    """FULL compaction rewrites every ingest into one, makes
    retraction physical (no stored row carries a retracted id), clears
    the tombstone entries in the same manifest commit, and leaves every
    read identical."""
    import glob

    from ksql_streams_from_schema_converter_spark.multimodal.index import (
        compact_dhash_index,
        read_dhash_band_rows,
    )
    from ksql_streams_from_schema_converter_spark.operators.indexstore import (
        read_manifest,
    )

    idx = str(tmp_path / "mm")
    build_dhash_index(_media(spark, 0, 30), idx)
    refresh_dhash_index(spark, idx, _media(spark, 100, 110), ingest_label="b1")
    retract_from_dhash_index(spark, idx, [0, 100], label="t1")
    before = {
        (r.doc_id, r.h0, r.h1, r.h2, r.h3)
        for r in read_dhash_signatures(spark, idx).collect()
    }
    label = compact_dhash_index(spark, idx)
    after = {
        (r.doc_id, r.h0, r.h1, r.h2, r.h3)
        for r in read_dhash_signatures(spark, idx).collect()
    }
    assert after == before
    entries = read_manifest(idx)
    assert [e["label"] for e in entries] == [label]
    assert not [e for e in entries if e.get("kind") == "tombstone"]
    # physical: one ingest directory, no tombstone dirs, retracted ids
    # absent from the RAW store (not just the filtered read)
    dirs = glob.glob(os.path.join(idx, SIG_SUB, "ingest=*"))
    assert [os.path.basename(d) for d in dirs] == [f"ingest={label}"]
    assert not glob.glob(os.path.join(idx, "tombstones", "ingest=*"))
    raw_ids = {r.doc_id for r in read_dhash_band_rows(spark, idx).collect()}
    assert 0 not in raw_ids and 100 not in raw_ids
    # search still works against the compacted store
    hits = {
        (r.probe_id, r.stored_id, r.hamming)
        for r in search_dhash_index(spark, idx, _media(spark, 5, 6)).collect()
    }
    assert all(h[1] != 0 and h[1] != 100 for h in hits)


def test_streaming_multimodal_retraction_restart_recovery(spark, tmp_path):
    """The dHash-index twin of the LSH/ANN restart tests (workload
    streaming_multimodal_retraction): the retraction stream survives a
    restart between batches — the checkpoint resumes with continuing
    batch ids — and an at-least-once redelivery of the tombstone batch
    commits its label exactly once and changes no read."""
    import glob
    import shutil
    import time

    from ksql_streams_from_schema_converter_spark.multimodal.index import (
        build_dhash_index,
        refresh_dhash_index,
        retract_from_dhash_index,
    )
    from ksql_streams_from_schema_converter_spark.operators.indexstore import (
        read_manifest,
    )

    work = str(tmp_path)
    stream_dir = os.path.join(work, "in")
    index_dir = os.path.join(work, "idx")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(stream_dir)
    base = _media(spark, 0, 20)
    copies = _media(spark, 0, 4).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "payload"
    )
    med = lambda df: df.select(  # noqa: E731
        F.lit("media").alias("kind"), "doc_id", "payload"
    )
    ops = [
        med(base),
        med(copies),
        spark.createDataFrame(
            [("retract", 1000 + i) for i in range(4)],
            "kind string, doc_id long",
        ).select("kind", "doc_id", F.lit(None).cast("binary").alias("payload")),
    ]

    def _drop(i, op, t0):
        tmp = os.path.join(work, f"tmp_{i}")
        op.coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(stream_dir, f"op{i}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (t0 + 10 * i, t0 + 10 * i))

    def apply_ops(batch_df, batch_id: int) -> None:
        m = batch_df.where(F.col("kind") == "media").select("doc_id", "payload")
        if not m.isEmpty():
            if batch_id == 0:
                build_dhash_index(m, index_dir)
            else:
                refresh_dhash_index(
                    spark, index_dir, m, ingest_label=f"b{batch_id}"
                )
        tombs = batch_df.where(F.col("kind") == "retract").select("doc_id")
        if not tombs.isEmpty():
            retract_from_dhash_index(
                spark,
                index_dir,
                [r.doc_id for r in tombs.collect()],
                label=f"t{batch_id}",
            )

    def _run():
        q = (
            spark.readStream.schema(ops[0].schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
            .writeStream.foreachBatch(apply_ops)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    t0 = time.time()
    # phase 1: build + refresh; the "crash" is the drain ending
    _drop(0, ops[0], t0)
    _drop(1, ops[1], t0)
    _run()
    ids1 = {r.doc_id for r in read_dhash_signatures(spark, index_dir).collect()}
    assert ids1 == set(range(20)) | {1000 + i for i in range(4)}
    # phase 2: the tombstone arrives; restart from the SAME checkpoint
    _drop(2, ops[2], t0)
    _run()
    ids2 = {r.doc_id for r in read_dhash_signatures(spark, index_dir).collect()}
    assert ids2 == set(range(20))
    labels = [e["label"] for e in read_manifest(index_dir)]
    assert labels.count("t2") == 1 and labels.count("b1") == 1
    # redelivery of the tombstone: same label, nothing changes
    retract_from_dhash_index(
        spark, index_dir, [1000 + i for i in range(4)], label="t2"
    )
    labels = [e["label"] for e in read_manifest(index_dir)]
    assert labels.count("t2") == 1
    assert {
        r.doc_id for r in read_dhash_signatures(spark, index_dir).collect()
    } == ids2


def test_incremental_near_dup_matches_scratch_and_never_rescans(spark, tmp_path):
    """incremental_near_dup_pairs (VERDICT r11 #7) == the from-scratch
    near_dup_pairs over corpus ∪ batch restricted to batch-touching
    pairs; and the returned plan contains NO Arrow signing stage and
    no media payload column — the stored corpus is never re-signed,
    only its persisted postings are read."""
    from ksql_streams_from_schema_converter_spark.multimodal import (
        near_dup_pairs,
        perceptual_dhash,
    )
    from ksql_streams_from_schema_converter_spark.multimodal.index import (
        incremental_near_dup_pairs,
    )

    idx = str(tmp_path / "mm")
    base = _media(spark, 0, 30)
    build_dhash_index(base, idx)
    # batch: exact copies of 3 and 7 (shifted ids) + two fresh items +
    # an in-batch duplicate pair (101/102 share a payload)
    copies = _media(spark, 3, 4).select(
        (F.col("doc_id") + 100).alias("doc_id"), "payload"
    ).unionByName(
        _media(spark, 7, 8).select(
            (F.col("doc_id") + 100).alias("doc_id"), "payload"
        )
    )
    dup = _media(spark, 50, 51).select(
        (F.col("doc_id") + 51).alias("doc_id"), "payload"
    ).unionByName(
        _media(spark, 50, 51).select(
            (F.col("doc_id") + 52).alias("doc_id"), "payload"
        )
    )
    batch = copies.unionByName(dup).localCheckpoint(eager=True)
    got = incremental_near_dup_pairs(spark, idx, batch)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan, plan  # batch pre-signed, corpus never
    assert "payload" not in plan, plan  # only postings in the plan
    got_set = {(r.id_a, r.id_b, r.hamming) for r in got.collect()}
    full = base.select("doc_id", "payload").unionByName(
        batch.select("doc_id", "payload")
    )
    batch_ids = {r.doc_id for r in batch.select("doc_id").collect()}
    want = {
        (r.id_a, r.id_b, r.hamming)
        for r in near_dup_pairs(perceptual_dhash(full), max_hamming=3).collect()
        if r.id_a in batch_ids or r.id_b in batch_ids
    }
    assert got_set == want
    assert (3, 103, 0) in got_set and (7, 107, 0) in got_set
    assert (101, 102, 0) in got_set
