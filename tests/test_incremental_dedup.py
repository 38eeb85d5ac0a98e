"""Incremental dedup against a persisted LSH index (operators/
incremental.py): refresh ≡ from-scratch, no old-doc rescan, and
composability of successive refreshes."""

import re

from pyspark.sql import functions as F

from ksql_streams_from_schema_converter_spark.operators.dedup import lsh_band_rows
from ksql_streams_from_schema_converter_spark.operators.incremental import (
    build_lsh_index,
    refresh_against_index,
)


def _corpus(spark, n=40, dups=((100, 0), (101, 1), (102, 2), (103, 17))):
    """Synthetic docs: 12 rotating tokens each, plus planted exact dups
    (new_id, copied_base_id) in a disjoint id range."""
    rows = [
        (i, " ".join(f"w{(i * 7 + k) % 50}" for k in range(12)))
        for i in range(n)
    ]
    base = dict(rows)
    for new_id, src in dups:  # sequential: a dup may copy a planted dup
        base[new_id] = base[src]
        rows.append((new_id, base[src]))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _scratch_verdicts(spark, docs):
    """The from-scratch keep rule, computed directly: drop iff a
    smaller id shares any (band, key) bucket."""
    bands = lsh_band_rows(docs)
    l, r = bands.alias("l"), bands.alias("r")
    dropped = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("r.doc_id") < F.col("l.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_id"))
        .distinct()
    )
    drop_ids = {r.doc_id for r in dropped.collect()}
    return {r.doc_id: r.doc_id not in drop_ids for r in docs.collect()}


def test_refresh_equals_from_scratch(spark, tmp_path):
    docs = _corpus(spark)
    old = docs.where(F.col("doc_id") < 100)
    new = docs.where(F.col("doc_id") >= 100)
    idx = str(tmp_path / "idx")
    build_lsh_index(old, idx)
    out = refresh_against_index(spark, idx, new)
    got = {r.doc_id: r.kept for r in out.collect()}
    want = _scratch_verdicts(spark, docs)
    assert got == want
    # the planted exact dups are all dropped, their sources kept
    assert not any(got[i] for i in (100, 101, 102, 103))
    # (doc 17 itself collides with an earlier rotating-token doc and is
    # legitimately dropped by the bucket rule — only 0..2 are asserted)
    assert got[0] and got[1] and got[2]
    # phases are labeled by batch membership
    phases = {r.doc_id: r.phase for r in out.collect()}
    assert phases[0] == "old" and phases[100] == "new"


def test_refresh_never_rescans_old_documents(spark, tmp_path):
    """Structural proof: the refresh plan's file scans all point INTO
    the index directory — the old documents' source is not touched
    (only their stored postings are)."""
    import contextlib
    import io

    docs = _corpus(spark)
    idx = str(tmp_path / "idx")
    build_lsh_index(docs.where(F.col("doc_id") < 100), idx)
    out = refresh_against_index(
        spark, idx, docs.where(F.col("doc_id") >= 100), append=False
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    locations = re.findall(r"file:[^\s,\]\[]+", plan)
    assert locations, plan  # the index IS read from files
    assert all("idx" in loc for loc in locations), locations


def test_chained_refreshes_compose(spark, tmp_path):
    """Two successive refresh batches (each appending to the index)
    produce the same verdicts as one from-scratch run over everything —
    the corpus-refresh loop a 100 TB pipeline actually runs."""
    docs = _corpus(spark, dups=((100, 0), (101, 1), (200, 2), (201, 100)))
    idx = str(tmp_path / "idx")
    build_lsh_index(docs.where(F.col("doc_id") < 100), idx)
    refresh_against_index(
        spark, idx, docs.where((F.col("doc_id") >= 100) & (F.col("doc_id") < 200))
    )
    out2 = refresh_against_index(
        spark, idx, docs.where(F.col("doc_id") >= 200)
    )
    got = {r.doc_id: r.kept for r in out2.collect()}
    assert got == _scratch_verdicts(spark, docs)
    # doc 201 copies doc 100 (itself a dropped dup of doc 0): it is
    # still dropped — the rule compares against ALL earlier docs, which
    # is what makes increments order-insensitive
    assert got[201] is False
    # batch-1 docs read back from the index as 'old' in batch 2's output
    phases = {r.doc_id: r.phase for r in out2.collect()}
    assert phases[100] == "old" and phases[200] == "new"


def test_non_monotone_refresh_fails_loudly(spark, tmp_path):
    """A batch carrying an id at or below the stored max would need to
    retroactively flip stored verdicts — the refresh must refuse, not
    silently diverge from the from-scratch answer."""
    import pytest

    docs = _corpus(spark, dups=())
    idx = str(tmp_path / "idx")
    build_lsh_index(docs.where(F.col("doc_id") >= 10), idx)
    with pytest.raises(ValueError, match="non-monotone"):
        refresh_against_index(spark, idx, docs.where(F.col("doc_id") < 10))


def test_refresh_replay_is_idempotent(spark, tmp_path):
    """At-least-once delivery (review r6): re-running the SAME batch
    with the SAME ingest label — foreachBatch's replay shape — must
    converge to the exact same verdict table with no duplicate rows
    and no monotone-guard trip."""
    docs = _corpus(spark)
    old = docs.where(F.col("doc_id") < 100)
    new = docs.where(F.col("doc_id") >= 100)
    idx = str(tmp_path / "idx")
    build_lsh_index(old, idx)
    first = sorted(
        tuple(r)
        for r in refresh_against_index(
            spark, idx, new, ingest_label="b1"
        ).collect()
    )
    replay = sorted(
        tuple(r)
        for r in refresh_against_index(
            spark, idx, new, ingest_label="b1"
        ).collect()
    )
    assert replay == first
    n_docs = docs.count()
    assert len(replay) == n_docs  # one verdict per doc — nothing doubled


def test_refresh_replay_converges_after_torn_write(spark, tmp_path):
    """Crash injected between the postings write and the verdicts
    write: the half-written ingest subdir must neither duplicate
    postings nor trip the monotone guard on replay, and the replayed
    state must equal the clean run's."""
    import os
    import shutil

    docs = _corpus(spark)
    old = docs.where(F.col("doc_id") < 100)
    new = docs.where(F.col("doc_id") >= 100)

    clean_idx = str(tmp_path / "clean")
    build_lsh_index(old, clean_idx)
    want = sorted(
        tuple(r)
        for r in refresh_against_index(
            spark, clean_idx, new, ingest_label="b1"
        ).collect()
    )

    torn_idx = str(tmp_path / "torn")
    build_lsh_index(old, torn_idx)
    # simulate the torn first attempt: postings landed, verdicts did not
    from ksql_streams_from_schema_converter_spark.operators.dedup import (
        lsh_band_rows,
    )

    lsh_band_rows(new).write.mode("overwrite").partitionBy("band").parquet(
        os.path.join(torn_idx, "bands", "ingest=b1")
    )
    assert not os.path.isdir(os.path.join(torn_idx, "docs", "ingest=b1"))
    got = sorted(
        tuple(r)
        for r in refresh_against_index(
            spark, torn_idx, new, ingest_label="b1"
        ).collect()
    )
    assert got == want
    shutil.rmtree(torn_idx, ignore_errors=True)
