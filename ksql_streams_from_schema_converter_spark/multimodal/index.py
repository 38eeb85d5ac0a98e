"""Persisted perceptual-signature index for binary media — the dedup
(operators/incremental.py) and ANN (operators/ann_index.py) governance
discipline applied to the multimodal family (VERDICT r10 #2).

The r8 near-dup operators (binary.py:271-424) recompute dHash
signatures per query; at real cadence the signatures are an INDEX: a
media corpus signs once, new batches sign only themselves and trade
banded buckets against the store, and GDPR retraction / as-of time
travel must hold on the persisted artifact exactly as they do for the
LSH-postings and IVF-PQ stacks.

Layout (indexstore manifest, one atomic commit per mutation):

- ``signatures/ingest=<label>/band=<b>/``: one row per (media id,
  band) — the 16-bit band value ``v`` is the LSH bucket key, and the
  FULL 4-band signature (h0..h3) rides on every row so the Hamming
  verify after a bucket join is a map-side expression (the
  near_dup_pairs discipline — no re-join against a signature table).
- ``tombstones/ingest=<label>/``: retracted id lists
  (indexstore.retract_ids) — reads subtract them via a broadcast
  anti-join ABOVE the band-pruned scan, so retraction never costs the
  index its partition pruning.

Scale: signatures are 4 ints per media row (KBs per million items per
band); refresh signs only the batch (one Arrow pass) and its bucket
trade joins band-partition-pruned stored postings; retraction is a
KB-sized broadcast anti-join; as-of reads resolve a manifest prefix —
zero data copies.  Reference parity: the reference repo has no media
plane; this mirrors its persisted-template discipline
(controllers/index.js:611-615) at the index layer instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.indexstore import (
    commit_ingest,
    committed_max_id,
    data_labels,
    entries_as_of,
    next_auto_label,
    read_ingests,
    require_manifested,
    retract_ids,
    subtract_tombstones,
)
from .binary import _check_banding_exact, perceptual_dhash

#: store subdirectory for signature band postings
SIG_SUB = "signatures"
#: the base (build-time) ingest label
_BASE = "base"


def _sig_band_rows(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """``(id, h0..h3, band, v)`` — each media row becomes 4 band rows
    keyed by its 16-bit band value, carrying the full signature.
    ``perceptual_dhash``'s Arrow kernel is pinned to the ``doc_id``
    column name, so a non-default ``id_col`` is renamed around it
    (ADVICE r11 — the parameter used to fail inside the kernel)."""
    if id_col != "doc_id":
        if "doc_id" in media.columns:
            raise ValueError(
                f"id_col={id_col!r} with a 'doc_id' column also present "
                "is ambiguous — rename one"
            )
        media = media.withColumnRenamed(id_col, "doc_id")
    hashes = perceptual_dhash(media)
    return hashes.select(
        F.col("doc_id").alias(id_col),
        *[F.col(f"h{i}") for i in range(4)],
        F.posexplode(F.array("h0", "h1", "h2", "h3")).alias("band", "v"),
    )


def _write_sigs(rows: DataFrame, index_dir: str, label: str) -> None:
    """One ingest directory, partitioned by ``band`` and sorted by the
    bucket value ``v`` (row-group skipping for bucket point-lookups)."""
    (
        rows.sortWithinPartitions("band", "v")
        .write.mode("overwrite")
        .partitionBy("band")
        .parquet(os.path.join(index_dir, SIG_SUB, f"ingest={label}"))
    )


def build_dhash_index(
    media: DataFrame, index_dir: str, id_col: str = "doc_id"
) -> None:
    """One-time signature build over the existing media corpus:
    persist band postings and publish with one atomic manifest commit.
    Idempotent — a replayed build overwrites ``ingest=base`` and
    re-commits."""
    rows = _sig_band_rows(media, id_col).localCheckpoint(eager=True)
    _write_sigs(rows, index_dir, _BASE)
    stats = rows.agg(
        F.max(id_col).alias("mx"), (F.count("*") / 4).cast("long").alias("n")
    ).head()
    commit_ingest(index_dir, _BASE, max_id=stats["mx"], rows=stats["n"])


def refresh_dhash_index(
    spark: SparkSession,
    index_dir: str,
    new_media: DataFrame,
    id_col: str = "doc_id",
    ingest_label: str | None = None,
    check_monotone: bool = True,
) -> str:
    """Sign a NEW media batch (one Arrow pass over the batch only —
    stored media never re-signs) and append it as its own ingest:
    label-scoped overwrite + one atomic manifest commit, so an
    at-least-once caller passing a stable label (foreachBatch batch id)
    converges under redelivery.  Returns the label.

    ``check_monotone`` enforces the same monotone-ingest contract as
    the dedup stack's ``refresh_against_index`` (ADVICE r11 — the
    manifest records ``max_id`` per entry; without the guard a batch
    re-ingesting already-stored ids under a NEW label silently
    duplicates signature rows and inflates ``read_dhash_signatures``
    counts).  The current label is excluded so a replayed batch never
    trips on its own half-written first attempt.  The guard runs
    BEFORE the parquet write (ADVICE r12: the batch's min/max come
    from the checkpointed rows, so a rejected batch leaves no orphan
    uncommitted ingest directory on disk)."""
    label = ingest_label or next_auto_label(index_dir)
    require_manifested(index_dir, SIG_SUB, allow={label})
    rows = _sig_band_rows(new_media, id_col).localCheckpoint(eager=True)
    lo, mx, n = rows.agg(
        F.min(id_col), F.max(id_col), (F.count("*") / 4).cast("long")
    ).head()
    if check_monotone:
        hi = committed_max_id(index_dir, exclude={label})
        if hi is not None and lo is not None and lo <= hi:
            raise ValueError(
                f"non-monotone refresh: new batch min {id_col}={lo} <= "
                f"stored max {id_col}={hi}"
            )
    _write_sigs(rows, index_dir, label)
    commit_ingest(index_dir, label, max_id=mx, rows=n)
    return label


def retract_from_dhash_index(
    spark: SparkSession,
    index_dir: str,
    ids,
    id_col: str = "doc_id",
    label: str | None = None,
) -> str:
    """GDPR-style removal of media ids: a tombstone ingest published
    by one atomic manifest commit (indexstore.retract_ids — the exact
    discipline of the dedup and ANN stacks).  After this commit the
    retracted media are gone from every read: signature reads,
    in-index pair discovery, and probe searches.  Returns the label."""
    require_manifested(index_dir, SIG_SUB)
    # plain id lists pass through: retract_ids lands them via the
    # bounded-artifact driver-side write (r14)
    return retract_ids(spark, index_dir, ids, id_col, label)


def _scoped_labels(
    index_dir: str, as_of: str | None
) -> tuple[list[str], list[str] | None]:
    """(data labels, tombstone labels) for a read — the full committed
    sets when ``as_of`` is None, else the manifest prefix ending at the
    label (later ingests invisible, only tombstones committed by then
    applied — the read_verdicts / read_cells time-travel contract)."""
    if as_of is None:
        return data_labels(index_dir), None
    pre = entries_as_of(index_dir, as_of)
    return (
        [e["label"] for e in pre if e.get("kind") != "tombstone"],
        [e["label"] for e in pre if e.get("kind") == "tombstone"],
    )


def read_dhash_band_rows(
    spark: SparkSession,
    index_dir: str,
    id_col: str = "doc_id",
    as_of: str | None = None,
) -> DataFrame:
    """The committed, tombstone-subtracted band postings ``(id, h0..h3,
    band, v)`` — manifest-scoped (torn ingests invisible); the
    anti-join sits ABOVE the scan so band partition pruning survives
    retraction (plan-guarded by tests/test_multimodal_index.py)."""
    require_manifested(index_dir, SIG_SUB)
    dl, tl = _scoped_labels(index_dir, as_of)
    df = read_ingests(spark, index_dir, SIG_SUB, dl)
    if df is None:
        raise ValueError(f"empty index (no committed ingests): {index_dir}")
    return subtract_tombstones(spark, index_dir, df, id_col, tl)


def read_dhash_signatures(
    spark: SparkSession,
    index_dir: str,
    id_col: str = "doc_id",
    as_of: str | None = None,
) -> DataFrame:
    """One signature row ``(id, h0..h3)`` per visible media item —
    read from the ``band=0`` partition only (every band row carries the
    full signature, so one partition IS the signature table and the
    scan reads 1/4 of the store)."""
    return (
        read_dhash_band_rows(spark, index_dir, id_col, as_of)
        .where(F.col("band") == 0)
        .select(id_col, "h0", "h1", "h2", "h3")
    )


def _verified_pairs(a: DataFrame, b: DataFrame, max_hamming: int) -> DataFrame:
    """Bucket-join ``a`` and ``b`` on (band, v) and Hamming-verify from
    the carried signatures — the near_dup_pairs core over two arbitrary
    band-row sides."""
    ham = sum(
        F.bit_count(F.col(f"__a{i}").bitwiseXOR(F.col(f"__b{i}")))
        for i in range(4)
    ).cast("long")
    return (
        a.join(b, ["band", "v"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def _sides(rows: DataFrame, id_col: str, tag: str) -> DataFrame:
    return rows.select(
        F.col(id_col).alias(f"id_{tag}"),
        *[F.col(f"h{i}").alias(f"__{tag}{i}") for i in range(4)],
        "band",
        "v",
    )


def index_near_dup_pairs(
    spark: SparkSession,
    index_dir: str,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    as_of: str | None = None,
) -> DataFrame:
    """Near-duplicate pairs among the index's visible media — the
    binary.near_dup_pairs semantics (4×16 Hamming banding, exact for
    distance ≤ 3 by pigeonhole, map-side verify) over the PERSISTED
    band postings: signatures are never recomputed, the bucket join
    reads the band-partitioned store, and retraction/as-of scoping
    applies before pairing."""
    _check_banding_exact(max_hamming)
    rows = read_dhash_band_rows(spark, index_dir, id_col, as_of)
    return _verified_pairs(
        _sides(rows, id_col, "a"), _sides(rows, id_col, "b"), max_hamming
    )


def search_dhash_index(
    spark: SparkSession,
    index_dir: str,
    probe_media: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    as_of: str | None = None,
) -> DataFrame:
    """Find stored near-duplicates of a PROBE media batch: sign the
    batch (one Arrow pass), trade its band buckets against the stored
    postings, Hamming-verify map-side.  Output ``(probe_id, stored_id,
    hamming)``; a stored row with the PROBE'S OWN id is excluded (a
    re-searched already-ingested item matching itself is noise, not a
    duplicate).  The probe side is batch-sized; the stored side is the
    band-pruned, tombstone-subtracted store."""
    _check_banding_exact(max_hamming)
    probe = _sig_band_rows(probe_media, id_col).localCheckpoint(eager=True)
    stored = read_dhash_band_rows(spark, index_dir, id_col, as_of)
    ham = sum(
        F.bit_count(F.col(f"__a{i}").bitwiseXOR(F.col(f"__b{i}")))
        for i in range(4)
    ).cast("long")
    return (
        _sides(probe, id_col, "a")
        .join(_sides(stored, id_col, "b"), ["band", "v"])
        .where(F.col("id_a") != F.col("id_b"))
        .select(
            F.col("id_a").alias("probe_id"),
            F.col("id_b").alias("stored_id"),
            ham.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def compact_dhash_index(
    spark: SparkSession,
    index_dir: str,
    id_col: str = "doc_id",
) -> str:
    """FULL compaction: rewrite every committed signature ingest into
    ONE (refresh cadence accumulates an ``ingest=`` directory per
    batch — the small-file problem at real cadence) and make
    retraction PHYSICAL — visible rows are re-read with tombstones
    applied, so no stored row can still carry a retracted id, and the
    tombstone entries are swapped out in the SAME atomic manifest
    commit (the compact_lsh_index / ANN-compaction discipline).  Reads
    are identical before and after; torn compactions are invisible
    (the new directory only becomes visible at the swap) and a re-run
    overwrites it.  As-of labels predating the compaction stop
    resolving — compaction is the explicit history-rewrite point.
    Returns the new label."""
    from ..operators.indexstore import (
        TOMBSTONES,
        drop_ingest_dirs,
        replace_ingests,
        tombstone_labels,
    )

    require_manifested(index_dir, SIG_SUB)
    labels = data_labels(index_dir)
    if not labels:
        raise ValueError("nothing to compact")
    tombs = tombstone_labels(index_dir)
    rows = read_dhash_band_rows(spark, index_dir, id_col).localCheckpoint(
        eager=True
    )
    new_label = next_auto_label(index_dir, prefix="c")
    _write_sigs(rows.select(id_col, "h0", "h1", "h2", "h3", "band", "v"),
                index_dir, new_label)
    stats = rows.agg(
        F.max(id_col).alias("mx"), (F.count("*") / 4).cast("long").alias("n")
    ).head()
    replace_ingests(
        index_dir,
        labels + tombs,
        new_label,
        max_id=stats["mx"],
        rows=stats["n"],
    )
    drop_ingest_dirs(index_dir, SIG_SUB, labels)
    drop_ingest_dirs(index_dir, TOMBSTONES, tombs)
    return new_label


def incremental_near_dup_pairs(
    spark: SparkSession,
    index_dir: str,
    new_media: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    as_of: str | None = None,
) -> DataFrame:
    """Every near-dup pair TOUCHING a new media batch, without
    re-signing the stored corpus (VERDICT r11 #7 — the
    dedup_incremental_index query contract on the signature index):
    the batch signs itself once (one Arrow pass, eagerly
    checkpointed), trades its band buckets against the band-pruned
    stored postings (batch-vs-stored), and pairs within itself
    (batch-vs-batch).  Output ``(id_a, id_b, hamming)`` with
    ``id_a < id_b``, exact at Hamming <= 3 by the same 4-band
    pigeonhole on both legs — so the result is value-identical to the
    from-scratch all-pairs answer over corpus ∪ batch restricted to
    pairs with a batch member (the gate's oracle).  Scale: the stored
    side is a tombstone-subtracted band-partitioned scan keyed by the
    batch's bucket values; stored media payloads appear NOWHERE in the
    plan — only their postings."""
    _check_banding_exact(max_hamming)
    probe = _sig_band_rows(new_media, id_col).localCheckpoint(eager=True)
    stored = read_dhash_band_rows(spark, index_dir, id_col, as_of)
    ham = sum(
        F.bit_count(F.col(f"__a{i}").bitwiseXOR(F.col(f"__b{i}")))
        for i in range(4)
    ).cast("long")
    cross = (
        _sides(probe, id_col, "a")
        .join(_sides(stored, id_col, "b"), ["band", "v"])
        .where(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            ham.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    within = _verified_pairs(
        _sides(probe, id_col, "a"), _sides(probe, id_col, "b"), max_hamming
    )
    return cross.unionByName(within).distinct()
