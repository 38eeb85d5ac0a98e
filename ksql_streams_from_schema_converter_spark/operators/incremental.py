"""Incremental dedup against a PERSISTED MinHash/LSH index (VERDICT r5
#5) — the real 100-TB corpus *refresh* shape.

A from-scratch dedup re-shingles and re-pairs the whole corpus on every
refresh; at 100 TB that re-pays almost all of the cost for a batch that
is a fraction of a percent of the corpus.  The incremental contract:

- :func:`build_lsh_index` runs once over the existing corpus and
  persists two parquet pieces under ``index_dir``:
  ``bands/`` — the LSH posting table ``(doc_id, band, key)``,
  partitioned by ``(ingest, band)`` and — for ingests large enough
  to amortize the directories (ADAPTIVE, see below) — additionally
  by ``kp``, a 2-hex-char md5 prefix of the key (256 uniform
  sub-buckets per band — the key-space pruning axis, VERDICT r6 #1),
  sorted by ``key`` within files with a parquet bloom filter on
  ``key``; and ``docs/`` — the per-document verdict
  ``(doc_id, kept)``, also ingest-partitioned.
- :func:`refresh_against_index` dedups a NEW batch by joining the new
  batch's band rows against (stored postings ∪ new band rows).  Old
  documents are never re-read (only their stored postings are),
  old-vs-old pairs are never recomputed (old ids never sit on the
  probe side), and the index is extended by appending the new batch's
  postings + verdicts — after which a further refresh composes.
- Ingest visibility is MANIFEST-driven (operators/indexstore.py):
  data writes land first, one atomic manifest commit publishes them;
  torn directories are invisible and label-scoped replay overwrites
  them (ADVICE r6).

Keep rule (shared with the oracle): a document is DROPPED iff some
document with a smaller id shares any (band, key) bucket with it.
The rule is per-document and compares against *all* earlier documents
regardless of their own verdict, which is what makes the incremental
answer provably equal to the from-scratch answer: a new document's
verdict depends only on the bucket contents with smaller ids, all of
which are either in the stored postings or in the same batch.  (The
alternative "match only against KEPT docs" rule is sequential — each
verdict depends on every earlier verdict — and cannot be replayed by a
set-based oracle.)

MONOTONE-INGEST CONTRACT: incremental ≡ from-scratch requires that a
refresh batch never carries an id smaller than anything already
stored — otherwise a stored doc's verdict would retroactively depend
on the late arrival, which an append-only index cannot express.  This
is the natural shape of corpus ingest (ids assigned monotonically at
arrival); :func:`refresh_against_index` enforces it against the
manifest's per-ingest ``max_id`` — ONE small-file read, not a scan of
the stored verdict table (``check_monotone=False`` opts out for id
schemes that guarantee it structurally).

REFRESH COST vs STORED-INDEX SIZE (VERDICT r6 #1): the stored-postings
side of the join is pruned to the batch's touched key-space, not just
its bands —

1. directory-level: the batch's distinct ``kp`` prefixes (bounded by
   256 × bands) become a partition filter, so only sub-buckets the
   batch actually hashes into are listed/opened;
2. row-level: when the batch's distinct key count is within
   ``key_pushdown_cap`` the keys are pushed as an ``IN`` filter into
   the parquet scan — the key bloom filter and dictionary filtering
   skip the stored row groups containing no batch key, so rows READ
   track the batch's bucket membership (O(batch × avg bucket df)),
   not the index size.  Beyond the cap (a giant refresh, where the
   batch itself is corpus-shaped and a rebuild is the better tool)
   only the kp prune applies.

Both filters restrict the stored side to rows that could never join
anyway, so verdicts are untouched — the driver gate re-proves
incremental ≡ from-scratch after the pruning.  ``scale_probe.py``'s
``incremental_refresh_base_axis`` family grows the STORED base with
the batch fixed and fits the exponent of exactly this path.

ADAPTIVE kp GRANULARITY (VERDICT r7 #1): the 256-way kp split is a
100-TB layout — paying it on a 50-doc micro-batch means up to
bands×256 directories of near-empty files PER INGEST (the r7 bench
regression).  Each ingest therefore picks its own layout by its own
row count: below :data:`KP_SPLIT_MIN_ROWS` band rows it partitions by
``band`` alone (``kp`` is a pure function of ``key`` and is recomputed
at read time, so the kp prune degrades to a residual row filter and
the row-level key pushdown + bloom carry the pruning — ample at that
size); at or above the threshold it keeps the full ``(band, kp)``
split whose directory pruning is what matters when one ingest is
corpus-shaped.  The layout choice is recorded per-ingest in the
manifest (``kp_split``), mixed layouts read side-by-side, and
:func:`compact_lsh_index` re-decides on the COMBINED row count — so
a run of small band-only ingests re-buckets into the kp layout the
moment compaction makes them collectively large.

Scale: each refresh costs shingling of the NEW batch only, plus one
equi-join keyed by (band, key) between the batch's postings and the
pruned index slice.  Appending postings is a blind parquet write of a
new ingest directory; no old file is rewritten (the merge.py
bucketed-state discipline, applied to an index).  Refresh cadence
accumulates one directory per ingest — :func:`compact_lsh_index`
rewrites N ingests into one under the same atomic-publish discipline.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import lsh_band_rows
from .indexstore import (
    commit_ingest,
    committed_max_id,
    data_labels,
    drop_ingest_dirs,
    next_auto_label,
    read_ingests,
    read_manifest,
    replace_ingests,
    require_manifested,
    retract_ids,
    subtract_tombstones,
    tombstone_labels,
)
from .indexstore import TOMBSTONES as _TOMBS

_BANDS = "bands"
_DOCS = "docs"
_BASE = "base"
#: default cap on the number of distinct batch keys pushed as an IN
#: filter into the stored-postings scan (each key is a short string;
#: 20k of them is a ~1 MB predicate — driver- and plan-safe)
KEY_PUSHDOWN_CAP = 20_000
#: band-row count at which an ingest adopts the 256-way kp sub-bucket
#: layout (module docstring: ADAPTIVE kp GRANULARITY).  At the default
#: 4 bands this is ≥ ~2k rows per (band, kp) directory — below it the
#: split is all file-count overhead and no pruning win.
KP_SPLIT_MIN_ROWS = 2_000_000


def _with_kp(band_rows: DataFrame) -> DataFrame:
    """The key-space sub-bucket: 2 hex chars of md5(key) → 256 uniform
    values.  md5, not a key substring — band keys are concatenated
    decimal MinHash values whose leading digits are Benford-skewed."""
    return band_rows.withColumn("kp", F.substring(F.md5("key"), 1, 2))


def _kp_of(key: str) -> str:
    """Driver-side twin of :func:`_with_kp` (same md5-prefix bucket),
    so a collected key list yields its kp set without a second
    collect (VERDICT r7 #4)."""
    return hashlib.md5(key.encode("utf-8")).hexdigest()[:2]


def _write_postings(
    band_rows: DataFrame, index_dir: str, label: str, kp_split: bool
) -> None:
    """One ingest directory: partitioned by ``band`` (plus ``kp`` for
    corpus-shaped ingests), key-sorted files with a parquet bloom
    filter on ``key`` for point-lookup row-group skipping.  ``kp`` is
    derivable from ``key`` and is never stored as a data column."""
    part_cols = ["band", "kp"] if kp_split else ["band"]
    rows = _with_kp(band_rows) if kp_split else band_rows
    (
        rows.sortWithinPartitions(*part_cols, "key")
        .write.mode("overwrite")
        .partitionBy(*part_cols)
        .option("parquet.bloom.filter.enabled#key", "true")
        .parquet(os.path.join(index_dir, _BANDS, f"ingest={label}"))
    )


def _dropped_ids(probe: DataFrame, prior: DataFrame, id_col: str) -> DataFrame:
    """Ids on the probe side bucket-sharing with any smaller prior id."""
    p, q = probe.alias("n"), prior.alias("p")
    return (
        p.join(
            q,
            (F.col("n.band") == F.col("p.band"))
            & (F.col("n.key") == F.col("p.key"))
            & (F.col(f"p.{id_col}") < F.col(f"n.{id_col}")),
        )
        .select(F.col(f"n.{id_col}").alias(id_col))
        .distinct()
    )


def _verdicts(docs: DataFrame, dropped: DataFrame, id_col: str) -> DataFrame:
    d = dropped.withColumn("__dropped", F.lit(True))
    return docs.select(id_col).join(d, id_col, "left").select(
        id_col, F.coalesce(F.col("__dropped"), F.lit(False)).alias("__x")
    ).select(id_col, (~F.col("__x")).alias("kept"))


def retract_from_index(
    spark: SparkSession,
    index_dir: str,
    ids,
    id_col: str = "doc_id",
    label: str | None = None,
) -> str:
    """GDPR-style removal from the persisted LSH index: after this
    commit, the retracted documents are gone from every read —
    :func:`read_verdicts` no longer returns them and future refreshes
    no longer match against their postings (a new document identical
    to a retracted one is KEPT: the content no longer exists in the
    corpus).  Documents dropped BEFORE the retraction because they
    duplicated a now-retracted doc STAY dropped — the index is
    append-only history and retroactive re-election would require
    re-deduping the corpus, which is a rebuild, not a retraction (the
    same posture as the monotone-ingest contract).

    Mechanics follow the ingest discipline: the id list lands as a
    tombstone ingest (``tombstones/ingest=<label>``), published by one
    atomic manifest commit carrying ``kind="tombstone"`` — torn writes
    invisible, label-scoped replay idempotent.  Reads subtract the
    tombstone set via a broadcast anti-join (tombstones are id lists —
    KBs at any corpus size); a FULL compaction makes the removal
    physical and clears the tombstones.  Returns the label."""
    require_manifested(index_dir, _DOCS)
    # plain id lists pass through: retract_ids lands them via the
    # bounded-artifact driver-side write (r14)
    return retract_ids(spark, index_dir, ids, id_col, label)


def _split_labels_by_layout(
    index_dir: str, labels: list[str]
) -> tuple[list[str], list[str]]:
    """Partition ingest labels into (kp-partitioned, band-only) by the
    manifest's per-ingest ``kp_split`` flag.  Entries written before
    the flag existed (r7) carry the kp layout — default True."""
    entries = {e["label"]: e for e in read_manifest(index_dir)}
    kp = [lb for lb in labels if entries.get(lb, {}).get("kp_split", True)]
    flat = [lb for lb in labels if lb not in set(kp)]
    return kp, flat


def _stored_postings(
    spark: SparkSession, index_dir: str, labels: list[str], id_col: str
) -> DataFrame | None:
    """All stored postings across ``labels`` as ``(id, band, kp,
    key)`` — mixed layouts read side-by-side, with ``kp`` recomputed
    as a projection for band-only ingests (it is a pure function of
    ``key``)."""
    kp_labels, flat_labels = _split_labels_by_layout(index_dir, labels)
    parts = []
    kp_df = read_ingests(spark, index_dir, _BANDS, kp_labels)
    if kp_df is not None:
        parts.append(kp_df.select(id_col, "band", "kp", "key"))
    flat_df = read_ingests(spark, index_dir, _BANDS, flat_labels)
    if flat_df is not None:
        parts.append(_with_kp(flat_df).select(id_col, "band", "kp", "key"))
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # retracted documents' postings must never match a future batch
    # (retract_from_index contract)
    return subtract_tombstones(spark, index_dir, out, id_col)


def pruned_stored_postings(
    spark: SparkSession,
    index_dir: str,
    labels: list[str],
    new_bands: DataFrame,
    id_col: str = "doc_id",
    key_pushdown_cap: int = KEY_PUSHDOWN_CAP,
) -> DataFrame | None:
    """The stored-postings join side, pruned to the batch's touched
    key-space (module docstring: VERDICT r6 #1).  Both filters only
    remove stored rows that cannot join the batch, so verdicts are
    unchanged — the batch's distinct ``kp`` set prunes DIRECTORIES of
    kp-partitioned ingests (partition filter) and is a cheap residual
    row filter on band-only ingests, and when the batch's distinct key
    count is within ``key_pushdown_cap`` the keys are pushed as an IN
    data filter the parquet reader evaluates against the key bloom
    filter + dictionary, so rows READ track batch bucket membership,
    not index size.

    ONE bounded driver collect (VERDICT r7 #4): the distinct keys
    (capped at ``key_pushdown_cap`` + 1) are collected once and the kp
    set is derived from them driver-side (:func:`_kp_of`); only a
    giant over-cap refresh falls back to a SECOND bounded collect of
    the distinct kp set itself (≤ 256 values) — two collects total on
    that branch, pinned with a losslessness check by
    tests/test_indexstore.py (ADVICE r8)."""
    stored = _stored_postings(spark, index_dir, labels, id_col)
    if stored is None:
        return None
    keys = [
        r["key"]
        for r in new_bands.select("key")
        .distinct()
        .limit(key_pushdown_cap + 1)
        .collect()
    ]
    if len(keys) <= key_pushdown_cap:
        kps = sorted({_kp_of(k) for k in keys})
        return stored.where(F.col("kp").isin(kps)).where(
            F.col("key").isin(keys)
        )
    kps = [
        r["kp"]
        for r in _with_kp(new_bands.select("key")).select("kp").distinct().collect()
    ]
    return stored.where(F.col("kp").isin(kps))


def read_verdicts(
    spark: SparkSession,
    index_dir: str,
    id_col: str = "doc_id",
    as_of: str | None = None,
) -> DataFrame:
    """The committed verdict table ``(id, kept)`` — manifest-scoped,
    so torn ingests are invisible; retracted ids are subtracted
    (:func:`retract_from_index`).  ``as_of`` reads the SNAPSHOT as of
    a committed label (the manifest prefix ending there — Delta-style
    time travel on the index's own commit log): later ingests are
    invisible and only tombstones committed up to that point apply.
    A pre-manifest index fails loudly instead of reading as empty
    (ADVICE r7).  NOTE: compaction REWRITES history (N entries become
    one), so as-of labels must predate the last compaction covering
    them — the standard log-compaction trade."""
    from .indexstore import entries_as_of

    require_manifested(index_dir, _DOCS)
    if as_of is None:
        dl, tl = data_labels(index_dir), None
    else:
        pre = entries_as_of(index_dir, as_of)
        dl = [e["label"] for e in pre if e.get("kind") != "tombstone"]
        tl = [e["label"] for e in pre if e.get("kind") == "tombstone"]
    df = read_ingests(spark, index_dir, _DOCS, dl)
    if df is None:
        raise ValueError(f"empty index (no committed ingests): {index_dir}")
    return subtract_tombstones(spark, index_dir, df, id_col, tl).select(
        id_col, "kept"
    )


def build_lsh_index(
    docs: DataFrame,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    kp_split: bool | None = None,
) -> None:
    """One-time index build over the existing corpus: persist postings
    (partitioned by band — plus kp when the corpus is large enough,
    see KP_SPLIT_MIN_ROWS; ``kp_split`` forces either layout) and
    per-doc keep verdicts, then publish both with one atomic manifest
    commit.  A re-run (e.g. a replayed first micro-batch) overwrites
    the same label and re-commits — idempotent."""
    band_rows = lsh_band_rows(
        docs, text_col, id_col, num_hashes, bands
    ).localCheckpoint(eager=True)  # shingle ONCE: write + self-join reuse it
    n_rows = band_rows.count()
    if kp_split is None:
        kp_split = n_rows >= KP_SPLIT_MIN_ROWS
    _write_postings(band_rows, index_dir, _BASE, kp_split)
    dropped = _dropped_ids(band_rows, band_rows, id_col)
    _verdicts(docs, dropped, id_col).write.mode("overwrite").parquet(
        os.path.join(index_dir, _DOCS, f"ingest={_BASE}")
    )
    max_id = docs.agg(F.max(id_col)).head()[0]
    commit_ingest(
        index_dir, _BASE, max_id=max_id, kp_split=kp_split, rows=n_rows
    )


def refresh_against_index(
    spark: SparkSession,
    index_dir: str,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    append: bool = True,
    check_monotone: bool = True,
    ingest_label: str | None = None,
    key_pushdown_cap: int = KEY_PUSHDOWN_CAP,
    full_output: bool = True,
) -> DataFrame:
    """Dedup ``new_docs`` against the stored index (and each other);
    returns the verdict table ``(doc_id, phase, kept)`` — the FULL
    table (stored docs read back from the index, never re-shingled)
    when ``full_output``, else only the new batch's rows (the
    batch-sized shape a steady-state refresh loop consumes).

    IDEMPOTENT-REPLAY CONTRACT (review r6 + ADVICE r6): each refresh
    writes its postings/verdicts under its own ``ingest=<label>``
    subdirectory with a label-scoped OVERWRITE and publishes them with
    ONE atomic manifest commit after both writes.  An at-least-once
    caller (foreachBatch) passes a stable ``ingest_label`` derived
    from the batch id: a re-delivered batch — including one torn
    anywhere before the manifest commit — rewrites its own directory
    and converges to the exact same state, while prior-state reads
    and the monotone guard see only COMMITTED ingests (minus the
    current label), so a half-written first attempt can neither
    duplicate postings nor trip the guard.  Without a label a
    sequential one is derived from the committed count (single-writer
    batch use) — a torn auto-labeled attempt never committed, so its
    retry reuses the same label.

    The refresh happens eagerly (the new postings/verdicts are
    localCheckpoint-ed first, so shingling runs once); the returned
    DataFrame reads verdicts back from the extended index."""
    label = ingest_label or next_auto_label(index_dir)
    # a pre-manifest index must not read as empty (ADVICE r7); the
    # in-flight label is exempt so a torn FIRST ingest's replay works
    require_manifested(index_dir, _BANDS, allow={label})
    prior_labels = [lb for lb in data_labels(index_dir) if lb != label]
    new_bands = lsh_band_rows(
        new_docs, text_col, id_col, num_hashes, bands
    ).localCheckpoint(eager=True)
    # one bounded job for min+max: the monotone guard's input and the
    # manifest entry's max_id (VERDICT r7 #4 — fewer driver round-trips
    # per refresh)
    lo, batch_max = new_docs.agg(F.min(id_col), F.max(id_col)).head()
    if check_monotone:
        # the monotone-ingest contract (module docstring): a late
        # smaller id would need to retroactively flip a STORED verdict,
        # which an append-only index cannot do — fail loudly instead of
        # silently diverging from the from-scratch answer.  The current
        # label is excluded, so a REPLAYED batch never trips the guard
        # on its own half-written first attempt.  hi comes from the
        # manifest (O(1)), not a stored-table scan.
        hi = committed_max_id(index_dir, exclude={label})
        if hi is not None and lo is not None and lo <= hi:
            raise ValueError(
                f"non-monotone refresh: new batch min {id_col}={lo} <= "
                f"stored max {id_col}={hi}"
            )
    stored = pruned_stored_postings(
        spark, index_dir, prior_labels, new_bands, id_col, key_pushdown_cap
    )
    if stored is not None:
        prior = stored.select(id_col, "band", "key").unionByName(
            new_bands.select(id_col, "band", "key")
        )
    else:
        prior = new_bands.select(id_col, "band", "key")
    dropped_new = _dropped_ids(
        new_bands.select(id_col, "band", "key"), prior, id_col
    )
    new_verdicts = _verdicts(new_docs, dropped_new, id_col).localCheckpoint(
        eager=True
    )
    new_ids = new_docs.select(id_col)
    if append:
        n_rows = new_bands.count()
        kp_split = n_rows >= KP_SPLIT_MIN_ROWS
        _write_postings(
            new_bands.select(id_col, "band", "key"), index_dir, label, kp_split
        )
        new_verdicts.write.mode("overwrite").parquet(
            os.path.join(index_dir, _DOCS, f"ingest={label}")
        )
        commit_ingest(
            index_dir, label, max_id=batch_max, kp_split=kp_split, rows=n_rows
        )
        if not full_output:
            return new_verdicts.join(new_ids, id_col).select(
                id_col, F.lit("new").alias("phase"), "kept"
            )
        all_verdicts = read_verdicts(spark, index_dir, id_col)
    else:
        # retracted ids must be gone from EVERY read (ADVICE r9): the
        # no-append full-output path reads prior verdicts directly, so
        # it subtracts tombstones exactly as read_verdicts does
        prior_docs = subtract_tombstones(
            spark,
            index_dir,
            read_ingests(spark, index_dir, _DOCS, prior_labels),
            id_col,
        )
        prior_verdicts = (
            prior_docs.select(id_col, "kept")
            if prior_docs is not None
            else new_verdicts.limit(0)
        )
        if not full_output:
            return new_verdicts.join(new_ids, id_col).select(
                id_col, F.lit("new").alias("phase"), "kept"
            )
        all_verdicts = prior_verdicts.unionByName(new_verdicts)
    return all_verdicts.join(
        new_ids.withColumn("__new", F.lit(True)), id_col, "left"
    ).select(
        id_col,
        F.when(F.col("__new"), F.lit("new")).otherwise(F.lit("old")).alias("phase"),
        "kept",
    )


def compact_lsh_index(
    spark: SparkSession,
    index_dir: str,
    labels: list[str] | None = None,
    id_col: str = "doc_id",
) -> str:
    """Rewrite N committed ingests into ONE (VERDICT r6 #2): refresh
    cadence accumulates an ``ingest=`` directory per batch — a
    small-file problem at real cadence.  Compaction reads the chosen
    ingests' postings and verdicts, rewrites each as a single new
    ingest (same band/kp layout, same key sort), and publishes with
    one atomic manifest swap.  Search/verdict results are identical
    before and after (same rows, one directory).  Torn-compaction
    discipline: the new directories are invisible until the swap, so
    a crash at any earlier point leaves the index untouched and a
    re-run overwrites them; directories replaced by the swap are
    deleted best-effort afterwards (already invisible).  The swap is
    atomic for NEW reads — LAZY DataFrames built over the index before
    compaction reference the replaced files and must be re-read (or
    checkpointed first), standard parquet-rewrite semantics.  Returns
    the new label."""
    committed = data_labels(index_dir)
    labels = list(labels) if labels is not None else committed
    if not labels:
        raise ValueError("nothing to compact")
    missing = set(labels) - set(committed)
    if missing:
        raise ValueError(f"cannot compact uncommitted ingests: {sorted(missing)}")
    new_label = next_auto_label(index_dir, prefix="c")
    # a FULL compaction makes retraction physical: tombstoned rows are
    # already filtered by the reads below, and with every data ingest
    # rewritten no stored row can still carry a retracted id — the
    # tombstone entries are swapped out in the SAME manifest commit.
    # A subset compaction keeps them (other ingests may still hold
    # retracted rows).
    tomb_labels = (
        tombstone_labels(index_dir) if set(labels) == set(committed) else []
    )
    # mixed-layout read, with the kp split RE-DECIDED on the combined
    # row count — compaction is where a run of small band-only ingests
    # graduates to the 256-way layout (module docstring).  The count
    # comes from the manifest's per-ingest ``rows`` (O(1)); only
    # entries predating the field cost a scan.
    entries = {e["label"]: e for e in read_manifest(index_dir)}
    counts = [entries.get(lb, {}).get("rows") for lb in labels]
    postings = _stored_postings(spark, index_dir, labels, id_col).select(
        id_col, "band", "key"
    )
    # with tombstones anywhere, the manifest row counts overcount the
    # filtered read — recount (retraction is rare; the common path
    # stays O(1) metadata)
    n_rows = (
        sum(counts)
        if all(c is not None for c in counts)
        and not tombstone_labels(index_dir)
        else postings.count()
    )
    kp_split = n_rows >= KP_SPLIT_MIN_ROWS
    _write_postings(postings, index_dir, new_label, kp_split)
    verdicts = subtract_tombstones(
        spark,
        index_dir,
        read_ingests(spark, index_dir, _DOCS, labels),
        id_col,
    )
    verdicts.select(id_col, "kept").write.mode("overwrite").parquet(
        os.path.join(index_dir, _DOCS, f"ingest={new_label}")
    )
    # the compacted entry inherits the max over exactly the ingests it
    # replaces; entries that stay keep their own
    replaced = [e for e in read_manifest(index_dir) if e["label"] in set(labels)]
    maxes = [e["max_id"] for e in replaced if e.get("max_id") is not None]
    replace_ingests(
        index_dir,
        labels + tomb_labels,
        new_label,
        max_id=max(maxes) if maxes else None,
        kp_split=kp_split,
        rows=n_rows,
    )
    drop_ingest_dirs(index_dir, _BANDS, labels)
    drop_ingest_dirs(index_dir, _DOCS, labels)
    drop_ingest_dirs(index_dir, _TOMBS, tomb_labels)
    return new_label
