"""Incremental dedup against a PERSISTED MinHash/LSH index (VERDICT r5
#5) — the real 100-TB corpus *refresh* shape.

A from-scratch dedup re-shingles and re-pairs the whole corpus on every
refresh; at 100 TB that re-pays almost all of the cost for a batch that
is a fraction of a percent of the corpus.  The incremental contract:

- :func:`build_lsh_index` runs once over the existing corpus and
  persists two parquet pieces under ``index_dir``:
  ``bands/`` — the LSH posting table ``(doc_id, band, key)``,
  partitioned by ``(ingest, band)`` (a refresh joins band-by-band, so
  partition pruning applies and a band's postings co-locate; each
  ingest writes only its own ``ingest=<label>`` subdir, which is what
  makes at-least-once replay idempotent — see
  :func:`refresh_against_index`); and
  ``docs/`` — the per-document verdict ``(doc_id, kept)``, also
  ingest-partitioned.
- :func:`refresh_against_index` dedups a NEW batch by joining the new
  batch's band rows against (stored postings ∪ new band rows).  Old
  documents are never re-read (only their stored postings are),
  old-vs-old pairs are never recomputed (old ids never sit on the
  probe side), and the index is extended by appending the new batch's
  postings + verdicts — after which a further refresh composes.

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
arrival); :func:`refresh_against_index` enforces it with a cheap
min/max check (``check_monotone=False`` opts out for id schemes that
guarantee it structurally).

Scale: each refresh costs shingling of the NEW batch only, plus one
equi-join keyed by (band, key) between the batch's postings and the
index — the bucketed-candidate bound the batch formulation has, with
the index side pruned to the batch's bands.  Appending postings is a
blind parquet append; no old file is rewritten (the merge.py
bucketed-state discipline, applied to an index).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import lsh_band_rows

_BANDS = "bands"
_DOCS = "docs"
_BASE = "base"


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


def _ingest_labels(index_dir: str) -> list[str]:
    """Existing ingest labels (subdir names) under the postings dir."""
    import glob

    return sorted(
        os.path.basename(d).split("=", 1)[1]
        for d in glob.glob(os.path.join(index_dir, _BANDS, "ingest=*"))
    )


def build_lsh_index(
    docs: DataFrame,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
) -> None:
    """One-time index build over the existing corpus: persist postings
    (partitioned by band, under the ``ingest=base`` label) and per-doc
    keep verdicts.  The label-scoped overwrite makes a re-run (e.g. a
    replayed first micro-batch) idempotent."""
    band_rows = lsh_band_rows(docs, text_col, id_col, num_hashes, bands)
    band_rows.write.mode("overwrite").partitionBy("band").parquet(
        os.path.join(index_dir, _BANDS, f"ingest={_BASE}")
    )
    spark = docs.sparkSession
    stored = spark.read.parquet(os.path.join(index_dir, _BANDS)).select(
        id_col, "band", "key"
    )
    dropped = _dropped_ids(stored, stored, id_col)
    _verdicts(docs, dropped, id_col).write.mode("overwrite").parquet(
        os.path.join(index_dir, _DOCS, f"ingest={_BASE}")
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
) -> DataFrame:
    """Dedup ``new_docs`` against the stored index (and each other);
    returns the FULL verdict table ``(doc_id, phase, kept)`` — stored
    docs read back from the index (never re-shingled), new docs
    freshly decided — and extends the index so the next refresh sees
    them.

    IDEMPOTENT-REPLAY CONTRACT (review r6): each refresh writes its
    postings/verdicts under its own ``ingest=<label>`` subdirectory
    with a label-scoped OVERWRITE, never a blind append.  An
    at-least-once caller (foreachBatch) passes a stable
    ``ingest_label`` derived from the batch id: a re-delivered batch —
    including one torn between the postings write and the verdicts
    write — simply rewrites its own subdirectory and converges to the
    exact same state, while the prior-state reads and the monotone
    guard EXCLUDE the current label so a half-written first attempt
    can neither duplicate postings nor trip the guard.  Without a
    label a sequential one is assigned (single-writer batch use).

    The refresh happens eagerly (the new postings/verdicts are
    localCheckpoint-ed first, so shingling runs once); the returned
    DataFrame reads verdicts back from the extended index."""
    label = ingest_label or f"r{len(_ingest_labels(index_dir)):06d}"
    new_bands = lsh_band_rows(
        new_docs, text_col, id_col, num_hashes, bands
    ).localCheckpoint(eager=True)
    stored = (
        spark.read.parquet(os.path.join(index_dir, _BANDS))
        .where(F.col("ingest") != label)
        .select(id_col, "band", "key")
    )
    docs_root = spark.read.parquet(os.path.join(index_dir, _DOCS))
    prior_verdicts = docs_root.where(F.col("ingest") != label).select(
        id_col, "kept"
    )
    if check_monotone:
        # the monotone-ingest contract (module docstring): a late
        # smaller id would need to retroactively flip a STORED verdict,
        # which an append-only index cannot do — fail loudly instead of
        # silently diverging from the from-scratch answer.  The current
        # label is excluded above, so a REPLAYED batch never trips the
        # guard on its own half-written first attempt.
        hi = prior_verdicts.agg(F.max(id_col)).head()[0]
        lo = new_docs.agg(F.min(id_col)).head()[0]
        if hi is not None and lo is not None and lo <= hi:
            raise ValueError(
                f"non-monotone refresh: new batch min {id_col}={lo} <= "
                f"stored max {id_col}={hi}"
            )
    prior = stored.unionByName(new_bands)
    dropped_new = _dropped_ids(new_bands, prior, id_col)
    new_verdicts = _verdicts(new_docs, dropped_new, id_col).localCheckpoint(
        eager=True
    )
    if append:
        new_bands.write.mode("overwrite").partitionBy("band").parquet(
            os.path.join(index_dir, _BANDS, f"ingest={label}")
        )
        new_verdicts.write.mode("overwrite").parquet(
            os.path.join(index_dir, _DOCS, f"ingest={label}")
        )
        all_verdicts = spark.read.parquet(
            os.path.join(index_dir, _DOCS)
        ).select(id_col, "kept")
    else:
        all_verdicts = prior_verdicts.unionByName(new_verdicts)
    new_ids = new_docs.select(id_col)
    return all_verdicts.join(
        new_ids.withColumn("__new", F.lit(True)), id_col, "left"
    ).select(
        id_col,
        F.when(F.col("__new"), F.lit("new")).otherwise(F.lit("old")).alias("phase"),
        "kept",
    )
