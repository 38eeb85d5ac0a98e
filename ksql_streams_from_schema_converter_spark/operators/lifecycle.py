"""Cache-lifecycle discipline for operators that ``persist()`` static
inputs consumed by exactly one job.

``persist()`` entries are pinned by Spark's CacheManager until an
explicit ``unpersist()`` — returning a lazy result that references a
persisted input means the cache can only be freed after the CALLER's
terminal action, which no operator can see.  Across a multi-query bench
session those blocks accumulate (ADVICE r5).

:func:`eager_release` closes the lifecycle inside the operator: the
result is materialized once via an eager ``localCheckpoint`` (its blocks
are reference-tracked and reclaimed by the ContextCleaner when the
DataFrame is garbage-collected, unlike CacheManager entries), then every
static input is unpersisted immediately.  Cached inputs live exactly as
long as the one job that needs them.

``merge.py`` already follows this discipline inline (materialize, then
``src.unpersist()``); this helper extends it to the iterative operators
(pagerank / triangles / k-means / prefix-filtered similarity join) whose
results are small relative to their persisted inputs, so the checkpoint
itself is cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def eager_release(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Materialize ``result`` (eager localCheckpoint), then unpersist
    the static ``cached`` inputs its plan consumed. Returns the
    checkpointed DataFrame — same rows/schema, truncated lineage."""
    out = result.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist()
    return out
