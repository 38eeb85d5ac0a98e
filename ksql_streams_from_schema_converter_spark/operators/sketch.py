"""Mergeable frequency sketches: distributed Misra-Gries heavy hitters.

The constant-memory path for "which items exceed φ·n frequency" at
100 TB — exact groupBy counting shuffles every distinct item; a
Misra-Gries summary keeps ``k`` counters per partition and merges in
the driver-free tree Spark's aggregation would use.  Guarantees
(Misra & Gries 1982; mergeability per Agarwal et al., "Mergeable
summaries", PODS 2012):

- ``est(x) ≤ freq(x)`` — never overestimates;
- ``freq(x) - est(x) ≤ Σ_p t_p ≤ n/(k+1)`` where ``t_p`` is partition
  p's total decrement — so every item with ``freq > n/(k+1)`` has a
  positive merged estimate (no heavy hitter is lost).

Implementation: one ``mapInPandas`` pass builds a batched MG summary
per partition — add a batch's value counts, then restore the k-counter
invariant by subtracting the (k+1)-th largest counter value and
dropping non-positives (the closed-form MG trim; the subtracted amount
accumulates into ``t_p``).  Each partition emits ≤ k (item, est) rows
plus one (NULL, t_p) error row; merging is a plain groupBy sum.
Memory is O(k + batch-distinct) per task regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_summaries(
    df: DataFrame, item_col: str, k: int = 20
) -> DataFrame:
    """Per-partition MG summaries: rows ``(item, est)`` for up to ``k``
    tracked items per partition, plus one ``(NULL, t_p)`` row carrying
    the partition's total decrement (the merged error bound is
    ``sum(est) where item IS NULL``)."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("item", T.StringType(), True),
            T.StructField("est", T.LongType(), False),
        ]
    )

    def summarize(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        t_p = 0
        for pdf in batches:
            if not len(pdf):
                continue
            for item, cnt in pdf[item_col].value_counts().items():
                counters[item] = counters.get(item, 0) + int(cnt)
            if len(counters) > k:
                # closed-form MG trim: subtract the (k+1)-th largest
                # value; ≤ k counters stay positive (ties can leave
                # fewer — that only tightens the summary)
                thresh = sorted(counters.values(), reverse=True)[k]
                t_p += thresh
                counters = {
                    i: c - thresh for i, c in counters.items() if c > thresh
                }
        rows = [{"item": i, "est": c} for i, c in counters.items()]
        rows.append({"item": None, "est": t_p})
        yield pd.DataFrame(rows, columns=["item", "est"])

    return df.select(F.col(item_col).cast("string").alias(item_col)).mapInPandas(
        summarize, schema=out_schema
    )


def heavy_hitters(
    df: DataFrame, item_col: str, k: int = 20
) -> DataFrame:
    """Merged MG sketch: ``(item, est, err_bound)`` for every tracked
    item (the same ``err_bound = Σ t_p`` on each row).  Any item with
    ``freq > n/(k+1)`` is guaranteed present with
    ``freq - err_bound ≤ est ≤ freq``."""
    from pyspark.sql import Window

    summaries = misra_gries_summaries(df, item_col, k)
    merged = summaries.groupBy("item").agg(F.sum("est").alias("est"))
    # attach the global error bound (the NULL-item row's total) via ONE
    # whole-frame window over the tiny merged summary — a self-join here
    # would re-run the corpus-wide sketch pass for each reference
    w = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    err = F.coalesce(
        F.sum(F.when(F.col("item").isNull(), F.col("est"))).over(w), F.lit(0)
    )
    return (
        merged.withColumn("err_bound", err)
        .where(F.col("item").isNotNull())
        .select("item", "est", "err_bound")
    )


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — engine-portable
# ---------------------------------------------------------------------------

#: hex-nibble value of md5 character at 1-based position {pos} (the
#: same engine-portable construction the SimHash oracle uses)
_NIB = "strpos('0123456789abcdef', substr(md5({expr}), {pos}, 1)) - 1"


def _cms_bucket_spark(key, d, width: int):
    """CMS bucket: first 16 bits of md5(d ':' key), mod width — md5 is
    byte-identical everywhere, so Spark and DuckDB agree on every
    bucket."""
    h = F.md5(F.concat(d.cast("string"), F.lit(":"), key.cast("string")))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint") % width


def cms_bucket_sql(key_expr: str, d_expr: str, width: int) -> str:
    """DuckDB replay of :func:`_cms_bucket_spark` (no conv() there —
    explicit nibble arithmetic over the same md5 hex)."""
    inp = f"CAST({d_expr} AS VARCHAR) || ':' || CAST({key_expr} AS VARCHAR)"
    nibs = " + ".join(
        f"({_NIB.format(expr=inp, pos=p + 1)}) * {16 ** (3 - p)}"
        for p in range(4)
    )
    return f"(({nibs}) % {width})"


def count_min_sketch(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Build a ``depth × width`` count-min sketch of ``key_col``'s
    frequency distribution as ``(d, bucket, cnt)`` rows.

    Scale: the explode multiplies rows ``depth``× BEFORE aggregation,
    but the groupBy key space is ``depth*width`` (constant), so
    partial aggregation collapses each map task's contribution to at
    most ``depth*width`` rows — the shuffle carries KBs regardless of
    input size.  This is the mergeable-summary property that lets CMS
    run as a streaming accumulator or a tree-reduce."""
    rows = df.select(
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
        F.col(key_col).alias("k"),
    )
    return (
        rows.select(
            "d", _cms_bucket_spark(F.col("k"), F.col("d"), width).alias("bucket")
        )
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_point_estimates(
    sketch: DataFrame,
    probes: DataFrame,
    probe_col: str = "k",
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point-frequency estimates for ``probes[probe_col]``: min over
    the ``depth`` rows of the probed bucket counters (0 when a bucket
    is empty).  Estimates NEVER undercount — ``est ≥ freq`` is the CMS
    guarantee, asserted downstream as a verdict column."""
    p = probes.select(
        F.col(probe_col).alias("k"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    )
    p = p.withColumn("bucket", _cms_bucket_spark(F.col("k"), F.col("d"), width))
    return (
        p.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy("k")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )
