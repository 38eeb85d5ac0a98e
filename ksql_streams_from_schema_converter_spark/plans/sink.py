"""Batch sink writers (the reference's SINK stage target shapes,
src/controllers/index.js:407,414-417,607).

Scale concerns encoded here rather than left to callers:

- **Keyed repartition before write** — the reference keys sink records
  by RECID (src/controllers/index.js:105,131); repartitioning on the
  key before the write (a) co-locates each key's rows in one file
  (downstream point-lookups touch one file), (b) controls file count
  (the small-files problem: a 1000-task stage writing per-task files
  makes 1000 tiny objects per partition directory).
- **maxRecordsPerFile** caps file size for the opposite failure mode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_keyed_parquet(
    df: DataFrame,
    path: str,
    key: str = "RECID",
    num_files: int | None = None,
    partition_by: list[str] | None = None,
    max_records_per_file: int = 5_000_000,
    mode: str = "overwrite",
) -> None:
    """Write the sink projection keyed by ``key``: hash-repartition on
    the key (optionally to a fixed file count), sort within partitions
    for run-length/dictionary-friendly parquet, then write."""
    # when writing hive-style partitions, distribute by the partition
    # columns (plus key) — hash-distributing by key alone would make
    # every task hold rows for most partition values and write
    # n_tasks x n_partitions tiny files
    dist_cols = [F.col(c) for c in (partition_by or [])] + [F.col(key)]
    out = (
        df.repartition(num_files, *dist_cols) if num_files else df.repartition(*dist_cols)
    ).sortWithinPartitions(*(list(partition_by or []) + [key]))
    writer = out.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def jdbc_upsert_batch(batch_df: DataFrame, batch_id: int, *, url: str, table: str, key: str = "RECID", properties: dict | None = None) -> None:
    """The per-micro-batch JDBC upsert the reference's Oracle sink needs
    (target table keyed by RECID, src/controllers/index.js:45-50).
    Staging-table + MERGE pattern: append the batch to a staging table,
    then issue a keyed MERGE — idempotent under streaming retries, which
    is what makes foreachBatch exactly-once. Requires a JDBC driver on
    the cluster; in this container it exists for API-shape completeness
    and is exercised via a mock in tests."""
    # ONE fixed staging table, overwritten per batch: a per-batch name
    # (f"{table}_staging_{batch_id}") would leak thousands of tables in
    # the target catalog, and the out-of-band MERGE needs a stable name.
    # Overwrite + keyed MERGE is what makes retries of the same batch_id
    # idempotent (exactly-once on top of at-least-once delivery).
    staging = f"{table}_staging"
    (batch_df.write.mode("overwrite").format("jdbc")
     .option("url", url).option("dbtable", staging)
     .options(**(properties or {})).save())
    # The MERGE itself is target-dialect SQL executed out-of-band by the
    # warehouse (e.g. Oracle MERGE INTO ... USING staging ON (key));
    # Spark's role ends at the staged, keyed, idempotent batch.


def write_range_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_col: str,
    num_files: int | None = None,
    max_records_per_file: int = 5_000_000,
    mode: str = "overwrite",
) -> None:
    """Range-partition + sort by ``sort_col`` before writing — the
    data-skipping layout for range-predicated columns (event time,
    ingestion date). A global ``repartitionByRange`` gives each task a
    disjoint value range, and the within-partition sort tightens every
    parquet row-group's min/max footer statistics to a narrow,
    non-overlapping span — so a reader's range predicate prunes whole
    row groups/files at the footer, before any IO on the pages
    (the same effect Delta/Iceberg docs call data skipping; plain
    parquet already supports it via row-group stats). On an unsorted
    layout every row group spans the whole value domain and min/max
    stats prune nothing.

    Cost model at 100 TB: one range-exchange (sampled boundaries) —
    the same shuffle count as any keyed write — traded for
    predicate-proportional scan cost forever after."""
    out = (
        df.repartitionByRange(num_files, F.col(sort_col))
        if num_files
        else df.repartitionByRange(F.col(sort_col))
    ).sortWithinPartitions(sort_col)
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )


def zorder_key(cols: list[Column | str], bits: int = 12) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of each
    (already bucketed, non-negative integer) column — the multi-column
    generalization of range-sorting for data skipping (the technique
    behind Delta/Iceberg ``ZORDER BY``; Morton 1966). Two dimensions at
    ``bits=12`` fill 24 bits of a long.

    Built purely from shift/mask/or column expressions, so the key is
    computed in whole-stage codegen during the write's exchange — no
    UDF in the layout path."""
    zcols = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(zcols)
    if bits * n > 63:
        # JVM shiftleft takes the distance mod 64: positions past 63
        # would silently wrap onto low bits and corrupt the key
        raise ValueError(
            f"bits({bits}) * columns({n}) = {bits * n} exceeds the 63 "
            "usable bits of a long; lower bits or cluster fewer columns"
        )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(zcols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + (n - 1 - j)))
    return z


def _bucketize(
    df: DataFrame, cols: list[str], bits: int, bucketing: str
) -> DataFrame:
    """Map each clustering column into integer buckets ``[0, 2^bits)``
    as ``__z_<col>`` columns — linear min/max scaling (1-row broadcast)
    or approxQuantile equi-depth boundaries (driver-side KB list,
    folded per row with ``F.aggregate``).

    NULL clustering values map to bucket 0 in BOTH modes (ADVICE r3:
    linear's NULL arithmetic used to yield a NULL bucket → NULL Morton
    key → one unsorted range, while quantile's fold already landed
    NULLs at 0 with the smallest values; now they agree, and NULL rows
    cluster with the low range where min/max footer stats still skip
    them)."""
    top = (1 << bits) - 1
    if bucketing == "linear":
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
        scaled = []
        for c in cols:
            lo = F.col(f"__min_{c}").cast("double")
            hi = F.col(f"__max_{c}").cast("double")
            span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
            scaled.append(
                F.coalesce(
                    F.floor(((F.col(c).cast("double") - lo) / span) * top),
                    F.lit(0),
                )
                .cast("long")
                .alias(f"__z_{c}")
            )
        return (
            df.crossJoin(F.broadcast(df.agg(*aggs)))
            .select("*", *scaled)
            .drop(*[f"__min_{c}" for c in cols])
            .drop(*[f"__max_{c}" for c in cols])
        )
    if bucketing != "quantile":
        raise ValueError(f"unknown bucketing: {bucketing!r}")
    probs = [i / (top + 1) for i in range(1, top + 1)]
    # ONE sketch pass computes every column's boundaries (approxQuantile
    # takes a column list) — the docstring's "one extra sampled pass"
    all_bounds = df.approxQuantile(list(cols), probs, 0.001)
    out = df
    for c, bounds in zip(cols, all_bounds):
        # interior boundaries; duplicates (massive ties) are fine — the
        # fold counts boundaries strictly below the value
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        out = out.withColumn(
            f"__z_{c}",
            F.aggregate(
                barr,
                F.lit(0).cast("long"),
                lambda acc, b: acc
                + F.when(F.col(c).cast("double") > b, 1).otherwise(0).cast("long"),
            ),
        )
    return out


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    bits: int = 12,
    num_files: int | None = None,
    max_records_per_file: int = 5_000_000,
    mode: str = "overwrite",
    bucketing: str = "linear",
) -> None:
    """Z-order-clustered parquet write: min/max-scale each clustering
    column into ``[0, 2^bits)``, range-partition + sort on the
    interleaved Morton key, write. Every parquet row group then covers
    a small axis-aligned rectangle of the multi-column space, so
    min/max footer stats prune row groups for predicates on ANY of the
    clustered columns — where a linear sort skips only on its leading
    column. ``test_zorder_write_skips_on_both_dims`` proves the span
    contraction from the written footers.

    Bucketing (``bucketing=``): ``"linear"`` min/max-scales each column
    via a 1-row broadcast aggregate (same scalar-broadcast policy as
    the workload's global aggregates) — deterministic and cheapest, but
    a heavily skewed column collapses into a handful of buckets and
    stops contributing skip bits. ``"quantile"`` buckets by
    ``approxQuantile`` boundaries instead (Greenwald–Khanna sketch; one
    extra sampled pass, boundaries are KBs on the driver) so every
    bucket holds ~equal rows whatever the distribution — the standard
    refinement in the published Z-order implementations. Quantile mode
    evaluates a ``2^bits``-element fold per row, so pair it with a
    modest ``bits`` (8 → 256 buckets/dim is plenty of skipping).

    Cost at 100 TB: identical to any range-sorted write — one sampled
    range exchange — bought once, multi-dimension data skipping on
    every read after."""
    keyed = _bucketize(df, zorder_cols, bits, bucketing).withColumn(
        "__z", zorder_key([f"__z_{c}" for c in zorder_cols], bits)
    ).drop(*[f"__z_{c}" for c in zorder_cols])
    out = (
        keyed.repartitionByRange(num_files, F.col("__z"))
        if num_files
        else keyed.repartitionByRange(F.col("__z"))
    ).sortWithinPartitions("__z").drop("__z")
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )


def compact_parquet(
    spark,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    mode: str = "overwrite",
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(input_bytes / target_file_bytes)`` similarly-sized files.
    Returns the output file count.

    Why it exists: streaming sinks and fine-grained partitioned writes
    accrete thousands of KB-scale files; at 100 TB that inflates
    metadata listings and gives every scan task sub-second work units
    (scheduler overhead dominates IO). Periodic compaction to
    ~128 MB files is the standard maintenance pass (Delta/Iceberg call
    it OPTIMIZE / rewrite_data_files; plain parquet gets the same
    effect with a rewrite).

    Sizing reads the directory's byte size from the FileSystem (one
    metadata call — no data scan), assuming output compression ≈ input
    compression. The rewrite is a round-robin ``repartition(n)`` —
    a full shuffle, deliberately: ``coalesce(n)`` would be
    shuffle-free but collapses upstream parallelism into n tasks and
    inherits whatever size skew the inputs had, so the shuffle is the
    price of even files. Write to a NEW directory and swap atomically
    at the catalog/manifest layer — compact-in-place over the live
    path is a read-under-write hazard on object stores."""
    import math

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(hpath).getLength()
    n = max(1, math.ceil(total_bytes / target_file_bytes))
    df = spark.read.parquet(path)
    df.repartition(n).write.mode(mode).parquet(out_path)
    return n
