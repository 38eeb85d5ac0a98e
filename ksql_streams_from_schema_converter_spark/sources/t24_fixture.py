"""Deterministic T24 CDC fixtures derived from the driver's TPC-H-ish
parquet (TESTDATA.md) — so the T24 pipeline queries are checkable
against a DuckDB oracle computing the same values relationally.

Encoding convention matches FIXTURES.md §1: multivalue payloads carry
``N:`` ordinals and ``#`` separators (subvalues ``sN:``); elements are
ordered by ``l_linenumber`` so both engines agree on positions.

Numeric fields pass through ``decimal`` casts before stringification —
double→string rendering differs across engines, decimal doesn't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .parquet import load_table


def _mv(prefix: str, struct_field: str) -> F.Column:
    """Build '1:v1#2:v2#...' from the sorted item array (ordinal = 1-based
    position; the synthetic l_linenumber is NOT unique per order, so the
    sort key is the full (l_linenumber, l_partkey, l_quantity) triple —
    every oracle that unpacks these strings must ORDER BY the same
    triple; see the t24_* oracles in workload.py)."""
    return F.concat_ws(
        "#",
        F.zip_with(
            F.col("items"),
            F.sequence(F.lit(1), F.size(F.col("items"))),
            lambda s, i: F.concat(
                F.lit(prefix),
                i.cast("string"),
                F.lit(":"),
                s[struct_field].cast("string"),
            ),
        ),
    )


_CDC_CACHE: dict[tuple[int, str], DataFrame] = {}


def orders_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One CDC record per order: single-value fields from ``orders``,
    VM/VS multivalue fields packed from its ``lineitem`` rows.

    The built frame is persisted and memoized per (session, sf_dir):
    several workload queries share this input, and re-running the
    pack-join for each would charge fixture construction to every
    query's runtime."""
    # keyed by applicationId, not id(spark): a new session allocated at a
    # recycled object address must not inherit a stopped session's cache
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _CDC_CACHE:
        return _CDC_CACHE[key]
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.col("l_quantity").cast("decimal(12,2)").alias("qty_d"),
        F.col("l_partkey").cast("string").alias("part"),
        F.col("l_quantity").cast("decimal(12,2)").cast("string").alias("qty"),
    )
    packed = (
        li.groupBy("l_orderkey")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("l_linenumber", "l_partkey", "qty_d", "part", "qty")
                )
            ).alias("items")
        )
        .select(
            "l_orderkey",
            _mv("", "part").alias("parts_mv"),
            _mv("s", "qty").alias("qtys_mv"),
        )
    )
    cdc = (
        orders.join(packed, orders.o_orderkey == packed.l_orderkey, "left")
        .select(
            F.col("o_orderkey").cast("string").alias("recid"),
            F.map_filter(
                F.create_map(
                    F.lit("STATUS"), F.col("o_orderstatus"),
                    F.lit("TOTAL"), F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
                    F.lit("ORDER_DATE"), F.date_format("o_orderdate", "yyyyMMdd"),
                    F.lit("PRIORITY"), F.col("o_orderpriority"),
                    F.lit("LOCALREF_CUST"), F.col("o_custkey").cast("string"),
                    F.lit("PART_multivalue"), F.col("parts_mv"),
                    F.lit("QTY_multivalue"), F.col("qtys_mv"),
                    F.lit("INPUTTER_multivalue"),
                    F.concat(
                        F.lit("1:"), F.col("o_custkey").cast("string"),
                        F.lit("_OP"), (F.col("o_custkey") % 7).cast("string"),
                        F.lit("_A#s2:"), F.col("o_custkey").cast("string"),
                        F.lit("_OP"), ((F.col("o_custkey") + 1) % 7).cast("string"),
                        F.lit("_B"),
                    ),
                ),
                lambda k, v: v.isNotNull(),
            ).alias("xmlrecord"),
        )
    )
    # AQE coalesces the small post-join output to ~1 partition; cached
    # like that, every downstream projection would run single-task.
    # Spread the cache across the cluster's cores before persisting.
    cdc = cdc.repartition(spark.sparkContext.defaultParallelism).persist()
    _CDC_CACHE[key] = cdc
    return cdc
