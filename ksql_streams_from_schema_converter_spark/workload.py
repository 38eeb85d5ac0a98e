"""The engine's query workload: every operator surfaced as a
(spark_query, oracle_sql) pair for the driver's differential gate.

Each entry in :data:`WORKLOAD` is ``name -> (fn, oracle_sql_or_None)``
where ``fn(spark, sf_dir) -> DataFrame`` builds the Spark plan and the
oracle is equivalent ANSI SQL DuckDB runs over the same parquet views.
Column names and types are aligned on both sides (the driver hashes
values after sorting columns by name).

Decimal discipline: every value that flows through arithmetic is cast
to an explicit DECIMAL before aggregation on BOTH sides, so sums are
exact and engine-independent (double summation order would not be).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import dedup as D
from .operators import similarity as S
from .operators import text as TX
from .operators.compiler import FieldSpec
from .plans.pipeline import EtlPipeline, PipelineSpec
from .sources.parquet import load_table
from .sources.t24_fixture import orders_cdc

QueryFn = Callable[[SparkSession, str], DataFrame]
WORKLOAD: dict[str, tuple[QueryFn, str | None]] = {}


def query(name: str, oracle: str | None):
    def deco(fn: QueryFn):
        WORKLOAD[name] = (fn, oracle)
        return fn

    return deco


# ===========================================================================
# T24 pipeline queries (reference parity; SURVEY.md §2.1-2.4)
# ===========================================================================


@query(
    "t24_mapped_projection",
    """
    SELECT CAST(o_orderkey AS VARCHAR)                    AS RECID,
           o_orderstatus                                  AS STATUS,
           CAST(o_orderdate AS DATE)                      AS ORDER_DATE,
           CAST(o_totalprice AS DECIMAL(18,2))            AS TOTAL,
           substr(o_orderpriority, 1, 35)                 AS PRIORITY,
           CAST(o_custkey AS VARCHAR)                     AS CUST,
           'OP' || (o_custkey % 7) || ' OP' || ((o_custkey + 1) % 7) AS INPUTTER_HIS
    FROM orders
    """,
)
def t24_mapped_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-value SINK projection over the MAPPED stream: identity,
    parse_date, CAST, substring, LOCALREF strip + nested TRIM, and the
    INPUTTER_HIS special case (reference singleParser, SURVEY.md §2.3)."""
    spec = PipelineSpec(
        schema_name="FBNK_ORDERS",
        fields=[
            FieldSpec(name="RECID", transformation="UCASE($)"),
            FieldSpec(name="STATUS"),
            FieldSpec(name="ORDER_DATE", transformation="parse_date", type=("string", "date")),
            FieldSpec(name="TOTAL", type=("string", "decimal(18,2)")),
            FieldSpec(name="PRIORITY", transformation="substring"),
            FieldSpec(name="LOCALREF_CUST", nested="TRIM($) CUST"),
            FieldSpec(name="INPUTTER_HIS", transformation="x"),
        ],
    )
    return EtlPipeline(spec).apply(orders_cdc(spark, sf_dir)).sink


@query(
    "t24_string_join",
    """
    SELECT CAST(o_orderkey AS VARCHAR) AS RECID,
           p.parts AS PARTS
    FROM orders
    LEFT JOIN (
      SELECT l_orderkey,
             string_agg(l_partkey, ',' ORDER BY l_linenumber, l_partkey, CAST(l_quantity AS DECIMAL(12,2))) AS parts
      FROM lineitem GROUP BY l_orderkey
    ) p ON p.l_orderkey = o_orderkey
    """,
)
def t24_string_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """string-join DSL: flatten the PART multivalue to a ','-joined
    string (reference :75-83)."""
    spec = PipelineSpec(
        schema_name="FBNK_ORDERS",
        fields=[
            FieldSpec(name="RECID", transformation="UCASE($)"),
            FieldSpec(name="PART", transformation="string-join(',')", nested="CONCAT($) PARTS"),
        ],
    )
    return EtlPipeline(spec).apply(orders_cdc(spark, sf_dir)).sink


@query(
    "t24_index_element",
    """
    SELECT CAST(o_orderkey AS VARCHAR) AS RECID, p.part2 AS PART2
    FROM orders
    LEFT JOIN (
      SELECT l_orderkey, CAST(l_partkey AS VARCHAR) AS part2
      FROM (SELECT l_orderkey, l_partkey,
                   row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, CAST(l_quantity AS DECIMAL(12,2))) AS rn
            FROM lineitem)
      WHERE rn = 2
    ) p ON p.l_orderkey = o_orderkey
    """,
)
def t24_index_element(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[n] DSL: 1-based multivalue element, NULL when out of range
    (reference :92-95; ksqlDB array semantics)."""
    spec = PipelineSpec(
        schema_name="FBNK_ORDERS",
        fields=[
            FieldSpec(name="RECID", transformation="UCASE($)"),
            FieldSpec(name="PART", transformation="[2]", nested="CONCAT($) PART2"),
        ],
    )
    return EtlPipeline(spec).apply(orders_cdc(spark, sf_dir)).sink


@query(
    "t24_multivalue_explode",
    """
    SELECT CAST(o_orderkey AS VARCHAR)          AS RECID,
           o_orderstatus                        AS STATUS,
           CAST(l_partkey AS VARCHAR)           AS PART,
           CAST(l_quantity AS DECIMAL(12,2))    AS QTY
    FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
    """,
)
def t24_multivalue_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MULTIVALUE stage: VM/VS fields exploded one row per element,
    positionally aligned, single-value fields carried (reference
    topology §0; multiHandler :413-571)."""
    spec = PipelineSpec(
        schema_name="FBNK_ORDERS",
        fields=[
            FieldSpec(name="RECID", transformation="UCASE($)"),
            FieldSpec(name="STATUS"),
            FieldSpec(name="PART", should_parse_sv=False, should_parse_vm=True),
            FieldSpec(
                name="QTY",
                type=("string", "decimal(12,2)"),
                should_parse_sv=False,
                should_parse_vs=True,
            ),
        ],
    )
    return EtlPipeline(spec).apply(orders_cdc(spark, sf_dir)).sink


@query(
    "t24_blob_roundtrip",
    """
    SELECT CAST(c_custkey AS VARCHAR)       AS RECID,
           c_name                           AS NAME,
           CAST(c_acctbal AS DECIMAL(18,2)) AS BAL
    FROM customer
    """,
)
def t24_blob_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOB path end-to-end: hex-encode a 0xFE/0xFD-delimited payload
    from real customer data, then decode through the BLOB FE pipeline
    (reference :582-600, decode shape :307)."""
    cust = load_table(spark, sf_dir, "customer")
    payload = F.concat(
        F.lit("NAMEý"), F.col("c_name"),
        F.lit("þBALý"), F.col("c_acctbal").cast("decimal(18,2)").cast("string"),
    )
    raw = cust.select(
        F.col("c_custkey").cast("string").alias("recid"),
        F.hex(F.encode(payload, "ISO-8859-1")).alias("value_hex"),
    )
    spec = PipelineSpec(
        schema_name="FBNK_CUSTOMER_BLOB",
        proc_type="BLOB",
        blob_delim="FE",
        fields=[
            FieldSpec(name="RECID", transformation="UCASE($)"),
            FieldSpec(name="NAME"),
            FieldSpec(name="BAL", type=("string", "decimal(18,2)")),
        ],
    )
    return EtlPipeline(spec).apply(raw).sink


# ===========================================================================
# Relational coverage (SURVEY.md §2.5 gap list — from Spark SQL natively)
# ===========================================================================


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2))      AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_base_price,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(15,2))
                         * CAST(1 - l_discount AS DECIMAL(8,6)) AS DECIMAL(24,8)))
                AS DECIMAL(38,8)) AS sum_disc_price,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(15,2))
                         * CAST(1 - l_discount AS DECIMAL(8,6)) AS DECIMAL(24,8))
                    * CAST(1 + l_tax AS DECIMAL(8,6)))
                AS DECIMAL(38,14)) AS sum_charge,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped aggregation. Inputs cast to DECIMAL before
    summing so results are exact (engine-independent)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    price = F.col("l_extendedprice").cast("decimal(15,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(8,6)")
    tax = (F.lit(1) + F.col("l_tax")).cast("decimal(8,6)")
    disc_price = (price * disc).cast("decimal(24,8)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("decimal(38,2)").alias("sum_qty"),
            F.sum(price).cast("decimal(38,2)").alias("sum_base_price"),
            F.sum(disc_price).cast("decimal(38,8)").alias("sum_disc_price"),
            F.sum(disc_price * tax).cast("decimal(38,14)").alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q3_top_revenue_orders",
    """
    SELECT o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(12,6))) AS DECIMAL(38,8)) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey, orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + aggregate + deterministic top-k (revenue is exact decimal;
    ties broken by key). Customer side is broadcast — it's the small
    dimension at any scale factor."""
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1) - F.col("l_discount")).cast("decimal(12,6)"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("orderdate"))
        .agg(F.sum(rev).cast("decimal(38,8)").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "q5_revenue_by_region",
    """
    SELECT r_name, n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(12,6))) AS DECIMAL(38,8)) AS revenue,
           count(*) AS n_items
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY r_name, n_name
    """,
)
def q5_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way dimensional join rolled up by region/nation. All three
    dimensions broadcast; only the orders⋈lineitem join shuffles."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1) - F.col("l_discount")).cast("decimal(12,6)"))
    dims = F.broadcast(
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "r_name", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dims, orders.o_custkey == dims.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(rev).cast("decimal(38,8)").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "window_top3_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, rnk,
           CAST(o_totalprice AS DECIMAL(18,2)) AS total
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rnk
          FROM orders)
    WHERE rnk <= 3
    """,
)
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            "o_custkey", "o_orderkey", "rnk",
            F.col("o_totalprice").cast("decimal(18,2)").alias("total"),
        )
    )


@query(
    "monthly_order_stats",
    """
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total
    FROM orders GROUP BY month
    """,
)
def monthly_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("decimal(38,2)").alias("total"),
        )
    )


@query(
    "setop_customer_order_status",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_totalprice > 400000
    """,
)
def setop_customer_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT + EXCEPT set operations (distinct semantics)."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.where(F.col("o_orderstatus") == "O").select("o_custkey")
    big = orders.where(F.col("o_totalprice") > 400000).select("o_custkey")
    return f.intersect(o).subtract(big)


@query(
    "rollup_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("decimal(38,2)").alias("total"),
    )


@query(
    "events_hourly_agg",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total_value
    FROM events GROUP BY window_start, event_type
    """,
)
def events_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (the streaming-shaped operator, run
    here in batch; the stream variant is `streaming_events_hourly`)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("decimal(38,2)").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


@query(
    "events_sessionization",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS new_s
      FROM events
    ), numbered AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events
    FROM numbered GROUP BY user_id, session_no
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 10-minute gap (F.session_window — the
    stateful streaming operator, batch-checkable against a
    gaps-and-islands oracle)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )
