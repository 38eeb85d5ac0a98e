"""Exact fixed-point k-means (Lloyd's algorithm) — hash-gateable
across engines.

Float k-means can never be differentially tested: centroid means
depend on summation order.  Here every vector is quantized ONCE to
BIGINT micro-units (``floor(x·10⁶)``), after which assignment
(integer squared-L2) and centroid updates (integer sum ``div`` count)
are exact and order-independent — the same discipline as the
fixed-point PageRank (graph.py).  Initialization is deterministic:
the k lowest-id vectors.  The DuckDB oracle replays the identical
recurrence as unrolled SQL.

Scale notes: assignment is a broadcast of k centroid rows against the
point set (k ≪ n — one map-side pass, no shuffle); the update is one
keyed shuffle of (cluster, dim) partial sums, map-side combined to
k·dim rows per task.  Iterations are a fixed constant.  This is the
standard distributed Lloyd's shape; the IVF coarse quantizer
(similarity.py) uses a driver-side FAISS-style sample training
instead because its k is larger and its contract is recall-gated —
this operator is the exactly-gated small-k complement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale: 1.0 == 10⁶ units (floor quantization)
KM_SCALE = 1_000_000

#: assignment tie-break: argmin key = dist·KEYMUL + cluster (requires
#: k < KEYMUL and dist·KEYMUL < 2⁶³ — dims·(2·maxval·SCALE)² bounded)
KM_KEYMUL = 8


def quantize_points(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """``(id, q)`` with q = per-element ``floor(x·SCALE)`` as BIGINT —
    floor of a double is engine-exact, and all later arithmetic is
    integer."""
    return emb.select(
        F.col(id_col).alias("pid"),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.floor(x * KM_SCALE).cast("bigint"),
        ).alias("q"),
    )


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def kmeans_fixed_point(
    emb: DataFrame,
    k: int = 4,
    n_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Lloyd's k-means, ``n_iter`` exact integer rounds; returns the
    final assignment ``(pid, cluster, dist)`` (dist = integer squared
    L2 to the final centroid — both exact).  Clusters are numbered
    0..k-1 in initialization order (ascending seed id); empty clusters
    keep their previous centroid (both engines replay the same rule:
    the update only rewrites clusters that own points)."""
    assert k < KM_KEYMUL
    # the final-assignment return lives INSIDE the loop body; n_iter=0
    # would fall through to the unreachable-return below and surface as
    # an AttributeError far from the cause (ADVICE r5)
    assert n_iter >= 1
    pts = quantize_points(emb, vec_col, id_col).persist()
    # deterministic init: the k lowest-id vectors, cluster = rank
    seeds = pts.orderBy("pid").limit(k)
    from pyspark.sql import Window

    cents = seeds.select(
        (F.row_number().over(Window.orderBy("pid")) - 1).alias("cluster"),
        F.col("q").alias("c"),
    )
    for it in range(n_iter):
        d = pts.crossJoin(F.broadcast(cents))
        key = _sq_dist(F.col("q"), F.col("c")) * KM_KEYMUL + F.col("cluster")
        assigned = (
            d.groupBy("pid")
            .agg(F.min(key).alias("__key"))
            .select("pid", (F.col("__key") % KM_KEYMUL).alias("cluster"))
        )
        if it == n_iter - 1:
            final = (
                pts.join(assigned, "pid")
                .join(F.broadcast(cents), "cluster")
                .select(
                    "pid",
                    "cluster",
                    _sq_dist(F.col("q"), F.col("c")).alias("dist"),
                )
            )
            from .lifecycle import eager_release

            return eager_release(final, pts)
        # update: per (cluster, dim) integer mean; clusters that own no
        # points keep their previous centroid
        sums = (
            pts.join(assigned, "pid")
            .select("cluster", F.posexplode("q").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.expr("sum(v) div count(*)").alias("cv"))
        )
        new_cents = sums.groupBy("cluster").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                lambda s: s.cv,
            ).alias("c")
        )
        kept = cents.join(new_cents.select("cluster"), "cluster", "left_anti")
        cents = new_cents.unionByName(kept).localCheckpoint()
    return None  # unreachable: n_iter >= 1 returns inside the loop


def kmeans_oracle_sql(k: int = 4, n_iter: int = 2, dims: int = 64) -> str:
    """DuckDB replay of :func:`kmeans_fixed_point` over the
    ``embeddings`` view: the same recurrence unrolled as chained CTEs
    (quantize → [assign → update]ⁿ⁻¹ → final assign+dist)."""
    dist_expr = (
        "CAST(list_sum(list_transform(generate_series(1, {d}), "
        "i -> (p.q[i] - c.c[i]) * (p.q[i] - c.c[i]))) AS BIGINT)"
    ).format(d=dims)
    key = f"({dist_expr} * {KM_KEYMUL} + c.cluster)"
    parts = [
        f"""
    WITH pts AS (
      SELECT vec_id AS pid,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * {KM_SCALE}) AS BIGINT)) AS q
      FROM embeddings
    ),
    cents0 AS (
      SELECT CAST(row_number() OVER (ORDER BY pid) - 1 AS BIGINT) AS cluster, q AS c
      FROM (SELECT pid, q FROM pts ORDER BY pid LIMIT {k})
    )"""
    ]
    for it in range(n_iter - 1):
        parts.append(
            f""",
    asg{it} AS (
      SELECT p.pid, CAST(min({key}) % {KM_KEYMUL} AS BIGINT) AS cluster
      FROM pts p CROSS JOIN cents{it} c
      GROUP BY p.pid
    ),
    upd{it} AS (
      SELECT a.cluster, s.pos, CAST(sum(p.q[s.pos]) // count(*) AS BIGINT) AS cv
      FROM pts p
      JOIN asg{it} a USING (pid)
      CROSS JOIN (SELECT unnest(generate_series(1, {dims})) AS pos) s
      GROUP BY a.cluster, s.pos
    ),
    newc{it} AS (
      SELECT cluster, list(cv ORDER BY pos) AS c FROM upd{it} GROUP BY cluster
    ),
    cents{it + 1} AS (
      SELECT * FROM newc{it}
      UNION ALL
      SELECT * FROM cents{it} WHERE cluster NOT IN (SELECT cluster FROM newc{it})
    )"""
        )
    last = n_iter - 1
    parts.append(
        f"""
    SELECT p.pid, CAST(min({key}) % {KM_KEYMUL} AS BIGINT) AS cluster,
           CAST(min({key}) // {KM_KEYMUL} AS BIGINT) AS dist
    FROM pts p CROSS JOIN cents{last} c
    GROUP BY p.pid
    """
    )
    return "".join(parts)
