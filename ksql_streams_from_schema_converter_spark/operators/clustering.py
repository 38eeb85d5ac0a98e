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
    keymul: int = KM_KEYMUL,
) -> DataFrame:
    """Lloyd's k-means, ``n_iter`` exact integer rounds; returns the
    final assignment ``(pid, cluster, dist)`` (dist = integer squared
    L2 to the final centroid — both exact).  Clusters are numbered
    0..k-1 in initialization order (ascending seed id); empty clusters
    keep their previous centroid (both engines replay the same rule:
    the update only rewrites clusters that own points).  ``keymul``
    widens the argmin tie-break modulus for larger k (SemDeDup scales
    cluster COUNT with the corpus); dist·keymul must stay under 2⁶³ —
    dims·(2·maxval·SCALE)² ≈ 10¹⁴ leaves 5 decimal digits of headroom."""
    assert k < keymul
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
        key = _sq_dist(F.col("q"), F.col("c")) * keymul + F.col("cluster")
        assigned = (
            d.groupBy("pid")
            .agg(F.min(key).alias("__key"))
            .select("pid", (F.col("__key") % keymul).alias("cluster"))
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


def _kmeans_chain_sql(
    k: int,
    n_iter: int,
    dims: int,
    emb_sql: str = "SELECT vec_id, embedding FROM embeddings",
    with_kw: bool = True,
) -> tuple[str, str]:
    """The :func:`kmeans_fixed_point` replay as a ``WITH`` chain
    (quantize → [assign → update]ⁿ⁻¹) over an arbitrary
    ``(vec_id, embedding)`` source; returns ``(chain, key_expr)``
    where the chain ends at ``cents{n_iter-1}`` + ``pts`` and the key
    expression is the final-assignment argmin key — shared by the
    plain k-means oracle and the SemDeDup oracle."""
    dist_expr = (
        "CAST(list_sum(list_transform(generate_series(1, {d}), "
        "i -> (p.q[i] - c.c[i]) * (p.q[i] - c.c[i]))) AS BIGINT)"
    ).format(d=dims)
    key = f"({dist_expr} * {KM_KEYMUL} + c.cluster)"
    lead = "WITH " if with_kw else ""
    parts = [
        f"""
    {lead}pts AS (
      SELECT vec_id AS pid,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * {KM_SCALE}) AS BIGINT)) AS q
      FROM ({emb_sql})
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
    return "".join(parts), key


def kmeans_oracle_sql(k: int = 4, n_iter: int = 2, dims: int = 64) -> str:
    """DuckDB replay of :func:`kmeans_fixed_point` over the
    ``embeddings`` view: the same recurrence unrolled as chained CTEs
    (quantize → [assign → update]ⁿ⁻¹ → final assign+dist)."""
    chain, key = _kmeans_chain_sql(k, n_iter, dims)
    last = n_iter - 1
    return (
        chain
        + f"""
    SELECT p.pid, CAST(min({key}) % {KM_KEYMUL} AS BIGINT) AS cluster,
           CAST(min({key}) // {KM_KEYMUL} AS BIGINT) AS dist
    FROM pts p CROSS JOIN cents{last} c
    GROUP BY p.pid
    """
    )


#: SemDeDup cosine threshold numerator: tau = SD_TAU_CENTI / 100
SD_TAU_CENTI = 92


def semdedup_kmeans(
    emb: DataFrame,
    k: int = 4,
    n_iter: int = 2,
    tau_centi: int = SD_TAU_CENTI,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keymul: int = KM_KEYMUL,
) -> DataFrame:
    """SemDeDup exactly as published (Abbas et al., "SemDeDup:
    Data-efficient learning at web-scale through semantic
    deduplication", 2023 §3): k-means clusters the embedding space,
    near-duplicate discovery runs WITHIN each cluster only, and of
    every near-duplicate pair the member FARTHER from its centroid is
    kept (the paper's "keep low-similarity-to-centroid" rule; ties on
    the integer distance break to the smaller id).  This is the
    clustering-blocked complement of
    :func:`~..dedup.semantic_dedup_keep`'s hyperplane-LSH blocking.

    Exactness: clustering is :func:`kmeans_fixed_point` (BIGINT
    micro-units), and the cosine test is EXACT integer arithmetic on
    the same quantized vectors — ``cos(a,b) >= tau`` decided as
    ``dot >= 0 AND (dot*100)² >= (|a|²·tau_centi²)·|b|²`` with
    DECIMAL(38,0) intermediates (HUGEINT on the DuckDB side), so the
    keep column hashes across engines even for boundary pairs.

    Output: ``(vec_id, cluster, dist, keep)`` for every input vector.

    Scale (the paper's own pitch): k-means blocking caps the pair join
    at Σᵢ|cᵢ|² instead of n² — with k ∝ corpus the per-cluster join is
    bounded; assignment is a broadcast-k map pass and the drop rule is
    one EXISTS (pairs → distinct → anti-join), never a window."""
    asg = kmeans_fixed_point(emb, k, n_iter, vec_col, id_col, keymul)
    tau2 = tau_centi * tau_centi
    feat = (
        asg.join(quantize_points(emb, vec_col, id_col), "pid")
        .withColumn(
            "nq",
            F.aggregate(
                F.expr("transform(q, x -> x * x)"),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            ),
        )
        .localCheckpoint(eager=True)  # the self-join reads it twice
    )
    l, r = feat.alias("l"), feat.alias("r")
    dominates = (F.col("l.dist") > F.col("r.dist")) | (
        (F.col("l.dist") == F.col("r.dist")) & (F.col("l.pid") < F.col("r.pid"))
    )
    cand = l.join(
        r,
        (F.col("l.cluster") == F.col("r.cluster"))
        & (F.col("l.pid") != F.col("r.pid"))
        & dominates,
    ).select(
        F.col("r.pid").alias("pid"),
        F.aggregate(
            F.zip_with("l.q", "r.q", lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ).alias("dot"),
        F.col("l.nq").alias("na"),
        F.col("r.nq").alias("nb"),
    )
    drops = (
        cand.where(
            (F.col("dot") >= 0)
            & (
                F.expr(
                    "CAST(dot * 100 AS DECIMAL(19,0)) * CAST(dot * 100 AS DECIMAL(19,0))"
                )
                >= F.expr(
                    f"CAST(na * {tau2} AS DECIMAL(19,0)) * CAST(nb AS DECIMAL(19,0))"
                )
            )
        )
        .select("pid")
        .distinct()
    )
    return (
        feat.join(drops.withColumn("__d", F.lit(1)), "pid", "left")
        .select(
            F.col("pid").alias(id_col),
            "cluster",
            "dist",
            F.col("__d").isNull().alias("keep"),
        )
    )


def semdedup_oracle_sql(
    k: int = 4,
    n_iter: int = 2,
    dims: int = 64,
    tau_centi: int = SD_TAU_CENTI,
    emb_sql: str = "SELECT vec_id, embedding FROM embeddings",
) -> str:
    """DuckDB replay of :func:`semdedup_kmeans`: the k-means chain,
    the final assignment with distances, per-point squared norms, the
    within-cluster dominated-pair join under the identical integer
    cosine test (HUGEINT), and the keep anti-join."""
    return (
        semdedup_chain_sql(k, n_iter, dims, tau_centi, emb_sql)
        + """
    SELECT vec_id, cluster, dist, keep FROM sdres
    """
    )


def semdedup_chain_sql(
    k: int = 4,
    n_iter: int = 2,
    dims: int = 64,
    tau_centi: int = SD_TAU_CENTI,
    emb_sql: str = "SELECT vec_id, embedding FROM embeddings",
    with_kw: bool = True,
) -> str:
    """The :func:`semdedup_kmeans` replay as a ``WITH`` chain ending at
    the ``sdres`` CTE ``(vec_id, cluster, dist, keep)`` — spliceable
    into composed-pipeline oracles; ``emb_sql`` may reference CTEs the
    caller defined earlier."""
    chain, key = _kmeans_chain_sql(k, n_iter, dims, emb_sql, with_kw)
    last = n_iter - 1
    tau2 = tau_centi * tau_centi
    return (
        chain
        + f""",
    asgf AS MATERIALIZED (
      SELECT p.pid, CAST(min({key}) % {KM_KEYMUL} AS BIGINT) AS cluster,
             CAST(min({key}) // {KM_KEYMUL} AS BIGINT) AS dist
      FROM pts p CROSS JOIN cents{last} c
      GROUP BY p.pid
    ),
    feat AS MATERIALIZED (
      SELECT a.pid, a.cluster, a.dist, p.q,
             CAST(list_sum(list_transform(generate_series(1, {dims}),
                  i -> p.q[i] * p.q[i])) AS BIGINT) AS nq
      FROM asgf a JOIN pts p USING (pid)
    ),
    cand AS MATERIALIZED (
      SELECT r.pid,
             CAST(list_sum(list_transform(generate_series(1, {dims}),
                  i -> l.q[i] * r.q[i])) AS BIGINT) AS dot,
             l.nq AS na, r.nq AS nb
      FROM feat l JOIN feat r
        ON l.cluster = r.cluster AND l.pid <> r.pid
       AND (l.dist > r.dist OR (l.dist = r.dist AND l.pid < r.pid))
    ),
    drops AS MATERIALIZED (
      SELECT DISTINCT pid FROM cand
      WHERE dot >= 0
        AND CAST(dot * 100 AS HUGEINT) * (dot * 100)
            >= CAST(na * {tau2} AS HUGEINT) * nb
    ),
    sdres AS MATERIALIZED (
      SELECT f.pid AS vec_id, f.cluster, f.dist, d.pid IS NULL AS keep
      FROM feat f LEFT JOIN drops d ON d.pid = f.pid
    )"""
    )
