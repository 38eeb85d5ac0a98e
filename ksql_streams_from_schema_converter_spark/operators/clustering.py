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
    keymul: int = KM_KEYMUL,
) -> tuple[str, str, int]:
    """The :func:`kmeans_fixed_point` replay as a ``WITH`` chain
    (quantize → [assign → update]ⁿ⁻¹) over an arbitrary
    ``(vec_id, embedding)`` source; returns ``(chain, key_expr,
    keymul)`` where the chain ends at ``cents{n_iter-1}`` + ``pts``
    and the key expression is the final-assignment argmin key —
    shared by the plain k-means oracle and the SemDeDup oracle.
    ``keymul`` must exceed ``k`` exactly as in
    :func:`kmeans_fixed_point` — a k ≥ keymul oracle would silently
    alias distinct clusters through the ``% keymul`` decode
    (ADVICE r10), so it raises here like the Spark twin asserts."""
    if k >= keymul:
        raise ValueError(
            f"k ({k}) must be < keymul ({keymul}): the argmin key "
            "decodes cluster as key % keymul"
        )
    dist_expr = (
        "CAST(list_sum(list_transform(generate_series(1, {d}), "
        "i -> (p.q[i] - c.c[i]) * (p.q[i] - c.c[i]))) AS BIGINT)"
    ).format(d=dims)
    key = f"({dist_expr} * {keymul} + c.cluster)"
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
      SELECT p.pid, CAST(min({key}) % {keymul} AS BIGINT) AS cluster
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
    return "".join(parts), key, keymul


def kmeans_oracle_sql(
    k: int = 4, n_iter: int = 2, dims: int = 64, keymul: int = KM_KEYMUL
) -> str:
    """DuckDB replay of :func:`kmeans_fixed_point` over the
    ``embeddings`` view: the same recurrence unrolled as chained CTEs
    (quantize → [assign → update]ⁿ⁻¹ → final assign+dist)."""
    chain, key, keymul = _kmeans_chain_sql(k, n_iter, dims, keymul=keymul)
    last = n_iter - 1
    return (
        chain
        + f"""
    SELECT p.pid, CAST(min({key}) % {keymul} AS BIGINT) AS cluster,
           CAST(min({key}) // {keymul} AS BIGINT) AS dist
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
    return _semdedup_prune(emb, asg, tau_centi, vec_col, id_col)


def _semdedup_prune(
    emb: DataFrame,
    asg: DataFrame,
    tau_centi: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The SemDeDup prune stage over an arbitrary assignment ``(pid,
    cluster, dist)``: within-cluster dominated-pair join under the
    exact integer cosine test, keep anti-join — shared by the
    single-level (:func:`semdedup_kmeans`, paper-exact control) and
    two-level (:func:`semdedup_two_level`, the k ∝ corpus scale path)
    front ends; the DataFrame ops are byte-identical to the original
    inlined body so existing hashes are unchanged."""
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
    keymul: int = KM_KEYMUL,
) -> str:
    """DuckDB replay of :func:`semdedup_kmeans`: the k-means chain,
    the final assignment with distances, per-point squared norms, the
    within-cluster dominated-pair join under the identical integer
    cosine test (HUGEINT), and the keep anti-join."""
    return (
        semdedup_chain_sql(k, n_iter, dims, tau_centi, emb_sql, keymul=keymul)
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
    keymul: int = KM_KEYMUL,
) -> str:
    """The :func:`semdedup_kmeans` replay as a ``WITH`` chain ending at
    the ``sdres`` CTE ``(vec_id, cluster, dist, keep)`` — spliceable
    into composed-pipeline oracles; ``emb_sql`` may reference CTEs the
    caller defined earlier."""
    chain, key, keymul = _kmeans_chain_sql(
        k, n_iter, dims, emb_sql, with_kw, keymul
    )
    last = n_iter - 1
    return (
        chain
        + f""",
    asgf AS MATERIALIZED (
      SELECT p.pid, CAST(min({key}) % {keymul} AS BIGINT) AS cluster,
             CAST(min({key}) // {keymul} AS BIGINT) AS dist
      FROM pts p CROSS JOIN cents{last} c
      GROUP BY p.pid
    )"""
        + _semdedup_tail_sql(dims, tau_centi)
    )


def _semdedup_tail_sql(dims: int, tau_centi: int) -> str:
    """The SemDeDup prune tail over an ``asgf`` ``(pid, cluster,
    dist)`` CTE + ``pts``: per-point squared norms, the within-cluster
    dominated-pair join under the exact integer cosine test (HUGEINT),
    and the keep anti-join ending at ``sdres`` — the SQL twin of
    :func:`_semdedup_prune`, shared by the single-level and two-level
    oracles (text byte-identical to the previously inlined tail, so
    existing oracle hashes are unchanged)."""
    tau2 = tau_centi * tau_centi
    return f""",
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


# ===========================================================================
# Two-level (coarse-then-fine) k-means — the k ∝ corpus configuration
# ===========================================================================


def kmeans_two_level(
    emb: DataFrame,
    k: int = 16,
    kc: int = 4,
    n_iter: int = 2,
    nc_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keymul: int = 32,
    ckeymul: int = KM_KEYMUL,
) -> DataFrame:
    """Lloyd's k-means with a TWO-LEVEL assignment (VERDICT r10 #1):
    instead of testing every point against all k centroids (the n·k
    flop term that goes quadratic when SemDeDup scales k with the
    corpus), each round first clusters the k CENTROIDS themselves into
    ``kc`` super-cells (an exact integer Lloyd over a k-row table —
    k·kc·nc_iter flops, negligible), then every point routes to its
    nearest non-empty super-cell (n·kc) and runs the exact argmin only
    against the fine centroids INSIDE that super-cell (n·k/kc expected)
    — the IVF ``assign_cells`` discipline (similarity.py:71) applied
    to the trainer itself.  With kc ≈ √k the per-point work drops from
    k to ~2√k distance evaluations.

    This changes WHICH clustering is produced (a point whose true
    nearest centroid lives in a different super-cell takes the in-cell
    argmin instead — standard IVF behavior), NOT whether it hashes:
    every step is the same deterministic integer arithmetic as
    :func:`kmeans_fixed_point` — quantized BIGINT vectors, argmin keys
    ``dist·mul + id``, integer-mean updates, empty cells keeping their
    previous centroid — and the DuckDB oracle
    (:func:`kmeans_two_level_oracle_sql`) replays the identical
    two-level recurrence round for round.

    Returns the final assignment ``(pid, cluster, dist)`` exactly like
    :func:`kmeans_fixed_point` (dist decodes from the argmin key, so it
    is the integer squared L2 to the ASSIGNED fine centroid).

    Scale: the coarse Lloyd runs on the k-row centroid table; point
    routing broadcasts kc rows; the in-cell argmin broadcasts the k
    (cluster, super-cell, centroid) rows but each point row only joins
    its routed super-cell's bucket, so the flop budget is
    n·(kc + k/kc) per round instead of n·k.  All collects remain
    bounded (none — everything stays in DataFrames)."""
    if k >= keymul:
        raise ValueError(f"k ({k}) must be < keymul ({keymul})")
    if kc >= ckeymul:
        raise ValueError(f"kc ({kc}) must be < ckeymul ({ckeymul})")
    if kc > k:
        raise ValueError(f"kc ({kc}) must be <= k ({k})")
    assert n_iter >= 1 and nc_iter >= 1
    from pyspark.sql import Window

    pts = quantize_points(emb, vec_col, id_col).persist()
    seeds = pts.orderBy("pid").limit(k)
    cents = seeds.select(
        (F.row_number().over(Window.orderBy("pid")) - 1).alias("cluster"),
        F.col("q").alias("c"),
    ).localCheckpoint()
    for it in range(n_iter):
        # ---- coarse Lloyd over the k centroid rows (exact, tiny) ----
        cpts = cents.select(
            F.col("cluster").alias("cpid"), F.col("c").alias("cq")
        )
        cseeds = cpts.orderBy("cpid").limit(kc)
        ccents = cseeds.select(
            (F.row_number().over(Window.orderBy("cpid")) - 1).alias("sc"),
            F.col("cq").alias("cc"),
        )
        cmap = None
        for j in range(nc_iter):
            ckey = _sq_dist(F.col("cq"), F.col("cc")) * ckeymul + F.col("sc")
            cass = (
                cpts.crossJoin(F.broadcast(ccents))
                .groupBy("cpid")
                .agg(F.min(ckey).alias("__ck"))
                .select("cpid", (F.col("__ck") % ckeymul).alias("sc"))
            )
            if j == nc_iter - 1:
                # k rows, read by BOTH the non-empty filter and the
                # fine-candidate join — checkpoint once so neither
                # downstream leg re-derives the coarse argmin chain
                cmap = cass.localCheckpoint(eager=True)
                break
            csums = (
                cpts.join(cass, "cpid")
                .select("sc", F.posexplode("cq").alias("pos", "v"))
                .groupBy("sc", "pos")
                .agg(F.expr("sum(v) div count(*)").alias("cv"))
            )
            cnew = csums.groupBy("sc").agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                    lambda s: s.cv,
                ).alias("cc")
            )
            ckept = ccents.join(cnew.select("sc"), "sc", "left_anti")
            ccents = cnew.unionByName(ckept).localCheckpoint()
        # super-cells that own >= 1 fine centroid: a point routed to an
        # EMPTY super-cell would find no fine candidates and silently
        # drop out of the assignment, so routing is restricted to the
        # non-empty cells (both engines replay the same rule)
        ne = ccents.join(cmap.select("sc").distinct(), "sc")
        # ---- route every point to its nearest non-empty super-cell ----
        rkey = _sq_dist(F.col("q"), F.col("cc")) * ckeymul + F.col("sc")
        route = (
            pts.crossJoin(F.broadcast(ne))
            .groupBy("pid")
            .agg(F.min(rkey).alias("__rk"))
            .select("pid", (F.col("__rk") % ckeymul).alias("sc"))
        )
        # ---- exact argmin over the routed super-cell's centroids ----
        cellcents = cents.join(
            cmap.select(F.col("cpid").alias("cluster"), "sc"), "cluster"
        )
        fkey = _sq_dist(F.col("q"), F.col("c")) * keymul + F.col("cluster")
        assigned = (
            pts.join(route, "pid")
            .join(F.broadcast(cellcents), "sc")
            .groupBy("pid")
            .agg(F.min(fkey).alias("__key"))
        )
        if it == n_iter - 1:
            final = assigned.select(
                "pid",
                (F.col("__key") % keymul).alias("cluster"),
                F.expr(f"__key div {keymul}").alias("dist"),
            )
            from .lifecycle import eager_release

            return eager_release(final, pts)
        asg2 = assigned.select(
            "pid", (F.col("__key") % keymul).alias("cluster")
        )
        sums = (
            pts.join(asg2, "pid")
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


def _kmeans2_chain_sql(
    k: int,
    kc: int,
    n_iter: int,
    nc_iter: int,
    dims: int,
    emb_sql: str = "SELECT vec_id, embedding FROM embeddings",
    with_kw: bool = True,
    keymul: int = 32,
    ckeymul: int = KM_KEYMUL,
) -> str:
    """The :func:`kmeans_two_level` replay as a ``WITH`` chain ending
    at ``asgf`` ``(pid, cluster, dist)`` + ``pts`` — per outer round:
    coarse Lloyd over the centroid table (``c{t}s*``/``c{t}a*``), the
    non-empty-cell filter, point routing, the in-cell fine argmin, and
    (below the last round) the integer-mean fine update.  Guards match
    the Spark twin."""
    if k >= keymul:
        raise ValueError(f"k ({k}) must be < keymul ({keymul})")
    if kc >= ckeymul:
        raise ValueError(f"kc ({kc}) must be < ckeymul ({ckeymul})")
    if kc > k:
        raise ValueError(f"kc ({kc}) must be <= k ({k})")

    def _d(a: str, b: str) -> str:
        return (
            f"CAST(list_sum(list_transform(generate_series(1, {dims}), "
            f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))) AS BIGINT)"
        )

    lead = "WITH " if with_kw else ""
    cj = nc_iter - 1  # final coarse round index
    parts = [
        f"""
    {lead}pts AS (
      SELECT vec_id AS pid,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * {KM_SCALE}) AS BIGINT)) AS q
      FROM ({emb_sql})
    ),
    f0 AS (
      SELECT CAST(row_number() OVER (ORDER BY pid) - 1 AS BIGINT) AS cluster, q AS c
      FROM (SELECT pid, q FROM pts ORDER BY pid LIMIT {k})
    )"""
    ]
    for t in range(n_iter):
        parts.append(
            f""",
    c{t}s0 AS (
      SELECT CAST(row_number() OVER (ORDER BY cluster) - 1 AS BIGINT) AS sc, c AS cc
      FROM (SELECT cluster, c FROM f{t} ORDER BY cluster LIMIT {kc})
    )"""
        )
        for j in range(nc_iter):
            ckey = f"({_d('p.c', 'c.cc')} * {ckeymul} + c.sc)"
            parts.append(
                f""",
    c{t}a{j} AS (
      SELECT p.cluster AS cpid, CAST(min({ckey}) % {ckeymul} AS BIGINT) AS sc
      FROM f{t} p CROSS JOIN c{t}s{j} c
      GROUP BY p.cluster
    )"""
            )
            if j < nc_iter - 1:
                parts.append(
                    f""",
    c{t}u{j} AS (
      SELECT a.sc, s.pos, CAST(sum(p.c[s.pos]) // count(*) AS BIGINT) AS cv
      FROM f{t} p
      JOIN c{t}a{j} a ON a.cpid = p.cluster
      CROSS JOIN (SELECT unnest(generate_series(1, {dims})) AS pos) s
      GROUP BY a.sc, s.pos
    ),
    c{t}n{j} AS (
      SELECT sc, list(cv ORDER BY pos) AS cc FROM c{t}u{j} GROUP BY sc
    ),
    c{t}s{j + 1} AS (
      SELECT * FROM c{t}n{j}
      UNION ALL
      SELECT * FROM c{t}s{j} WHERE sc NOT IN (SELECT sc FROM c{t}n{j})
    )"""
                )
        rkey = f"({_d('p.q', 'c.cc')} * {ckeymul} + c.sc)"
        fkey = f"({_d('p.q', 'g.c')} * {keymul} + g.cluster)"
        parts.append(
            f""",
    ne{t} AS (
      SELECT s.sc, s.cc FROM c{t}s{cj} s
      WHERE s.sc IN (SELECT sc FROM c{t}a{cj})
    ),
    r{t} AS (
      SELECT p.pid, CAST(min({rkey}) % {ckeymul} AS BIGINT) AS sc
      FROM pts p CROSS JOIN ne{t} c
      GROUP BY p.pid
    ),
    fa{t} AS (
      SELECT p.pid, min({fkey}) AS fk
      FROM pts p
      JOIN r{t} r ON r.pid = p.pid
      JOIN c{t}a{cj} m ON m.sc = r.sc
      JOIN f{t} g ON g.cluster = m.cpid
      GROUP BY p.pid
    )"""
        )
        if t < n_iter - 1:
            parts.append(
                f""",
    fd{t} AS (
      SELECT pid, CAST(fk % {keymul} AS BIGINT) AS cluster FROM fa{t}
    ),
    fu{t} AS (
      SELECT a.cluster, s.pos, CAST(sum(p.q[s.pos]) // count(*) AS BIGINT) AS cv
      FROM pts p
      JOIN fd{t} a USING (pid)
      CROSS JOIN (SELECT unnest(generate_series(1, {dims})) AS pos) s
      GROUP BY a.cluster, s.pos
    ),
    fn{t} AS (
      SELECT cluster, list(cv ORDER BY pos) AS c FROM fu{t} GROUP BY cluster
    ),
    f{t + 1} AS (
      SELECT * FROM fn{t}
      UNION ALL
      SELECT * FROM f{t} WHERE cluster NOT IN (SELECT cluster FROM fn{t})
    )"""
            )
    parts.append(
        f""",
    asgf AS MATERIALIZED (
      SELECT pid, CAST(fk % {keymul} AS BIGINT) AS cluster,
             CAST(fk // {keymul} AS BIGINT) AS dist
      FROM fa{n_iter - 1}
    )"""
    )
    return "".join(parts)


def kmeans_two_level_oracle_sql(
    k: int = 16,
    kc: int = 4,
    n_iter: int = 2,
    nc_iter: int = 2,
    dims: int = 64,
    emb_sql: str = "SELECT vec_id, embedding FROM embeddings",
    keymul: int = 32,
    ckeymul: int = KM_KEYMUL,
) -> str:
    """DuckDB replay of :func:`kmeans_two_level` over the
    ``embeddings`` view."""
    return (
        _kmeans2_chain_sql(
            k, kc, n_iter, nc_iter, dims, emb_sql, True, keymul, ckeymul
        )
        + """
    SELECT pid, cluster, dist FROM asgf
    """
    )


def semdedup_two_level(
    emb: DataFrame,
    k: int = 16,
    kc: int = 4,
    n_iter: int = 2,
    nc_iter: int = 2,
    tau_centi: int = SD_TAU_CENTI,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keymul: int = 32,
    ckeymul: int = KM_KEYMUL,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023 §3) over the TWO-LEVEL k-means
    assignment (VERDICT r10 #1): identical prune semantics to
    :func:`semdedup_kmeans` — within-cluster dominated pairs under the
    exact integer cosine test, farther-from-centroid member kept —
    but the clustering stage is :func:`kmeans_two_level`, whose
    coarse-then-fine assignment replaces the n·k flop term with
    n·(kc + k/kc).  With the paper's k ∝ corpus recipe and kc ≈ √k
    this is the configuration that survives a 100× scale-up; the
    single-level operator remains the paper-exact control.

    Output: ``(vec_id, cluster, dist, keep)`` for every input vector,
    exactly like :func:`semdedup_kmeans`."""
    asg = kmeans_two_level(
        emb, k, kc, n_iter, nc_iter, vec_col, id_col, keymul, ckeymul
    )
    return _semdedup_prune(emb, asg, tau_centi, vec_col, id_col)


def semdedup_two_level_chain_sql(
    k: int = 16,
    kc: int = 4,
    n_iter: int = 2,
    nc_iter: int = 2,
    dims: int = 64,
    tau_centi: int = SD_TAU_CENTI,
    emb_sql: str = "SELECT vec_id, embedding FROM embeddings",
    with_kw: bool = True,
    keymul: int = 32,
    ckeymul: int = KM_KEYMUL,
) -> str:
    """The :func:`semdedup_two_level` replay as a ``WITH`` chain ending
    at ``sdres`` ``(vec_id, cluster, dist, keep)``: the two-level
    assignment chain (:func:`_kmeans2_chain_sql`, ending at ``asgf``)
    spliced onto the same prune tail the single-level oracle uses."""
    return _kmeans2_chain_sql(
        k, kc, n_iter, nc_iter, dims, emb_sql, with_kw, keymul, ckeymul
    ) + _semdedup_tail_sql(dims, tau_centi)


def semdedup_two_level_oracle_sql(
    k: int = 16,
    kc: int = 4,
    n_iter: int = 2,
    nc_iter: int = 2,
    dims: int = 64,
    tau_centi: int = SD_TAU_CENTI,
    emb_sql: str = "SELECT vec_id, embedding FROM embeddings",
    keymul: int = 32,
    ckeymul: int = KM_KEYMUL,
) -> str:
    """DuckDB replay of :func:`semdedup_two_level`."""
    return (
        semdedup_two_level_chain_sql(
            k, kc, n_iter, nc_iter, dims, tau_centi, emb_sql, True,
            keymul, ckeymul,
        )
        + """
    SELECT vec_id, cluster, dist, keep FROM sdres
    """
    )
