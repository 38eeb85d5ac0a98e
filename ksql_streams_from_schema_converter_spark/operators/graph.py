"""Distributed graph operators: fixed-point PageRank and oriented
triangle counting.

Both are built so the ENTIRE computation is exact integer arithmetic —
no floating point anywhere — which makes the results order-independent
and bit-identical across engines (the driver's DuckDB oracle replays
the same recurrence as unrolled SQL and hash-matches).  Float PageRank
cannot be hash-gated: double summation order differs between engines
and between Spark partitionings of the SAME data.

Scale notes are inline per operator; the common theme is that every
round/stage is one keyed shuffle over the edge list — the
iterative-MapReduce shape (Malewicz et al., "Pregel", SIGMOD 2010;
same execution skeleton as :func:`..dedup.connected_components`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: rank unit: 1.0 == 1_000_000 micro-ranks.  Integer fixed-point keeps
#: every engine's sum exact regardless of aggregation order.
PR_SCALE = 1_000_000

#: damping as an integer percentage (0.85) — applied as ``(85*x) div
#: 100`` so both engines use the same truncating integer division.
PR_DAMPING_PCT = 85


def pagerank_fixed_point(
    edges: DataFrame,
    n_iter: int = 3,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 5,
    release: bool = True,
) -> DataFrame:
    """PageRank over a directed edge list, ``n_iter`` synchronous
    rounds of the un-normalized recurrence

        rank'(v) = (1-d)*SCALE  +  d * sum_{(u,v) in E} rank(u) div outdeg(u)

    entirely in BIGINT micro-ranks (``div`` = truncating integer
    division; all quantities positive, so Spark's ``div`` and DuckDB's
    ``//`` agree exactly).  Dangling mass (nodes with no out-edges) is
    dropped, as in the classic simplified formulation — the oracle does
    the same, so the contract is exact.

    Scale: each round is ONE shuffle — edges join ranks on ``src``
    (both pre-partitioned on the node key after round 1), then a
    map-side-combining sum keyed on ``dst``.  Rounds are a fixed
    constant, so total cost is ``n_iter`` keyed shuffles of |E| — the
    textbook Pregel-style plan.  Skewed in-degree (celebrity nodes) is
    absorbed by partial aggregation: each map task pre-sums its local
    contributions per ``dst`` before the shuffle.

    Lineage policy: the static inputs (``nodes``, the degree-annotated
    edge list) are ``persist``-ed — they recur in every round's plan —
    but ranks stay LAZY between checkpoints so few-round runs execute
    as ONE job end-to-end (an eager per-round ``localCheckpoint``
    costs a full job per round, which dominates at benchmark scale).
    Every ``checkpoint_every`` rounds the rank lineage is truncated so
    deep runs don't build unbounded plans — the same discipline as
    :func:`..dedup.connected_components`, which DOES checkpoint every
    round because its convergence ``count`` forces a job anyway."""
    from pyspark import StorageLevel

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # outdeg is static across rounds: join it into the edge list ONCE
    # so each round's join is a single equi-join on src
    e_deg = e.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    ranks = nodes.select("node", F.lit(PR_SCALE).cast("bigint").alias("rank"))
    base = (PR_SCALE * (100 - PR_DAMPING_PCT)) // 100
    for i in range(n_iter):
        contrib = (
            e_deg.join(ranks, e_deg.src == ranks.node)
            .select(F.col("dst").alias("node"), F.expr("rank div outdeg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base).cast("bigint")
                + F.expr(f"({PR_DAMPING_PCT} * coalesce(contrib, 0L)) div 100")
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 and i != n_iter - 1:
            ranks = ranks.localCheckpoint()
    if not release:
        return ranks
    # close the cache lifecycle here: nodes/e_deg are pinned by the
    # CacheManager and would otherwise leak across a bench session
    # (ADVICE r5); the final rank table is |V|-sized, so the eager
    # checkpoint is cheap.  release=False hands back the LAZY plan
    # (caller owns the persisted inputs) — the plan-shape tests use it.
    from .lifecycle import eager_release

    return eager_release(ranks, nodes, e_deg)


def pagerank_oracle_sql(edges_cte: str, n_iter: int = 3) -> str:
    """The DuckDB replay of :func:`pagerank_fixed_point`: the fixed
    recurrence unrolled as chained CTEs (``r0 .. r{n}``), integer
    division via ``//``.  ``edges_cte`` is a SELECT producing
    ``(src, dst)``; DISTINCT is applied here to mirror the operator."""
    parts = [
        f"WITH edges AS (SELECT DISTINCT src, dst FROM ({edges_cte})),",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),",
        "deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),",
        f"r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS rank FROM nodes)",
    ]
    base = (PR_SCALE * (100 - PR_DAMPING_PCT)) // 100
    for i in range(n_iter):
        parts.append(
            f""",
r{i + 1} AS (
  SELECT n.node,
         CAST({base} + ({PR_DAMPING_PCT} * COALESCE(s.contrib, 0)) // 100
              AS BIGINT) AS rank
  FROM nodes n
  LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank // d.outdeg) AS contrib
    FROM edges e
    JOIN r{i} r ON e.src = r.node
    JOIN deg d ON e.src = d.src
    GROUP BY e.dst
  ) s ON n.node = s.node
)"""
        )
    parts.append(f"\nSELECT node, rank FROM r{n_iter}")
    return "".join(parts)


def canonical_edges(edges: DataFrame) -> DataFrame:
    """Undirected edge set in id-canonical form ``(a < b)``, self-loops
    dropped, deduplicated across directions."""
    return (
        edges.select(
            F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def orient_edges_by_degree(edges: DataFrame) -> DataFrame:
    """Orient an undirected edge set low-degree → high-degree (ties by
    id): the standard preparation for wedge enumeration that bounds
    triangle counting at O(|E|^1.5) total wedges (Schank & Wagner,
    "Finding, counting and listing all triangles in large graphs",
    WEA 2005; the same orientation MapReduce formulations use, Suri &
    Vassilvitskii, WWW 2011).  Without it a single high-degree hub
    generates deg² wedges; with it every wedge is charged to its
    lowest-degree endpoint.

    Input rows may list an edge in either or both directions; output
    has each undirected edge exactly once as ``(lo, hi)`` in the
    degree order."""
    canon = canonical_edges(edges)
    deg = (
        canon.select(F.col("a").alias("n"))
        .union(canon.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("n").alias("b"), F.col("deg").alias("deg_b"))
    j = canon.join(da, "a").join(db, "b")
    lo_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    return j.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )


def triangle_participation(edges: DataFrame, release: bool = True) -> DataFrame:
    """Per-node triangle counts over an undirected graph given as
    ``(u, v)`` rows (either/both directions).  Pipeline: degree-orient
    (:func:`orient_edges_by_degree`), enumerate wedges at the low
    vertex (self-join on ``lo``), close each wedge against the oriented
    edge set, then explode each closed triangle's three corners and
    count per node.

    Scale: two hash joins over the oriented edge list — wedge
    generation is bounded by the orientation (each node generates
    C(outdeg, 2) wedges with outdeg ≤ O(sqrt(|E|)) after orienting),
    and the closing probe is a pure two-column EQUI-join: wedge
    endpoints are re-canonicalized to id order ``(min, max)`` so they
    hit the id-canonical edge set directly — no OR-of-conjunctions
    condition that would degrade to a nested-loop join.  No driver
    materialization; per-node counts come from exploding a 3-element
    array (constant factor)."""
    from pyspark import StorageLevel

    # lazy persist (not eager localCheckpoint): the oriented set feeds
    # both wedge branches and the plan executes as one job
    canon = canonical_edges(edges).persist(StorageLevel.MEMORY_AND_DISK)
    o = orient_edges_by_degree(edges).persist(StorageLevel.MEMORY_AND_DISK)
    e1 = o.select(F.col("lo").alias("p"), F.col("hi").alias("q1"))
    e2 = o.select(F.col("lo").alias("p"), F.col("hi").alias("q2"))
    wedges = e1.join(e2, "p").where(F.col("q1") < F.col("q2"))
    # a wedge (p; q1, q2) closes iff {q1, q2} is an edge; q1 < q2 by id
    # already, so the id-canonical set closes it with an equi-join
    tri = wedges.join(
        canon,
        (F.col("q1") == F.col("a")) & (F.col("q2") == F.col("b")),
    ).select("p", "q1", "q2")
    counts = (
        tri.select(F.explode(F.array("p", "q1", "q2")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )
    if not release:
        return counts
    from .lifecycle import eager_release

    return eager_release(counts, canon, o)


def triangle_oracle_sql(edges_cte: str) -> str:
    """DuckDB replay of :func:`triangle_participation` over the same
    ``(u, v)`` edge CTE — identical orient/wedge/close construction."""
    return f"""
    WITH raw_edges AS ({edges_cte}),
    canon AS (
      SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
      FROM raw_edges WHERE u <> v
    ),
    deg AS (
      SELECT n, count(*) AS deg FROM (
        SELECT a AS n FROM canon UNION ALL SELECT b FROM canon
      ) GROUP BY n
    ),
    oriented AS (
      SELECT CASE WHEN (da.deg, c.a) < (db.deg, c.b) THEN c.a ELSE c.b END AS lo,
             CASE WHEN (da.deg, c.a) < (db.deg, c.b) THEN c.b ELSE c.a END AS hi
      FROM canon c
      JOIN deg da ON c.a = da.n
      JOIN deg db ON c.b = db.n
    ),
    tri AS (
      SELECT e1.p, e1.q1, e2.q2
      FROM (SELECT lo AS p, hi AS q1 FROM oriented) e1
      JOIN (SELECT lo AS p, hi AS q2 FROM oriented) e2 USING (p)
      JOIN canon c ON c.a = e1.q1 AND c.b = e2.q2
      WHERE e1.q1 < e2.q2
    )
    SELECT node, count(*) AS triangles
    FROM (
      SELECT unnest([p, q1, q2]) AS node FROM tri
    )
    GROUP BY node
    """


def bfs_hops_multi(
    edges: DataFrame,
    sources: list[int],
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Multi-source shortest hop counts via distributed frontier BFS:
    ``(source, node, hops)`` for every node within ``max_hops`` of each
    source — all sources expand in the SAME synchronous rounds (the
    landmark/distance-sketch primitive: k landmark BFS runs cost one
    traversal with k-tagged frontiers, not k traversals).

    Each level is one keyed join (edges ⋈ frontier on ``src``) + a
    distinct + an anti-join against the visited set, both keyed on
    (source, node) — the standard bulk-synchronous BFS whose total
    work is O(levels × |E| × k), NOT the all-walks enumeration a naive
    ``UNION ALL`` recursive CTE would do (walk counts explode
    combinatorially on dense graphs; the DuckDB oracle therefore
    recurses with deduplicating ``UNION``, which is the same frontier
    semantics).  Only the per-level FRONTIER is checkpointed (the
    convergence check forces that job anyway); the visited set is a
    lazy union over the already-checkpointed frontiers — re-
    materializing it each level was one extra O(reached-so-far) job
    per level, ~2x the loop's job count for zero reuse (VERDICT r8
    #7: the bench variance of bfs_hops_from_supplier1 tracked exactly
    those redundant jobs).  The visited set stays
    O(k × reached nodes)."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    frontier = e.sparkSession.createDataFrame(
        [(s, s) for s in sources], "source long, node long"
    ).localCheckpoint()
    visited = frontier.select(
        "source", "node", F.lit(0).cast("bigint").alias("hops")
    )
    for d in range(1, max_hops + 1):
        frontier = (
            e.join(frontier, e.src == frontier.node)
            .select("source", F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("source", "node"), ["source", "node"], "left_anti")
            .localCheckpoint()
        )
        if frontier.isEmpty():
            break
        visited = visited.union(
            frontier.select(
                "source", "node", F.lit(d).cast("bigint").alias("hops")
            )
        )
    return visited


def bfs_hops(
    edges: DataFrame,
    source: int,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Single-source BFS — :func:`bfs_hops_multi` with one landmark,
    the ``source`` column projected away."""
    return bfs_hops_multi(edges, [source], max_hops, src, dst).select(
        "node", "hops"
    )


def bfs_oracle_sql(edges_cte: str, source: int, max_hops: int = 4) -> str:
    """DuckDB replay of :func:`bfs_hops`: recursive CTE with
    deduplicating UNION (frontier semantics — the recursion's working
    set is the NEW distinct rows only), min(depth) per node."""
    return f"""
    WITH RECURSIVE edges AS (SELECT DISTINCT src, dst FROM ({edges_cte})),
    walk(node, depth) AS (
      SELECT CAST({source} AS BIGINT), CAST(0 AS BIGINT)
      UNION
      SELECT e.dst, w.depth + 1
      FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.depth < {max_hops}
    )
    SELECT node, min(depth) AS hops FROM walk GROUP BY node
    """


def bfs_multi_oracle_sql(
    edges_cte: str, sources: list[int], max_hops: int = 4
) -> str:
    """DuckDB replay of :func:`bfs_hops_multi`: the same deduplicating-
    UNION recursion tagged with the landmark, min(depth) per
    (source, node)."""
    seeds = " UNION ALL ".join(
        f"SELECT CAST({s} AS BIGINT), CAST({s} AS BIGINT), CAST(0 AS BIGINT)"
        for s in sources
    )
    return f"""
    WITH RECURSIVE edges AS (SELECT DISTINCT src, dst FROM ({edges_cte})),
    walk(source, node, depth) AS (
      {seeds}
      UNION
      SELECT w.source, e.dst, w.depth + 1
      FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.depth < {max_hops}
    )
    SELECT source, node, min(depth) AS hops
    FROM walk GROUP BY source, node
    """


def bellman_ford_rounds(
    edges: DataFrame,
    source: int,
    n_rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Weighted shortest-path distances after ``n_rounds`` synchronous
    Bellman-Ford relaxations from ``source``: exact distances to every
    node reachable within ``n_rounds`` hops (the BSP relaxation each
    round: dist' = min(dist, min over in-edges dist[u]+w)).  Integer
    weights → exact, order-independent minimums both engines replay
    (the oracle unrolls the same rounds as CTEs, like PageRank).

    Scale: each round is one keyed join (distances ⋈ edges on the
    source endpoint) + a map-side-combining min keyed on the
    destination — O(rounds × |E|).  Only REACHED nodes carry rows, so
    early rounds touch the frontier's edge neighborhood, not the
    graph.  This is delta-stepping's degenerate (Δ=∞) form; a fixed
    round count keeps the plan lazy end-to-end, checkpoint-free."""
    e = (
        edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(weight).cast("bigint").alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .localCheckpoint()
    )
    dist = e.sparkSession.createDataFrame(
        [(source, 0)], "node long, dist long"
    )
    for _ in range(n_rounds):
        relaxed = (
            e.join(dist, e.src == dist.node)
            .select(F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    return dist


def bellman_ford_oracle_sql(
    edges_cte: str, source: int, n_rounds: int = 3
) -> str:
    """DuckDB replay of :func:`bellman_ford_rounds`: the relaxation
    unrolled as chained CTEs; ``edges_cte`` yields (src, dst, w) with
    parallel edges collapsed to min weight here, mirroring the
    operator."""
    parts = [
        f"""WITH raw_e AS ({edges_cte}),
    edges AS (
      SELECT src, dst, CAST(min(w) AS BIGINT) AS w
      FROM raw_e GROUP BY src, dst
    ),
    d0 AS (SELECT CAST({source} AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist)"""
    ]
    for i in range(n_rounds):
        parts.append(
            f""",
    d{i + 1} AS (
      SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d{i}
        UNION ALL
        SELECT e.dst AS node, d.dist + e.w AS dist
        FROM d{i} d JOIN edges e ON e.src = d.node
      ) GROUP BY node
    )"""
        )
    parts.append(f"\n    SELECT node, dist FROM d{n_rounds}")
    return "".join(parts)
