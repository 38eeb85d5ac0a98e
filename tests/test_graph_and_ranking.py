"""Unit tests for operators/graph.py (fixed-point PageRank, oriented
triangle counting), operators/ranking.py (distributed global rank /
NTILE) and the count-min sketch (operators/sketch.py) — the oracle
parity suite covers their workload queries end-to-end; these pin the
operator contracts on hand-checkable graphs."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ksql_streams_from_schema_converter_spark.operators.graph import (
    PR_SCALE,
    canonical_edges,
    orient_edges_by_degree,
    pagerank_fixed_point,
    triangle_participation,
)
from ksql_streams_from_schema_converter_spark.operators.ranking import (
    global_ntile,
    global_row_number,
)
from ksql_streams_from_schema_converter_spark.operators.sketch import (
    cms_point_estimates,
    count_min_sketch,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def test_canonical_edges_dedup_and_self_loops(spark):
    e = _edges(spark, [(1, 2), (2, 1), (1, 2), (3, 3), (2, 4)])
    got = {(r.a, r.b) for r in canonical_edges(e).collect()}
    assert got == {(1, 2), (2, 4)}


def test_orientation_covers_each_edge_once(spark):
    # path 1-2-3-4 plus chord 1-3
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 3)])
    o = orient_edges_by_degree(e).collect()
    assert len(o) == 4
    undirected = {frozenset((r.lo, r.hi)) for r in o}
    assert undirected == {
        frozenset(p) for p in [(1, 2), (2, 3), (3, 4), (1, 3)]
    }
    # 4 has degree 1, 3 has degree 3: the 3-4 edge must point 4 -> 3
    assert (4, 3) in {(r.lo, r.hi) for r in o}


def test_triangles_k4(spark):
    # K4: C(4,3)=4 triangles, every node participates in C(3,2)=3
    nodes = [1, 2, 3, 4]
    e = _edges(spark, [(a, b) for a in nodes for b in nodes if a < b])
    got = {r.node: r.triangles for r in triangle_participation(e).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangles_none_in_tree(spark):
    e = _edges(spark, [(1, 2), (1, 3), (1, 4), (2, 5)])
    assert triangle_participation(e).count() == 0


def test_pagerank_two_node_cycle_exact(spark):
    """1 <-> 2: both nodes keep rank exactly PR_SCALE at every round
    (each forwards its whole rank to the other): fixed point of the
    recurrence, checkable by hand: 150000 + 85*1000000 div 100 div 1
    -> 150000 + 850000 = 1000000."""
    e = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    got = {r.node: r.rank for r in pagerank_fixed_point(e, n_iter=3).collect()}
    assert got == {1: PR_SCALE, 2: PR_SCALE}


def test_pagerank_star_hub_dominates(spark):
    e = spark.createDataFrame(
        [(i, 99) for i in range(1, 6)] + [(99, i) for i in range(1, 6)],
        "src long, dst long",
    )
    ranks = {r.node: r.rank for r in pagerank_fixed_point(e, n_iter=3).collect()}
    assert all(ranks[99] > ranks[i] for i in range(1, 6))
    # leaves are symmetric: identical ranks
    assert len({ranks[i] for i in range(1, 6)}) == 1


def test_pagerank_deep_run_checkpoints(spark):
    """n_iter beyond checkpoint_every exercises the lineage
    truncation path and still converges to stable integer ranks."""
    e = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src long, dst long")
    got = {r.node: r.rank for r in pagerank_fixed_point(
        e, n_iter=7, checkpoint_every=3
    ).collect()}
    # 3-cycle: every node forwards its full rank -> all stay at SCALE
    assert got == {1: PR_SCALE, 2: PR_SCALE, 3: PR_SCALE}


def test_global_row_number_matches_sequential_window(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") * 37 % 251).alias("key"), F.col("id")
    )
    got, total = global_row_number(df, ["key", "id"], n_partitions=8)
    assert total == 1000
    w = Window.orderBy("key", "id")
    want = df.withColumn("rn", F.row_number().over(w))
    assert (
        got.select("key", "id", "rn")
        .exceptAll(want.select("key", "id", "rn"))
        .count()
        == 0
    )


@pytest.mark.parametrize("n,k", [(1000, 8), (10, 4), (7, 3), (5, 9)])
def test_global_ntile_matches_sql_ntile(spark, n, k):
    df = spark.range(0, n).select((F.col("id") * 61 % 997).alias("key"), "id")
    got = global_ntile(df, ["key", "id"], k=k, n_partitions=4)
    want = df.withColumn(
        "bin", F.ntile(k).over(Window.orderBy("key", "id"))
    )
    assert (
        got.select("key", "id", "bin")
        .exceptAll(want.select("key", "id", "bin"))
        .count()
        == 0
    )


def test_cms_never_undercounts_and_is_tiny(spark):
    df = spark.range(0, 2000).select((F.col("id") % 37).alias("k"))
    sketch = count_min_sketch(df, "k", depth=4, width=16)
    assert sketch.count() <= 4 * 16
    probes = spark.range(0, 37).select(F.col("id").alias("k"))
    est = cms_point_estimates(sketch, probes, depth=4, width=16)
    truth = df.groupBy("k").agg(F.count("*").alias("t"))
    joined = est.join(truth, "k").collect()
    assert len(joined) == 37
    assert all(r.cms_est >= r.t for r in joined)


def test_bfs_hops_path_graph(spark):
    from ksql_streams_from_schema_converter_spark.operators.graph import bfs_hops

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (9, 1)], "src long, dst long"
    )
    got = {r.node: r.hops for r in bfs_hops(e, source=1, max_hops=3).collect()}
    # directed: 9 -> 1 is not reachable FROM 1; 5 is beyond max_hops
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_bfs_takes_shortest_route(spark):
    from ksql_streams_from_schema_converter_spark.operators.graph import bfs_hops

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "src long, dst long"
    )
    got = {r.node: r.hops for r in bfs_hops(e, source=1, max_hops=4).collect()}
    assert got[4] == 1  # via the direct edge, not the 3-hop path


def test_bfs_early_exit_on_empty_frontier(spark):
    from ksql_streams_from_schema_converter_spark.operators.graph import bfs_hops

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {r.node: r.hops for r in bfs_hops(e, source=1, max_hops=10).collect()}
    assert got == {1: 0, 2: 1}


def test_prefix_filter_identity_and_candidate_reduction(spark):
    """The prefix-filtered similarity join must (a) return EXACTLY the
    plain formulation's pairs, (b) index strictly fewer postings than
    the full shingle set on a corpus with shared boilerplate."""
    from ksql_streams_from_schema_converter_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = []
    for i in range(30):
        # shared boilerplate prefix + per-doc tail; docs i and i+100
        # are near-duplicates (one word changed)
        tail = f"document number {i} talks about topic {i % 5} in detail"
        rows.append((i, f"{base} {tail}"))
        rows.append((i + 100, f"{base} {tail} extra"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    plain = ngram_jaccard_pairs(docs, threshold=0.5)
    pref = ngram_jaccard_pairs_prefix(docs, threshold=0.5)
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in pref.collect()}
    assert a == b and len(a) >= 30  # every planted near-dup pair found


def test_kmeans_separates_planted_clusters(spark):
    from ksql_streams_from_schema_converter_spark.operators.clustering import (
        kmeans_fixed_point,
    )

    rows = []
    for i in range(10):
        rows.append((i, [0.0 + i * 0.01, 0.0]))        # cluster near origin
        rows.append((100 + i, [10.0 + i * 0.01, 10.0]))  # cluster far away
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # 3 rounds: both seeds start inside the origin group, so round 1
    # splits {point 0} vs {rest}, round 2's update lands one centroid
    # on each planted group, round 3's final assignment is clean
    got = kmeans_fixed_point(emb, k=2, n_iter=3).collect()
    by_cluster = {}
    for r in got:
        by_cluster.setdefault(r.cluster, set()).add(r.pid)
    assert len(by_cluster) == 2
    groups = sorted(by_cluster.values(), key=min)
    assert groups[0] == set(range(10))
    assert groups[1] == {100 + i for i in range(10)}
    # converged centroids == group means: within-group spread is
    # 0.09 in x -> integer dist bounded by (0.05 * 1e6)^2 * 2
    assert all(r.dist <= 2 * (50_000**2) for r in got)


def test_kmeans_is_deterministic(spark):
    from ksql_streams_from_schema_converter_spark.operators.clustering import (
        kmeans_fixed_point,
    )
    from ksql_streams_from_schema_converter_spark.sources.parquet import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    a = sorted(map(tuple, kmeans_fixed_point(emb, k=4, n_iter=2).collect()))
    b = sorted(map(tuple, kmeans_fixed_point(emb, k=4, n_iter=2).collect()))
    assert a == b


def test_map_in_arrow_features_match_pandas_path(spark):
    """The Arrow-native feature extractor must be byte-identical to
    the mapInPandas path on the same media corpus."""
    from ksql_streams_from_schema_converter_spark.multimodal.binary import (
        attach_fake_media,
        extract_features_arrow,
        extract_media_features,
    )
    from ksql_streams_from_schema_converter_spark.sources.parquet import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(50)
    media = attach_fake_media(docs)
    a = sorted(map(tuple, extract_media_features(media).collect()))
    b = sorted(map(tuple, extract_features_arrow(media).collect()))
    assert a == b and len(a) == 50


def test_triangles_match_bruteforce_on_seeded_random_graphs(spark):
    """Deterministic pseudo-random graphs (seeded LCG — no RNG state in
    the test) cross-checked against an O(n³) Python brute force."""
    import itertools

    seed = 12345
    for trial in range(3):
        edges, x = set(), seed + trial
        for _ in range(60):
            x = (x * 1103515245 + 12345) % (2**31)
            u = x % 12
            x = (x * 1103515245 + 12345) % (2**31)
            v = x % 12
            if u != v:
                edges.add((min(u, v), max(u, v)))
        brute = {n: 0 for n in range(12)}
        for a, b, c in itertools.combinations(sorted({n for e in edges for n in e}), 3):
            if (a, b) in edges and (b, c) in edges and (a, c) in edges:
                for n in (a, b, c):
                    brute[n] += 1
        df = spark.createDataFrame(sorted(edges), "u long, v long")
        got = {r.node: r.triangles for r in triangle_participation(df).collect()}
        want = {n: c for n, c in brute.items() if c > 0}
        assert got == want, f"trial {trial}: {got} != {want}"


def test_global_ntile_on_all_equal_keys(spark):
    """Degenerate total-tie input: ordering falls entirely to the
    tie-break column; NTILE must still match the sequential window."""
    df = spark.range(0, 100).select(F.lit(7).alias("key"), "id")
    got = global_ntile(df, ["key", "id"], k=6, n_partitions=4)
    want = df.withColumn("bin", F.ntile(6).over(Window.orderBy("key", "id")))
    assert (
        got.select("id", "bin").exceptAll(want.select("id", "bin")).count() == 0
    )


def test_bfs_multi_source_tags_each_landmark(spark):
    from ksql_streams_from_schema_converter_spark.operators.graph import (
        bfs_hops_multi,
    )

    # 1 -> 2 -> 3 and 9 -> 3: landmarks 1 and 9 see 3 at different hops
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (9, 3)], "src long, dst long"
    )
    got = {
        (r.source, r.node): r.hops
        for r in bfs_hops_multi(e, sources=[1, 9], max_hops=4).collect()
    }
    assert got == {
        (1, 1): 0, (1, 2): 1, (1, 3): 2,
        (9, 9): 0, (9, 3): 1,
    }


def test_bellman_ford_prefers_cheap_long_path(spark):
    from ksql_streams_from_schema_converter_spark.operators.graph import (
        bellman_ford_rounds,
    )

    # direct 1->4 costs 100; the 3-hop path costs 3 — 3 rounds find it
    e = spark.createDataFrame(
        [(1, 4, 100), (1, 2, 1), (2, 3, 1), (3, 4, 1)],
        "src long, dst long, w long",
    )
    got = {r.node: r.dist for r in bellman_ford_rounds(e, 1, n_rounds=3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}
    # with only 1 round, the expensive direct edge is the best known
    got1 = {r.node: r.dist for r in bellman_ford_rounds(e, 1, n_rounds=1).collect()}
    assert got1[4] == 100


def test_bellman_ford_parallel_edges_collapse_to_min(spark):
    from ksql_streams_from_schema_converter_spark.operators.graph import (
        bellman_ford_rounds,
    )

    e = spark.createDataFrame(
        [(1, 2, 9), (1, 2, 4), (1, 2, 7)], "src long, dst long, w long"
    )
    got = {r.node: r.dist for r in bellman_ford_rounds(e, 1, n_rounds=1).collect()}
    assert got == {1: 0, 2: 4}
