"""Similarity search over embedding columns (``array<float>``).

The ANN path uses random-hyperplane LSH (Charikar, STOC 2002) with
multi-probe search (Lv et al., "Multi-probe LSH", VLDB 2007).

Two paths, per the scale story:

- ``knn_bruteforce``: exact top-k by cosine. The crossJoin is
  broadcast-able when the query set is small (the common case: q ≪ n);
  the candidate scoring is a map-side native expression
  (``F.aggregate`` dot product — JVM codegen, no Python), so it scales
  to any corpus size with zero shuffles besides the final top-k.
- ``knn_lsh``: random-hyperplane LSH buckets (deterministic md5-derived
  planes) restrict scoring to same-bucket candidates — the 100 TB path.
  Multi-probe = search the query's bucket only; recall/cost tuned by
  ``n_planes``.

Top-k per query uses a window rank — one shuffle keyed by query id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Native dot product: fold over zipped arrays (JVM, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def hyperplane_weights(p: int, dim: int) -> list[float]:
    """Plane ``p``'s deterministic ±1 weights: the parity of the first
    md5 nibble of ``"p:d"`` for each 1-based dimension d. Computed
    driver-side (they are row-independent constants) and shipped as an
    array literal — the executor does a plain dot product instead of
    dim×planes md5 calls per row."""
    import hashlib

    return [
        1.0 if int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[0], 16) % 2 == 0 else -1.0
        for d in range(1, dim + 1)
    ]


def hyperplane_sketch(vec: Column, n_planes: int = 8, dim: int = 64) -> Column:
    """Deterministic random-hyperplane sketch: plane p's weight for
    dimension d is md5-derived in {-1, +1}; bit p of the sketch is the
    sign of the projection. Returns a compact string key."""
    v = vec.cast("array<double>")
    bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(w) for w in hyperplane_weights(p, dim)])
        proj = dot(v, plane)
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _lit_vec(vals: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vals])


def _cell_sims(v: Column, centroids: list[list[float]]) -> Column:
    """array<struct<sim,cell>> of the row's cosine to every centroid —
    all JVM-native; struct ordering (sim first) makes array_max /
    array_sort rank cells by similarity with cell-id tie-break."""
    return F.array(
        *[
            F.struct(
                F.round(cosine(v, _lit_vec(c)), 9).alias("sim"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(centroids)
        ]
    )


def nearest_cell(v: Column, centroids: list[list[float]]) -> Column:
    return F.array_max(_cell_sims(v, centroids))["cell"]


def probe_cells(v: Column, centroids: list[list[float]], nprobe: int) -> Column:
    """The ``nprobe`` most-similar cells for a query vector (IVF's
    recall/cost knob): ascending sort, take the last ``nprobe``."""
    top = F.slice(F.array_sort(_cell_sims(v, centroids)), -nprobe, nprobe)
    return F.transform(top, lambda s: s["cell"])


def train_ivf_centroids(
    emb: DataFrame,
    n_cells: int = 16,
    refine_iters: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Train an IVF coarse quantizer: deterministic seeds (the
    ``n_cells`` lowest-id vectors) + ``refine_iters`` Lloyd steps
    (assign → per-cell elementwise mean, computed distributed via
    posexplode/groupBy — one shuffle per iteration). Centroid
    components are rounded to 9 decimals so the trained quantizer is
    reproducible across partitionings. At 100 TB you train on
    ``emb.sample(...)`` — the quantizer only needs a sample, and
    everything downstream is unchanged."""
    base = emb.select(F.col(id_col).alias("i"), F.col(vec_col).cast("array<double>").alias("v"))
    centroids = [r.v for r in base.orderBy("i").limit(n_cells).collect()]
    for _ in range(refine_iters):
        assigned = base.select(nearest_cell(F.col("v"), centroids).alias("cell"), "v")
        means = (
            assigned.select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.round(F.avg("x"), 9).alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .collect()
        )
        refined = list(centroids)
        for r in means:
            refined[r.cell] = [s.m for s in r.pm]
        centroids = refined  # empty cells keep their seed
    return centroids


def knn_ivf(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 2,
    refine_iters: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index — the
    classic ANN scale path alongside LSH: a coarse quantizer assigns
    every vector to its nearest centroid cell, and each query scores
    only the ``nprobe`` most-similar cells (~``nprobe/n_cells`` of the
    corpus). The cell-equality join co-locates candidates by cell, so
    at scale the scan partitions by cell instead of broadcasting the
    corpus. Same output shape as :func:`knn_bruteforce`; recall < 1 by
    design (rows-only correctness check).

    Reference: Jégou et al., "Product Quantization for Nearest
    Neighbor Search" (TPAMI 2011) — the IVF coarse stage, without PQ
    residual compression (we score exact vectors within probed cells,
    i.e. IVF-Flat)."""
    centroids = train_ivf_centroids(emb, n_cells, refine_iters, vec_col, id_col)
    base = emb.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("v"),
        nearest_cell(F.col(vec_col).cast("array<double>"), centroids).alias("cell"),
    )
    queries = (
        emb.where(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        )
        .withColumn("qcell", F.explode(probe_cells(F.col("qv"), centroids, nprobe)))
    )
    scored = (
        base.join(F.broadcast(queries), F.col("cell") == F.col("qcell"))
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def knn_bruteforce(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (excluding self).

    Output: (query_id, neighbor_id, rank) — ranks by cosine rounded to
    6 decimals with neighbor-id tie-break, so results are deterministic
    and engine-comparable."""
    base = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    queries = base.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        base.crossJoin(F.broadcast(queries))
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def knn_lsh(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 6,
    multiprobe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: score only candidates in the query's
    hyperplane bucket, plus (``multiprobe``=1) every bucket at Hamming
    distance 1 — the standard recall/cost knob: with b balanced buckets
    this scores ~``(1+n_planes)/b`` of the corpus instead of all of it.
    Same output shape as :func:`knn_bruteforce`; recall < 1 by design
    (rows-only correctness check)."""
    base = emb.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("v"),
        hyperplane_sketch(F.col(vec_col), n_planes).alias("bucket"),
    )
    queries = base.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"), F.col("bucket").alias("qb")
    )
    if multiprobe:
        # probe set = own bucket + each 1-bit flip (native expressions)
        flips = F.array(
            F.col("qb"),
            *[
                F.concat(
                    F.substring("qb", 1, p),
                    F.when(F.substring("qb", p + 1, 1) == "1", "0").otherwise("1"),
                    F.substring("qb", p + 2, n_planes),
                )
                for p in range(n_planes)
            ],
        )
        queries = queries.withColumn("qb", F.explode(flips))
    scored = (
        base.join(F.broadcast(queries), (F.col("bucket") == F.col("qb")))
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
