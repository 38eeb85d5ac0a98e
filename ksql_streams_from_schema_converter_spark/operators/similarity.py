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


def assign_cells(df: DataFrame, centroids: list[list[float]], nprobe: int = 1,
                 vec_col: str = "v") -> DataFrame:
    """Append an int ``cell`` column: each row's ``nprobe`` most-cosine-
    similar centroid cells (rows fan out nprobe×).

    Vectorized numpy over Arrow batches (one GEMM per batch) — this is
    how real IVF implementations score the coarse quantizer (BLAS), and
    it avoids a ~16×dim-literal Catalyst expression per row whose
    codegen cost dwarfs 2k-row inputs. Scales with corpus size at
    O(batch × dim × n_cells) flops, no shuffle. Ties break toward the
    lower cell id (stable argsort on rounded sims) so assignment is
    deterministic across partitionings."""
    import numpy as np
    from pyspark.sql import types as T

    cmat = np.asarray(centroids, dtype="float64").T  # dim × cells
    cnorm = np.linalg.norm(cmat, axis=0)
    cmat = cmat / np.where(cnorm == 0, 1.0, cnorm)
    out_schema = T.StructType(
        list(df.schema) + [T.StructField("cell", T.IntegerType(), False)]
    )

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf[vec_col].values).astype("float64")
            vnorm = np.linalg.norm(v, axis=1, keepdims=True)
            sims = np.round((v / np.where(vnorm == 0, 1.0, vnorm)) @ cmat, 9)
            top = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]  # b × nprobe
            rep = pdf.loc[pdf.index.repeat(nprobe)].reset_index(drop=True)
            rep["cell"] = top.reshape(-1).astype("int32")
            yield rep

    return df.mapInPandas(score, schema=out_schema)


def training_sample(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    train_sample: int = 512,
    at_least: int = 1,
):
    """Collect the deterministic quantizer-training sample ONCE (the
    ``train_sample`` lowest-id vectors) as a numpy matrix, shared by
    IVF and PQ training — at corpus scale the id-ordered head is the
    dominant trainer setup cost, so it must not run per trainer."""
    import numpy as np

    rows = (
        emb.select(
            F.col(id_col).alias("i"), F.col(vec_col).cast("array<double>").alias("v")
        )
        .orderBy("i")
        .limit(max(train_sample, at_least))
        .collect()
    )
    return np.stack([np.asarray(r.v, dtype="float64") for r in rows])


def train_ivf_centroids(
    emb: DataFrame,
    n_cells: int = 16,
    refine_iters: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    train_sample: int = 512,
    sample=None,
) -> list[list[float]]:
    """Train an IVF coarse quantizer on a deterministic sample: collect
    the ``train_sample`` lowest-id vectors (ONE small job — a quantizer
    never needs the full corpus; FAISS trains IVF on a sample too), run
    ``refine_iters`` Lloyd steps in numpy on the driver, seed = first
    ``n_cells`` sampled vectors. Components are rounded to 9 decimals;
    the whole procedure is exactly reproducible across partitionings.
    At 100 TB swap the id-ordered head for ``emb.sample(fraction,
    seed)`` — still one tiny collect; everything downstream is
    unchanged. Pass ``sample`` (from :func:`training_sample`) to share
    one collected sample across trainers."""
    import numpy as np

    x = (
        sample
        if sample is not None
        else training_sample(emb, vec_col, id_col, train_sample, at_least=n_cells)
    )
    xnorm = np.linalg.norm(x, axis=1, keepdims=True)
    xn = x / np.where(xnorm == 0, 1.0, xnorm)
    centroids = x[:n_cells].copy()
    for _ in range(refine_iters):
        cmat = centroids.T / np.maximum(np.linalg.norm(centroids.T, axis=0), 1e-30)
        assign = np.argmax(np.round(xn @ cmat, 9), axis=1)
        for c in range(n_cells):
            members = x[assign == c]
            if len(members):  # empty cells keep their seed
                centroids[c] = members.mean(axis=0)
    return np.round(centroids, 9).tolist()


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
    base = assign_cells(
        emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")),
        centroids,
    )
    queries = assign_cells(
        emb.where(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        ),
        centroids,
        nprobe=nprobe,
        vec_col="qv",
    ).withColumnRenamed("cell", "qcell")
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


def train_pq_codebooks(
    emb: DataFrame,
    m: int = 8,
    ksub: int = 16,
    refine_iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    train_sample: int = 512,
    sample=None,
):
    """Train product-quantization codebooks (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011 §II): split
    the vector into ``m`` subvectors and k-means each subspace to
    ``ksub`` centroids on a deterministic sample (ONE tiny collect —
    same training policy as :func:`train_ivf_centroids`; FAISS trains
    PQ on a sample too). Returns an ``m × ksub × dsub`` nested list,
    rounded to 9 decimals for cross-partitioning reproducibility.
    Pass ``sample`` (from :func:`training_sample`) to share one
    collected sample across trainers."""
    import numpy as np

    x = (
        sample
        if sample is not None
        else training_sample(emb, vec_col, id_col, train_sample, at_least=ksub)
    )
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = []
    for s in range(m):
        xs = x[:, s * dsub : (s + 1) * dsub]
        cent = xs[:ksub].copy()
        for _ in range(refine_iters):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(np.round(d2, 9), axis=1)
            for c in range(ksub):
                members = xs[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books.append(np.round(cent, 9).tolist())
    return books


def pq_encode(
    df: DataFrame, codebooks, vec_col: str = "v"
) -> DataFrame:
    """Append ``code`` (array<int>, length m) and ``recon``
    (array<double>, the PQ reconstruction): per subvector, the index of
    the nearest codebook centroid (L2). Vectorized numpy over Arrow
    batches — one small GEMM-shaped distance computation per batch, no
    shuffle, scales linearly with the corpus. The m×ksub codebooks ride
    along as a task-closure constant (a few KB), the same way a real
    IVF-PQ index ships its quantizer to searchers."""
    import numpy as np
    from pyspark.sql import types as T

    books = [np.asarray(b, dtype="float64") for b in codebooks]
    m = len(books)
    dsub = books[0].shape[1]
    out_schema = T.StructType(
        list(df.schema)
        + [
            T.StructField("code", T.ArrayType(T.IntegerType()), False),
            T.StructField("recon", T.ArrayType(T.DoubleType()), False),
        ]
    )

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf[vec_col].values).astype("float64")
            codes = np.empty((len(v), m), dtype="int32")
            recon = np.empty_like(v)
            for s in range(m):
                xs = v[:, s * dsub : (s + 1) * dsub]
                d2 = ((xs[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
                idx = np.argmin(np.round(d2, 9), axis=1)
                codes[:, s] = idx
                recon[:, s * dsub : (s + 1) * dsub] = books[s][idx]
            pdf = pdf.copy()
            pdf["code"] = list(codes)
            pdf["recon"] = list(recon)
            yield pdf

    return df.mapInPandas(encode, schema=out_schema)


def knn_ivf_pq(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 2,
    m: int = 8,
    ksub: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ approximate top-k (Jégou et al., TPAMI 2011 — the IVFADC
    system): the IVF coarse quantizer prunes to ``nprobe`` cells and
    candidates are scored against the query using their PQ
    reconstruction (asymmetric distance: exact query side, 8-bit-coded
    database side). At 100 TB the corpus stores only ``m`` bytes + cell
    id per vector (a 32× compression at dim=64 float32) and the scan
    partitions by cell — the classic billion-scale ANN layout.

    Same output shape as :func:`knn_bruteforce`; recall < 1 by design
    (rows-only correctness check; recall gated in pytest against the
    planted-cluster ground truth)."""
    # ONE collected sample feeds both trainers (identical deterministic
    # head either way; the global-sort job is the setup cost at scale)
    sample = training_sample(
        emb, vec_col, id_col, at_least=max(n_cells, ksub)
    )
    centroids = train_ivf_centroids(emb, n_cells, 1, vec_col, id_col, sample=sample)
    codebooks = train_pq_codebooks(emb, m, ksub, 2, vec_col, id_col, sample=sample)
    base = pq_encode(
        assign_cells(
            emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")),
            centroids,
        ),
        codebooks,
    ).select(id_col, "cell", "recon")
    queries = assign_cells(
        emb.where(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        ),
        centroids,
        nprobe=nprobe,
        vec_col="qv",
    ).withColumnRenamed("cell", "qcell")
    scored = (
        base.join(F.broadcast(queries), F.col("cell") == F.col("qcell"))
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(F.col("recon"), F.col("qv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


#: id offset separating planted near-duplicates from the base corpus;
#: :func:`recall_verdicts` asserts the separation as a verdict column
PLANTED_OFFSET = 100_000


def planted_corpus(
    emb: DataFrame,
    query_ids: list[int],
    copies: int = 5,
    offset: int = PLANTED_OFFSET,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The corpus plus ``copies`` deterministic near-duplicates of each
    query vector (±0.01 per element, sign alternating with element index
    and copy number → cosine ≈ 0.997 to the source, far above any random
    corpus pair). The exact top-``copies`` of every query is then the
    planted set — real ground truth for recall gates, not a vacuous
    overlap bound. Planted ids are ``qid + offset*(1..copies)``, so
    membership is a pure arithmetic predicate both engines can state.

    All-native expressions (one ``transform`` per copy over a broadcast-
    small query slice) — at corpus scale this is ``copies × |queries|``
    extra rows, a constant."""
    q = emb.where(F.col(id_col).isin(query_ids))
    corpus = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col)
    )
    # ONE exploded branch for all copies (not a copies-way union): copy
    # j's perturbation sign pattern is (i + j - 1) % 2 with j 1-based —
    # identical values to the per-copy unions, a fraction of the plan
    planted = q.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias(vec_col),
        F.explode(F.sequence(F.lit(1), F.lit(copies))).alias("__j"),
    ).select(
        (F.col(id_col) + F.col("__j") * offset).alias(id_col),
        F.transform(
            F.col(vec_col),
            lambda x, i: x
            + F.when(
                (i + F.col("__j") - 1) % 2 == 0, F.lit(0.01)
            ).otherwise(F.lit(-0.01)),
        ).alias(vec_col),
    )
    return corpus.unionByName(planted)


def recall_verdicts(
    result: DataFrame,
    emb: DataFrame,
    query_ids: list[int],
    k: int,
    copies: int = 5,
    offset: int = PLANTED_OFFSET,
    min_query_hits: int = 3,
    overall_recall: float = 0.8,
    id_col: str = "vec_id",
) -> DataFrame:
    """Turn an ANN result over a :func:`planted_corpus` into hash-
    gateable boolean verdicts — the ``approx_stats`` pattern (VERDICT
    r4 #1): approximate OUTPUTS are engine-specific, but their QUALITY
    against planted ground truth is a deterministic boolean both
    engines can assert, which upgrades the ANN family from rows-only
    to a hard driver gate.

    Per query: ``topk_full`` (the index returned a full top-k) and
    ``query_recall_ok`` (≥ ``min_query_hits`` of the ``copies`` planted
    near-duplicates found — the planted cluster is detected).  Globally
    (repeated on every row so the shape stays one-row-per-query):
    ``overall_recall_ok`` (total recall ≥ ``overall_recall``, the same
    contract the pytest recall gates assert) and ``ids_disjoint`` (the
    base id space stays below ``offset``, so planted-membership
    arithmetic cannot collide with real ids — the gate's own
    precondition, verified not assumed).

    Cost: one groupBy on ``query_id`` (tiny — |queries| groups), a
    1-row total, a 1-row max-id scan, both broadcast."""
    is_planted = (
        (F.col("neighbor_id") >= offset)
        & (F.col("neighbor_id") % offset == F.col("query_id"))
        & (F.col("neighbor_id") <= F.col("query_id") + offset * copies)
    )
    per_q = result.groupBy("query_id").agg(
        F.count("*").alias("__ret"),
        F.sum(is_planted.cast("long")).alias("__hits"),
    )
    totals = per_q.agg(F.sum("__hits").alias("__total_hits"))
    disjoint = emb.agg(
        (F.max(F.col(id_col)) < F.lit(offset)).alias("ids_disjoint")
    )
    import math

    need_total = math.ceil(len(query_ids) * copies * overall_recall)
    return (
        per_q.crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(disjoint))
        .select(
            F.col("query_id").cast("bigint").alias("query_id"),
            (F.col("__ret") == F.lit(k)).alias("topk_full"),
            (F.col("__hits") >= F.lit(min_query_hits)).alias("query_recall_ok"),
            (F.col("__total_hits") >= F.lit(need_total)).alias("overall_recall_ok"),
            F.col("ids_disjoint"),
        )
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max|v| / 127``,
    ``q_i = floor(v_i / scale + 0.5)`` (half-up via floor — both engines
    agree on floor's IEEE semantics, unlike round()'s tie rules). The
    4× storage cut is the standard embedding-at-rest layout at corpus
    scale; dequantization error per element is bounded by scale/2.

    All-native expressions; ``scale`` is materialized into a column
    BEFORE the per-element lambda — referencing the array_max expression
    inside ``transform`` would re-evaluate it per element (O(dim²))."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    with_scale = df.select(F.col(id_col), v.alias("__v")).select(
        id_col,
        "__v",
        (F.array_max(F.transform("__v", F.abs)) / F.lit(127.0)).alias("scale"),
    )
    q = F.transform(
        F.col("__v"),
        lambda x: F.when(
            F.col("scale") > 0, F.floor(x / F.col("scale") + 0.5).cast("int")
        ).otherwise(F.lit(0)),
    )
    return with_scale.select(id_col, "scale", q.alias("q"))


def dequantize_int8(q_col: str = "q", scale_col: str = "scale") -> Column:
    """Inverse of :func:`quantize_int8`: ``v_i ≈ q_i * scale``.

    Returns a Column expression over the ``q``/``scale`` columns that
    :func:`quantize_int8` emits — select it on that frame."""
    return F.transform(F.col(q_col), lambda x: x.cast("double") * F.col(scale_col))


def projection_coefficients(out_dim: int, in_dim: int) -> list[list[int]]:
    """Deterministic integer projection matrix: entry (i, j) is the
    first md5 nibble of ``"{i}:{j}"`` minus 8 — small integers in
    [-8, 7], reproducible on any engine/run with no RNG state. Integer
    entries follow Achlioptas (JCSS 2003): database-friendly random
    projections don't need Gaussian entries, sparse integer matrices
    preserve distances within the same Johnson–Lindenstrauss bounds."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[0], 16) - 8
            for j in range(in_dim)
        ]
        for i in range(out_dim)
    ]


def random_projection(
    emb: DataFrame,
    out_dim: int = 16,
    in_dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction: project each
    vector through the deterministic integer matrix of
    :func:`projection_coefficients` (64 → 16 dims = 4× smaller ANN
    index / shuffle payload, distances preserved to JL distortion).

    Each output component is a fixed-order fold ``Σ_j v_j * c_ij``
    (``zip_with`` + ``aggregate`` — array order IS the summation
    order), so the doubles are bit-identical across engines and the
    driver hash-gates the result exactly: no rounding fudge. The
    coefficients are plan-time constants (KBs) shipped in the task
    closure — a map-side-only stage, zero shuffles, no Python."""
    coeffs = projection_coefficients(out_dim, in_dim)
    v = F.col(vec_col).cast("array<double>")
    outs = []
    for i, row in enumerate(coeffs):
        carr = F.array(*[F.lit(c) for c in row])
        outs.append(
            F.aggregate(
                F.zip_with(v, carr, lambda x, c: x * c),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias(f"proj_{i:02d}")
        )
    return emb.select(F.col(id_col), *outs)
