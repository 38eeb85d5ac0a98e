"""Persisted incremental IVF index (operators/ann_index.py)."""

import glob
import os

from pyspark.sql import functions as F

from ksql_streams_from_schema_converter_spark.operators.ann_index import (
    assign_queries,
    build_ivf_index,
    load_centroids,
    refresh_ivf_index,
    score_assigned,
    search_ivf_index,
)
from ksql_streams_from_schema_converter_spark.operators.similarity import (
    assign_cells,
)


def _vec(i, dim=8):
    # deterministic, well-spread unit-ish vectors
    return [float((i * 31 + d * 7) % 13 - 6) for d in range(dim)]


def _emb(spark, ids):
    return spark.createDataFrame(
        [(i, _vec(i)) for i in ids], "vec_id long, embedding array<double>"
    )


def test_refresh_appends_without_touching_stored_files(spark, tmp_path):
    """FAISS add() contract: a refresh writes NEW part files only —
    every file from the build survives byte-untouched (mtime identity,
    the merge.py discipline applied to an index)."""
    idx = str(tmp_path / "ivf")
    build_ivf_index(_emb(spark, range(0, 200)), idx, n_cells=4)
    before = {
        p: os.stat(p).st_mtime_ns
        for p in glob.glob(f"{idx}/cells/**/*.parquet", recursive=True)
    }
    assert before
    refresh_ivf_index(spark, idx, _emb(spark, range(200, 260)))
    after = {
        p: os.stat(p).st_mtime_ns
        for p in glob.glob(f"{idx}/cells/**/*.parquet", recursive=True)
    }
    for p, m in before.items():
        assert after[p] == m, f"stored file rewritten: {p}"
    assert len(after) > len(before)  # something was appended


def test_incremental_equals_monolithic(spark, tmp_path):
    """Frozen-quantizer equivalence: build on 80%, refresh 20%,
    search — identical rows to assigning everything at once against
    the same centroids."""
    idx = str(tmp_path / "ivf")
    ids = list(range(300))
    old = [i for i in ids if i % 5 != 3]
    new = [i for i in ids if i % 5 == 3]
    build_ivf_index(_emb(spark, old), idx, n_cells=4)
    refresh_ivf_index(spark, idx, _emb(spark, new))
    queries = _emb(spark, [7, 42]).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    inc = sorted(
        tuple(r)
        for r in search_ivf_index(spark, idx, queries, k=5, nprobe=2).collect()
    )
    cents = load_centroids(spark, idx)
    base_all = assign_cells(
        _emb(spark, ids).select(
            "vec_id", F.col("embedding").alias("v")
        ),
        cents,
    )
    q = assign_queries(spark, idx, queries, nprobe=2)
    scratch = sorted(
        tuple(r) for r in score_assigned(base_all, q, k=5).collect()
    )
    assert inc == scratch and len(inc) == 10


def test_search_partition_prunes_to_probed_cells(spark, tmp_path):
    """The probed-cell isin filter must reach the parquet scan as a
    PARTITION filter — the search reads ~nprobe/n_cells of the index
    from storage, which is the point of the cell-partitioned layout."""
    idx = str(tmp_path / "ivf")
    build_ivf_index(_emb(spark, range(0, 400)), idx, n_cells=8)
    queries = _emb(spark, [3]).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    q = assign_queries(spark, idx, queries, nprobe=2)
    probed = sorted({r.qcell for r in q.select("qcell").distinct().collect()})
    assert len(probed) == 2
    pruned = spark.read.parquet(f"{idx}/cells").where(
        F.col("cell").isin(probed)
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the isin lands in PartitionFilters (directory pruning), not a
    # post-scan Filter
    assert "PartitionFilters" in plan and "cell" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan
    # and the pruned scan actually reads fewer partitions' rows
    full = spark.read.parquet(f"{idx}/cells").count()
    assert 0 < pruned.count() < full


def test_pq_index_incremental_equals_monolithic_and_bytes_per_vector(
    spark, tmp_path
):
    """IVF-PQ persisted cells (VERDICT r7 #2): (a) the coded store
    persists m BYTES per vector — a binary code column, no raw vector
    array survives in cells/; (b) frozen-quantizer equivalence holds
    for the PQ path exactly as for flat IVF; (c) a further refresh
    composes."""
    from ksql_streams_from_schema_converter_spark.operators.ann_index import (
        _pq_coded,
        build_ivf_pq_index,
        read_cells,
        refresh_ivf_pq_index,
        score_assigned_pq,
        search_ivf_pq_index,
    )

    idx = str(tmp_path / "ivfpq")
    ids = list(range(300))
    old = [i for i in ids if i % 5 != 3]
    new = [i for i in ids if i % 5 == 3]
    m = 4
    cents, books = build_ivf_pq_index(
        _emb(spark, old), idx, n_cells=4, m=m, ksub=8
    )
    refresh_ivf_pq_index(
        spark, idx, _emb(spark, new), centroids=cents, codebooks=books
    )
    # (a) bytes per vector: binary code of EXACTLY m bytes; no
    # array<double> column persisted in the cell store
    cells = read_cells(spark, idx)
    kinds = dict(cells.dtypes)
    assert kinds["code"] == "binary" and "v" not in kinds, kinds
    lens = cells.select(F.length("code").alias("n")).distinct().collect()
    assert [r.n for r in lens] == [m], lens
    # (b) incremental == monolithic under the same frozen quantizers
    queries = _emb(spark, [7, 42]).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    inc = sorted(
        tuple(r)
        for r in search_ivf_pq_index(spark, idx, queries, k=5, nprobe=2).collect()
    )
    coded_all = _pq_coded(
        assign_cells(
            _emb(spark, ids).select("vec_id", F.col("embedding").alias("v")),
            cents,
        ),
        books,
    )
    q = assign_queries(spark, idx, queries, nprobe=2)
    scratch = sorted(
        tuple(r) for r in score_assigned_pq(coded_all, q, books, k=5).collect()
    )
    assert inc == scratch and len(inc) == 10
    # (c) another refresh composes and search still answers
    refresh_ivf_pq_index(spark, idx, _emb(spark, range(300, 340)))
    assert (
        search_ivf_pq_index(spark, idx, queries, k=5, nprobe=2).count() == 10
    )


def test_pq_index_compaction_preserves_search(spark, tmp_path):
    """compact_ivf_index over PQ-coded cells: N ingests -> 1, search
    results identical (the coded rows are layout-agnostic data)."""
    from ksql_streams_from_schema_converter_spark.operators.ann_index import (
        build_ivf_pq_index,
        compact_ivf_index,
        refresh_ivf_pq_index,
        search_ivf_pq_index,
    )

    idx = str(tmp_path / "ivfpq")
    cents, books = build_ivf_pq_index(
        _emb(spark, range(0, 200)), idx, n_cells=4, m=4, ksub=8
    )
    refresh_ivf_pq_index(spark, idx, _emb(spark, range(200, 260)))
    queries = _emb(spark, [7, 42]).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    before = sorted(
        tuple(r)
        for r in search_ivf_pq_index(spark, idx, queries, k=5, nprobe=2).collect()
    )
    compact_ivf_index(spark, idx)
    after = sorted(
        tuple(r)
        for r in search_ivf_pq_index(spark, idx, queries, k=5, nprobe=2).collect()
    )
    assert after == before
