"""Frozen k-means model lifecycle (VERDICT r11 #4) + the struct-
election scale proof (VERDICT r11 weak #1).

The clusterer was the last trained-artifact family without a save/load
path; these tests pin (a) frozen-assignment == trainer equality for
both levels, (b) the versioned round trip through the indexstore
manifest incl. seq addressing, and (c) the election's freedom from the
old ``dist·keymul`` int64 ceiling — a value domain where ANY modulus
multiplier would overflow now hashes against DuckDB."""

import duckdb
import pytest

from ksql_streams_from_schema_converter_spark.operators.clustering import (
    assign_frozen,
    kmeans_fit,
    kmeans_fixed_point,
    kmeans_oracle_sql,
    kmeans_two_level,
    kmeans_two_level_fit,
    load_kmeans_model,
    save_kmeans_model,
    semdedup_frozen,
    semdedup_kmeans,
)
from ksql_streams_from_schema_converter_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_assign_frozen_matches_trainer_single(spark):
    """kmeans_fit + assign_frozen reproduces kmeans_fixed_point
    cell-for-cell: the persisted model IS the trainer's final
    centroid table, and the frozen assignment is the trainer's final
    round."""
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    model = kmeans_fit(emb, k=4, n_iter=2)
    assert _rows(assign_frozen(emb, model)) == _rows(
        kmeans_fixed_point(emb, k=4, n_iter=2)
    )


def test_assign_frozen_matches_trainer_two_level(spark):
    """Two-level twin: the model carries fine centroids WITH their
    super-cell routing plus the coarse centroids, so the frozen
    assignment replays the final round's route + in-cell argmin."""
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    model = kmeans_two_level_fit(emb, k=16, kc=4, n_iter=2, nc_iter=2)
    assert _rows(assign_frozen(emb, model)) == _rows(
        kmeans_two_level(emb, k=16, kc=4, n_iter=2, nc_iter=2)
    )


def test_semdedup_frozen_matches_in_query(spark):
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    model = kmeans_fit(emb, k=4, n_iter=2)
    assert _rows(semdedup_frozen(emb, model)) == _rows(
        semdedup_kmeans(emb, k=4, n_iter=2)
    )


def test_kmeans_model_roundtrip_and_seq(spark, tmp_path):
    """Versioned round trip: save km0, save a DEGENERATE km1 (one
    centroid), load seq=0 back losslessly; loading latest returns the
    degenerate model — so seq addressing is load-bearing exactly like
    the tokenizer lifecycles."""
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    store = str(tmp_path / "km_store")
    model = kmeans_two_level_fit(emb, k=8, kc=3, n_iter=2, nc_iter=2)
    save_kmeans_model(spark, store, model, seq=0)
    degenerate = kmeans_fit(emb, k=1, n_iter=1)
    save_kmeans_model(spark, store, degenerate, seq=1)
    loaded, label, two_level = load_kmeans_model(spark, store, seq=0)
    assert label == "km0"
    # the manifest entry records the model kind at save time, so the
    # load returns the branch flag with no probe action (ADVICE r12)
    assert two_level is True
    assert _rows(loaded) == _rows(model)
    latest, latest_label, latest_tl = load_kmeans_model(spark, store)
    assert latest_label == "km1"
    assert latest_tl is False
    assert latest.where("level = 'f'").count() == 1
    # frozen scoring under the loaded model == scoring under the
    # in-memory one (the lossless-artifact contract); the
    # manifest-known flag must select the same branch the probe does
    assert _rows(assign_frozen(emb, loaded, two_level=two_level)) == _rows(
        assign_frozen(emb, model)
    )


def test_load_kmeans_model_empty_store_raises(spark, tmp_path):
    with pytest.raises(ValueError):
        load_kmeans_model(spark, str(tmp_path / "nope"))


def test_kmeans_struct_election_huge_value_domain(spark):
    """The election's overflow-freedom proof: coordinates near ±1000
    quantize to ±10⁹, so a 2-dim squared distance reaches ~8·10¹⁸ —
    within int64, but the OLD ``dist·keymul + cluster`` key could not
    multiply it by ANY keymul ≥ 2 without leaving int64.  The struct
    election hashes against DuckDB on exactly that domain."""
    rows = [
        (0, [1000.0, -1000.0]),
        (1, [-1000.0, 1000.0]),
        (2, [999.5, 999.5]),
        (3, [-999.5, -999.5]),
        (4, [1000.0, -999.0]),
        (5, [0.0, 0.0]),
        (6, [123.456, -654.321]),
        (7, [-1000.0, 999.0]),
    ]
    emb = _emb(spark, rows)
    got = _rows(kmeans_fixed_point(emb, k=3, n_iter=2))
    values = ", ".join(f"({i}, [{a!r}, {b!r}]::DOUBLE[])" for i, (a, b) in rows)
    con = duckdb.connect()
    want = sorted(
        tuple(x)
        for x in con.execute(
            kmeans_oracle_sql(
                k=3,
                n_iter=2,
                dims=2,
                # huge-coordinate synthetic corpus, inline
            ).replace(
                "SELECT vec_id, embedding FROM embeddings",
                "SELECT * FROM (VALUES "
                + values
                + ") AS t(vec_id, embedding)",
            )
        ).fetchall()
    )
    assert got == want
    # the domain genuinely exceeds what the old modulus key could
    # encode: dist * KM_KEYMUL (the former default, 8) leaves int64
    assert max(d for _, _, d in got) * 8 > 2**63


def test_kmeans_huge_k_runs_past_old_ceiling(spark):
    """k above the old ~9·10⁴ ceiling RUNS under the election (the
    modulus key would have needed keymul > k, overflowing int64 at
    dist ≈ 10¹⁴): 100_008 points, k = 100_000 — every point with
    pid < k seeds its own cluster, so the assignment must produce
    dist = 0 for the seeds and a valid in-range cluster id for the
    rest."""
    n, k = 100_008, 100_000
    emb = spark.range(n).selectExpr(
        "id AS vec_id",
        "array(CAST(id % 2003 AS DOUBLE) / 7.0,"
        " CAST((id * 13) % 1999 AS DOUBLE) / 11.0) AS embedding",
    )
    from ksql_streams_from_schema_converter_spark.operators.clustering import (
        kmeans_two_level_fit,
    )

    model = kmeans_two_level_fit(emb, k=k, kc=316, n_iter=1, nc_iter=1)
    out = assign_frozen(emb, model)
    agg = out.selectExpr(
        "count(*) AS n",
        "max(cluster) AS mx",
        "sum(CASE WHEN dist = 0 THEN 1 ELSE 0 END) AS zeros",
    ).head()
    assert agg["n"] == n
    assert agg["mx"] >= 90_000  # clusters genuinely above the old bound
    # every seed point is its own centroid (n_iter=1: centroids ARE
    # the first k points), so >= k zero-distance assignments exist
    assert agg["zeros"] >= k


def test_kmeans_warm_start_continues_from_init(spark):
    """kmeans_fit(init=model, n_iter=p+1) == running the cold trainer
    p more rounds over the same corpus: warm-starting from the
    persisted state is exactly a continuation, never a re-seed."""
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    cold3 = kmeans_fit(emb, k=4, n_iter=3)
    m1 = kmeans_fit(emb, k=4, n_iter=2)
    warm = kmeans_fit(emb, n_iter=2, init=m1)
    assert _rows(warm) == _rows(cold3)
    # and a warm start over a DIFFERENT corpus uses the init clusters,
    # not fresh seeds: cluster ids survive even where new data has
    # lower ids than any seed
    half = emb.where("vec_id % 2 = 1")
    w2 = kmeans_fit(half, n_iter=1, init=m1)
    assert _rows(w2) == _rows(m1)  # n_iter=1: zero updates, model passes through


def test_semdedup_batch_verdicts_under_two_level_model(spark):
    """semdedup_batch_verdicts routes through a TWO-LEVEL frozen model
    exactly like assign_frozen does (the auto-detected coarse path):
    batch verdicts under the two-level model equal the single-batch
    SemDeDup prune under the same frozen assignment."""
    from ksql_streams_from_schema_converter_spark.operators.clustering import (
        semdedup_batch_verdicts,
        semdedup_frozen,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    model = kmeans_two_level_fit(emb, k=8, kc=3, n_iter=2, nc_iter=2)
    verdicts, keepers = semdedup_batch_verdicts(emb, model, stored=None)
    assert _rows(verdicts) == _rows(semdedup_frozen(emb, model))
    kept = {r[0] for r in keepers.select("vec_id").collect()}
    assert kept == {
        r.vec_id for r in verdicts.where("keep").select("vec_id").collect()
    }


def test_kmeans_two_level_fit_warm_start(spark, tmp_path):
    """Two-level warm start (VERDICT r12 #3): continuing training from
    a LOADED model's fine centroids equals continuing from the
    in-memory model (lossless round trip into the recurrence), the
    cluster set is the init's (k ignored), and the warm model differs
    from a cold full-corpus fit — so the init is load-bearing."""
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    half = emb.where(F.col("vec_id") % 2 == 0)
    cold = kmeans_two_level_fit(half, k=8, kc=3, n_iter=2, nc_iter=2)
    store = str(tmp_path / "km2w")
    save_kmeans_model(spark, store, cold, seq=0)
    m0, label, two_level = load_kmeans_model(spark, store, seq=0)
    assert label == "km0" and two_level
    warm_loaded = kmeans_two_level_fit(emb, kc=3, n_iter=2, nc_iter=2, init=m0)
    warm_mem = kmeans_two_level_fit(emb, kc=3, n_iter=2, nc_iter=2, init=cold)
    assert _rows(warm_loaded) == _rows(warm_mem)
    # k ignored under init: the fine cluster set is the init's
    assert (
        warm_loaded.where("level = 'f'").count()
        == cold.where("level = 'f'").count()
    )
    cold_full = kmeans_two_level_fit(emb, k=8, kc=3, n_iter=2, nc_iter=2)
    assert _rows(warm_loaded) != _rows(cold_full)
