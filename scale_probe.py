"""Scale-probe harness (VERDICT r5 #1): measure, don't argue.

SCALE.md states the 100-TB scaling arguments in prose; this harness
proves them empirically on the heavy operator families by running each
at 1x / 4x / 16x the base row count and fitting the scaling exponent
``e`` in ``t = a * n^e`` (least squares over log-log points).  A keyed
equi-join/agg pipeline should land near e = 1 (linear in rows, the
shape that survives a 1000-executor scale-up); anything approaching
e = 2 is an all-pairs blowup the prose missed.

Replica construction (deterministic, seedless):

- Every fact table is replicated k times with all key AND foreign-key
  columns shifted by ``i * SPACING`` per replica, so referential
  integrity holds within each replica and key spaces never collide
  (SPACING = 4e9 also clears merge_into_orders' +1e9 synthetic-insert
  band).
- ``documents.text`` gets every token suffixed with ``_r{i}`` via one
  regexp_replace: token counts, document lengths, and per-replica
  shingle statistics are identical to the base corpus, but replica
  shingle universes are DISJOINT — so near-dup structure scales
  linearly (each replica contains one copy of the corpus's planted
  duplicates' base docs) instead of every document acquiring k-1
  artificial twins, which would make candidate generation quadratic
  by construction and measure the generator, not the engine.
- The same transform is applied at k=1 (replica 0), so x1 and x16 run
  byte-comparable per-document content.
- region/nation are dimensions: copied, not replicated.

Timings follow bench.py methodology (hot warmup, min of 2 full
noop-sink executions).  Per query and scale the formatted plan's
Exchange count and any nested-loop/cartesian nodes are recorded —
plan-shape stability across scales is half the claim (a join that
flips to BroadcastNestedLoopJoin at 16x is a scale bug regardless of
the fitted exponent).

Artifacts: ``SCALE_PROBE.json`` at the repo root;
``tests/test_scale_probe.py`` asserts the committed exponents and plan
shapes and smoke-runs the harness end-to-end at sf0.001.

Run: ``python scale_probe.py`` (env: SCALE_PROBE_BASE_DIR,
SCALE_PROBE_SCALES, SCALE_PROBE_QUERIES, SCALE_PROBE_WORK_DIR).
"""

from __future__ import annotations

import contextlib
import io
import json
import math
import os
import shutil
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ksql_streams_from_schema_converter_spark.sources.parquet import load_table

SPACING = 4_000_000_000
#: replica-construction version — bump to invalidate cached x{k} dirs
#: (markers record it; r10: embeddings rotation added)
_GEN_VERSION = 2
#: x64 of sf0.01 ≈ 0.64 SF — big enough that the local[32] cores
#: saturate and fixed per-query overhead (~1.5 s of job scheduling at
#: x1) stops dominating; the x16→x64 marginal exponent is the
#: overhead-free scaling signal
DEFAULT_SCALES = (1, 4, 16, 64)
DEFAULT_QUERIES = (
    "dedup_ngram_jaccard",
    "dedup_jaccard_prefix_filtered",
    "entity_resolution_golden",
    "pretrain_pipeline_v2",
    "pagerank_supplier_customer",
    "merge_into_orders",
    # the gate's old/new split is at doc_id 10000, so at scale k the
    # indexed base stays replica-0-sized while the refresh batch grows
    # ~k — this measures refresh cost against BATCH size (shingling +
    # the postings join), which must stay ~linear in the batch
    "dedup_incremental_index",
    # map-side features + two 256-bucket partial aggs + broadcast
    # weight join — should be the most linear family of all
    "dsir_importance_selection",
    # one shuffle keyed by k-gram + per-doc islands: the replicas'
    # disjoint token universes keep the duplicated-gram structure
    # per-replica, so the gram-group sizes stay constant while the
    # corpus grows — the linear claim under test
    "dedup_span_exact_substr",
    # pair extraction is the data-sized stage (per-order self-join,
    # <=21 pairs/order); the MM iteration runs on the constant
    # 25-brand matrix — cost must track pair count, not rounds
    "bradley_terry_brand_ratings",
    # VERDICT r9 #5 — the tombstone axis (SPECIAL: fixed index, growing
    # tombstone list; see _setup_tombstone_axis)
    "incremental_tombstone_axis",
    # build+refresh+search+monolithic-control per run: index build
    # dominates; search must partition-prune regardless of scale
    "ann_incremental_index",
    # VERDICT r6 #1 — the OTHER axis of incremental dedup: the STORED
    # base grows with scale while the refresh batch stays fixed at 50
    # docs, so this measures refresh cost against INDEX size.  The
    # kp-partition prune + pushed key IN-list must keep the stored-
    # side read batch-proportional; exponent ~0 is the target (the
    # only base-proportional residue is parquet footer/stat pruning
    # work, which is metadata-sized)
    "incremental_refresh_base_axis",
    # VERDICT r7 #7 — the compaction path at scale: base + 8 micro-
    # refresh ingests compacted into one (untimed), then a fixed-batch
    # refresh is timed against the compacted index.  Post-compaction
    # refresh must cost single-ingest levels and stay flat in the
    # stored-base axis
    "incremental_compacted_refresh",
    # VERDICT r9 #5 — perceptual-hash banding at scale: replica
    # suffixing keeps payloads replica-disjoint, so the planted near/
    # exact pairs stay replica-0-sized while the corpus grows; the
    # residual cost driver is the LSH bucket trade itself — random
    # 16-bit band values collide at ~N^2/2^16 per band, which at the
    # probe's x64 (~32k docs) is still corpus-comparable.  The fit
    # proves the banded join tracks that candidate budget, not an
    # all-pairs N^2
    "multimodal_near_dup",
    # VERDICT r9 #5 — the wide-key (2-column ~124-bit) span variant
    # must scale exactly like the 62-bit one: same single gram-keyed
    # shuffle, the second Horner pair is pure map-side arithmetic
    "dedup_span_exact_substr_wide",
    # r10 — unigram-LM Viterbi hard-EM: ONE corpus scan builds the
    # capped word table (suffixed replicas multiply distinct words
    # until the cap bites), then rounds run on bounded state — cost
    # must track the corpus scan, never the rounds
    "unigram_lm_tokenizer",
    # VERDICT r8 #1 — corpus-wide line dedup under GUARANTEED key skew:
    # replica token-suffixing keeps content lines replica-disjoint
    # (group sizes constant) but blank lines are identical across
    # replicas, so the hottest key grows ~k by construction.  The
    # min(struct) partial-agg + join-back formulation must absorb it
    # map-side and stay ~linear; the old fingerprint-partitioned
    # row_number window would concentrate the blank-line key on one
    # task
    "corpus_line_dedup",
    # r10 — SemDeDup with k ∝ corpus (see _semdedup_scaled_k)
    "semdedup_scaled_k",
    # r11 — same k ∝ corpus recipe through the two-level assignment
    # (VERDICT r10 #1); the marginal exponent must drop decisively
    # below the single-level's 1.30 (see _semdedup_two_level_scaled_k)
    "semdedup_two_level_scaled_k",
    # r12 (VERDICT r11 #5) — the COMPOSED v7 funnel end-to-end: LM
    # gate -> exact NTILE -> two-level SemDeDup -> WordPiece train +
    # encode, with its checkpoints and cmap reuse; the stages are
    # probed individually above, this pins the composition
    "pretrain_pipeline_v7",
    # r12 (VERDICT r11 #1) — the struct-election datapoint ABOVE the
    # old dist*keymul int64 ceiling: k = min(n, 100_000) grows with
    # the replica corpus and crosses 9e4 at x64 (see
    # _kmeans_scaled_k_election)
    "kmeans_scaled_k_election",
    # r13 (VERDICT r12 #5) — streaming SemDeDup's keeper-STORE axis:
    # fixed 50-vector batch, committed keeper store growing with scale.
    # Under a FIXED k=4 model every stored keeper in the batch's
    # cluster is a candidate, so the per-batch marginal is ~linear in
    # the store BY CONSTRUCTION — the documented worst case...
    "semdedup_store_axis_fixed_k",
    # ...and the documented mitigation, measured: k ∝ store keeps
    # keepers-per-cluster bounded (~250), the store is PARTITIONED by
    # cluster and the batch's <=50 cluster ids are pushed down as a
    # partition filter (the kp-pushdown discipline), so the stored-side
    # read is batch-proportional and the marginal must read ~flat
    "semdedup_store_axis_scaled_k",
)
#: key / FK columns shifted per replica (referential integrity holds
#: within a replica; replicas never cross-reference)
OFFSET_COLS: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIM_TABLES = ("region", "nation")


def _write_single_parquet(df: DataFrame, out_dir: str, table: str) -> None:
    """Write ``df`` as ``out_dir/<table>.parquet`` — a single FILE, the
    same layout as /root/testdata (streaming sources pathGlobFilter on
    the exact file name, so a directory would be invisible to them)."""
    import glob as _glob

    tmp = os.path.join(out_dir, f"__tmp_{table}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = _glob.glob(os.path.join(tmp, "part-*.parquet"))
    assert len(part) == 1, part
    shutil.move(part[0], os.path.join(out_dir, f"{table}.parquet"))
    shutil.rmtree(tmp)


def generate_scaled_dir(
    spark: SparkSession, base_dir: str, out_dir: str, k: int
) -> dict[str, int]:
    """Materialize a k-replica copy of ``base_dir`` under ``out_dir``;
    returns per-table row counts. Idempotent: skips if already built
    (marker file records base_dir + k)."""
    marker = os.path.join(out_dir, "__scale_probe_marker.json")
    if os.path.exists(marker):
        with open(marker) as fh:
            m = json.load(fh)
        if (
            m.get("base_dir") == base_dir
            and m.get("k") == k
            and m.get("gen") == _GEN_VERSION
        ):
            return m["rows"]
    os.makedirs(out_dir, exist_ok=True)

    def _written_rows(t: str) -> int:
        # the count is free in the written file's footer — re-running
        # df.count() would re-execute the whole k-way union + regexp
        # transform a second time (review r6)
        import pyarrow.parquet as pq

        return pq.ParquetFile(os.path.join(out_dir, f"{t}.parquet")).metadata.num_rows

    rows: dict[str, int] = {}
    for t in DIM_TABLES:
        _write_single_parquet(load_table(spark, base_dir, t), out_dir, t)
        rows[t] = _written_rows(t)
    for t, key_cols in OFFSET_COLS.items():
        base = load_table(spark, base_dir, t)
        reps = []
        for i in range(k):
            r = base
            for c in key_cols:
                r = r.withColumn(c, (F.col(c) + F.lit(i * SPACING)).cast("long"))
            if t == "documents":
                # uniquify every token per replica: shingle universes
                # become disjoint across replicas while per-replica
                # token/shingle statistics stay identical to the base
                r = r.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", f"$1_r{i}")
                )
            if t == "embeddings":
                # the vector twin of token suffixing: circularly rotate
                # each replica's vectors by i positions — an ISOMETRY
                # (distances/cosines within a replica are untouched, so
                # per-replica near-dup structure equals the base), but
                # cross-replica cosines decorrelate (rot(v, i) vs
                # rot(v, j) of a random vector is itself ~random), so
                # a vector does NOT acquire k-1 exact twins and pair
                # joins measure the engine, not the generator
                rot = i % 64
                if rot:
                    r = r.withColumn(
                        "embedding",
                        F.expr(
                            f"concat(slice(embedding, {rot + 1}, {64 - rot}), "
                            f"slice(embedding, 1, {rot}))"
                        ),
                    )
            reps.append(r)
        _write_single_parquet(reduce(DataFrame.unionByName, reps), out_dir, t)
        rows[t] = _written_rows(t)
    with open(marker, "w") as fh:
        json.dump(
            {"base_dir": base_dir, "k": k, "gen": _GEN_VERSION, "rows": rows},
            fh,
        )
    return rows


def _probe_index_dir(sf_dir: str) -> str:
    # versioned so a layout change (partitioning, manifest format)
    # invalidates a stale on-disk index from an earlier probe run
    return os.path.join(sf_dir, "__lsh_probe_index_v1")


def _setup_refresh_base_axis(spark: SparkSession, sf_dir: str) -> None:
    """UNTIMED setup for the base-axis family: index the whole scaled
    documents table once per scale dir (idempotent — the manifest
    commit marks completion)."""
    from ksql_streams_from_schema_converter_spark.operators.incremental import (
        build_lsh_index,
    )
    from ksql_streams_from_schema_converter_spark.operators.indexstore import (
        committed_labels,
    )

    idx = _probe_index_dir(sf_dir)
    if "base" in committed_labels(idx):
        return
    build_lsh_index(load_table(spark, sf_dir, "documents"), idx)
    # pre-commit the 'probe' ingest once, UNTIMED (ADVICE r8): the
    # timed body overwrites this label, so with it already committed
    # every repetition performs the identical label-scoped overwrite
    # against the identical committed set — repetition 1 no longer
    # differs from 2+ by a first-time directory create + manifest grow
    _refresh_base_axis(spark, sf_dir)


def _refresh_base_axis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMED body: refresh a FIXED 50-doc batch against the scale-k
    stored index.  The batch is replica-0's first 50 docs re-keyed
    above every stored id — byte-identical content at every scale
    (replica 0 is the same transform at every k), so its shingles,
    keys, and bucket matches are constant; only the STORED side grows.
    The stable 'probe' label makes re-runs overwrite their own ingest
    (idempotent replay), and full_output=False keeps the result
    batch-sized — the steady-state refresh-loop shape."""
    from pyspark.sql import functions as F  # noqa: F811 (closure import)

    from ksql_streams_from_schema_converter_spark.operators.incremental import (
        refresh_against_index,
    )

    batch = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 50)
        .withColumn("doc_id", F.col("doc_id") + F.lit(100 * SPACING))
    )
    return refresh_against_index(
        spark,
        _probe_index_dir(sf_dir),
        batch,
        ingest_label="probe",
        full_output=False,
    )


def _compact_index_dir(sf_dir: str) -> str:
    return os.path.join(sf_dir, "__lsh_compact_probe_index_v1")


def _setup_compacted_refresh(spark: SparkSession, sf_dir: str) -> None:
    """UNTIMED setup for the compaction family (VERDICT r7 #7): build
    the scale-k base index, run EIGHT micro-refreshes (the ingest-per-
    batch accumulation a real refresh cadence produces), then compact
    everything into one ingest.  Idempotent — a committed compaction
    label marks completion."""
    from pyspark.sql import functions as F  # noqa: F811 (closure import)

    from ksql_streams_from_schema_converter_spark.operators.incremental import (
        build_lsh_index,
        compact_lsh_index,
        refresh_against_index,
    )
    from ksql_streams_from_schema_converter_spark.operators.indexstore import (
        committed_labels,
    )

    idx = _compact_index_dir(sf_dir)
    if any(lb.startswith("c") for lb in committed_labels(idx)):
        return
    docs = load_table(spark, sf_dir, "documents")
    build_lsh_index(docs, idx)
    for j in range(8):
        batch = docs.where(F.col("doc_id") < 20).withColumn(
            "doc_id", F.col("doc_id") + F.lit(100 * SPACING + j * 1000)
        )
        refresh_against_index(
            spark, idx, batch, ingest_label=f"p{j}", full_output=False
        )
    compact_lsh_index(spark, idx)
    # pre-commit the timed body's 'probe' label once, untimed (ADVICE
    # r8): repetitions then all see the same committed ingest set
    # (compacted + probe) and perform the same overwrite, instead of
    # the first repetition refreshing a probe-less index
    _compacted_refresh(spark, sf_dir)


def _compacted_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMED body: one more fixed-batch refresh against the COMPACTED
    index — the steady-state cost after compaction folded 9 ingest
    directories (base + 8 micro-refreshes) into one.  The claim under
    test: post-compaction refresh cost equals single-ingest refresh
    cost and stays flat in the stored-base axis (the 9-way directory
    accumulation is gone; tests/test_indexstore.py asserts the
    file-count drop and search/verdict equivalence directly)."""
    from pyspark.sql import functions as F  # noqa: F811 (closure import)

    from ksql_streams_from_schema_converter_spark.operators.incremental import (
        refresh_against_index,
    )

    batch = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 50)
        .withColumn("doc_id", F.col("doc_id") + F.lit(200 * SPACING))
    )
    return refresh_against_index(
        spark,
        _compact_index_dir(sf_dir),
        batch,
        ingest_label="probe",
        full_output=False,
    )


def _tombstone_index_dir(sf_dir: str) -> str:
    return os.path.join(sf_dir, "__lsh_tombstone_probe_index_v1")


def _setup_tombstone_axis(spark: SparkSession, sf_dir: str) -> None:
    """UNTIMED setup for the TOMBSTONE axis (VERDICT r9 #5): the index
    is FIXED (replica 0 only — byte-identical content at every scale)
    while the tombstone list grows ~200 ids per scale unit, so the
    timed refresh isolates retraction overhead: the broadcast anti-join
    against a k-proportional (but KB-sized at any real k) id list.
    Retracted ids need not exist as documents — the cost driver is the
    tombstone set itself."""
    from ksql_streams_from_schema_converter_spark.operators.incremental import (
        build_lsh_index,
        retract_from_index,
    )
    from ksql_streams_from_schema_converter_spark.operators.indexstore import (
        committed_labels,
    )

    idx = _tombstone_index_dir(sf_dir)
    if "t_probe" in committed_labels(idx):
        return
    k = int(os.path.basename(sf_dir).lstrip("x"))
    base = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < SPACING
    )
    build_lsh_index(base, idx)
    retract_from_index(spark, idx, range(200 * k), label="t_probe")
    # pre-commit the timed body's 'probe' label once, untimed (ADVICE
    # r8 repetition parity)
    _tombstone_axis_refresh(spark, sf_dir)


def _tombstone_axis_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMED body: the same fixed 50-doc refresh as the base axis, but
    against the tombstoned index — cost must stay FLAT in tombstone
    count (the subtract_tombstones broadcast anti-join sits above the
    pushed-down stored scan; exponent ~0 is the claim)."""
    from ksql_streams_from_schema_converter_spark.operators.incremental import (
        refresh_against_index,
    )

    batch = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 50)
        .withColumn("doc_id", F.col("doc_id") + F.lit(300 * SPACING))
    )
    return refresh_against_index(
        spark,
        _tombstone_index_dir(sf_dir),
        batch,
        ingest_label="probe",
        full_output=False,
    )


def _noop_setup(spark: SparkSession, sf_dir: str) -> None:
    return None


def _sem_store_dir(sf_dir: str, variant: str) -> str:
    return os.path.join(sf_dir, f"__sem_store_axis_{variant}_v1")


def _keeper_rows(emb: DataFrame, model: DataFrame, two_level: bool) -> DataFrame:
    """Committed-keeper rows ``(vec_id, cluster, q, nq)`` for every
    vector of ``emb`` under the frozen model — the store schema
    ``semdedup_batch_verdicts`` consumes."""
    from ksql_streams_from_schema_converter_spark.operators.clustering import (
        assign_frozen,
        quantize_points,
    )

    asg = assign_frozen(emb, model, two_level=two_level)
    return (
        asg.join(quantize_points(emb), "pid")
        .withColumn(
            "nq",
            F.aggregate(
                F.expr("transform(q, x -> x * x)"),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            ),
        )
        .select(F.col("pid").alias("vec_id"), "cluster", "q", "nq")
    )


def _probe_batch_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FIXED 50-vector batch: replica-0's first vectors re-keyed
    above every stored id — byte-identical content at every scale."""
    return (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .where(F.col("vec_id") < 50)
        .withColumn("vec_id", F.col("vec_id") + F.lit(100 * SPACING))
    )


def _setup_sem_store_axis_fixed(spark: SparkSession, sf_dir: str) -> None:
    """UNTIMED setup, keeper-store axis / FIXED k=4 (VERDICT r12 #5):
    the frozen model trains on replica 0 only (byte-identical at every
    scale, so the clustering is constant), then the WHOLE scale-k
    embeddings table commits as the keeper store — stored keepers per
    cluster grow ~k while the timed batch stays fixed."""
    from ksql_streams_from_schema_converter_spark.operators.clustering import (
        kmeans_fit,
        load_kmeans_model,
        save_kmeans_model,
    )
    from ksql_streams_from_schema_converter_spark.operators.indexstore import (
        commit_ingest,
        committed_labels,
        ingest_paths,
    )

    store = _sem_store_dir(sf_dir, "k4")
    if "keep_base" in committed_labels(store):
        return
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.where(F.col("vec_id") < SPACING)  # replica 0
    save_kmeans_model(spark, store, kmeans_fit(base, k=4, n_iter=2), seq=0)
    m0, _, tl = load_kmeans_model(spark, store, seq=0)
    path = ingest_paths(store, "sem_keepers", ["keep_base"])[0]
    _keeper_rows(emb, m0, tl).write.mode("overwrite").parquet(path)
    commit_ingest(store, "keep_base", kind="semkeep", seq=0)
    # pre-run the timed body once, untimed (ADVICE r8 repetition parity)
    _sem_store_axis_fixed(spark, sf_dir)


def _sem_store_axis_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMED body: one streaming-SemDeDup batch (fixed 50 vectors)
    against the scale-k keeper store under the frozen k=4 model — the
    exact per-micro-batch work of the streaming_semdedup gate.  With
    only 4 clusters every stored keeper in a batch cluster is a cosine
    candidate, so this marginal is ~LINEAR in the store by
    construction — the worst case the scaled-k twin mitigates."""
    from ksql_streams_from_schema_converter_spark.operators.clustering import (
        load_kmeans_model,
        semdedup_batch_verdicts,
    )
    from ksql_streams_from_schema_converter_spark.operators.indexstore import (
        read_ingests,
    )

    store = _sem_store_dir(sf_dir, "k4")
    model, _, tl = load_kmeans_model(spark, store, seq=0)
    stored = read_ingests(spark, store, "sem_keepers", ["keep_base"]).select(
        "vec_id", "cluster", "q", "nq"
    )
    verdicts, _ = semdedup_batch_verdicts(
        _probe_batch_emb(spark, sf_dir), model, stored, two_level=tl
    )
    return verdicts


def _setup_sem_store_axis_scaled(spark: SparkSession, sf_dir: str) -> None:
    """UNTIMED setup, keeper-store axis / k ∝ STORE (the mitigation):
    a two-level model with k = n/250 trains on the scale-k table, and
    the keeper store is written PARTITIONED BY cluster so a batch's
    cluster set prunes the stored read to ~250 keepers per batch
    cluster regardless of total store size."""
    import math as _math

    import pyarrow.parquet as pq

    from ksql_streams_from_schema_converter_spark.operators.clustering import (
        kmeans_two_level_fit,
        load_kmeans_model,
        save_kmeans_model,
    )
    from ksql_streams_from_schema_converter_spark.operators.indexstore import (
        commit_ingest,
        committed_labels,
        ingest_paths,
    )

    store = _sem_store_dir(sf_dir, "scaledk")
    if "keep_base" in committed_labels(store):
        return
    n = pq.ParquetFile(
        os.path.join(sf_dir, "embeddings.parquet")
    ).metadata.num_rows
    k = max(4, n // 250)
    kc = max(2, _math.isqrt(k))
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    save_kmeans_model(
        spark,
        store,
        kmeans_two_level_fit(emb, k=k, kc=kc, n_iter=2, nc_iter=2),
        seq=0,
    )
    m0, _, tl = load_kmeans_model(spark, store, seq=0)
    path = ingest_paths(store, "sem_keepers", ["keep_base"])[0]
    _keeper_rows(emb, m0, tl).write.mode("overwrite").partitionBy(
        "cluster"
    ).parquet(path)
    commit_ingest(store, "keep_base", kind="semkeep", seq=0)
    _sem_store_axis_scaled(spark, sf_dir)


def _sem_store_axis_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMED body: the same fixed batch against the k ∝ store keeper
    store.  The batch assigns once (bounded — 50 rows), its <=50
    distinct cluster ids are collected (the kp-pushdown bounded-collect
    discipline) and pushed as a PARTITION filter on the cluster-
    partitioned store, so the stored-side read and the cosine join are
    batch-proportional: keepers-per-cluster ≈ 250 by construction.
    The marginal must read ~flat — this is the documented mitigation
    for the fixed-k family's linear marginal."""
    from ksql_streams_from_schema_converter_spark.operators.clustering import (
        assign_frozen,
        load_kmeans_model,
        semdedup_batch_verdicts,
    )
    from ksql_streams_from_schema_converter_spark.operators.indexstore import (
        read_ingests,
    )

    store = _sem_store_dir(sf_dir, "scaledk")
    model, _, tl = load_kmeans_model(spark, store, seq=0)
    batch = _probe_batch_emb(spark, sf_dir)
    clusters = [
        r["cluster"]
        for r in assign_frozen(batch, model, two_level=tl)
        .select("cluster")
        .distinct()
        .collect()
    ]
    stored = (
        read_ingests(spark, store, "sem_keepers", ["keep_base"])
        .where(F.col("cluster").isin(clusters))
        .select(
            "vec_id", F.col("cluster").cast("bigint").alias("cluster"), "q", "nq"
        )
    )
    verdicts, _ = semdedup_batch_verdicts(batch, model, stored, two_level=tl)
    return verdicts


def _semdedup_scaled_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup at scale THE WAY THE PAPER RUNS IT: cluster count
    grows with the corpus (Abbas et al. use 50k clusters on LAION) so
    the expected cluster size — and with it the per-cluster pair join
    — stays bounded.  k = n/250 (floor 4; the struct election has no k bound); the
    fit proves the Σ|cᵢ|² pair budget tracks n, not n², once k scales.
    The fixed-k gated query (semdedup_kmeans, k=4) is the correctness
    surface; THIS is the 100 TB configuration."""
    import pyarrow.parquet as pq

    from ksql_streams_from_schema_converter_spark.operators.clustering import (
        semdedup_kmeans,
    )

    n = pq.ParquetFile(
        os.path.join(sf_dir, "embeddings.parquet")
    ).metadata.num_rows
    k = max(4, min(200, n // 250))
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return semdedup_kmeans(emb, k=k, n_iter=2)


def _semdedup_two_level_scaled_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same k = n/250 paper recipe through the TWO-LEVEL
    assignment (VERDICT r10 #1): coarse Lloyd over the k centroids
    into kc = ⌈√k⌉ super-cells, point routing to the nearest non-empty
    cell, exact argmin only within it — n·(kc + k/kc) flops per round
    instead of the single-level's n·k.  Same prune stage, same pair
    budget Σ|cᵢ|²; the delta this family must show vs semdedup_scaled_k
    is the assignment term's marginal exponent dropping from 1.30
    toward linear."""
    import math as _math

    import pyarrow.parquet as pq

    from ksql_streams_from_schema_converter_spark.operators.clustering import (
        semdedup_two_level,
    )

    n = pq.ParquetFile(
        os.path.join(sf_dir, "embeddings.parquet")
    ).metadata.num_rows
    k = max(4, min(200, n // 250))
    kc = max(2, _math.isqrt(k))
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return semdedup_two_level(emb, k=k, kc=kc, n_iter=2, nc_iter=2)


def _kmeans_scaled_k_election(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The struct-election scale proof (VERDICT r11 #1): two-level
    Lloyd with k = min(n, 100_000) — at x64 (~320k vectors) k reaches
    100_000, ABOVE the ~9·10⁴ ceiling where the retired
    ``dist·keymul + cluster`` modulus key left int64 (quantized
    64-dim dist ≈ 2.6·10¹⁴ times any keymul > k overflows).  One
    assignment round (n_iter=1, nc_iter=1): the cost model is
    n·(kc + k/kc) routing + in-cell argmin, and the family fit proves
    it stays near-linear in n while k saturates at the cap — the
    regime the election exists for."""
    import math as _math

    import pyarrow.parquet as pq

    from ksql_streams_from_schema_converter_spark.operators.clustering import (
        kmeans_two_level,
    )

    n = pq.ParquetFile(
        os.path.join(sf_dir, "embeddings.parquet")
    ).metadata.num_rows
    k = min(n, 100_000)
    kc = max(2, _math.isqrt(k))
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return kmeans_two_level(emb, k=k, kc=kc, n_iter=1, nc_iter=1)


#: probe families that are not WORKLOAD queries: name -> (untimed
#: per-scale setup, timed query body)
SPECIAL_QUERIES = {
    # r10 — SemDeDup with corpus-proportional cluster count (the
    # paper's own scale recipe; embeddings replicas are ROTATED per
    # replica so cross-replica vectors decorrelate — see
    # generate_scaled_dir)
    "semdedup_scaled_k": (_noop_setup, _semdedup_scaled_k),
    # r11 — two-level assignment under the same recipe (VERDICT r10 #1)
    "semdedup_two_level_scaled_k": (_noop_setup, _semdedup_two_level_scaled_k),
    # r12 — the election's above-the-old-ceiling datapoint (VERDICT
    # r11 #1)
    "kmeans_scaled_k_election": (_noop_setup, _kmeans_scaled_k_election),
    "incremental_refresh_base_axis": (
        _setup_refresh_base_axis,
        _refresh_base_axis,
    ),
    "incremental_compacted_refresh": (
        _setup_compacted_refresh,
        _compacted_refresh,
    ),
    # VERDICT r9 #5 — refresh-after-tombstones vs tombstone count
    "incremental_tombstone_axis": (
        _setup_tombstone_axis,
        _tombstone_axis_refresh,
    ),
    # r13 (VERDICT r12 #5) — streaming SemDeDup keeper-store axis:
    # worst case (fixed k) and the measured mitigation (k ∝ store +
    # cluster-partition pushdown)
    "semdedup_store_axis_fixed_k": (
        _setup_sem_store_axis_fixed,
        _sem_store_axis_fixed,
    ),
    "semdedup_store_axis_scaled_k": (
        _setup_sem_store_axis_scaled,
        _sem_store_axis_scaled,
    ),
}


def plan_stats(df: DataFrame) -> dict[str, int]:
    """Operator counts from the formatted (pre-AQE) physical plan."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    return {
        "exchanges": plan.count("Exchange"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        "cartesian_products": plan.count("CartesianProduct"),
        # queries that return an eagerly-materialized result (localCheckpoint /
        # eager_release) explain as a Scan ExistingRDD stub: their REAL plan
        # ran inside the query function, so exchange counts here are
        # meaningless — flagged so the plan-shape guard can fall back to the
        # executed job/stage counts instead of silently asserting nothing
        # (review r6)
        "opaque_result_plan": "ExistingRDD" in plan and plan.count("Exchange") == 0,
    }


def fit_exponent(points: list[tuple[float, float]]) -> float:
    """Least-squares slope of log(t) over log(scale)."""
    xs = [math.log(s) for s, _ in points]
    ys = [math.log(max(t, 1e-3)) for _, t in points]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs)
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom


def driver_maxrss_mb() -> int:
    """The PYTHON driver process's peak RSS so far.  CAVEAT (review
    r6): this is a process-lifetime HIGH-WATER mark, monotone across
    the whole probe — it can only ever attribute growth to the first
    (query, scale) that reaches a new peak.  run_probe therefore runs
    scales in ASCENDING order as the OUTER loop, so every query's x1
    reading is taken before any larger scale has run and a
    scale-proportional collect() still surfaces as x64 > x1."""
    import resource

    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024


def time_query(spark: SparkSession, name: str, sf_dir: str, n_runs: int = 2):
    from ksql_streams_from_schema_converter_spark.workload import WORKLOAD

    if name in SPECIAL_QUERIES:
        fn = SPECIAL_QUERIES[name][1]
    else:
        fn, _ = WORKLOAD[name]
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    runs, stats = [], None
    for i in range(n_runs):
        group = f"probe-{name}-{os.path.basename(sf_dir)}-{i}"
        sc.setJobGroup(group, name)
        try:
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        if stats is None:
            stats = plan_stats(df)
            # executed job/stage counts for the whole query run —
            # checkpoint-proof plan-shape evidence: an eager
            # localCheckpoint hides its upstream plan from explain()
            # but cannot hide the jobs it ran (review r6)
            job_ids = tracker.getJobIdsForGroup(group)
            infos = [tracker.getJobInfo(j) for j in job_ids]
            stats["jobs"] = len(job_ids)
            stats["stages"] = sum(
                len(info.stageIds) for info in infos if info is not None
            )
    stats["driver_maxrss_mb"] = driver_maxrss_mb()
    return min(runs), runs, stats


def run_probe(
    spark: SparkSession,
    base_dir: str,
    work_dir: str,
    scales=DEFAULT_SCALES,
    queries=DEFAULT_QUERIES,
    n_runs: int = 2,
) -> dict:
    scales = tuple(sorted(scales))  # ascending — the maxrss loop order
    dirs: dict[int, str] = {}
    gen_rows: dict[int, dict[str, int]] = {}
    for k in scales:
        d = os.path.join(work_dir, f"x{k}")
        gen_rows[k] = generate_scaled_dir(spark, base_dir, d, k)
        dirs[k] = d
        for name in queries:
            if name in SPECIAL_QUERIES:
                # untimed per-scale setup (e.g. the base-axis index
                # build) — setup cost must not contaminate the fit
                SPECIAL_QUERIES[name][0](spark, d)
    # warm the same paths bench.py warms (JIT, Arrow worker pool)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(100_000).repartition(8).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    out: dict[str, dict] = {
        name: {"sec": {}, "runs": {}, "plan": {}} for name in queries
    }
    # SCALES are the OUTER loop, ascending: driver_maxrss_mb is a
    # process-lifetime high-water mark, so every query's x1 reading
    # must be taken before ANY larger scale has run — with the loops
    # the other way round, query #2's x1 cell would already contain
    # query #1's x64 peak and the memory guard would be vacuous
    # (review r6)
    for k in scales:
        for name in queries:
            best, runs, stats = time_query(spark, name, dirs[k], n_runs)
            rec = out[name]
            rec["sec"][str(k)] = best
            rec["runs"][str(k)] = runs
            rec["plan"][str(k)] = stats
    for name in queries:
        rec = out[name]
        rec["exponent"] = round(
            fit_exponent([(k, rec["sec"][str(k)]) for k in scales]), 3
        )
        if len(scales) >= 2:
            # overhead-free signal: slope between the two LARGEST
            # scales, where fixed per-query cost is amortized away
            k_hi, k_lo = scales[-1], scales[-2]
            rec["marginal_exponent"] = round(
                math.log(
                    max(rec["sec"][str(k_hi)], 1e-3)
                    / max(rec["sec"][str(k_lo)], 1e-3)
                )
                / math.log(k_hi / k_lo),
                3,
            )
    return {
        "base_dir": base_dir,
        "scales": list(scales),
        "rows_x1": gen_rows[scales[0]],
        "methodology": (
            f"min of {n_runs} full noop-sink executions per (query, scale); "
            "exponent = least-squares slope of log(sec) vs log(scale); "
            "replicas are key-shifted + token-suffixed (disjoint shingle "
            "universes) so duplicate structure scales linearly by design"
        ),
        "queries": out,
    }


def main() -> None:
    from ksql_streams_from_schema_converter_spark.session import get_spark

    base_dir = os.environ.get("SCALE_PROBE_BASE_DIR", "/root/testdata/sf0.01")
    work_dir = os.environ.get(
        "SCALE_PROBE_WORK_DIR", "/tmp/spark_graft_scale_probe"
    )
    scales = tuple(
        int(s)
        for s in os.environ.get(
            "SCALE_PROBE_SCALES", ",".join(map(str, DEFAULT_SCALES))
        ).split(",")
    )
    queries = tuple(
        q
        for q in os.environ.get(
            "SCALE_PROBE_QUERIES", ",".join(DEFAULT_QUERIES)
        ).split(",")
        if q
    )
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    result = run_probe(spark, base_dir, work_dir, scales, queries)
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "SCALE_PROBE.json")
    # Merge into the existing record when only a SUBSET of families was
    # run (SCALE_PROBE_QUERIES): each family's fit is independent, so a
    # new family need not re-time the other ~20 — but a partial run
    # must never silently DROP their committed records.  Same scales +
    # base_dir required; set SCALE_PROBE_MERGE=0 to force a fresh file.
    if os.environ.get("SCALE_PROBE_MERGE", "1") != "0" and os.path.exists(path):
        try:
            with open(path) as fh:
                prior = json.load(fh)
        except ValueError:
            prior = None
        if (
            prior
            and prior.get("scales") == result["scales"]
            and prior.get("base_dir") == result["base_dir"]
        ):
            merged = {**prior.get("queries", {}), **result["queries"]}
            result = {**prior, **result, "queries": merged}
            result["merge_note"] = (
                "families measured across separate runs are merged "
                "(each family's sec/runs/plan come from ONE run and its "
                "fit is self-contained; cross-family second-for-second "
                "comparisons across runs carry ambient variance)"
            )
    with open(path, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
    print(
        json.dumps(
            {
                "probe": {
                    n: {"exponent": r["exponent"], "sec": r["sec"]}
                    for n, r in result["queries"].items()
                }
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
