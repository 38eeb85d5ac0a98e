"""r14 phase breakdowns (guide §1): replicate a gate's internals phase
by phase, bracketing each phase with sequential job-id probes so the
scheduled-job count AND wall-clock of every phase is visible.

Usage: python plans/r14/breakdown.py <which>
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from ksql_streams_from_schema_converter_spark.session import get_spark
from ksql_streams_from_schema_converter_spark.sources.parquet import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("breakdown-r14")
spark.sparkContext.setLogLevel("ERROR")
import bench

bench._warmup(spark, SF)
st = spark.sparkContext.statusTracker()
_n = [0]


def probe() -> int:
    _n[0] += 1
    grp = f"probe-{_n[0]}"
    spark.sparkContext.setJobGroup(grp, grp)
    spark.range(1).count()
    return max(st.getJobIdsForGroup(grp))


class phase:
    def __init__(self, name):
        self.name = name

    def __enter__(self):
        self.j0 = probe()
        self.t0 = time.perf_counter()

    def __exit__(self, *a):
        dt = time.perf_counter() - self.t0
        jobs = probe() - self.j0 - 1
        print(f"PHASE {self.name}: {dt:.3f}s {jobs} jobs", flush=True)


which = sys.argv[1]

if which == "v4":
    from ksql_streams_from_schema_converter_spark.operators.dedup import (
        duplicated_span_removal,
    )
    from ksql_streams_from_schema_converter_spark.operators.pretrain import (
        domain_mixture_allocation,
        dsir_importance_weights,
    )
    from ksql_streams_from_schema_converter_spark.operators.quality import (
        apply_quality_classifier,
        train_quality_perceptron,
    )
    from ksql_streams_from_schema_converter_spark.workload import (
        _quality_weak_label,
        _V3_BUDGET,
    )

    docs = load_table(spark, SF, "documents")
    with phase("span_removal+cleaned (lazy)"):
        clean = duplicated_span_removal(docs, k=8, emit_clean_text=True)
        meta = docs.select("doc_id", "source", "lang")
        cleaned = meta.join(clean, "doc_id")
    with phase("train_quality_perceptron"):
        w = train_quality_perceptron(docs, _quality_weak_label())
    with phase("apply+ckpt verdicts"):
        verdicts = apply_quality_classifier(docs, w).localCheckpoint(eager=True)
    with phase("quality ckpt"):
        quality = cleaned.join(
            verdicts.where("keep").select("doc_id"), "doc_id"
        ).localCheckpoint(eager=True)
    with phase("dsir (lazy)"):
        dsel = dsir_importance_weights(
            quality, F.col("lang") == "en", text_col="clean_text"
        )
    with phase("mixture (lazy)"):
        mix_in = quality.join(
            dsel.where("kept").select("doc_id"), "doc_id"
        ).select("doc_id", "source", "clean_text")
        mix = domain_mixture_allocation(
            mix_in, _V3_BUDGET, text_col="clean_text", domain_col="source"
        )
    with phase("final join + noop"):
        out = (
            cleaned.select("doc_id", "source", "n_removed", "n_kept")
            .join(
                verdicts.select("doc_id", F.col("keep").alias("passed_quality")),
                "doc_id",
                "left",
            )
            .join(
                dsel.select(
                    "doc_id",
                    F.col("score").alias("dsir_score"),
                    F.col("kept").alias("__dk"),
                ),
                "doc_id",
                "left",
            )
            .join(mix.select("doc_id", F.col("kept").alias("__mk")), "doc_id", "left")
        )
        out.write.format("noop").mode("overwrite").save()

elif which == "spearman":
    from ksql_streams_from_schema_converter_spark.operators.quality import (
        _avg_ranks2,
        spearman_rank_moments,
    )
    from ksql_streams_from_schema_converter_spark.operators.text import (
        bigram_backoff_surprisal,
        unigram_surprisal_scores,
    )

    docs = load_table(spark, SF, "documents")
    with phase("x=unigram_surprisal noop"):
        x = unigram_surprisal_scores(docs).select(
            "doc_id", F.col("surprisal").alias("x")
        )
        x.write.format("noop").mode("overwrite").save()
    with phase("y=bigram_backoff noop"):
        y = bigram_backoff_surprisal(docs).select(
            "doc_id", F.col("bpb_milli").alias("y")
        )
        y.write.format("noop").mode("overwrite").save()
    with phase("moments over join (incl x+y recompute)"):
        spearman_rank_moments(x.join(y, "doc_id"), "x", "y").write.format(
            "noop"
        ).mode("overwrite").save()

elif which == "qtrain":
    from ksql_streams_from_schema_converter_spark.operators.quality import (
        labeled_features,
        train_on_features,
        weights_table,
    )
    from ksql_streams_from_schema_converter_spark.workload import _quality_weak_label

    docs = load_table(spark, SF, "documents")
    with phase("labeled_features ckpt (repartition+ckpt)"):
        feats = labeled_features(docs, _quality_weak_label()).repartition(
            8, "doc_id"
        ).localCheckpoint(eager=True)
    with phase("16+1 rounds over ckpt feats"):
        w = train_on_features(feats.drop("__nope", "__nope2"), 16, 256)
    with phase("weights noop"):
        weights_table(spark, w).write.format("noop").mode("overwrite").save()

elif which == "bt":
    from ksql_streams_from_schema_converter_spark.operators.preference import (
        bradley_terry_ratings,
        pairwise_wins,
    )

    li = (
        load_table(spark, SF, "lineitem")
        .join(
            F.broadcast(load_table(spark, SF, "part")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_orderkey", "l_linenumber", "p_brand", "l_extendedprice")
    )
    with phase("pairwise_wins noop"):
        wins = pairwise_wins(
            li, "l_orderkey", "l_linenumber", "p_brand", "l_extendedprice"
        )
        wins.write.format("noop").mode("overwrite").save()
    with phase("bradley_terry_ratings full noop"):
        bradley_terry_ratings(wins, n_iter=6).write.format("noop").mode(
            "overwrite"
        ).save()

elif which == "semk":
    from ksql_streams_from_schema_converter_spark.operators.clustering import (
        _semdedup_prune,
        kmeans_fixed_point,
    )

    emb = load_table(spark, SF, "embeddings")
    with phase("kmeans_fixed_point (k=4,n_iter=2)"):
        asg = kmeans_fixed_point(emb, 4, 2)
    with phase("prune + noop"):
        _semdedup_prune(emb, asg, 92).write.format("noop").mode(
            "overwrite"
        ).save()

elif which == "annret":
    import shutil
    import tempfile

    from ksql_streams_from_schema_converter_spark.operators.ann_index import (
        build_ivf_pq_index,
        refresh_ivf_pq_index,
        retract_from_ann_index,
        search_ivf_pq_index,
    )
    from ksql_streams_from_schema_converter_spark.operators.similarity import (
        PLANTED_OFFSET,
    )
    from ksql_streams_from_schema_converter_spark.workload import (
        _KNN_QUERY_IDS,
        _ann_retraction_verdicts,
    )
    from ksql_streams_from_schema_converter_spark.operators import similarity as S

    emb = load_table(spark, SF, "embeddings")
    corpus = S.planted_corpus(emb, _KNN_QUERY_IDS, copies=5)
    old = corpus.where(F.col("vec_id") % 5 != 3)
    new = corpus.where(F.col("vec_id") % 5 == 3)
    queries = corpus.where(F.col("vec_id").isin(_KNN_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    retracted = [q + j * PLANTED_OFFSET for q in _KNN_QUERY_IDS for j in (4, 5)]
    index_dir = tempfile.mkdtemp(prefix="ivfpq_bd_")
    try:
        with phase("build_ivf_pq_index"):
            cents, books = build_ivf_pq_index(
                old, index_dir, n_cells=16, m=8, ksub=16
            )
        with phase("refresh_ivf_pq_index"):
            refresh_ivf_pq_index(
                spark, index_dir, new, centroids=cents, codebooks=books
            )
        with phase("retract_from_ann_index"):
            retract_from_ann_index(spark, index_dir, retracted)
        with phase("verdicts + noop"):
            _ann_retraction_verdicts(
                spark, index_dir, emb, corpus, queries, retracted
            ).write.format("noop").mode("overwrite").save()
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)

print("DONE")
