"""Pre-training corpus preparation operators: benchmark decontamination
and fixed-budget sequence packing.

Both are native-DataFrame compositions (no Python UDFs) with exact
integer semantics, so the DuckDB oracle replicates them bit-for-bit.

Scale notes (100 TB corpus, 1000 executors):

* Decontamination joins the corpus's exploded n-grams against the
  *benchmark* n-grams — the benchmark side (eval sets, thousands of
  docs) is tiny, so it broadcasts; the corpus side streams through a
  hash-join probe without shuffling all-pairs. The output is keyed by
  (corpus doc, benchmark doc), aggregated map-side first.
* Sequence packing is the GPT-style concat-then-cut layout: documents
  are concatenated in a deterministic per-shard order and cut every
  ``budget`` tokens (documents may span cuts). One window cumsum per
  shard — shards keep the sort distributed; no global single-partition
  ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import ngrams_from_tokens, tokens


def contamination_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """Count distinct shared word n-grams between every corpus document
    and every benchmark document it overlaps (the standard n-gram
    contamination check run before training on scraped data).

    Output: one row per contaminated (doc, benchmark) pair with the
    number of distinct shared n-grams — downstream policy (drop doc,
    drop span) is the caller's. Only pairs with >=1 shared gram appear.
    """
    # tokens are materialized into a column before the n-gram transform:
    # an embedded split() expression would be re-evaluated per element
    # inside the lambda (O(len²) — see ngrams_from_tokens's note)
    corpus_grams = corpus.select(
        F.col(id_col), tokens(text_col).alias("__t")
    ).select(
        F.col(id_col),
        F.explode(F.array_distinct(ngrams_from_tokens(F.col("__t"), n))).alias("gram"),
    )
    bench_grams = benchmark.select(
        F.col(bench_id_col), tokens(text_col).alias("__t")
    ).select(
        F.col(bench_id_col),
        F.explode(F.array_distinct(ngrams_from_tokens(F.col("__t"), n))).alias("gram"),
    )
    return (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col, bench_id_col)
        .agg(F.count("*").alias("n_shared_ngrams"))
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 256,
    shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every document its place in fixed-token-budget training
    sequences, GPT-style: within a shard, documents are concatenated in
    ``doc_id`` order and the token stream is cut every ``budget`` tokens
    (a document may straddle a cut — ``spans_cut`` marks those).

    Deterministic layout key: ``(shard, seq_in_shard)``. Shard count
    bounds the window sort's parallelism — at 100 TB raise ``shards`` to
    O(cluster cores) so each per-shard sort stays executor-sized.
    """
    n_tok = F.size(tokens(text_col))
    w = Window.partitionBy("shard").orderBy(id_col)
    return (
        docs.select(
            F.col(id_col),
            (F.col(id_col) % shards).cast("bigint").alias("shard"),
            n_tok.cast("bigint").alias("n_tok"),
        )
        .withColumn("cum_tok", F.sum("n_tok").over(w))
        .select(
            id_col,
            "shard",
            "n_tok",
            (F.col("cum_tok") - F.col("n_tok")).alias("tok_offset"),
            F.floor((F.col("cum_tok") - F.col("n_tok")) / budget).alias("seq_in_shard"),
            ((F.col("cum_tok") - F.col("n_tok")) % budget).alias("offset_in_seq"),
            (
                (F.col("n_tok") > 0)
                & (
                    F.floor((F.col("cum_tok") - F.col("n_tok")) / budget)
                    != F.floor((F.col("cum_tok") - 1) / budget)
                )
            ).alias("spans_cut"),
        )
    )
