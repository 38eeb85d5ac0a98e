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

from .text import ngrams_from_tokens, tokens, word_ngrams


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


def dsir_bucket_weights(counts: DataFrame) -> DataFrame:
    """Centered integer permille bucket affinities from a smoothed
    count table ``(b, ct, cc)`` (see :func:`dsir_importance_weights`
    for the derivation):

        w_b = (ct[b] * TOTAL_C * 1000) div (cc[b] * TOTAL_T) - 1000

    OVERFLOW DISCIPLINE (ADVICE r6, the table_checksum_orders fix
    applied at the same bug class): ``ct * tot_c * 1000`` multiplies a
    per-bucket count by a corpus-wide total — at 100 TB both sides are
    ~corpus-scale, so the BIGINT product wraps (silently, ANSI off)
    around a few-hundred-GB corpus while DuckDB's HUGEINT promotes and
    the gate diverges exactly when it matters.  Both cross-products
    therefore run in DECIMAL(38,0) (good to ~10^38 — ct*tot_c*1000 for
    a 100-TB corpus of ~10^13 bigrams tops out near 10^29) and the
    quotient — bounded by ~1000 * max(ct)/min(cc) * tot_c/tot_t, which
    is permille-of-ratio sized — is cast back to BIGINT.  The oracle
    mirrors the promotion with HUGEINT (DuckDB's ``//`` on DECIMAL
    rounds instead of truncating, so decimal is NOT engine-portable
    there; 128-bit HUGEINT truncates like Spark's decimal ``div``).
    All operands are positive, so truncation and floor coincide."""
    totals = counts.agg(
        F.sum("ct").alias("tot_t"), F.sum("cc").alias("tot_c")
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "b",
        F.expr(
            "cast((cast(ct as decimal(38,0)) * tot_c * 1000)"
            " div (cast(cc as decimal(38,0)) * tot_t) as bigint) - 1000"
        ).alias("w"),
    )


def dsir_importance_weights(
    docs: DataFrame,
    target_cond,
    n_buckets: int = 256,
    keep_quarter: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Data Selection via Importance Resampling, DSIR-style (Xie et
    al., "Data Selection for Language Models via Importance
    Resampling", NeurIPS 2023): score every document by how
    target-distribution-like its hashed n-gram features are, then keep
    the top slice — the data-selection step a real pretrain pipeline
    runs between raw crawl and training mix.

    Faithful-to-the-paper parts: word-bigram features hashed into
    ``n_buckets`` buckets, bag-of-buckets bucket counts from the
    target subset vs the full corpus (add-one smoothed), per-document
    score = sum of per-occurrence feature affinities, resample = keep
    the top quantile.  ENGINE-EXACT deviation: the paper's
    log-likelihood-ratio weight ``log(p_t[b]/p_c[b])`` is replaced by
    the CENTERED integer permille affinity

        w_b = (ct[b] * TOTAL_C * 1000) div (cc[b] * TOTAL_T) - 1000

    (cross-multiplied smoothed ratio, truncating BIGINT division,
    zero-centered) — ``ln`` is libm-dependent and cannot be hash-gated
    across engines, while this weight preserves the ratio ORDERING of
    buckets exactly, keeps every value an integer, and — like the
    log-ratio's ``ln(x) ≈ x - 1`` first order — makes
    target-neutral buckets contribute ~0, so a document's score
    measures AFFINITY, not length (uncentered weights are all
    positive and the top quartile degenerates to the longest docs).
    The cross-products run in DECIMAL(38,0) (the table_checksum_orders
    discipline, ADVICE r6): at ~256 buckets the BIGINT form would
    silently wrap around a few-hundred-GB corpus — see
    :func:`dsir_bucket_weights` for the overflow arithmetic.
    The hash is the md5 head (16 bits, mod n_buckets), the same
    engine-portable bucketing every md5-split operator here uses, not
    Spark's Murmur3 (which DuckDB cannot replay).

    Scale shape: feature extraction is a map-side explode; both count
    passes are map-side-combined aggregations onto ``n_buckets`` rows;
    the weight table is a broadcast join against the exploded corpus;
    the keep decision is a top-quantile rank computed with the
    DISTRIBUTED range-partition + offset-prefix-sum row_number
    (operators/ranking.global_row_number, the TeraSort shape) — no
    corpus-sized single-partition window anywhere.

    ``target_cond``: a boolean Column selecting the target docs (e.g.
    ``F.col("lang") == "en"``).  Output: (doc_id, score, kept) for
    every document with at least one bigram."""
    bg = docs.select(
        F.col(id_col),
        target_cond.alias("__tgt"),
        F.explode(word_ngrams(text_col, 2)).alias("bg"),
    )
    bucket = (
        F.conv(F.substring(F.md5("bg"), 1, 4), 16, 10).cast("bigint")
        % n_buckets
    ).alias("b")
    occ = bg.select(id_col, "__tgt", bucket)
    spine = docs.sparkSession.range(n_buckets).select(F.col("id").alias("b"))
    counts = (
        spine.join(
            occ.groupBy("b").agg(
                F.count("*").alias("__nc"),
                F.count_if("__tgt").alias("__nt"),
            ),
            "b",
            "left",
        )
        .select(
            "b",
            (F.coalesce("__nt", F.lit(0)) + 1).alias("ct"),
            (F.coalesce("__nc", F.lit(0)) + 1).alias("cc"),
        )
    )
    weights = dsir_bucket_weights(counts)
    scored = (
        occ.join(F.broadcast(weights), "b")
        .groupBy(id_col)
        .agg(F.sum("w").alias("score"))
    )
    if not keep_quarter:
        return scored
    # exact global rank WITHOUT a corpus-sized single-partition window:
    # the distributed range-partition + offset-prefix-sum row_number
    # (operators/ranking.py — the TeraSort shape).  Same rank values as
    # ROW_NUMBER() OVER (ORDER BY score DESC, id), so the oracle's
    # window form replays it unchanged; descending score is expressed
    # as an ascending negated key.
    from .ranking import global_row_number

    # materialize the doc-count-sized score table first: range
    # partitioning SAMPLES its input to pick bounds, which would
    # otherwise re-execute the whole bigram/weight pipeline once for
    # the sample pass and again for the layout
    scored = scored.localCheckpoint(eager=True)
    ranked, n = global_row_number(
        scored.withColumn("__ns", -F.col("score")), ["__ns", id_col]
    )
    return ranked.select(
        F.col(id_col),
        "score",
        (F.col("rn") * 4 <= F.lit(n)).alias("kept"),
    )


def domain_mixture_allocation(
    docs: DataFrame,
    budget_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    domain_col: str = "source",
) -> DataFrame:
    """Temperature-sampled domain mixture for a pretraining token
    budget (the alpha-sampling of Conneau et al., "Unsupervised
    Cross-lingual Representation Learning at Scale", ACL 2020 — the
    hand-tuned ancestor of DoReMi's learned weights): each domain's
    share of the budget is proportional to ``n_d ** alpha`` with
    alpha = 0.5, which up-weights small domains relative to their raw
    token mass.

    Engine-portable determinism: ``n_d ** 0.5`` is computed as
    ``floor(sqrt(double(n_d)))`` — IEEE-754 requires sqrt to be
    correctly rounded (unlike ln/exp, which is why DSIR's log-ratio
    needed replacing but this exponent does not), and ``n_d`` < 2^53
    is exactly representable, so JVM and DuckDB agree bit-for-bit.
    The integer budget split uses the largest-remainder method
    (truncating ``div`` base + top remainders get one extra token), so
    allocations sum to exactly ``budget_tokens``.  Within a domain,
    documents are taken in md5(doc_id) order — a deterministic global
    shuffle, the same order a training-data exporter would shard by —
    until the allocation is exhausted (a document is kept iff the
    tokens BEFORE it fit strictly inside the allocation, so the
    boundary doc is the last kept).

    Scale shape: token counting is map-side; the domain table is tiny
    (one row per domain) and every join against it broadcasts; the
    only data-sized shuffle is the per-domain cumulative sum, keyed by
    domain — at 100 TB with few giant domains, sub-shard the cumsum by
    ``(domain, md5-prefix)`` and prefix-offset the shards (the
    distributed NTILE pattern in operators/ranking.py).

    Returns (doc_id, domain, n_tok, cum_before, kept) for every doc."""
    from pyspark.sql import Window

    tc = docs.select(
        F.col(id_col),
        F.col(domain_col).alias("domain"),
        F.size(tokens(text_col)).cast("long").alias("n_tok"),
    )
    dom = tc.groupBy("domain").agg(F.sum("n_tok").alias("n_d"))
    wts = dom.select(
        "domain",
        F.floor(F.sqrt(F.col("n_d").cast("double"))).cast("long").alias("w"),
    )
    tot = wts.agg(F.sum("w").alias("wsum"))
    a0 = wts.crossJoin(F.broadcast(tot)).select(
        "domain",
        F.expr(f"({budget_tokens} * w) div wsum").alias("base"),
        F.expr(f"({budget_tokens} * w) % wsum").alias("rem"),
    )
    rsum = a0.agg((F.lit(budget_tokens) - F.sum("base")).alias("R"))
    wr = Window.orderBy(F.desc("rem"), "domain")
    alloc = a0.crossJoin(F.broadcast(rsum)).select(
        "domain",
        (
            F.col("base")
            + F.when(F.row_number().over(wr) <= F.col("R"), 1).otherwise(0)
        ).alias("alloc"),
    )
    wd = Window.partitionBy("domain").orderBy(
        F.md5(F.col(id_col).cast("string")), id_col
    )
    ordered = tc.select(
        F.col(id_col),
        "domain",
        "n_tok",
        F.coalesce(
            F.sum("n_tok").over(wd.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("cum_before"),
    )
    return ordered.join(F.broadcast(alloc), "domain").select(
        F.col(id_col),
        "domain",
        "n_tok",
        "cum_before",
        (F.col("cum_before") < F.col("alloc")).alias("kept"),
    )
