"""Unit tests for the pre-training corpus operators
(operators/text.py PII/repetition, operators/pretrain.py)."""

from ksql_streams_from_schema_converter_spark.operators import pretrain as P
from ksql_streams_from_schema_converter_spark.operators import text as TX


def test_redact_pii_all_kinds(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b@x.org now"),
            (2, "see https://x.org/p?q=1 and http://y.io"),
            (3, "call 555-123-4567 twice 555-000-1111"),
            (4, "email inside url https://x.org/a@b.com stays one <URL>"),
            (5, "clean text"),
        ],
        "id long, text string",
    )
    out = {
        r["id"]: r["red"]
        for r in df.select("id", TX.redact_pii("text").alias("red")).collect()
    }
    assert out[1] == "mail <EMAIL> now"
    assert out[2] == "see <URL> and <URL>"
    assert out[3] == "call <PHONE> twice <PHONE>"
    # URL redaction runs first, so the embedded email is not double-hit
    assert out[4] == "email inside url <URL> stays one <URL>"
    assert out[5] == "clean text"


def test_pii_counts_match_redactions(spark):
    df = spark.createDataFrame(
        [(1, "a@b.co https://x.io 555-123-4567 c@d.eu")], "id long, text string"
    )
    counts = TX.pii_counts("text")
    row = df.select(
        counts["url"].alias("u"), counts["email"].alias("e"), counts["phone"].alias("p")
    ).first()
    assert (row["u"], row["e"], row["p"]) == (1, 2, 1)


def test_repetition_metrics_degenerate_doc(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),  # fully degenerate
            (2, "all words here differ"),  # no repetition
            (3, "x"),  # too short for 2-grams
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in TX.repetition_metrics(df).collect()}
    assert rows[1]["n_tokens"] == 4
    assert rows[1]["n_distinct_tokens"] == 1
    assert rows[1]["n_2grams"] == 3
    assert rows[1]["top_2gram_count"] == 3  # "spam spam" x3
    assert rows[2]["top_2gram_count"] == 1
    assert rows[3]["n_2grams"] == 0 and rows[3]["top_2gram_count"] == 0


def test_contamination_overlap_finds_planted_leak(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven"),
            (3, "unrelated words entirely different content here today"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        # first 5-gram of doc 1, twice (distinct grams, one hit)
        [(100, "alpha beta gamma delta epsilon")],
        "bench_id long, text string",
    )
    out = P.contamination_overlap(corpus, bench, n=5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_id"], r["bench_id"], r["n_shared_ngrams"]) == (1, 100, 1)


def test_contamination_broadcasts_benchmark(spark):
    corpus = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    bench = spark.createDataFrame([(9, "a b c d e")], "bench_id long, text string")
    plan = P.contamination_overlap(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # benchmark side must broadcast


def test_pack_sequences_layout(spark):
    # 5 docs of 10 tokens in one shard, budget 16: offsets 0,10,20,30,40
    docs = spark.createDataFrame(
        [(i * 8, " ".join(f"t{j}" for j in range(10))) for i in range(5)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in P.pack_sequences(docs, budget=16, shards=8).collect()}
    assert all(r["shard"] == 0 for r in out.values())
    assert [out[i * 8]["tok_offset"] for i in range(5)] == [0, 10, 20, 30, 40]
    assert [out[i * 8]["seq_in_shard"] for i in range(5)] == [0, 0, 1, 1, 2]
    assert [out[i * 8]["offset_in_seq"] for i in range(5)] == [0, 10, 4, 14, 8]
    # doc at offset 10 spans the cut at 16; doc at offset 0 does not
    assert out[8]["spans_cut"] and not out[0]["spans_cut"]
    # token accounting: every shard's total tokens equals sum of n_tok
    assert sum(r["n_tok"] for r in out.values()) == 50


def test_pack_sequences_sharding(spark):
    docs = spark.createDataFrame(
        [(i, "w1 w2 w3") for i in range(16)], "doc_id long, text string"
    )
    out = P.pack_sequences(docs, budget=4, shards=4).collect()
    shards = {r["shard"] for r in out}
    assert shards == {0, 1, 2, 3}
    # within a shard offsets restart from 0 and increase by 3
    by_shard = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r["tok_offset"])
    assert all(offs == [0, 3, 6, 9] for offs in by_shard.values())


def test_quantize_int8_roundtrip_and_zero_vector(spark):
    from ksql_streams_from_schema_converter_spark.operators.similarity import (
        dequantize_int8,
        quantize_int8,
    )

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 127.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    q = quantize_int8(df)
    rows = {r["vec_id"]: r for r in q.withColumn(
        "deq", dequantize_int8()
    ).collect()}
    # max-magnitude element maps exactly to ±127
    assert rows[1]["q"][3] == 127
    assert abs(rows[1]["scale"] - 1.0) < 1e-12
    # reconstruction error bounded by scale/2 per element
    orig = [1.0, -0.5, 0.25, 127.0]
    for o, d in zip(orig, rows[1]["deq"]):
        assert abs(o - d) <= rows[1]["scale"] / 2 + 1e-12
    # zero vector: scale 0, all-zero codes, no division blowup
    assert rows[2]["scale"] == 0.0 and rows[2]["q"] == [0, 0, 0, 0]


def test_chunk_documents_window_layout(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{j}" for j in range(10))), (2, "solo")],
        "doc_id long, text string",
    )
    out = TX.chunk_documents(docs, chunk_tokens=4, overlap=2)
    rows = sorted(
        ((r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_chunk_tokens"]) for r in out.collect())
    )
    # stride 2 over 10 tokens -> 5 chunks; consecutive chunks share 2 tokens
    assert [r[1] for r in rows if r[0] == 1] == [0, 1, 2, 3, 4]
    assert rows[0][2] == "t0 t1 t2 t3"
    assert rows[1][2] == "t2 t3 t4 t5"
    # final chunk is clamped at the document end
    assert rows[4][2] == "t8 t9" and rows[4][3] == 2
    # a short doc still yields exactly one chunk
    assert [r for r in rows if r[0] == 2] == [(2, 0, "solo", 1)]


def test_chunk_documents_empty_token_array_emits_no_bogus_rows(spark):
    """sequence(0, -1) counts DOWN in Spark ([0, -1]) — the guard must
    keep a 0-chunk document from emitting two bogus rows (ADVICE r2).
    Exercised directly through the expression chain with a genuinely
    empty token array (tokens() itself never returns one)."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame([(1, "a b c d"), (2, "")], "doc_id long, text string")
    out = TX.chunk_documents(docs, chunk_tokens=4, overlap=2)
    # empty string still tokenizes to [""] -> one chunk, never negative idx
    rows = sorted((r["doc_id"], r["chunk_idx"]) for r in out.collect())
    assert rows == [(1, 0), (1, 1), (2, 0)]
    assert out.where(F.col("chunk_idx") < 0).count() == 0


def test_ngrams_null_token_array_yields_empty_array(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    row = df.select(
        TX.ngrams_from_tokens(TX.tokens("text"), 3).alias("g")
    ).head()
    assert row["g"] == []  # NULL propagation would break minhash paths


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        TX.chunk_documents(docs, chunk_tokens=4, overlap=4)


# --- property tests (one DataFrame pass per property; examples built
# up front because Spark jobs are expensive per-example) ---

import string

from hypothesis import given, settings, strategies as st

words = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=6)
docs_strategy = st.lists(
    st.lists(words, min_size=1, max_size=40), min_size=1, max_size=12
)


@settings(max_examples=15, deadline=None)
@given(docs_strategy, st.integers(2, 10), st.integers(0, 5))
def test_chunking_covers_every_token_exactly(spark, docs, chunk, overlap):
    """Every token appears in some chunk; de-overlapped concatenation
    reconstructs the document exactly."""
    if overlap >= chunk:
        overlap = chunk - 1
    stride = chunk - overlap
    from ksql_streams_from_schema_converter_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        toks = r["chunk_text"].split(" ") if r["chunk_text"] else []
        assert len(toks) == r["n_chunk_tokens"]
        # each chunk after the first re-covers `overlap` trailing tokens
        keep = toks if r["chunk_idx"] == 0 else toks[overlap:]
        by_doc.setdefault(r["doc_id"], []).extend(keep)
    for i, toks in enumerate(docs):
        assert by_doc[i] == toks


@settings(max_examples=15, deadline=None)
@given(docs_strategy, st.integers(1, 64), st.integers(1, 4))
def test_packing_offsets_are_contiguous(spark, docs, budget, shards):
    """Within each shard, token offsets tile the stream with no gaps or
    overlaps, and every seq index equals offset div budget."""
    from ksql_streams_from_schema_converter_spark.operators.pretrain import pack_sequences

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    out = pack_sequences(df, budget=budget, shards=shards).collect()
    by_shard = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r)
    for rows in by_shard.values():
        expect = 0
        for r in rows:
            assert r["tok_offset"] == expect
            assert r["seq_in_shard"] == r["tok_offset"] // budget
            assert r["offset_in_seq"] == r["tok_offset"] % budget
            expect += r["n_tok"]


def test_dsir_selects_target_like_documents(spark):
    """The centered-affinity DSIR variant must ENRICH for the target
    distribution: with two disjoint vocabularies, the kept quartile is
    drawn overwhelmingly from target-vocabulary docs, and scores are
    affinity-driven, not length-driven (a long off-target doc scores
    below a short on-target one)."""
    from pyspark.sql import functions as F

    from ksql_streams_from_schema_converter_spark.operators.pretrain import (
        dsir_importance_weights,
    )

    rows = []
    for i in range(40):  # target-like: vocabulary A
        rows.append((i, "alpha beta gamma delta " * 6, True))
    for i in range(40, 80):  # off-target: vocabulary B, LONGER docs
        rows.append((i, "omega sigma tau upsilon " * 12, False))
    docs = spark.createDataFrame(rows, "doc_id long, text string, is_tgt boolean")
    out = dsir_importance_weights(docs, F.col("is_tgt")).collect()
    kept = {r.doc_id for r in out if r.kept}
    assert len(kept) == 20  # top quartile of 80
    assert all(i < 40 for i in kept), kept  # all from the target vocab
    scores = {r.doc_id: r.score for r in out}
    # affinity beats length: every (short) target doc outscores every
    # (long) off-target doc
    assert min(scores[i] for i in range(40)) > max(
        scores[i] for i in range(40, 80)
    )


def test_domain_mixture_sqrt_upweights_small_domains(spark):
    """alpha=0.5 temperature sampling: a domain with 64x the token
    mass gets only 8x the allocation (sqrt), so the small domain's
    keep RATE is far higher; the largest-remainder split makes the
    integer allocations exact (big=889, small=111 of 1000)."""
    from ksql_streams_from_schema_converter_spark.operators.pretrain import (
        domain_mixture_allocation,
    )

    rows = [(i, "w " * 100, "big") for i in range(64)]  # 6400 tokens
    rows += [(i, "w " * 25, "small") for i in range(64, 68)]  # 100 tokens
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = domain_mixture_allocation(docs, budget_tokens=1000).collect()
    # weights sqrt(6400)=80, sqrt(100)=10; bases 888/111, remainder
    # (R=1) goes to big (rem 80 > 10) -> alloc big=889, small=111
    kept_small = [r for r in out if r.domain == "small" and r.kept]
    kept_big = [r for r in out if r.domain == "big" and r.kept]
    assert len(kept_small) == 4  # 100 tokens < 111: ALL small docs kept
    assert len(kept_big) == 9  # 9*100=900: doc with cum_before=800 is last
    # proportional split would have given small ~15 tokens (zero docs)


def test_grpo_advantages_sum_to_zero_per_group(spark):
    """The multiplied-through advantage preserves the defining GRPO
    invariant: advantages sum to zero within every sampling group
    (sum_i (n*r_i - sum_r) = n*sum_r - n*sum_r = 0), and the rank-1
    sample carries the group's max advantage."""
    from collections import defaultdict
    from decimal import Decimal

    from ksql_streams_from_schema_converter_spark.workload import WORKLOAD

    fn, _ = WORKLOAD["grpo_group_advantage"]
    rows = fn(spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_g = defaultdict(list)
    for r in rows:
        by_g[r.user_id].append(r)
    for g, rs in by_g.items():
        assert sum(r.adv_num for r in rs) == Decimal(0), g
        top = [r for r in rs if r.rank_in_group == 1]
        assert len(top) == 1
        assert top[0].adv_num == max(r.adv_num for r in rs)
        assert len(rs) == rs[0].n


def test_pipeline_v3_stage_funnel_is_monotone(spark):
    """Each stage only narrows: final ⊆ dsir ⊆ quality, and a doc that
    failed quality can carry no downstream verdicts."""
    from ksql_streams_from_schema_converter_spark.workload import WORKLOAD

    fn, _ = WORKLOAD["pretrain_pipeline_v3"]
    rows = fn(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        if r.final_kept:
            assert r.dsir_kept
        if r.dsir_kept:
            assert r.passed_quality and r.dsir_score is not None
        if not r.passed_quality:
            assert not r.dsir_kept and not r.final_kept
    # and the funnel is non-degenerate at every stage
    assert (
        len(rows)
        > sum(r.passed_quality for r in rows)
        > sum(r.dsir_kept for r in rows)
        > sum(r.final_kept for r in rows)
        > 0
    )


def test_dsir_weights_survive_bigint_overflow_counts(spark):
    """ADVICE r6: the weight cross-product (ct * tot_c * 1000) must run
    in DECIMAL(38,0) — at BIGINT it wraps silently (ANSI off) for
    corpus-scale counts.  Counts here are sized so the BIGINT product
    overflows (ct * tot_c * 1000 ~ 3.2e22 >> 2^63 ~ 9.2e18) and the
    result is checked against exact Python integer arithmetic."""
    counts = spark.createDataFrame(
        [
            (0, 4_000_000_000, 7_000_000_000),
            (1, 1_000_000_000, 2_000_000_000),
        ],
        "b long, ct long, cc long",
    )
    out = {r["b"]: r["w"] for r in P.dsir_bucket_weights(counts).collect()}
    tot_t = 4_000_000_000 + 1_000_000_000
    tot_c = 7_000_000_000 + 2_000_000_000
    for b, ct, cc in [(0, 4_000_000_000, 7_000_000_000), (1, 1_000_000_000, 2_000_000_000)]:
        assert out[b] == (ct * tot_c * 1000) // (cc * tot_t) - 1000
    # and the DuckDB oracle's HUGEINT mirror truncates to the same values
    import duckdb

    con = duckdb.connect()
    oracle = {
        b: w
        for b, w in con.execute(
            """
            WITH counts(b, ct, cc) AS (VALUES
              (0, 4000000000::BIGINT, 7000000000::BIGINT),
              (1, 1000000000::BIGINT, 2000000000::BIGINT)),
            tot AS (SELECT sum(ct) AS tot_t, sum(cc) AS tot_c FROM counts)
            SELECT b, CAST((CAST(ct AS HUGEINT) * tot_c * 1000)
                      // (CAST(cc AS HUGEINT) * tot_t) AS BIGINT) - 1000
            FROM counts, tot
            """
        ).fetchall()
    }
    con.close()
    assert oracle == out


def test_pipeline_v5_ccnet_funnel_is_monotone(spark):
    """CCNet composition (VERDICT r8 #2): each stage only narrows —
    scored ⊆ passed_lang ⊆ all docs, final_kept = head+middle of the
    scored set (exactly the non-tail two-thirds), and a doc that
    failed the language gate carries no surprisal or bucket."""
    from ksql_streams_from_schema_converter_spark.workload import WORKLOAD

    fn, _ = WORKLOAD["pretrain_pipeline_v5"]
    rows = fn(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        if not r.passed_lang:
            assert r.surprisal is None and r.bucket is None
            assert not r.final_kept
        if r.final_kept:
            assert r.passed_lang and r.bucket in ("head", "middle")
        if r.bucket == "tail":
            assert not r.final_kept
    n_docs = len(rows)
    n_lang = sum(r.passed_lang for r in rows)
    n_scored = sum(r.surprisal is not None for r in rows)
    n_kept = sum(r.final_kept for r in rows)
    # non-degenerate funnel: the gate and the tail-drop both bite
    assert n_docs > n_lang >= n_scored > n_kept > 0
    # head+middle vs tail split is the exact NTILE 2/3 (within 1 per
    # ntile remainder rule)
    n_tail = sum(r.bucket == "tail" for r in rows)
    assert n_kept + n_tail == n_scored
    assert abs(n_kept - 2 * n_tail) <= 2


def test_pipeline_v5_line_dedup_feeds_the_gate(spark):
    """The language gate runs over the DEDUPED text: a document whose
    every line is boilerplate already seen earlier in the corpus has
    empty clean_text -> lang 'und' -> gated out, never scored."""
    from ksql_streams_from_schema_converter_spark.workload import WORKLOAD

    fn, _ = WORKLOAD["pretrain_pipeline_v5"]
    rows = {r.doc_id: r for r in fn(spark, "/root/testdata/sf0.001").collect()}
    fully_deduped = [r for r in rows.values() if r.n_dropped == r.n_lines]
    for r in fully_deduped:
        assert r.lang_pred == "und" and not r.final_kept
