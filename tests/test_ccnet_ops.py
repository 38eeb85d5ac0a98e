"""CCNet-shaped corpus operators: corpus-level line dedup
(operators/dedup.corpus_line_dedup) and unigram-surprisal quality
bucketing (operators/text.unigram_surprisal_scores)."""

from pyspark.sql import functions as F

from ksql_streams_from_schema_converter_spark.operators.dedup import (
    corpus_line_dedup,
)
from ksql_streams_from_schema_converter_spark.operators.text import (
    unigram_surprisal_scores,
)


def test_line_dedup_keeps_first_occurrence_corpus_wide(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta\nshared footer\ngamma"),
            (2, "shared footer\ndelta"),
            (3, "epsilon\nshared footer\nshared footer"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in corpus_line_dedup(docs).collect()}
    # doc 1 saw the footer first — keeps everything
    assert out[1].n_dropped == 0 and out[1].clean_text == (
        "alpha beta\nshared footer\ngamma"
    )
    # doc 2 loses the footer, keeps its own line
    assert out[2].n_dropped == 1 and out[2].clean_text == "delta"
    # doc 3 loses BOTH copies (within-doc repeats are corpus dups too)
    assert out[3].n_dropped == 2 and out[3].clean_text == "epsilon"
    assert out[3].n_lines == 3


def test_line_dedup_normalizes_case_and_whitespace(spark):
    docs = spark.createDataFrame(
        [(1, "Shared Footer"), (2, "  shared footer ")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in corpus_line_dedup(docs).collect()}
    assert out[1].n_dropped == 0
    assert out[2].n_dropped == 1 and out[2].clean_text == ""


def test_surprisal_orders_rare_content_above_common(spark):
    """Documents of rare tokens must out-score equal-length documents
    of common tokens — the CCNet head/tail signal — and the score is
    an exact integer."""
    rows = [(i, "the and of to in is it that was a") for i in range(20)]
    rows.append((100, "zyx qwv jkl mno pqr stu abc def ghi foo"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    s = {r.doc_id: r.surprisal for r in unigram_surprisal_scores(docs).collect()}
    assert s[100] > s[0]
    assert all(isinstance(v, int) for v in s.values())
    # common-token docs are identical, so their scores are too
    assert len({s[i] for i in range(20)}) == 1


def test_surprisal_drops_empty_documents(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "")], "doc_id long, text string"
    )
    got = {r.doc_id for r in unigram_surprisal_scores(docs).collect()}
    assert got == {1}


def _plan(df):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_ccnet_op_plan_shapes(spark):
    """Plan audit: no cartesian products anywhere; the only nested-loop
    joins in the surprisal plan are the 1-row corpus-total broadcast
    (scale-independent by construction); line dedup's first-occurrence
    pass is a partial-aggregating min, never a window (VERDICT r8 #1)."""
    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{(i + 1) % 7} line{i % 3}") for i in range(50)],
        "doc_id long, text string",
    )
    p1 = _plan(corpus_line_dedup(docs))
    assert "CartesianProduct" not in p1 and "NestedLoop" not in p1
    p2 = _plan(unigram_surprisal_scores(docs))
    assert "CartesianProduct" not in p2
    # the corpus-total attach is a broadcast of ONE row — bounded at
    # any corpus size; everything else must be hash-join/aggregate
    assert p2.count("BroadcastNestedLoopJoin") <= 2


def test_line_dedup_hot_key_plan_has_no_window(spark):
    """VERDICT r8 #1 planted-hot-key guard: a boilerplate footer shared
    by >=50% of documents plus blank lines — the exact skew the
    operator exists to remove.  The first-occurrence computation must
    be a partial aggregation (map-side combine absorbs the hot
    fingerprints; the join-back's probe-side skew is AQE-splittable),
    NOT a row_number window partitioned by the fingerprint (one task
    sorts every occurrence of the hot key; no combine, no skew
    split)."""
    rows = []
    for i in range(200):
        body = [f"unique line {i}"]
        if i % 2 == 0:  # the shared footer, planted in half the corpus
            body.append("copyright footer all rights reserved")
        body.append("")  # blank line in EVERY document
        rows.append((i, "\n".join(body)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = corpus_line_dedup(docs)
    plan = _plan(out)
    assert "Window" not in plan  # the r8 skew scale-killer
    # first-occurrence via min(struct) — partial agg must appear
    assert "partial_min" in plan
    got = {r.doc_id: r for r in out.collect()}
    # doc 0 saw footer + blank first — keeps all 3 lines
    assert got[0].n_dropped == 0
    # every later even doc loses footer + blank; odd docs lose blank
    assert got[2].n_dropped == 2 and got[2].clean_text == "unique line 2"
    assert got[1].n_dropped == 1 and got[1].clean_text == "unique line 1"
    assert got[199].n_lines == 2


def test_surprisal_join_input_is_preaggregated(spark):
    """VERDICT r8 #6 guard: the score join consumes (doc, tok, n)
    counts, not one row per occurrence — the shuffle shrinks by the
    repetition factor and the doc score becomes sum(s*n).  The plan
    must show a partial aggregation keyed by BOTH doc_id and tok
    upstream of the join."""
    docs = spark.createDataFrame(
        [(1, "the the the the rare"), (2, "the the common words")],
        "doc_id long, text string",
    )
    df = unigram_surprisal_scores(docs)
    plan = _plan(df)
    assert "partial_count" in plan
    # the (doc_id, tok) grouping reaches the physical plan
    assert "doc_id" in plan and "tok" in plan
    import re

    agg_keys = re.findall(r"Keys \[2\]: \[doc_id[^\]]*, tok[^\]]*\]", plan)
    assert agg_keys, "no (doc_id, tok) pre-aggregation found in plan"
    s = {r.doc_id: r.surprisal for r in df.collect()}
    assert s[1] > 0 and s[2] > 0 and isinstance(s[1], int)
