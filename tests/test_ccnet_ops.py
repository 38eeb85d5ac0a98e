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
    (scale-independent by construction); line dedup is pure
    window+aggregate — zero joins at all."""
    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{(i + 1) % 7} line{i % 3}") for i in range(50)],
        "doc_id long, text string",
    )
    p1 = _plan(corpus_line_dedup(docs))
    assert "CartesianProduct" not in p1 and "NestedLoop" not in p1
    assert "Join" not in p1  # window + groupBy only
    p2 = _plan(unigram_surprisal_scores(docs))
    assert "CartesianProduct" not in p2
    # the corpus-total attach is a broadcast of ONE row — bounded at
    # any corpus size; everything else must be hash-join/aggregate
    assert p2.count("BroadcastNestedLoopJoin") <= 2
