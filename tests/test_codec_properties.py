"""Property-based round-trip tests for the T24 multivalue codec
(SURVEY.md §7 'what's hard': the s?N:/# regexes have edge cases that
need exhaustive fixtures — hypothesis generates them).

Spark jobs are expensive per-example, so examples are generated up
front and checked in ONE DataFrame pass per property.
"""

import string

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from ksql_streams_from_schema_converter_spark.functions import t24

# element values: non-empty, no '#' (separator), no ':' in a position
# that could look like an ordinal prefix — the encoding's own alphabet
VALUE_ALPHABET = string.ascii_letters + string.digits + " .,-_/"
values = st.text(alphabet=VALUE_ALPHABET, min_size=1, max_size=12).filter(
    lambda s: s.strip() == s and s != ""
)
value_lists = st.lists(values, min_size=1, max_size=6)


def encode(vals: list[str], sub: bool = False, with_ordinals: bool = True) -> str:
    """Encode a value list the way T24 does (FIXTURES.md §1)."""
    prefix = "s" if sub else ""
    if with_ordinals:
        return "#".join(f"{prefix}{i + 1}:{v}" for i, v in enumerate(vals))
    return "#".join(vals)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(value_lists, st.booleans(), st.booleans()), min_size=1, max_size=20))
def test_mv_array_roundtrip(spark, cases):
    rows = [(encode(vals, sub, ords), vals) for vals, sub, ords in cases]
    df = spark.createDataFrame(rows, "enc string, expected array<string>")
    bad = df.where(~(t24.mv_array("enc") == F.col("expected"))).count()
    assert bad == 0


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(value_lists, st.integers(min_value=1, max_value=8)), min_size=1, max_size=20))
def test_mv_element_roundtrip(spark, cases):
    rows = [
        (encode(vals), n, vals[n - 1] if n <= len(vals) else None)
        for vals, n in cases
    ]
    df = spark.createDataFrame(rows, "enc string, n int, expected string")
    got = df.select(
        t24.mv_element("enc", 1).alias("_"),  # touch codec path
        F.expr(
            "try_element_at(filter(split(enc, '(^s?[0-9]+:|#(s?[0-9]+:)?)'), x -> x != ''), n)"
        ).alias("got"),
        "expected",
    )
    assert got.where(~(F.col("got").eqNullSafe(F.col("expected")))).count() == 0


@settings(max_examples=20, deadline=None)
@given(st.lists(value_lists, min_size=1, max_size=20), st.sampled_from([",", " ", "|", ";"]))
def test_mv_join_roundtrip(spark, lists, sep):
    rows = [(encode(vals), sep.join(vals)) for vals in lists]
    df = spark.createDataFrame(rows, "enc string, expected string")
    assert df.where(t24.mv_join("enc", sep) != F.col("expected")).count() == 0


# ---------------------------------------------------------------------------
# round-3 operators: chunk dedup layout, gopher rules vs pure-Python twin
# ---------------------------------------------------------------------------

doc_text = st.text(
    alphabet=string.ascii_lowercase + " ", min_size=0, max_size=120
)


@settings(max_examples=15, deadline=None)
@given(st.lists(doc_text, min_size=1, max_size=12), st.sampled_from([4, 7, 16]))
def test_chunk_dedup_layout_matches_python_reference(spark, texts, chunk):
    """chunk_exact_dedup's (doc, idx, fp, is_dup) layout must equal a
    direct Python computation of the same spec: non-overlapping token
    windows, md5 keys, first (doc_id, idx) occurrence kept."""
    import hashlib
    import re

    from ksql_streams_from_schema_converter_spark.operators.dedup import (
        chunk_exact_dedup,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.chunk_idx): (r.chunk_fp, r.is_dup)
        for r in chunk_exact_dedup(df, chunk_tokens=chunk).collect()
    }

    expected = {}
    seen: dict[str, tuple] = {}
    for i, t in rows:  # registration order == (doc_id, chunk_idx) order
        toks = re.split(r"[ \t\n\f\r]+", t.strip().lower())
        n = -(-len(toks) // chunk)
        for ci in range(n):
            fp = hashlib.md5(
                " ".join(toks[ci * chunk : (ci + 1) * chunk]).encode()
            ).hexdigest()
            dup = fp in seen
            seen.setdefault(fp, (i, ci))
            expected[(i, ci)] = (fp, dup)
    assert got == expected


@settings(max_examples=15, deadline=None)
@given(st.lists(doc_text, min_size=1, max_size=12))
def test_gopher_flags_match_python_reference(spark, texts):
    """Every gopher rule flag must equal the integer-exact Python twin."""
    import re

    from ksql_streams_from_schema_converter_spark.operators.text import (
        STOPWORDS,
        gopher_quality_flags,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (
            r.n_tokens, r.ok_word_count, r.ok_mean_word_len,
            r.ok_symbol_ratio, r.ok_stopwords, r.ok_alpha_tokens, r.keep,
        )
        for r in gopher_quality_flags(df).collect()
    }
    for i, t in rows:
        toks = re.split(r"[ \t\n\f\r]+", t.strip().lower())
        n = len(toks)
        wc = len(re.sub(r"[ \t\n\f\r]+", "", t.strip()))
        punct = len(re.sub(r"[A-Za-z0-9 \t\n\f\r]", "", t))
        stop = sum(1 for x in toks if x in STOPWORDS["en"])
        alpha = sum(1 for x in toks if re.search(r"[A-Za-z]", x))
        ok_n = 30 <= n <= 90
        ok_len = 4 * n <= wc <= 5 * n
        ok_sym = punct * 100 <= 10 * n
        ok_stop = stop >= 2
        ok_alpha = alpha * 100 >= 80 * n
        keep = ok_n and ok_len and ok_sym and ok_stop and ok_alpha
        assert got[i] == (n, ok_n, ok_len, ok_sym, ok_stop, ok_alpha, keep), (i, t)
