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


# ---------------------------------------------------------------------------
# round-3 continuation: C4 line cleaning, substring-dup profile, Morton key
# ---------------------------------------------------------------------------

line_text = st.text(
    alphabet=string.ascii_lowercase + " .!?{j\r", min_size=0, max_size=60
)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.lists(line_text, min_size=0, max_size=8), min_size=1, max_size=8))
def test_c4_clean_matches_python_reference(spark, docs):
    """c4_clean's per-document (n_lines, n_kept, cleaned, keep) must
    equal a direct Python evaluation of the C4 rules over the same
    newline-joined text (alphabet includes '{', 'j' runs that can spell
    'javascript', and terminal punctuation)."""
    import re

    from ksql_streams_from_schema_converter_spark.operators.text import (
        C4_BLOCKLIST,
        c4_clean,
    )

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_lines, r.n_kept, r.cleaned, r.keep)
        for r in c4_clean(df).collect()
    }
    for i, text in rows:
        lines = text.split("\n")

        def keep_line(l: str) -> bool:
            if not re.search(r"[.!?\"']$", l):
                return False
            if len(re.split(r"[ \t\n\f\r]+", l.strip())) < 5:
                return False
            return not any(bad in l.lower() for bad in C4_BLOCKLIST)

        kept = [l for l in lines if keep_line(l)]
        assert got[i] == (len(lines), len(kept), "\n".join(kept), len(kept) >= 3), (
            i,
            text,
        )


@settings(max_examples=15, deadline=None)
@given(st.lists(doc_text, min_size=1, max_size=10), st.sampled_from([2, 3, 8]))
def test_duplicated_window_stats_matches_python_reference(spark, texts, w):
    """duplicated_window_stats must equal the Python twin: sliding
    w-token windows, md5 content keys, a window is dup iff its content
    occurs >1 time across all (doc, pos)."""
    import hashlib
    import re
    from collections import Counter

    from ksql_streams_from_schema_converter_spark.operators.dedup import (
        duplicated_window_stats,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_windows, r.n_dup_windows, r.dup_frac)
        for r in duplicated_window_stats(df, window_tokens=w).collect()
    }

    wins: dict[int, list[str]] = {}
    occ: Counter = Counter()
    for i, t in rows:
        toks = re.split(r"[ \t\n\f\r]+", t.strip().lower())
        fps = [
            hashlib.md5(" ".join(toks[p : p + w]).encode()).hexdigest()
            for p in range(len(toks) - w + 1)
        ]
        wins[i] = fps
        occ.update(fps)
    expected = {}
    for i, fps in wins.items():
        if not fps:
            continue
        nd = sum(1 for fp in fps if occ[fp] > 1)
        expected[i] = (len(fps), nd, nd / len(fps))
    assert got == expected


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 12) - 1),
            st.integers(min_value=0, max_value=(1 << 12) - 1),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_zorder_key_matches_python_reference(spark, pairs):
    """zorder_key must equal the classic bit-interleave: bit i of col j
    lands at position i*n + (n-1-j) — column 0 in the higher slot."""
    from ksql_streams_from_schema_converter_spark.plans.sink import zorder_key

    def morton(a: int, b: int, bits: int = 12) -> int:
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    rows = [(a, b, morton(a, b)) for a, b in pairs]
    df = spark.createDataFrame(rows, "a long, b long, expected long")
    assert (
        df.where(zorder_key(["a", "b"], bits=12) != F.col("expected")).count() == 0
    )
