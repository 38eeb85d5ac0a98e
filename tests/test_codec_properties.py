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
