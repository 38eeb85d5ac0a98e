"""Python UDTF surface (Spark 3.5+): the T24 multivalue decode as a
user-defined table function. This exists to demonstrate the UDTF API —
the production path is the native explode (operators/explode.py), which
stays JVM-side; the docstring comparison IS the point."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="pos int, value string")
class MultivalueExplode:
    """Yield (1-based position, element) rows for a T24 multivalue
    string — Python-side twin of the native posexplode path; prefer the
    native operator in the hot path (JVM, whole-stage codegen)."""

    def eval(self, mv: str):
        import re

        if mv is None:
            return
        stripped = re.sub(r"^s?[0-9]+:", "", mv)
        parts = [p for p in re.split(r"#(?:s?[0-9]+:)?", stripped) if p != ""]
        for i, p in enumerate(parts, start=1):
            yield (i, p)


def test_udtf_matches_native_explode(spark):
    from ksql_streams_from_schema_converter_spark.functions.t24 import mv_array

    mv = "1:VND100#2:USD200#s3:EUR300"
    via_udtf = [tuple(r) for r in MultivalueExplode(F.lit(mv)).collect()]
    native = spark.createDataFrame([(mv,)], "c string").select(
        F.posexplode(mv_array("c"))
    ).collect()
    via_native = [(r[0] + 1, r[1]) for r in native]
    assert via_udtf == via_native == [(1, "VND100"), (2, "USD200"), (3, "EUR300")]


def test_udtf_lateral_join(spark):
    spark.udtf.register("mv_explode", MultivalueExplode)
    spark.createDataFrame(
        [("r1", "1:A#2:B"), ("r2", None)], "recid string, mv string"
    ).createOrReplaceTempView("__udtf_src")
    rows = spark.sql(
        "SELECT recid, pos, value FROM __udtf_src, LATERAL mv_explode(mv)"
    ).collect()
    assert sorted((r.recid, r.pos, r.value) for r in rows) == [
        ("r1", 1, "A"),
        ("r1", 2, "B"),
    ]
