"""Regression net for the driver-boundary canonicalization class
(round 1 DECIMAL/DATE → round 2 HUGEINT → round 3 ARRAY).

The driver hashes both engines' outputs after a pandas sort; Decimal
and date cells hash differently between engines even when values are
bit-identical, and list cells crash the sort outright
(``TypeError: unhashable type: 'list'`` — CORRECTNESS_r03
``embedding_quantize_int8`` / ``inverted_index_postings``).  canon.py
must therefore re-type all three classes to byte-identical strings on
BOTH sides of the differential gate.
"""

import datetime
import os
import sys
from decimal import Decimal

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ksql_streams_from_schema_converter_spark.canon import (
    canonicalize_oracle_sql,
    canonicalize_spark_output,
)

from diffcheck import duckdb_conn

_SF = "/root/testdata/sf0.001"


def test_spark_side_retypes_decimal_date_and_array(spark):
    df = spark.createDataFrame(
        [(Decimal("904045.72"), datetime.date(2024, 1, 2), [1, 2, 3], "keep")],
        "d decimal(12,2), dt date, arr array<int>, s string",
    )
    out = canonicalize_spark_output(df)
    types = dict(out.dtypes)
    assert types == {"d": "string", "dt": "string", "arr": "string", "s": "string"}
    row = out.collect()[0]
    assert row.d == "904045.72"
    assert row.dt == "2024-01-02"
    assert row.arr == "[1,2,3]"


def test_array_json_text_matches_duckdb_byte_for_byte(spark):
    """The canonical array form must be IDENTICAL text on both engines,
    including null elements, empty arrays, and NULL containers."""
    df = spark.createDataFrame(
        [(1, [1, None, 3], ["x", "y"]), (2, [], None)],
        "id int, a array<int>, b array<string>",
    )
    s_rows = {
        r.id: (r.a, r.b) for r in canonicalize_spark_output(df).collect()
    }

    if not os.path.isdir(_SF):
        pytest.skip("testdata not generated")
    con = duckdb_conn(_SF)
    sql = """
    SELECT * FROM (VALUES
        (1, [1, NULL, 3], ['x','y']),
        (2, CAST([] AS INT[]), CAST(NULL AS VARCHAR[]))
    ) t(id, a, b)
    """
    canon_sql = canonicalize_oracle_sql(sql)
    assert canon_sql != sql, "oracle canonicalization did not rewrite [] types"
    o_rows = {r[0]: (r[1], r[2]) for r in con.execute(canon_sql).fetchall()}
    assert s_rows == o_rows == {
        1: ("[1,null,3]", '["x","y"]'),
        2: ("[]", None),
    }


def test_oracle_side_retypes_hugeint_to_bigint():
    if not os.path.isdir(_SF):
        pytest.skip("testdata not generated")
    con = duckdb_conn(_SF)
    sql = "SELECT sum(r_regionkey) AS s FROM region"
    canon = canonicalize_oracle_sql(sql)
    assert "BIGINT" in canon
    (v,) = con.execute(canon).fetchone()
    assert isinstance(v, int)


def test_red_cell_queries_emit_no_container_at_the_boundary(spark):
    """The exact r03 red cells, wrapped the way __spark_entry__ wraps
    them: every boundary cell must be hashable by pandas."""
    if not os.path.isdir(_SF):
        pytest.skip("testdata not generated")
    from ksql_streams_from_schema_converter_spark.workload import WORKLOAD

    for name in (
        "embedding_quantize_int8",
        "inverted_index_postings",
        "array_functions_showcase",
    ):
        fn, _ = WORKLOAD[name]
        out = canonicalize_spark_output(fn(spark, _SF))
        for f in out.schema.fields:
            assert f.dataType.typeName() in (
                "string", "long", "integer", "double", "boolean", "timestamp",
            ), f"{name}.{f.name} boundary type {f.dataType}"
