"""Differential tests mimicking the driver's t2 gate: every workload
query with an oracle must match DuckDB exactly at sf0.001 (fast); the
driver runs the same comparison at sf0.01."""

import os

import pytest

from ksql_streams_from_schema_converter_spark.workload import WORKLOAD

from diffcheck import compare, duckdb_conn

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize(
    "name", [n for n, (_, sql) in WORKLOAD.items() if sql is not None]
)
def test_query_matches_oracle(spark, con, name):
    fn, oracle = WORKLOAD[name]
    df = fn(spark, SF_DIR)
    # repo-wide plan policy, enforced on EVERY registered query (the
    # DataFrame is already built here, so the check is planning-only):
    # no row-at-a-time Python (BatchEvalPython — Arrow-batched
    # MapInPandas/ArrowEvalPython surfaces are the allowed Python
    # path), and no unbroadcast cartesian product (every crossJoin in
    # the repo is a broadcast 1-row scalar aggregate)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    ok, msg = compare(df, con, oracle)
    assert ok, f"{name}: {msg}"


def test_no_rows_only_queries_remain():
    """r5: the last rows-only queries (the ANN family) moved to
    in-query recall verdicts — every registered query now carries an
    oracle, so the old rows-only smoke parametrization is asserted
    empty rather than silently skipping."""
    assert [n for n, (_, sql) in WORKLOAD.items() if sql is None] == []


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
