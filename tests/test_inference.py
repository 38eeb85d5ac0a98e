"""Schema inference (plans/inference.py): classification of field
types, vm/vs routing, and tolerance to dirty values."""

import pytest
from pyspark.sql import functions as F

from ksql_streams_from_schema_converter_spark.plans.inference import infer_field_specs
from ksql_streams_from_schema_converter_spark.sources.t24_fixture import orders_cdc

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fixture_specs(spark):
    return {s.name: s for s in infer_field_specs(orders_cdc(spark, SF_DIR))}


def test_infers_types_from_fixture(fixture_specs):
    s = fixture_specs
    assert s["ORDER_DATE"].transformation == "parse_date"
    assert s["ORDER_DATE"].type[1] == "date"
    assert s["LOCALREF_CUST"].type[1] == "bigint"
    assert s["TOTAL"].type[1].startswith("decimal(")
    assert s["STATUS"].type[1] == "string"
    assert s["RECID"].type[1] == "string"


def test_infers_multivalue_routing(fixture_specs):
    s = fixture_specs
    assert s["PART"].should_parse_vm and not s["PART"].should_parse_vs
    assert s["QTY"].should_parse_vs and not s["QTY"].should_parse_vm
    # INPUTTER has embedded '#sN:' markers but a plain leading ordinal → vm
    assert s["INPUTTER"].should_parse_vm and not s["INPUTTER"].should_parse_vs
    assert s["PART"].type[1] == "bigint"  # element type, not packed-string type
    assert s["QTY"].type[1].startswith("decimal(")


def _cdc_of(spark, rows):
    return spark.createDataFrame(
        [(str(i), m) for i, m in enumerate(rows)], "recid string, xmlrecord map<string,string>"
    )


def test_dirty_values_within_tolerance(spark):
    # 1 bad date in 200 (< 1% default tolerance) still infers parse_date
    rows = [{"D": "20240115"}] * 199 + [{"D": "oops"}]
    specs = {s.name: s for s in infer_field_specs(_cdc_of(spark, rows))}
    assert specs["D"].transformation == "parse_date"
    # 5 in 100 bad → falls back to string
    rows = [{"D": "20240115"}] * 95 + [{"D": "oops"}] * 5
    specs = {s.name: s for s in infer_field_specs(_cdc_of(spark, rows))}
    assert specs["D"].transformation == "" and specs["D"].type[1] == "string"


def test_empty_values_ignored_and_invalid_dates_rejected(spark):
    # empty strings don't count against the match fraction
    rows = [{"N": "42"}] * 10 + [{"N": ""}] * 10
    specs = {s.name: s for s in infer_field_specs(_cdc_of(spark, rows))}
    assert specs["N"].type[1] == "bigint"
    # 8 digits but not a real date (month 13) → stays numeric, not a date
    rows = [{"X": "20241301"}] * 10
    specs = {s.name: s for s in infer_field_specs(_cdc_of(spark, rows))}
    assert specs["X"].transformation == ""
    assert specs["X"].type[1] == "bigint"


def test_timestamp_and_decimal_sizing(spark):
    rows = [{"TS": "2401151230", "AMT": "12345.678"}] * 10
    specs = {s.name: s for s in infer_field_specs(_cdc_of(spark, rows))}
    assert specs["TS"].transformation == "parse_timestamp"
    assert specs["AMT"].type[1] == "decimal(8,3)"


def test_inference_deterministic_across_partitioning(spark):
    cdc = orders_cdc(spark, SF_DIR)
    a = infer_field_specs(cdc)
    b = infer_field_specs(cdc.repartition(13))
    assert [s.to_dict() for s in a] == [s.to_dict() for s in b]


def test_inferred_pipeline_runs(spark, fixture_specs):
    from ksql_streams_from_schema_converter_spark.plans.pipeline import (
        EtlPipeline,
        PipelineSpec,
    )

    cdc = orders_cdc(spark, SF_DIR)
    spec = PipelineSpec(schema_name="INFERRED", fields=list(fixture_specs.values()))
    out = EtlPipeline(spec).apply(cdc).sink
    assert out.where(F.col("PART").isNotNull()).count() > 0
    assert dict(out.dtypes)["ORDER_DATE"] == "date"
