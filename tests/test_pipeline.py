"""End-to-end pipeline topology tests (SURVEY.md §0 topology; FIXTURES.md §1-2)."""

import datetime

import pytest

from ksql_streams_from_schema_converter_spark.operators.compiler import FieldSpec
from ksql_streams_from_schema_converter_spark.plans.pipeline import EtlPipeline, PipelineSpec

XML_ROW = (
    "CUST-1",
    {
        "CUSTOMER_NO": "100123",
        "VALUE_DATE": "20240215",
        "LAST_UPDATE": "2402151030",
        "SHORT_NAME": "ALICE",
        "ACCT_NO": "1:VND100#2:USD200#3:EUR300",
        "ACCT_NO_multivalue": "1:VND100#2:USD200#3:EUR300",
        "CCY_multivalue": "1:VND#2:USD#3:EUR",
        "RATE_multivalue": "s1:0.0125#s2:0.0250#s3:0.05",
        "INPUTTER_multivalue": "1:9901_OP1_X#s2:9902_OP2_Y",
    },
)
EMPTY_ROW = ("CUST-2", {"CUSTOMER_NO": "200456", "VALUE_DATE": "20240101"})


@pytest.fixture(scope="module")
def raw_xml(spark):
    return spark.createDataFrame(
        [XML_ROW, EMPTY_ROW], "recid string, xmlrecord map<string,string>"
    )


def test_xml_single_value_pipeline(raw_xml):
    spec = PipelineSpec(
        schema_name="FBNK_CUSTOMER",
        fields=[
            FieldSpec(name="RECID", transformation="UCASE($)"),
            FieldSpec(name="CUSTOMER_NO"),
            FieldSpec(name="VALUE_DATE", transformation="parse_date", type=("string", "date")),
            FieldSpec(name="LAST_UPDATE", transformation="parse_timestamp"),
            FieldSpec(name="ACCT_NO", transformation="string-join(',')"),
        ],
    )
    res = EtlPipeline(spec).apply(raw_xml)
    rows = {r["RECID"]: r for r in res.sink.collect()}
    assert len(rows) == 2  # single-value pipeline: no explosion
    assert rows["CUST-1"]["ACCT_NO"] == "VND100,USD200,EUR300"
    assert rows["CUST-1"]["VALUE_DATE"] == datetime.date(2024, 2, 15)
    assert rows["CUST-1"]["LAST_UPDATE"] == datetime.datetime(2024, 2, 15, 10, 30)
    assert rows["CUST-2"]["ACCT_NO"] is None
    assert 'CREATE TABLE T24BNK."FBNK_CUSTOMER_SINK"' in res.ddl
    assert '"VALUE_DATE" DATE' in res.ddl
    # parse_timestamp compiles to TimestampNTZType, which is NOT a
    # TimestampType subclass — regression guard for the _ORACLE_TYPES row
    assert '"LAST_UPDATE" TIMESTAMP' in res.ddl


def test_xml_multivalue_pipeline(raw_xml):
    spec = PipelineSpec(
        schema_name="FBNK_ACCOUNT",
        fields=[
            FieldSpec(name="RECID", transformation="UCASE($)"),
            FieldSpec(name="CUSTOMER_NO"),
            FieldSpec(name="INPUTTER_HIS", transformation="x"),
            FieldSpec(name="ACCT_NO", should_parse_sv=False, should_parse_vm=True),
            FieldSpec(name="CCY", should_parse_sv=False, should_parse_vm=True),
            FieldSpec(
                name="RATE",
                type=("string", "decimal(18,4)"),
                should_parse_sv=False,
                should_parse_vs=True,
            ),
        ],
    )
    res = EtlPipeline(spec).apply(raw_xml)
    rows = res.sink.collect()
    by_key = {(r["RECID"], r["ACCT_NO"]): r for r in rows}
    # CUST-1 explodes to 3 rows (one per VM element), CUST-2 to 1 null row
    assert len(rows) == 4
    r2 = by_key[("CUST-1", "USD200")]
    assert r2["CCY"] == "USD"
    assert str(r2["RATE"]) == "0.0250"
    assert r2["CUSTOMER_NO"] == "100123"
    assert r2["INPUTTER_HIS"] == "OP1 OP2"
    # empty-multivalue record survives with NULL elements (outer explode)
    assert ("CUST-2", None) in by_key
    # MV_POS is not in this sink projection, so the exploded table has
    # no unique key to claim — the DDL must NOT assert a PK on RECID
    assert "PRIMARY KEY" not in res.ddl


def test_blob_fe_pipeline(spark):
    # NAME<FD>value pairs joined by <FE>, hex-encoded (ISO-8859-1 bytes)
    payload = "CUSTOMER_NOý100123þVALUE_DATEý20240215"
    hex_payload = payload.encode("ISO-8859-1").hex().upper()
    raw = spark.createDataFrame([("B-1", hex_payload)], "recid string, value_hex string")
    spec = PipelineSpec(
        schema_name="FBNK_BLOB",
        proc_type="BLOB",
        blob_delim="FE",
        fields=[
            FieldSpec(name="RECID", transformation="UCASE($)"),
            FieldSpec(name="CUSTOMER_NO"),
            FieldSpec(name="VALUE_DATE", transformation="parse_date", type=("string", "date")),
        ],
    )
    res = EtlPipeline(spec).apply(raw)
    row = res.sink.head()
    assert row["CUSTOMER_NO"] == "100123"
    assert row["VALUE_DATE"] == datetime.date(2024, 2, 15)


def test_blob_fefd_multivalue_pipeline(spark):
    payload = "CUSTOMER_NOý100123þACCT_NOý1:A#2:B"
    hex_payload = payload.encode("ISO-8859-1").hex()
    raw = spark.createDataFrame([("B-2", hex_payload)], "recid string, value_hex string")
    spec = PipelineSpec(
        schema_name="FBNK_BLOB_MV",
        proc_type="BLOB",
        blob_delim="FEFD",
        fields=[
            FieldSpec(name="CUSTOMER_NO"),
            FieldSpec(name="ACCT_NO", should_parse_sv=False, should_parse_vm=True),
        ],
    )
    res = EtlPipeline(spec).apply(raw)
    vals = sorted(r["ACCT_NO"] for r in res.sink.collect())
    assert vals == ["A", "B"]


def test_blob_split_pipeline(spark):
    payload = "9901_OPERATOR1_X"
    raw = spark.createDataFrame(
        [("B-3", payload.encode().hex())], "recid string, value_hex string"
    )
    spec = PipelineSpec(
        schema_name="FBNK_SPLIT",
        proc_type="BLOB",
        blob_delim="SPLIT",
        fields=[
            FieldSpec(name="RECID", transformation="UCASE($)"),
            # every field carves out of the whole decoded blob
            FieldSpec(name="OPERATOR", transformation="seab_field"),
            FieldSpec(name="PART1", transformation="SUBSTRING($,1,4) HEAD"),
        ],
    )
    res = EtlPipeline(spec).apply(raw)
    row = res.sink.head()
    assert row["RECID"] == "B-3"
    assert row["OPERATOR"] == "OPERATOR1"
    assert row["HEAD"] == "9901"


def test_pipeline_spec_from_request_dict():
    spec = PipelineSpec.from_dict(
        {
            "collectionName": "t24",
            "procName": "P1",
            "schemaName": "FBNK_X",
            "procType": "XML",
            "procData": [
                {"name": "A", "transformation": "", "type": ["string", "string"],
                 "nested": "", "aliases": [], "should_parse_sv": True},
                {"name": "B", "should_parse_sv": False, "should_parse_vm": True},
            ],
        }
    )
    assert spec.schema_name == "FBNK_X"
    assert [f.name for f in spec.single_values] == ["A"]
    assert [f.name for f in spec.vms] == ["B"]
