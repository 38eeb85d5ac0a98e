"""Service-surface tests: the reference's endpoint shapes work end-to-end."""

import pytest

from ksql_streams_from_schema_converter_spark import api
from ksql_streams_from_schema_converter_spark.operators.compiler import FieldSpec
from ksql_streams_from_schema_converter_spark.plans.registry import SchemaRegistry

REQUEST = {
    "collectionName": "t24",
    "procName": "CUSTOMER_PROC",
    "schemaName": "FBNK_CUSTOMER",
    "procType": "XML",
    "procData": [
        {"name": "RECID", "transformation": "UCASE($)", "type": ["string", "string"],
         "nested": "", "aliases": [], "should_parse_sv": True},
        {"name": "VALUE_DATE", "transformation": "parse_date",
         "type": ["string", "date"], "nested": "", "aliases": [],
         "should_parse_sv": True},
        {"name": "ACCT_NO", "transformation": "", "type": ["string", "string"],
         "nested": "", "aliases": [], "should_parse_sv": False,
         "should_parse_vm": True},
    ],
}


def test_etl_pipeline_endpoint(spark):
    raw = spark.createDataFrame(
        [("r1", {"VALUE_DATE": "20240101", "ACCT_NO_multivalue": "1:A#2:B"})],
        "recid string, xmlrecord map<string,string>",
    )
    resp = api.etl_pipeline(REQUEST, source=raw)
    rows = resp.result.sink.collect()
    assert len(rows) == 2  # VM explode
    assert resp.stmt_ddl and "CREATE TABLE" in resp.stmt_ddl


def test_etl_pipeline_unbound():
    resp = api.etl_pipeline(REQUEST)
    assert resp.result is None
    assert resp.pipeline.spec.schema_name == "FBNK_CUSTOMER"


def test_proc_data_roundtrip(tmp_path):
    reg = SchemaRegistry()
    reg.put("FBNK_X", [FieldSpec(name="A", transformation="parse_date")])
    reg.save(str(tmp_path / "reg.json"))
    reg2 = SchemaRegistry(str(tmp_path / "reg.json"))
    doc = api.get_proc_data(reg2, "FBNK_X")
    assert doc["schema_name"] == "FBNK_X"
    assert doc["fields"][0]["transformation"] == "parse_date"
    with pytest.raises(KeyError):
        api.get_proc_data(reg2, "MISSING")


def test_execute_passthrough(spark):
    api.create_test_data(spark, "/root/testdata/sf0.001")
    df = api.execute(
        spark,
        "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag",
    )
    assert df.count() > 0


def test_template_registry_crud(tmp_path):
    """Full template CRUD parity with src/services/index.js:43-79."""
    from ksql_streams_from_schema_converter_spark.plans.registry import TemplateRegistry

    reg = TemplateRegistry()
    reg.update_all(
        [
            {"template_name": "RAW", "template": "CREATE STREAM `x` ..."},
            {"template_name": "SINK", "template": "CREATE STREAM s AS SELECT *"},
        ]
    )
    assert [d["template_name"] for d in api.get_templates(reg)] == ["RAW", "SINK"]
    # get-by-name backtick-escapes exactly like the reference (:74)
    assert api.get_template(reg, "RAW") == "CREATE STREAM \\`x\\` ..."
    # bulk update: falsy template deletes; bad rows are skipped not fatal
    api.update_templates(
        reg,
        [
            {"template_name": "RAW", "template": ""},
            {"no_name_key": True},
            {"template_name": "SINK", "template": "CREATE STREAM s2 AS SELECT 1"},
        ],
    )
    assert reg.names() == ["SINK"]
    assert "s2" in api.get_template(reg, "SINK")
    with pytest.raises(KeyError):
        api.get_template(reg, "RAW")
    # persistence round-trip
    p = tmp_path / "templates.json"
    reg.save(str(p))
    reg2 = TemplateRegistry(str(p))
    assert reg2.names() == ["SINK"]


def test_schema_registry_bulk_update():
    """SchemaRegistry gains the same bulk upsert/delete shape."""
    reg = SchemaRegistry()
    reg.update_all(
        [
            {"schema_name": "A", "fields": [{"name": "F1", "transformation": ""}]},
            {"schema_name": "B", "fields": [{"name": "F2", "transformation": ""}]},
        ]
    )
    assert reg.names() == ["A", "B"]
    assert [d["schema_name"] for d in reg.get_all()] == ["A", "B"]
    reg.update_all(
        [
            {"schema_name": "A", "fields": []},  # falsy -> remove
            {"fields": [{"name": "X"}]},  # bad row skipped
        ]
    )
    assert reg.names() == ["B"]
