"""Batch/stream parity: the same compiled pipeline under readStream
(SURVEY.md §5 item 4)."""

import os
import tempfile
import uuid

import pytest

from ksql_streams_from_schema_converter_spark.operators.compiler import FieldSpec
from ksql_streams_from_schema_converter_spark.plans.pipeline import EtlPipeline, PipelineSpec
from ksql_streams_from_schema_converter_spark.streaming.runner import stream_to_batch

SPEC = PipelineSpec(
    schema_name="FBNK_STREAM",
    fields=[
        FieldSpec(name="RECID", transformation="UCASE($)"),
        FieldSpec(name="CUSTOMER_NO"),
        FieldSpec(name="ACCT_NO", should_parse_sv=False, should_parse_vm=True),
    ],
)

ROWS = [
    ("c-1", {"CUSTOMER_NO": "1", "ACCT_NO_multivalue": "1:A#2:B"}),
    ("c-2", {"CUSTOMER_NO": "2", "ACCT_NO_multivalue": "1:C"}),
]
SCHEMA = "recid string, xmlrecord map<string,string>"


def test_stream_matches_batch(spark):
    tmp = os.path.join(tempfile.gettempdir(), f"t24_src_{uuid.uuid4().hex}")
    spark.createDataFrame(ROWS, SCHEMA).write.parquet(tmp)

    batch_out = EtlPipeline(SPEC).apply(spark.read.parquet(tmp)).sink
    stream_src = spark.readStream.schema(SCHEMA).parquet(tmp)
    stream_out = stream_to_batch(spark, SPEC, stream_src)

    key = lambda r: (r["RECID"], r["ACCT_NO"] or "")
    assert sorted(map(key, batch_out.collect())) == sorted(map(key, stream_out.collect()))
    assert set(batch_out.columns) == set(stream_out.columns)
