"""Golden tests for the T24 multivalue codec (SURVEY.md §2.3 / FIXTURES.md §4)."""

from pyspark.sql import functions as F

from ksql_streams_from_schema_converter_spark.functions import t24

MV = "1:VND100#2:USD200#3:EUR300"
SUBV = "s1:0.0125#s2:0.0250"
INPUTTER = "1:9901_OPERATOR1_X#s2:9902_OPERATOR2_Y"


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).head()[0]


def test_mv_array(spark):
    df = spark.createDataFrame([(MV,)], "c string")
    assert df.select(t24.mv_array("c").alias("v")).head()[0] == ["VND100", "USD200", "EUR300"]


def test_mv_array_subvalues(spark):
    df = spark.createDataFrame([(SUBV,)], "c string")
    assert df.select(t24.mv_array("c").alias("v")).head()[0] == ["0.0125", "0.0250"]


def test_mv_array_no_ordinals(spark):
    df = spark.createDataFrame([("a#b#c",)], "c string")
    assert df.select(t24.mv_array("c").alias("v")).head()[0] == ["a", "b", "c"]


def test_mv_array_empty_elements_dropped(spark):
    df = spark.createDataFrame([("1:a##3:c",)], "c string")
    assert df.select(t24.mv_array("c").alias("v")).head()[0] == ["a", "c"]


def test_mv_join(spark):
    df = spark.createDataFrame([(MV,)], "c string")
    assert df.select(t24.mv_join("c", ",").alias("v")).head()[0] == "VND100,USD200,EUR300"
    assert df.select(t24.mv_join("c").alias("v")).head()[0] == "VND100 USD200 EUR300"


def test_mv_element(spark):
    df = spark.createDataFrame([(MV,)], "c string")
    assert df.select(t24.mv_element("c", 2).alias("v")).head()[0] == "USD200"
    # ksqlDB out-of-range -> NULL
    assert df.select(t24.mv_element("c", 9).alias("v")).head()[0] is None


def test_seab_field(spark):
    df = spark.createDataFrame([("9901_OPERATOR1_X",), ("plain",)], "c string")
    rows = df.select(t24.seab_field("c").alias("v")).collect()
    assert rows[0][0] == "OPERATOR1"
    assert rows[1][0] is None  # null-safe when no 2nd token


def test_inputter_his(spark):
    df = spark.createDataFrame([(INPUTTER,)], "c string")
    assert df.select(t24.inputter_his("c").alias("v")).head()[0] == "OPERATOR1 OPERATOR2"


def test_inputter_his_null_token_stripped(spark):
    # an element without '_' yields NULL -> rendered 'null' -> stripped
    df = spark.createDataFrame([("1:9901_OP1_X#2:plain#3:9903_OP3_Y",)], "c string")
    # tokens -> ['OP1', NULL, 'OP3']; join renders NULL as 'null'; 'null ' stripped
    assert df.select(t24.inputter_his("c").alias("v")).head()[0] == "OP1 OP3"


def test_blob_hex_roundtrip(spark):
    df = spark.createDataFrame([("48656C6C6F",)], "c string")
    assert df.select(t24.blob_hex_to_text("c").alias("v")).head()[0] == "Hello"


def test_blob_to_map(spark):
    blob = "ACCTý100þNAMEýAliceþEMPTY"
    df = spark.createDataFrame([(blob,)], "c string")
    m = df.select(t24.blob_to_map("c").alias("v")).head()[0]
    assert m == {"ACCT": "100", "NAME": "Alice", "EMPTY": None}
