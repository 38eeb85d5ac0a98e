"""Table-driven tests over every DSL branch (SURVEY.md §2.3, FIXTURES.md §3)."""

import datetime
from decimal import Decimal

import pytest

from ksql_streams_from_schema_converter_spark.functions.registry import UnknownFunctionError
from ksql_streams_from_schema_converter_spark.operators.compiler import (
    BlobResolver,
    CompileError,
    ExplodedResolver,
    FieldSpec,
    MappedResolver,
    compile_field,
    rewrite_ksql_sql,
)

XMLRECORD = {
    "CUSTOMER_NO": "100123",
    "VALUE_DATE": "20240215",
    "AUDIT_TS": "2402151030",
    "SHORT_NAME": "NGUYEN VAN A WITH A VERY LONG NAME PAST 35 CHARS",
    "ACCT_NO": "1:VND100#2:USD200#3:EUR300",
    "ACCT_NO_multivalue": "1:VND100#2:USD200#3:EUR300",
    "INPUTTER_multivalue": "1:9901_OPERATOR1_X#s2:9902_OPERATOR2_Y",
    "LOCALREF_BRANCH_CODE": "  HN001  ",
    "RATE_multivalue": "s1:0.0125#s2:0.0250",
    "OFFICER": "12_JOHN_7",
}


@pytest.fixture(scope="module")
def t24_df(spark):
    return spark.createDataFrame(
        [("1234567890", XMLRECORD)], "recid string, xmlrecord map<string,string>"
    )


def run(t24_df, spec):
    cf = compile_field(spec, MappedResolver(), schema_name="FBNK_CUSTOMER")
    row = t24_df.select(cf.column).head()
    return cf, row[0], row.__fields__[0]


def test_identity(t24_df):
    cf, val, name = run(t24_df, FieldSpec(name="CUSTOMER_NO"))
    assert (val, name) == ("100123", "CUSTOMER_NO")


def test_recid_source_override(t24_df):
    _, val, name = run(t24_df, FieldSpec(name="RECID"))
    # RECID with empty transformation resolves to the map in the reference
    # only via FUNC branch; identity goes through xmlrecord -> NULL here,
    # matching `DATA.XMLRECORD['RECID']` (reference :74).
    assert val is None


def test_recid_func(t24_df):
    _, val, name = run(t24_df, FieldSpec(name="RECID", transformation="UCASE($)"))
    assert (val, name) == ("1234567890", "RECID")


def test_parse_date(t24_df):
    _, val, _ = run(
        t24_df, FieldSpec(name="VALUE_DATE", transformation="parse_date", type=("string", "date"))
    )
    assert val == datetime.date(2024, 2, 15)


def test_parse_timestamp(t24_df):
    _, val, _ = run(
        t24_df,
        FieldSpec(name="AUDIT_TS", transformation="parse_timestamp", type=("string", "timestamp")),
    )
    assert val == datetime.datetime(2024, 2, 15, 10, 30)


def test_substring_fixed_35(t24_df):
    _, val, _ = run(t24_df, FieldSpec(name="SHORT_NAME", transformation="substring"))
    assert val == XMLRECORD["SHORT_NAME"][:35]


def test_string_join_default_sep(t24_df):
    _, val, _ = run(t24_df, FieldSpec(name="ACCT_NO", transformation="string-join"))
    assert val == "VND100 USD200 EUR300"


def test_string_join_custom_sep(t24_df):
    _, val, _ = run(t24_df, FieldSpec(name="ACCT_NO", transformation="string-join(',')"))
    assert val == "VND100,USD200,EUR300"


def test_index(t24_df):
    _, val, _ = run(t24_df, FieldSpec(name="ACCT_NO", transformation="[2]"))
    assert val == "USD200"


def test_index_out_of_range_null(t24_df):
    _, val, _ = run(t24_df, FieldSpec(name="ACCT_NO", transformation="[9]"))
    assert val is None


def test_index_subvalue(t24_df):
    _, val, _ = run(t24_df, FieldSpec(name="RATE", transformation="[2]"))
    assert val == "0.0250"


def test_seab_field(t24_df):
    _, val, _ = run(t24_df, FieldSpec(name="OFFICER", transformation="seab_field"))
    assert val == "JOHN"


def test_inputter_his(t24_df):
    _, val, name = run(t24_df, FieldSpec(name="INPUTTER_HIS", transformation="whatever"))
    assert (val, name) == ("OPERATOR1 OPERATOR2", "INPUTTER_HIS")


def test_localref_strip(t24_df):
    _, val, name = run(t24_df, FieldSpec(name="LOCALREF_BRANCH_CODE"))
    assert (val, name) == ("  HN001  ", "BRANCH_CODE")


def test_nested_wrap_and_realias(t24_df):
    _, val, name = run(
        t24_df, FieldSpec(name="LOCALREF_BRANCH_CODE", nested="TRIM($) BRANCH")
    )
    assert (val, name) == ("HN001", "BRANCH")


def test_generic_func_ucase_alias(t24_df):
    _, val, name = run(
        t24_df, FieldSpec(name="CUSTOMER_NO", transformation="CONCAT($, '-X') CUST_TAG")
    )
    assert (val, name) == ("100123-X", "CUST_TAG")


def test_generic_func_dollar_dollar(t24_df):
    # $$ -> the literal field name spliced into the args
    _, val, _ = run(
        t24_df, FieldSpec(name="CUSTOMER_NO", transformation="CONCAT('F:', '$$') TAG")
    )
    assert val == "F:CUSTOMER_NO"


def test_func_no_alias_falls_back_to_name(t24_df):
    _, val, name = run(t24_df, FieldSpec(name="CUSTOMER_NO", transformation="UCASE($)"))
    assert (val, name) == ("100123", "CUSTOMER_NO")


def test_func_indexed_with_auto_params_parse_date(t24_df):
    # multivalue date element 2 -> parse_date params auto-inferred
    df_spec = FieldSpec(name="DATES", transformation="parse_date([2])", type=("string", "date"))
    import copy

    rec = dict(XMLRECORD)
    rec["DATES_multivalue"] = "1:20240101#2:20240215"
    df = t24_df.sparkSession.createDataFrame(
        [("r1", rec)], "recid string, xmlrecord map<string,string>"
    )
    cf = compile_field(df_spec, MappedResolver())
    assert df.select(cf.column).head()[0] == datetime.date(2024, 2, 15)


def test_func_indexed_explicit_params(t24_df):
    _, val, _ = run(
        t24_df, FieldSpec(name="ACCT_NO", transformation="SUBSTRING([1] ,1,3) A3")
    )
    assert val == "VND"


def test_cast(t24_df):
    _, val, _ = run(
        t24_df,
        FieldSpec(name="RATE", transformation="[1]", type=("string", "decimal(18,4)")),
    )
    assert val == Decimal("0.0125")


def test_verbatim_fallback(t24_df):
    _, val, name = run(
        t24_df,
        FieldSpec(
            name="LEGACY_EXPR",
            transformation="COALESCE(DATA.XMLRECORD['MISSING'], '-')",
        ),
    )
    assert (val, name) == ("-", "LEGACY_EXPR")


def test_verbatim_skips_cast_and_nested(t24_df):
    # reference returns verbatim immediately (:145-147) — no CAST, no nested
    cf, val, _ = run(
        t24_df,
        FieldSpec(
            name="LEGACY_EXPR",
            transformation="COALESCE(DATA.XMLRECORD['MISSING'], '-')",
            type=("string", "int"),
            nested="TRIM($) X",
        ),
    )
    assert "CAST" not in cf.sql and val == "-"


def test_unknown_function_fails_loudly():
    with pytest.raises(UnknownFunctionError):
        compile_field(
            FieldSpec(name="X", transformation="EVIL_FUNC($)"), MappedResolver()
        )


def test_func_without_dollar_or_index_is_verbatim(t24_df):
    # FUNC-shaped with neither '$' nor '[n]' args: the reference emits the
    # literal "undefined" (bug); we route it through the verbatim path.
    _, val, _ = run(
        t24_df, FieldSpec(name="X", transformation="TRIM('  padded  ')")
    )
    assert val == "padded"


def test_added_field_metadata(t24_df):
    cf, _, _ = run(
        t24_df,
        FieldSpec(
            name="NEW_FIELD",
            transformation="",
            aliases=["c12_m3"],
            doc="M",
            is_added_field=True,
        ),
    )
    # reference addedFieldComment (:42-54)
    assert cf.added_field == {
        "name": "NEW_FIELD",
        "alias": "c12_m3",
        "prefix": "FBNK",
        "table_name": "FBNK.CUSTOMER",
        "field_name": "NEW.FIELD",
        "field_fm": "12",
        "field_vm": "3",
        "field_single_multi": "M",
        "data_type": "VARCHAR2",
        "comment": (
            " -- add field NEW_FIELD - c12_m3 || "
            "INSERT INTO T24BNK.STANDARD_SELECTION_MANUAL "
            "(PREFIX, TABLE_NAME, FIELD_NAME, FIELD_FM, FIELD_VM, "
            "FIELD_SINGLE_MULTI, DATA_TYPE) "
            "VALUES('FBNK', 'FBNK.CUSTOMER', 'NEW.FIELD', 12, 3, "
            "'M', 'VARCHAR2'); commit;"
        ),
    }


def test_exploded_resolver(spark):
    df = spark.createDataFrame([("r1", "VND100")], "recid string, ACCT_NO string")
    cf = compile_field(
        FieldSpec(name="ACCT_NO", transformation="UCASE($) ACCT"), ExplodedResolver()
    )
    row = df.select(cf.column).head()
    assert (row[0], row.__fields__[0]) == ("VND100", "ACCT")


def test_blob_resolver(spark):
    df = spark.createDataFrame([("r1", "A_B_C",)], "recid string, blob string")
    cf = compile_field(
        FieldSpec(name="ANY", transformation="seab_field"), BlobResolver("blob")
    )
    assert df.select(cf.column).head()[0] == "B"


def test_rewrite_ksql_sql():
    assert (
        rewrite_ksql_sql("UCASE(DATA.XMLRECORD['F'])")
        == "upper(element_at(xmlrecord, 'F'))"
    )
    assert rewrite_ksql_sql("SEAB_FIELD(x,'_',2)") == "try_element_at(split(x, '_'), 2)"
    # FILTER keeps its (case-insensitive) name; the lambda arrow is rewritten
    assert (
        rewrite_ksql_sql("FILTER(a, (X) => (X <> ''))") == "FILTER(a, (X) -> (X <> ''))"
    )
