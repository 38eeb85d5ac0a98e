"""Target-table DDL emission (the reference's 'DDL_SINGLE' /
'DDL_MULTIVALUE' templates, src/controllers/index.js:408,567-570).

The reference targets Oracle — `VARCHAR2` appears in the dictionary
INSERT it emits (src/controllers/index.js:50). The template bodies are
not in the repo, so this pretty-printer reconstructs the observable
contract: a CREATE TABLE matching the sink projection's schema, keyed by
RECID (plus MV_POS for multivalue sinks).
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

_ALIAS_PART_RE = re.compile(r"^c(\d*)(?:_m(\d*))*$")


def added_field_comment(
    schema_name: str,
    name: str,
    alias: str | None,
    doc: str | None,
    out_name: str = "",
) -> str:
    """The ``-- add field`` Oracle-dictionary comment, reconstructed
    verbatim from the reference's addedFieldComment
    (src/controllers/index.js:42-54) and its no-alias fallback
    (:395-399), including the JS quirks a downstream consumer may have
    come to rely on: an empty FM capture renders as nothing, a missing
    VM group renders as the literal ``null`` (JS template coercion),
    ``doc`` defaults to 'S', and a non-matching alias yields
    ``-- INPUT FORMAT ERROR`` (the reference's catch branch)."""
    if not alias:
        return f" -- add field {name} AS {out_name or name}"
    m = _ALIAS_PART_RE.match(alias)
    if m is None:
        return " -- INPUT FORMAT ERROR"
    vm = m.group(2) if m.group(2) else "null"
    return (
        f" -- add field {name} - {alias} || "
        f"INSERT INTO T24BNK.STANDARD_SELECTION_MANUAL "
        f"(PREFIX, TABLE_NAME, FIELD_NAME, FIELD_FM, FIELD_VM, "
        f"FIELD_SINGLE_MULTI, DATA_TYPE) "
        f"VALUES('FBNK', '{schema_name.replace('_', '.')}', "
        f"'{name.replace('_', '.')}', {m.group(1)}, {vm}, "
        f"'{doc or 'S'}', 'VARCHAR2'); commit;"
    )

_ORACLE_TYPES: list[tuple[type, str]] = [
    (T.StringType, "VARCHAR2(4000)"),
    (T.DateType, "DATE"),
    (T.TimestampType, "TIMESTAMP"),
    # parse_timestamp compiles to to_timestamp_ntz (compiler.py:412-415);
    # TimestampNTZType is NOT a subclass of TimestampType, so it needs
    # its own row or NTZ columns silently fall through to VARCHAR2(4000)
    (T.TimestampNTZType, "TIMESTAMP"),
    (T.IntegerType, "NUMBER(10)"),
    (T.LongType, "NUMBER(19)"),
    (T.ShortType, "NUMBER(5)"),
    (T.DoubleType, "BINARY_DOUBLE"),
    (T.FloatType, "BINARY_FLOAT"),
    (T.BooleanType, "NUMBER(1)"),
    (T.BinaryType, "BLOB"),
]


def _oracle_type(dt: T.DataType) -> str:
    if isinstance(dt, T.DecimalType):
        return f"NUMBER({dt.precision},{dt.scale})"
    for spark_t, oracle_t in _ORACLE_TYPES:
        if isinstance(dt, spark_t):
            return oracle_t
    return "VARCHAR2(4000)"  # maps/arrays/structs sink as serialized text


def generate_oracle_ddl(table_name: str, schema: T.StructType, multivalue: bool = False) -> str:
    cols = [f'  "{f.name}" {_oracle_type(f.dataType)}' for f in schema.fields]
    key_cols = [f.name for f in schema.fields if f.name.upper() == "RECID"]
    if multivalue:
        # an exploded sink emits one row per multivalue element, so RECID
        # alone is NOT unique; only claim a key when the position column
        # made it into the projection
        if any(f.name == "MV_POS" for f in schema.fields):
            key_cols.append("MV_POS")
        else:
            key_cols = []
    pk = (
        ",\n  CONSTRAINT pk_{t} PRIMARY KEY ({k})".format(
            t=table_name.lower(), k=", ".join(f'"{c}"' for c in key_cols)
        )
        if key_cols
        else ""
    )
    body = ",\n".join(cols)
    return f'CREATE TABLE T24BNK."{table_name}" (\n{body}{pk}\n);'
