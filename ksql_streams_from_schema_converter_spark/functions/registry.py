"""Whitelisted translation of ksqlDB scalar-function names to Spark SQL.

The reference's generic ``FUNC(args)`` DSL branch and verbatim fallback
(src/controllers/index.js:96-114,145-147) accept *any* function name and
splice it into SQL that is later ``eval``-interpolated — arbitrary code by
design. Our engine replaces that trust with a whitelist: known ksqlDB
names are rewritten to their Spark equivalents; unknown names raise at
compile time instead of failing (or worse) at run time on the cluster.
"""

from __future__ import annotations

import re

# ksqlDB name -> Spark SQL name. Names that are identical in both engines
# are listed explicitly so the whitelist is the single source of truth.
FUNCTION_REGISTRY: dict[str, str] = {
    # string
    "UCASE": "upper",
    "LCASE": "lower",
    "TRIM": "trim",
    "LTRIM": "ltrim",
    "RTRIM": "rtrim",
    "SUBSTRING": "substring",
    "REPLACE": "replace",
    "REGEXP_REPLACE": "regexp_replace",
    "REGEXP_EXTRACT": "regexp_extract",
    "CONCAT": "concat",
    "CONCAT_WS": "concat_ws",
    "LPAD": "lpad",
    "RPAD": "rpad",
    "LEN": "length",
    "INSTR": "instr",
    "SPLIT": "split",
    "INITCAP": "initcap",
    "ENCODE": "encode",
    "CHR": "chr",
    "MASK": "mask",
    # null handling / conditional
    "COALESCE": "coalesce",
    "IFNULL": "ifnull",
    "NULLIF": "nullif",
    # numeric
    "ABS": "abs",
    "CEIL": "ceil",
    "FLOOR": "floor",
    "ROUND": "round",
    "SIGN": "sign",
    "SQRT": "sqrt",
    "LN": "ln",
    "EXP": "exp",
    "POWER": "power",
    "GREATEST": "greatest",
    "LEAST": "least",
    # date/time (ksqlDB PARSE_* -> Spark to_* ; src/controllers/index.js:85,87)
    "PARSE_DATE": "to_date",
    # NTZ: ksqlDB timestamps are zoneless; a zoned parse would shift
    # collected values with the reading process's timezone
    "PARSE_TIMESTAMP": "to_timestamp_ntz",
    "FORMAT_DATE": "date_format",
    "FORMAT_TIMESTAMP": "date_format",
    "DATEADD": "dateadd",
    # arrays (the codec functions the reference emits; src/controllers/index.js:71,78,93)
    "ARRAY_JOIN": "array_join",
    "ARRAY_LENGTH": "size",
    "ARRAY_CONTAINS": "array_contains",
    "ARRAY_DISTINCT": "array_distinct",
    "ARRAY_MAX": "array_max",
    "ARRAY_MIN": "array_min",
    "REGEXP_SPLIT_TO_ARRAY": "split",
    "TRANSFORM": "transform",
    "FILTER": "filter",
    "SLICE": "slice",
    # bytes
    "FROM_BYTES": "unhex",  # only the 'hex' variant is used (src/controllers/index.js:307)
    "TO_BYTES": "hex",
    "MD5": "md5",
    # the reference's custom SEAB_* UDFs are handled structurally by the
    # compiler (functions/t24.py), but allow direct mention too:
    "SEAB_FIELD": "__seab_field__",
    "SEAB_HEXTOTEXT": "__seab_hextotext__",
}

_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


class UnknownFunctionError(ValueError):
    pass


def translate_function(ksql_name: str) -> str:
    """Translate an (uppercased) ksqlDB function name to its Spark SQL
    name, raising :class:`UnknownFunctionError` for anything not
    whitelisted."""
    name = ksql_name.upper().strip()
    if not _NAME_RE.match(name):
        raise UnknownFunctionError(f"invalid function name: {ksql_name!r}")
    try:
        return FUNCTION_REGISTRY[name]
    except KeyError:
        raise UnknownFunctionError(
            f"function {ksql_name!r} is not in the whitelist; add it to "
            "FUNCTION_REGISTRY if it has a Spark equivalent"
        ) from None
