"""Driver-boundary output canonicalization.

The verification driver hashes query results after converting both
engines' outputs to a common form, but its canonicalization of DECIMAL
and DATE values differs between Spark and DuckDB: round 1 showed every
query emitting a DECIMAL or DATE column hash-red with bit-identical
values, while every query emitting only string/bigint/double/timestamp
hashed green.

Parity therefore means presenting those types in a hash-stable form on
BOTH sides of the differential gate. We canonicalize at the driver
boundary (``__spark_entry__``), not inside the queries: the engine keeps
exact DECIMAL arithmetic end-to-end (summation stays order-independent),
and only the final projection handed to the driver re-types columns.

Canonical form: DECIMAL → STRING, DATE → STRING (ISO). A decimal value
cast to string is exact — both engines print the full stored value at
the column's scale ("904045.72", "-0.50") — unlike a double round-trip,
which would re-introduce float formatting as a failure mode. Dates print
ISO "yyyy-MM-dd" in both engines. The driver's column-name-sorted value
hash then sees byte-identical strings.

ARRAY (round 3's red class: the driver's pandas value-hash raises
``TypeError: unhashable type: 'list'`` before comparing anything) →
compact JSON text via ``to_json`` on BOTH engines. Verified
byte-identical for the boundary cases: ``[1,2,3]``, ``["x","y"]``,
``[1,null,3]``, ``[]``, and NULL arrays (both engines emit SQL NULL).
Element types at the driver boundary are integer/string only (asserted
by tests/test_canon.py) — float formatting inside JSON is NOT relied
on.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: sf dir used only to *bind* oracle SQL in DuckDB for output-type
#: discovery (no query execution) — types are scale-independent.
_TYPING_SF_DIRS = ("/root/testdata/sf0.01", "/root/testdata/sf0.001")


def canonicalize_spark_output(df: DataFrame) -> DataFrame:
    """Re-type DECIMAL/DATE columns of a final result to strings and
    ARRAY columns to compact-JSON strings.

    Top-level columns only: no workload query emits nested decimals or
    dates at the driver boundary (asserted by tests/test_canon.py).
    """
    from pyspark.sql import types as T

    cols = []
    changed = False
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.DecimalType, T.DateType)):
            cols.append(F.col(f.name).cast("string").alias(f.name))
            changed = True
        elif isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            cols.append(F.to_json(F.col(f.name)).alias(f.name))
            changed = True
        else:
            cols.append(F.col(f.name))
    return df.select(*cols) if changed else df


def _duckdb_output_types(sql: str) -> list[tuple[str, str]] | None:
    """Bind ``sql`` in an in-memory DuckDB over the testdata views and
    return [(column, type_str), ...] without executing the query.
    Returns None when binding is impossible (no testdata on disk)."""
    import duckdb

    sf_dir = next((d for d in _TYPING_SF_DIRS if os.path.isdir(d)), None)
    if sf_dir is None:
        return None
    con = duckdb.connect()
    try:
        for t in (
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        ):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        rel = con.sql(sql)
        return list(zip(rel.columns, (str(t) for t in rel.types)))
    finally:
        con.close()


#: successful-typings-only cache (ADVICE r4: lru_cache would also pin
#: the identity fallback taken when DuckDB typing is unavailable —
#: e.g. testdata not yet generated — silently disabling canonicalization
#: for that query for the process lifetime)
_CANON_CACHE: dict[str, str] = {}


def canonicalize_oracle_sql(sql: str) -> str:
    """Wrap oracle SQL so DECIMAL/DATE output columns become VARCHAR and
    HUGEINT columns become BIGINT, mirroring
    :func:`canonicalize_spark_output` on the DuckDB side.

    HUGEINT: DuckDB types ``sum(<integer>)`` as int128, which the
    driver's value hash canonicalizes differently from Spark's int64
    even when values are bit-identical (round-2 ``json_props_extract``).
    BIGINT is the canonical form — it matches Spark's LongType sum
    exactly, and a value outside int64 fails loudly in DuckDB just as
    the Spark sum could not have produced it.

    LIST/STRUCT/MAP (round-3 red class): ``to_json`` → VARCHAR, the
    mirror of the Spark-side ``F.to_json`` — both engines emit the same
    compact JSON text (no spaces, ``null`` for null elements, SQL NULL
    for a null container).
    """
    if sql in _CANON_CACHE:
        return _CANON_CACHE[sql]
    typed = _duckdb_output_types(sql)
    if typed is None:
        return sql  # NOT cached: retry once typing becomes possible
    select_list = []
    changed = False
    for name, typ in typed:
        if typ.startswith("DECIMAL") or typ == "DATE":
            select_list.append(f'CAST("{name}" AS VARCHAR) AS "{name}"')
            changed = True
        elif typ in ("HUGEINT", "UHUGEINT"):
            select_list.append(f'CAST("{name}" AS BIGINT) AS "{name}"')
            changed = True
        elif typ.endswith("[]") or typ.startswith(("STRUCT(", "MAP(")):
            select_list.append(
                f'CAST(to_json("{name}") AS VARCHAR) AS "{name}"'
            )
            changed = True
        else:
            select_list.append(f'"{name}"')
    out = (
        sql
        if not changed
        else f"SELECT {', '.join(select_list)} FROM (\n{sql}\n) __canon"
    )
    _CANON_CACHE[sql] = out
    return out
