"""Strict driver-hash simulation: run every canonicalized query pair
(exactly what the driver sees via __spark_entry__) and require

1. NO Decimal or date cell on either side — canon.py must have
   re-typed them, since those are the types the driver's value hash
   canonicalizes differently between engines (VERDICT r1 item 3);
2. byte-exact equality of the column-name-sorted, row-sorted values
   (no decimal normalization, no float rounding — stricter than
   diffcheck.compare on purpose).

Usage: python tests/hash_sim.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import datetime
from decimal import Decimal

from diffcheck import duckdb_conn


def _cell(v):
    if isinstance(v, Decimal):
        raise AssertionError(f"Decimal cell survived canonicalization: {v!r}")
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        raise AssertionError(f"date cell survived canonicalization: {v!r}")
    if isinstance(v, (list, dict, tuple)):
        # the round-3 red class: the driver's pandas value-hash dies on
        # unhashable container cells before comparing anything
        raise AssertionError(f"container cell survived canonicalization: {v!r}")
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, float):
        return repr(v)  # exact: both engines must produce identical doubles
    return v


def strict_compare(spark_df, con, oracle_sql):
    oracle = con.execute(oracle_sql)
    o_cols = [d[0].lower() for d in oracle.description]
    o_rows = oracle.fetchall()
    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]
    if sorted(s_cols) != sorted(o_cols):
        return False, f"columns: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    if len(s_rows) != len(o_rows):
        return False, f"rows: spark={len(s_rows)} oracle={len(o_rows)}"
    s_order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    o_order = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
    s_norm = sorted((tuple(_cell(r[i]) for i in s_order) for r in s_rows), key=repr)
    o_norm = sorted((tuple(_cell(r[i]) for i in o_order) for r in o_rows), key=repr)
    for i, (a, b) in enumerate(zip(s_norm, o_norm)):
        if a != b:
            return False, f"row {i}:\n  spark : {a!r}\n  oracle: {b!r}"
    return True, f"ok ({len(s_rows)} rows)"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    os.environ.setdefault("TZ", "Asia/Ho_Chi_Minh")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("hash-sim")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb_conn(sf_dir)
    bad = 0
    for name, fn in qs.items():
        try:
            if name in oracles:
                ok, msg = strict_compare(fn(spark, sf_dir), con, oracles[name])
                if not ok:
                    bad += 1
                    print("FAIL", name, msg[:400])
            else:
                n = fn(spark, sf_dir).count()
                if n == 0:
                    bad += 1
                    print("FAIL", name, "rows-only query returned 0 rows (vacuous gate)")
        except Exception as ex:
            bad += 1
            print("ERROR", name, str(ex)[:300])
    print("hash-sim failures:", bad, "of", len(qs))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
