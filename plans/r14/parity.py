"""r14 targeted oracle-parity checker: compare named workload queries
against their DuckDB oracles at a given SF (default sf0.001, the
test_oracle_parity harness).  Usage:
    python plans/r14/parity.py q1,q2,... [sf_dir]
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from pyspark.sql import SparkSession

from ksql_streams_from_schema_converter_spark.workload import WORKLOAD

from diffcheck import compare, duckdb_conn

names = [n for n in sys.argv[1].split(",") if n]
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
spark = (
    SparkSession.builder.master("local[8]")
    .appName("parity-r14")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
con = duckdb_conn(sf_dir)
bad = 0
for name in names:
    fn, oracle = WORKLOAD[name]
    try:
        ok, msg = compare(fn(spark, sf_dir), con, oracle)
    except Exception as e:
        ok, msg = False, f"{type(e).__name__}: {e}"
    if not ok:
        bad += 1
    print(("OK  " if ok else "FAIL") + f" {name} {'' if ok else msg[:250]}", flush=True)
print(f"parity: {len(names) - bad}/{len(names)} ok")
sys.exit(1 if bad else 0)
