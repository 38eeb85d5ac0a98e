import sys, os; sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
os.environ["TZ"] = "Asia/Ho_Chi_Minh"
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]").appName("driver-sim")
         .config("spark.sql.shuffle.partitions","8")
         .config("spark.driver.extraJavaOptions","-Duser.timezone=Asia/Ho_Chi_Minh")
         .config("spark.executor.extraJavaOptions","-Duser.timezone=Asia/Ho_Chi_Minh")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
from diffcheck import duckdb_conn, compare
print("entry rows:", e.entry(spark).count())
qs, oracles = e.queries(), e.oracle_sql()
con = duckdb_conn("/root/testdata/sf0.01")
bad = 0
for name, fn in qs.items():
    try:
        if name in oracles:
            ok, msg = compare(fn(spark, "/root/testdata/sf0.01"), con, oracles[name])
            if not ok: bad += 1; print("FAIL", name, msg[:150])
        else:
            fn(spark, "/root/testdata/sf0.01").count()
    except Exception as ex:
        bad += 1; print("ERROR", name, str(ex)[:150])
print("driver-sim failures:", bad, "of", len(qs))
