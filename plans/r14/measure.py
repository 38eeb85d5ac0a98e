"""r14 measurement harness (guide §1): run named workload queries in a
fresh session with the bench warmup preamble, time each with the noop
sink, count scheduled Spark jobs per query (job-group scoped), and dump
`.explain("formatted")` to plans/r14/<query>_<tag>.txt.

Usage: python plans/r14/measure.py <tag> <query>[,<query>...] [--runs N]

Timing methodology matches bench.py (fn() + noop save, hot persisted
base tables); job counts make the scheduling overhead visible — the
dominant cost of the multi-round gates at sf0.1.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from ksql_streams_from_schema_converter_spark.session import get_spark
from ksql_streams_from_schema_converter_spark.workload import WORKLOAD

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    tag = sys.argv[1]
    names = [n for n in sys.argv[2].split(",") if n]
    runs = 3
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("measure-r14")
    spark.sparkContext.setLogLevel("ERROR")
    import bench

    bench._warmup(spark, sf_dir)
    st = spark.sparkContext.statusTracker()
    out = {}
    for name in names:
        fn, _ = WORKLOAD[name]
        times, jobs = [], []

        def probe(tag2: str) -> int:
            # sequential global job ids: a 1-row probe job's id brackets
            # everything scheduled in between, including streaming threads
            grp = f"probe-{tag2}"
            spark.sparkContext.setJobGroup(grp, grp)
            spark.range(1).count()
            return max(st.getJobIdsForGroup(grp))

        for i in range(runs):
            j0 = probe(f"{name}-{i}-pre")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            jobs.append(probe(f"{name}-{i}-post") - j0 - 1)
            if i == 0:
                with open(os.path.join(HERE, f"{name}_{tag}.txt"), "w") as fh:
                    fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
        out[name] = {"times": times, "jobs_per_run": jobs}
        print(f"{name}: times={times} jobs={jobs}", flush=True)
    print("RESULT", __import__("json").dumps(out))


if __name__ == "__main__":
    main()
