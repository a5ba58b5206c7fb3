"""bench.py methodology (same session conf, warmup, min-of-3 noop runs)
on a SUBSET of queries — the iteration tool for the r14 optimization
round. Does not touch BENCH_DETAIL.json; prints per-query lines only.

Usage: python -u scripts/mini_bench.py q1 q2 ...
"""
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("metrique-spark-minibench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.cleaner.periodicGC.interval", "1min")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "20000")
        .config("spark.ui.retainedJobs", "20000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    qs["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()

    def _warm(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from batches

    spark.range(0, 1024, 1, int(cpus)).mapInPandas(
        _warm, schema="id long").write.format("noop").mode(
        "overwrite").save()

    out = {}
    for name in names:
        fn = qs[name]
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        best = None
        for _ in range(runs):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"# {name}: {best:.3f}s (load {os.getloadavg()[0]:.1f})",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
