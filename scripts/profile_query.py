"""Per-query phase profiler for the r14 optimization round.

For each named query (default: a hot-list), measures separately:

- build_s:   wall of the ``fn(spark, sf_dir)`` call — Python expression-
             tree construction + any driver-side training jobs (collects)
             the builder runs before returning a DataFrame;
- run_s:     wall of each of N noop executions of the returned frame;
- jobs:      Spark job count the whole query scheduled (REST delta) —
             many small jobs = driver/scheduling-bound;
- task_cpu_s/task_run_s: executor task time (REST stage delta);
- explain_s: time to produce the formatted plan string (plan/analysis
             cost proxy).

Prints one JSON line per query to stdout; progress on stderr.

Usage: python -u scripts/profile_query.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

HOT = [
    "text_softmax_langid",
    "sim_ivfpq_topk",
    "sim_pq_topk",
    "sim_ivfsq8_topk",
    "text_classifier_holdout",
    "text_quality_classifier",
    "text_bpe_token_counts",
    "sim_cluster_summary",
    "sim_kmeans_clusters",
    "pipeline_curate",
    "sim_semantic_dedup",
    "text_bpe_merges",
    "dedup_incremental",
    "text_trigram_logprob",
    "dedup_components",
    "dedup_minhash_pairs",
    "sample_mix_corpus",
    "sim_ivfpq_indexed",
    "deptree_regions",
]


def main() -> None:
    names = sys.argv[1:] or HOT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile-query")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.cleaner.periodicGC.interval", "1min")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "20000")
        .config("spark.ui.retainedJobs", "20000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import urllib.request

    sc = spark.sparkContext
    api = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"

    def _job_count() -> int:
        try:
            with urllib.request.urlopen(api + "/jobs", timeout=10) as r:
                return len(json.loads(r.read().decode()))
        except Exception:
            return 0

    import __spark_entry__ as entrymod
    from metrique_spark.plans.metrics import StageMetricsProbe

    qs = entrymod.queries()

    # warmup (mirrors bench.py)
    qs["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()

    def _warm(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from batches

    spark.range(0, 1024, 1, int(cpus)).mapInPandas(
        _warm, schema="id long").write.format("noop").mode(
        "overwrite").save()

    probe = StageMetricsProbe(spark)
    for name in names:
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        rec: dict = {"query": name}
        j0 = _job_count()
        probe.start()
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        rec["build_s"] = round(time.time() - t0, 3)
        bm = probe.finish()
        rec["build_jobs"] = _job_count() - j0
        rec["build_task_cpu_s"] = bm["task_cpu_s"]
        t0 = time.time()
        _ = df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        rec["explain_s"] = round(time.time() - t0, 3)
        run_wall = []
        run_jobs = []
        run_task_cpu = []
        run_task_run = []
        for i in range(runs):
            j1 = _job_count()
            probe.start()
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            run_wall.append(round(time.time() - t0, 3))
            m = probe.finish()
            run_jobs.append(_job_count() - j1)
            run_task_cpu.append(m["task_cpu_s"])
            run_task_run.append(m["task_run_s"])
        rec["run_s"] = run_wall
        rec["run_jobs"] = run_jobs
        rec["run_task_cpu_s"] = run_task_cpu
        rec["run_task_run_s"] = run_task_run
        rec["total_best"] = round(rec["build_s"] + min(run_wall), 3)
        print(json.dumps(rec), flush=True)
        print(f"# {name}: build {rec['build_s']}s "
              f"({rec['build_jobs']} jobs) + runs {run_wall}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
