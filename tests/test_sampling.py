"""Deterministic hash-sampling tests: stability, nesting, stratification,
scan-stage plan shape."""

import pytest
from pyspark.sql import functions as F

from metrique_spark.functions import sampling


def test_hex_threshold_edges():
    assert sampling._hex_threshold(0.0) == "00000000"
    assert sampling._hex_threshold(0.25) == "40000000"
    assert sampling._hex_threshold(0.5) == "80000000"
    assert sampling._hex_threshold(1.0) == "g"      # above all hex
    assert sampling._hex_threshold(2.0) == "g"      # clamped
    assert sampling._hex_threshold(-1.0) == "00000000"


def test_sample_deterministic_and_nested(spark):
    df = spark.range(5000).withColumnRenamed("id", "k")
    s20a = {r["k"] for r in
            sampling.deterministic_sample(df, "k", 0.2).collect()}
    s20b = {r["k"] for r in
            sampling.deterministic_sample(df, "k", 0.2).collect()}
    s40 = {r["k"] for r in
           sampling.deterministic_sample(df, "k", 0.4).collect()}
    assert s20a == s20b                       # rerun-stable
    assert s20a <= s40                        # samples nest
    assert 0.15 < len(s20a) / 5000 < 0.25     # near the asked fraction
    assert 0.35 < len(s40) / 5000 < 0.45
    # boundary fractions are exact
    assert sampling.deterministic_sample(df, "k", 1.0).count() == 5000
    assert sampling.deterministic_sample(df, "k", 0.0).count() == 0


def test_stratified_fractions(spark):
    rows = [(i, "en" if i % 2 == 0 else ("zh" if i % 4 == 1 else "de"))
            for i in range(4000)]
    df = spark.createDataFrame(rows, ["k", "lang"])
    out = sampling.stratified_sample(
        df, "lang", {"en": 0.1, "zh": 1.0}, key_col="k",
        default_fraction=0.5)
    got = out.groupBy("lang").count().collect()
    by = {r["lang"]: r["count"] for r in got}
    assert 0.05 < by["en"] / 2000 < 0.15
    assert by["zh"] == 1000                   # keep-all really keeps all
    assert 0.4 < by["de"] / 1000 < 0.6


def test_sample_is_scan_stage_predicate(spark, tmp_path):
    """The sample must reach the parquet scan as a pushed/partition-level
    filter subtree — no exchange, no UDF, one stage."""
    p = str(tmp_path / "t.parquet")
    spark.range(1000).withColumnRenamed("id", "k").write.parquet(p)
    q = sampling.deterministic_sample(spark.read.parquet(p), "k", 0.3)
    plan = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
