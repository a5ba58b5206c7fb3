"""Loaders for the driver's synthetic tables (TESTDATA.md).

Handles the one physical quirk: ``events.ts`` is nanosecond-precision
parquet, which Spark reads as long under
``spark.sql.legacy.parquet.nanosAsLong`` — converted here to a microsecond
timestamp (matching DuckDB's truncation, so oracle values agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # ts is TIMESTAMP(NANOS) parquet — illegal for Spark's reader unless
        # surfaced as a long, then converted. Integer `div` (not `/`) — ns
        # epochs exceed 2^53, double division would drift by ±1µs.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
