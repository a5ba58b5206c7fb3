"""Loaders for the driver's synthetic tables (TESTDATA.md).

Handles the one physical quirk: ``events.ts`` has shipped both as
nanosecond-precision parquet (read as long under
``spark.sql.legacy.parquet.nanosAsLong``, converted to microsecond
timestamp here — matching DuckDB's truncation, so oracle values agree)
and as microsecond TIMESTAMP_NTZ (cast to TimestampType; session TZ is
UTC so values are identical). Either way the rest of the engine sees a
plain ``TimestampType`` column.
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
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            # Microsecond TIMESTAMP_NTZ parquet: session TZ is UTC, so a
            # plain cast preserves every instant bit-for-bit and restores
            # the TimestampType the rest of the engine expects.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
