"""File loaders — the reference ``load()`` dispatcher (``utils.py:762-825``)
as a thin veneer over Spark's natively glob-aware readers.

The reference loops files through pandas/csv readers on one core; here every
format goes straight to a distributed reader, and ``_oid`` assignment is a
column expression, not a per-row callable.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_EXT_FORMAT = {
    ".csv": "csv",
    ".tsv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".parquet": "parquet",
    ".orc": "orc",
    ".txt": "text",
}


def detect_format(path: str) -> str:
    """Filetype autodetection by extension (reference ``utils.py:779-789``)."""
    base = path.rstrip("*").rstrip("/")
    ext = os.path.splitext(base)[1].lower()
    if ext in _EXT_FORMAT:
        return _EXT_FORMAT[ext]
    raise ValueError(f"cannot detect filetype for {path!r}")


def load(
    spark: SparkSession,
    path: str,
    filetype: str | None = None,
    oid: str | Column | None = None,
    **reader_options,
) -> DataFrame:
    """Glob-aware multi-file loader (reference ``load()``,
    ``utils.py:762-825``). ``oid`` is a column name or expression assigned
    to ``_oid``; None leaves assignment to a later ``stamp()``."""
    fmt = filetype or detect_format(path)
    reader = spark.read
    if fmt == "csv":
        reader = reader.options(header=True, inferSchema=True)
        if path.endswith(".tsv"):
            reader = reader.option("sep", "\t")
    df = reader.options(**reader_options).format(fmt).load(path)
    if oid is not None:
        df = df.withColumn("_oid", F.col(oid) if isinstance(oid, str) else oid)
    return df


def load_csv(spark: SparkSession, path: str, **kw) -> DataFrame:
    """Header-required CSV (reference ``load_csv``, ``utils.py:865-878``)."""
    return load(spark, path, "csv", **kw)


def load_json(spark: SparkSession, path: str, orient_index: bool = False, **kw) -> DataFrame:
    """JSON loader (reference ``load_json``, ``utils.py:898-900``).

    ``orient_index=True`` handles the pandas ``orient='index'``
    dict-of-dicts shape the reference's tests use
    (``tests/test_cubes_builtin.py:102``): the top-level keys become an
    ``_key`` column via a multiLine read + stack."""
    if not orient_index:
        return load(spark, path, "json", **kw)
    raw = spark.read.option("multiLine", True).json(path)
    # each top-level key is a column holding the record struct; unpivot
    cols = raw.columns
    stacked = raw.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(c).alias("_key"), F.col(c).alias("_rec"))
                for c in cols
            ])
        ).alias("kv")
    )
    return stacked.select(F.col("kv._key").alias("_key"), F.col("kv._rec.*"))
