"""File loaders — the reference ``load()`` dispatcher (``utils.py:762-825``)
as a thin veneer over Spark's natively glob-aware readers.

The reference loops files through pandas/csv readers on one core; here every
format goes straight to a distributed reader, and ``_oid`` assignment is a
column expression, not a per-row callable.
"""

from __future__ import annotations

import glob as _glob
import os
import pickle
import re
import tempfile
import time
import urllib.request

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
    retries: int | None = None,
    **reader_options,
) -> DataFrame:
    """Glob-aware multi-file loader (reference ``load()``,
    ``utils.py:762-825``). ``oid`` is a column name or expression assigned
    to ``_oid``; None leaves assignment to a later ``stamp()``.

    ``http(s)://`` paths are fetched driver-side to a temp file first
    (reference ``utils.py:791-798``), retried ``retries`` times on
    transient failure (reference ``urlretrieve``, ``utils.py:1340-1359``,
    default 3), and read from there; the temp file is left in place
    because Spark reads lazily."""
    if re.match(r"https?://", path):
        return _load_url(spark, path, filetype, oid, retries=retries,
                         **reader_options)
    if filetype == "pickle" or (filetype is None
                                and path.rstrip("*").endswith(".pickle")):
        return load_pickle(spark, path, oid=oid)
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


def _load_url(
    spark: SparkSession,
    url: str,
    filetype: str | None,
    oid: str | Column | None,
    retries: int | None = None,
    **reader_options,
) -> DataFrame:
    """Driver-side fetch of an HTTP(S) source into a temp file, then the
    normal loader (reference ``load()`` URL branch, ``utils.py:791-798``
    and ``urlretrieve``, ``utils.py:1340-1359``). At cluster scale a
    one-shot driver fetch only suits small side inputs; bulk data should
    land on shared storage first."""
    fmt = filetype or detect_format(url.split("?", 1)[0])
    suffix = os.path.splitext(url.split("?", 1)[0])[1] or f".{fmt}"
    fd, tmp = tempfile.mkstemp(prefix="metrique_fetch_", suffix=suffix)
    os.close(fd)
    _fetch_with_retries(url, tmp, retries)
    return load(spark, tmp, fmt, oid=oid, **reader_options)


def _fetch_with_retries(url: str, dest: str, retries: int | None) -> None:
    """Retry transient fetch failures with a short backoff (reference
    ``urlretrieve``, ``utils.py:1340-1359``: default 3 attempts, sleep
    between tries, raise once exhausted)."""
    attempts = int(retries) if retries else 3
    last_err: Exception | None = None
    for _ in range(attempts):
        try:
            urllib.request.urlretrieve(url, dest)  # noqa: S310 — user URL
            return
        except Exception as e:  # transient network errors included
            last_err = e
            time.sleep(0.2)
    raise RuntimeError(f"failed to retrieve {url!r} "
                       f"after {attempts} attempts") from last_err


def load_pickle(
    spark: SparkSession, path: str, oid: str | Column | None = None
) -> DataFrame:
    """Multi-pickle stream loader (reference ``load_pickle``,
    ``utils.py:903-912``): each file may hold several concatenated pickle
    dumps; each dump is a dict-record or a list of them.

    Pickle is not splittable, so files are read driver-side and
    parallelized — suitable for the reference's small fixture streams,
    not a bulk path (convert to parquet for that)."""
    files = sorted(_glob.glob(os.path.expanduser(path)))
    if not files:
        raise IOError(f"failed to load: {path}")
    records: list[dict] = []
    for fp in files:
        with open(fp, "rb") as f:
            while True:
                try:
                    obj = pickle.load(f)
                except EOFError:
                    break
                records.extend(obj if isinstance(obj, list) else [obj])
    if not records:
        raise RuntimeError("no objects extracted!")
    df = spark.createDataFrame(records)
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


def parquet_row_count(path: str) -> int:
    """Total row count of a parquet file/dataset from FOOTER metadata —
    no data pages read, no Spark job. The cheap upper-bound hint for
    skew-guard decisions (``similarity.cosine_pairs_bucketed(n_rows=…)``):
    any filtered subset of the table is bounded by the footer total."""
    import pyarrow.dataset as ds

    return ds.dataset(path, format="parquet").count_rows()
