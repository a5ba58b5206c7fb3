"""Deterministic sampling for training-data pipelines.

Random `df.sample()` is useless for corpus engineering: reruns pick
different rows, so downstream caches/dedups/evals can't be compared
across runs, and train/holdout membership must never depend on partition
layout. The standard fix is hash-based sampling — a row is in the sample
iff a stable content hash of its key falls under a threshold:

- deterministic: same key → same decision, on any run, any engine, any
  partitioning;
- composable: a 10% sample is a strict subset of the 20% sample (same
  hash, lower threshold), so samples nest for scaling-law curves;
- zero-shuffle: the predicate is a pure column expression evaluated
  inside the scan stage — at 100 TB the sample IS the pushed filter,
  no pass over the data beyond the read.

The hash is the first 8 hex chars of ``md5(key)`` compared against a
zero-padded hex threshold — chosen over xxhash64 because md5 produces
byte-identical lowercase hex in Spark AND DuckDB/ANSI engines, making
every sample oracle-verifiable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PREC = 8  # hex digits of hash compared; 16^8 ≈ 4.3e9 buckets


def _hex_threshold(fraction: float) -> str:
    """fraction ∈ [0, 1] → zero-padded hex threshold on the first
    ``_PREC`` md5 hex chars. fraction=1.0 returns ``"g"`` — lexically
    above every hex string, so keep-all really keeps all."""
    f = min(max(float(fraction), 0.0), 1.0)
    if f >= 1.0:
        return "g"
    return format(int(f * 16 ** _PREC), f"0{_PREC}x")


def hash_bucket(key: Column) -> Column:
    """The stable sampling coordinate of a key: first ``_PREC`` lowercase
    hex chars of md5(key as string)."""
    return F.substring(F.md5(key.cast("string")), 1, _PREC)


def sample_predicate(key: Column, fraction: float) -> Column:
    """Column predicate selecting a deterministic ``fraction`` of keys."""
    if fraction >= 1.0:
        return F.lit(True)
    if fraction <= 0.0:
        return F.lit(False)
    return hash_bucket(key) < F.lit(_hex_threshold(fraction))


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by key hash. Nesting
    property: ``deterministic_sample(df, k, a)`` ⊆
    ``deterministic_sample(df, k, b)`` whenever ``a <= b``."""
    return df.where(sample_predicate(F.col(key_col), fraction))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing: keep
    10% of English, 100% of low-resource languages). ``fractions`` maps
    stratum value → fraction; unlisted strata get ``default_fraction``.

    The per-stratum threshold is a literal CASE chain — no join, no
    shuffle, still a scan-stage predicate."""
    thr: Column = F.lit(_hex_threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(stratum_col) == value,
                     F.lit(_hex_threshold(frac))).otherwise(thr)
    return df.where(hash_bucket(F.col(key_col)) < thr)
