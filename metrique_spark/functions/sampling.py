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

from functools import reduce

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


def mix_corpus(
    df: DataFrame,
    stratum_col: str,
    weights: dict[str, float],
    key_col: str,
    margin_sigmas: float = 4.0,
) -> DataFrame:
    """Rebalance a corpus to target mixture proportions (e.g. language
    weights for pretraining): take the largest total N such that every
    stratum can supply its share, then keep exactly ``floor(w_s * N)`` rows
    per stratum — the ones with the smallest ``(md5(key), key)``, so the
    selection is deterministic, engine-portable, and nested (raising N
    only adds rows).

    Scale shape: one tiny count aggregation decides the per-stratum quotas
    on the driver; the exact top-``n_s``-by-hash selection then runs on a
    hash-threshold PRE-CUT of each stratum (quota fraction plus a
    ``margin_sigmas``-sigma binomial margin), so the per-stratum
    row_number window sorts ~n_s rows, not the whole stratum. The pre-cut
    is verified: any stratum whose cut undershoots its quota (probability
    ~3e-5 at 4 sigma) falls back to ranking the full stratum, keeping the
    result exact rather than probabilistic.
    """
    import math

    counts = {
        r["s"]: r["c"]
        for r in df.groupBy(F.col(stratum_col).alias("s"))
        .agg(F.count("*").alias("c")).collect()
        if r["s"] in weights
    }
    missing = set(weights) - set(counts)
    if missing:
        raise ValueError(f"strata absent from the corpus: {sorted(missing)}")
    total = min(counts[s] / w for s, w in weights.items() if w > 0)
    quotas = {s: int(w * total) for s, w in weights.items()}

    def _cut_fraction(s: str) -> float:
        n, c = quotas[s], counts[s]
        if not n:
            return 0.0
        f = n / c
        return min(1.0, f + margin_sigmas * math.sqrt(f * (1 - f) / c) + 16 / c)

    stratum = F.col(stratum_col)
    pre = df.where(stratum.isin(list(weights))).where(
        hash_bucket(F.col(key_col))
        < reduce(
            lambda acc, s: F.when(stratum == s,
                                  F.lit(_hex_threshold(_cut_fraction(s))))
            .otherwise(acc),
            sorted(quotas), F.lit("0"),
        )
    )
    got = {r["s"]: r["c"]
           for r in pre.groupBy(stratum.alias("s"))
           .agg(F.count("*").alias("c")).collect()}
    short = [s for s, n in quotas.items() if got.get(s, 0) < n]
    if short:
        pre = pre.unionByName(
            df.where(stratum.isin(short)).join(
                pre.where(stratum.isin(short)), [key_col], "anti"))

    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col).orderBy(
        hash_bucket(F.col(key_col)), F.col(key_col))
    quota_col = reduce(
        lambda acc, s: F.when(stratum == s, F.lit(quotas[s])).otherwise(acc),
        sorted(quotas), F.lit(0),
    )
    return (
        pre.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= quota_col)
        .drop("__rn")
    )


def select_by_token_budget(
    df: DataFrame,
    budget: int,
    quality_col: str = "quality",
    token_col: str = "n_tokens",
    key_col: str = "doc_id",
) -> DataFrame:
    """Greedy quality-first selection under a total token budget: order
    docs by ``(quality DESC, key ASC)`` and keep every doc whose running
    token sum stays ≤ ``budget`` (the curation step that fills a training
    budget with the best available data; equivalent to
    ``SUM(tokens) OVER (ORDER BY quality DESC, key) <= budget``).

    Scale shape: a single global window over 100 TB would sort everything
    onto one task, so the prefix is located band-first — quality is
    quantized into ≤1001 bands, a tiny per-band aggregate finds the
    boundary band on the driver, whole bands above it are kept with a
    scan-stage predicate (no shuffle), and only the boundary band (one
    band's rows) pays a window sort with the carried-in prefix offset.
    Requires non-negative token counts (the running sum must be monotone
    for the prefix cut to be exact).
    """
    from pyspark import StorageLevel

    # three passes read the input (band aggregate, whole-band keep,
    # boundary-band cumsum); persist so a caller handing in a scored
    # projection with expression-heavy columns (quality regexes) pays
    # the compute once. The expected input is the NARROW scored table
    # (key, quality, tokens) — at scale that is GBs, not the corpus.
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    q = F.col(quality_col)
    band_of = F.floor(q * 1000).cast("int")
    per_band = sorted(
        ((r["b"], r["t"]) for r in
         df.groupBy(band_of.alias("b"))
         .agg(F.sum(token_col).alias("t")).collect()),
        key=lambda x: -x[0],
    )
    prefix = 0
    boundary = None
    keep_bands: list[int] = []
    for b, t in per_band:
        if prefix + t <= budget:
            keep_bands.append(b)
            prefix += t
        else:
            boundary = b
            break
    kept = df.where(band_of.isin(keep_bands) if keep_bands else F.lit(False))
    if boundary is None:
        return kept
    return kept.unionByName(
        _prefix_under_budget(df.where(band_of == boundary), budget - prefix,
                             quality_col, token_col, key_col))


def _prefix_under_budget(
    band: DataFrame, remaining: int,
    quality_col: str, token_col: str, key_col: str,
) -> DataFrame:
    """Exact running-sum prefix of one quality band under ``remaining``
    tokens, without a single-task global sort: the band is range-partitioned
    on the selection order (so partition i sorts wholly before partition
    i+1 — the (quality, key) tuple is unique per row), per-partition token
    sums become driver-side prefix offsets (one tiny collect of
    #partitions rows), and each partition then runs its own window cumsum
    plus its offset. Fully parallel at any band size; the band-level
    quantization upstream already bounded this to one band's rows."""
    from pyspark.sql import Window

    q = F.col(quality_col)
    nparts = band.sparkSession.sparkContext.defaultParallelism
    # persist is CORRECTNESS here, not an optimization: the offsets
    # collect and the final cumsum must see the same range boundaries,
    # and two independent executions of repartitionByRange each run
    # their own boundary-sampling job
    from pyspark import StorageLevel

    ranged = (band.repartitionByRange(nparts, q.desc(), F.col(key_col))
              .withColumn("__pid", F.spark_partition_id())
              .persist(StorageLevel.MEMORY_AND_DISK))
    psums = {r["__pid"]: r["t"] for r in
             ranged.groupBy("__pid").agg(F.sum(token_col).alias("t"))
             .collect()}
    offsets, acc = {}, 0
    for pid in sorted(psums):
        offsets[pid] = acc
        acc += psums[pid]
    off = F.lit(0)
    for pid, o in sorted(offsets.items()):
        off = F.when(F.col("__pid") == pid, F.lit(o)).otherwise(off)
    w = (Window.partitionBy("__pid").orderBy(q.desc(), F.col(key_col))
         .rowsBetween(Window.unboundedPreceding, 0))
    return (
        ranged.withColumn("__run", F.sum(token_col).over(w) + off)
        .where(F.col("__run") <= remaining)
        .drop("__run", "__pid")
    )


def shard_boundaries(n_shards: int) -> list[str]:
    """Hex thresholds splitting the md5 hash space into ``n_shards``
    equal ranges — shard i covers [boundaries[i], boundaries[i+1])."""
    space = 16 ** _PREC
    return [format(i * space // n_shards, f"0{_PREC}x")
            for i in range(n_shards)]


def shard_id(key: Column, n_shards: int) -> Column:
    """Deterministic shard assignment by hash-range: the number of shard
    boundaries at or below the key's hash bucket, minus one. A CASE chain
    over literal hex thresholds — pure scan-stage expression, portable to
    any engine with md5 (no hex→int conversion needed)."""
    h = hash_bucket(key)
    bounds = shard_boundaries(n_shards)
    return reduce(
        lambda acc, b: acc + F.when(h >= F.lit(b), 1).otherwise(0),
        bounds[1:], F.lit(0),
    ).alias("shard")


def write_training_shards(
    df: DataFrame, path: str, n_shards: int, key_col: str
) -> None:
    """Materialize a training corpus as ``n_shards`` hash-disjoint parquet
    shard directories (``shard=K/``), rows sorted by hash within each
    shard — a deterministic global shuffle: any engine reading shard K in
    order sees the identical sequence on every run. One repartition on
    the shard id (the only shuffle), sort within partitions, partitioned
    write."""
    out = df.withColumn("shard", shard_id(F.col(key_col), n_shards))
    (
        out.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", hash_bucket(F.col(key_col)),
                              F.col(key_col))
        .write.partitionBy("shard").mode("overwrite").parquet(path)
    )
