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

from metrique_spark.functions.cache import narrow_small

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


def hash_ranked_within_strata(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    rank_col: str = "__rn",
    n_partitions: int | None = None,
    prune_rank_over=None,
    prune_rank_col: str | None = None,
) -> DataFrame:
    """Global rank of every row within its stratum by the deterministic
    selection order ``(md5-bucket(key), key)`` — fully parallel AND
    sampling-free. Because the order key is a uniform content hash, the
    range-partition id is a pure scan-stage expression
    (``floor(hash_int · nparts / 16^8)`` — monotone in the hash, balanced
    by md5 uniformity whatever the stratum skew), so unlike
    ``ranked_within_strata`` there is no boundary-sampling job and no
    persist: every pass recomputes identical partition ids from content.

    The rank offsets are computed DISTRIBUTED — a per-stratum
    cumulative-sum window over the tiny (pid, stratum) count table,
    joined back (AQE broadcasts it when small) — never collected, so a
    web-scale stratum cardinality (per-domain caps: millions of groups)
    costs the driver nothing and the whole ranking is ONE job: millions
    of tiny strata spread across the count table's hash partitioning
    while a huge stratum's rows stay spread across pids (each window
    task ranks ~|stratum|/nparts rows).

    ``prune_rank_over``: a callable mapping the stratum-value Column to
    the per-stratum rank bound the CALLER will filter at
    (``__rn <= bound``) — slices whose offset already reaches the bound
    are dropped before the corpus join, so the over-bound tail of a
    dominant stratum never shuffles.

    ``prune_rank_col``: the DATA-carried sibling of ``prune_rank_over``
    — the name of a column of ``df`` holding each row's per-stratum
    bound (constant within a stratum, e.g. a joined-in quota). The
    bound rides the same (pid, stratum) count aggregate via ``first()``,
    so per-stratum bounds of web-scale cardinality never touch the
    driver and never become a literal CASE chain."""
    from pyspark.sql import Window

    spark = df.sparkSession
    nparts = n_partitions or spark.sparkContext.defaultParallelism
    stratum = F.col(stratum_col)
    h = hash_bucket(F.col(key_col))
    # hash_int < 16^8 = 2^32 and nparts ≤ ~10^4: the product stays well
    # under 2^53, so the double division inside floor() is exact
    pid = F.floor((F.conv(h, 16, 10).cast("long") * F.lit(nparts))
                  / F.lit(16 ** _PREC)).cast("int")
    withpid = df.withColumn("__pid", pid)
    woff = (Window.partitionBy("__s").orderBy("__opid")
            .rowsBetween(Window.unboundedPreceding, -1))
    aggs = [F.count("*").alias("__c")]
    if prune_rank_col is not None:
        # the bound is constant within a stratum; first() folds it into
        # the same tiny count aggregate — no extra join, no driver trip
        aggs.append(F.first(prune_rank_col).alias("__bound"))
    offs = (withpid.groupBy(F.col("__pid").alias("__opid"),
                            stratum.alias("__s"))
            .agg(*aggs)
            .withColumn("__off",
                        F.coalesce(F.sum("__c").over(woff), F.lit(0))))
    if prune_rank_col is not None:
        offs = offs.where(F.col("__off") < F.col("__bound"))
    elif prune_rank_over is not None:
        # a slice whose offset already reaches the bound can only
        # produce ranks > bound (rank = local rn + offset > bound)
        offs = offs.where(F.col("__off") < prune_rank_over(F.col("__s")))
    offs = offs.select("__opid", "__s", "__off")
    w = Window.partitionBy("__pid", stratum_col).orderBy(
        h, F.col(key_col))
    return (
        withpid.join(offs,
                     (F.col("__pid") == F.col("__opid"))
                     & stratum.eqNullSafe(F.col("__s")))
        .drop("__opid", "__s")
        .withColumn(rank_col, F.row_number().over(w) + F.col("__off"))
        .drop("__off")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    key_col: str = "doc_id",
    n_partitions: int | None = None,
) -> DataFrame:
    """Deterministic per-group volume cap — the per-domain/per-source
    guard web-scale pipelines run before mixing (one crawl host must
    not dominate its stratum). Keeps each group's first ``cap`` rows in
    the deterministic hash order ``(md5-bucket(key), key)`` — an
    unbiased within-group selection, reproducible across runs AND
    engines — and drops the rest; groups under the cap pass through
    whole.

    Scale: rides ``hash_ranked_within_strata`` directly — scan-stage
    hash-range pids, per-(pid, group) windows (never a single-task
    group sort; the cap exists precisely because some groups are huge),
    rank offsets computed distributed (never collected — the advertised
    group column is per-domain/per-host, web-scale cardinality), and
    slices whose offset already reaches the cap dropped BEFORE the
    corpus join so the over-cap tail of a dominant domain never
    shuffles."""
    if cap < 1:
        raise ValueError(f"cap_per_group: cap must be >= 1, got {cap}")
    ranked = hash_ranked_within_strata(
        df, group_col, key_col, n_partitions=n_partitions,
        prune_rank_over=lambda _: F.lit(cap))
    return ranked.where(F.col("__rn") <= cap).drop("__rn", "__pid")


def temperature_mix(
    df: DataFrame,
    stratum_col: str,
    total: int,
    alpha: float = 0.5,
    key_col: str = "doc_id",
    margin_sigmas: float = 4.0,
) -> DataFrame:
    """Temperature-based mixture rebalancing (public technique: the
    ``p_s ∝ n_s^alpha`` sampling of multilingual corpora — T5/mC4,
    XLM-R): stratum ``s`` receives a quota ``min(n_s,
    floor(total · w_s))`` with ``w_s = round(k_s / Σ k_t, 9)`` and
    ``k_s = floor(n_s^alpha · 10^9 + 0.5)`` — ``alpha < 1`` flattens
    head strata toward the tail without the user hand-writing target
    fractions (``mix_corpus`` is the explicit-fractions sibling). No
    oversampling: a quota never exceeds its stratum, so the output can
    undershoot ``total`` (a deterministic selection cannot mint rows).
    NULL strata are EXCLUDED — a size-derived quota for an unknown
    stratum is meaningless, and the exclusion keeps SQL twins faithful
    (equi-joins drop NULL keys).

    Engine parity by integer arithmetic: the only cross-engine float
    ops are ``pow`` (folded into an integer ``k_s`` at 9dp — a 1-ulp
    pow disagreement flips ``k_s`` only at an exact .5 boundary),
    one exact-integer division ``k_s / Σ k_t`` (both < 2^53 —
    enforced), and the shared half-away 9dp round. No float SUMS cross
    the engine boundary (integer Σ k_t is order-free), unlike a
    decimal-quantized double sum — DuckDB's double→DECIMAL cast does
    NOT match Python's exact-binary quantize (measured: 21/5000 sqrt
    values differ at 1e-12).

    Scale shape: one count aggregate → IN-PLAN quotas (the stratum count
    table never touches the driver — per-domain mixing with millions of
    strata is fine) → the shared ``_take_per_stratum`` machinery
    (hash-threshold pre-cut + distributed rank + shortfall fallback) —
    the exact ranking sees ~quota rows per stratum, never the whole
    corpus."""
    if total < 0:
        raise ValueError(f"temperature_mix: total must be >= 0, got {total}")

    src_df = df.where(F.col(stratum_col).isNotNull())
    # quotas are computed IN-PLAN — the per-stratum count table never
    # touches the driver, so a web-scale stratum cardinality (per-domain
    # temperature mixing: millions of strata) costs the driver nothing.
    # Arithmetic is the same integer folding as before: Spark's round is
    # half-away (num.round_half_away documents the cross-engine
    # precedent), the k sum is an exact integer, k/Σk one double division.
    counts = (src_df.groupBy(F.col(stratum_col).alias("__s"))
              .agg(F.count("*").alias("__n")))
    k = F.floor(F.pow(F.col("__n").cast("double"), F.lit(float(alpha)))
                * F.lit(1e9) + F.lit(0.5)).cast("long")
    kk = counts.withColumn(
        "__k",
        F.when(k >= F.lit(2 ** 53), F.raise_error(F.lit(
            "temperature_mix: n^alpha overflows exact-double range — "
            "lower alpha (the 1e9 weight scale assumes n^alpha < 9e6)")
        ).cast("long")).otherwise(k))
    sk = kk.agg(F.sum("__k").alias("__sk"))
    quota_df = (
        kk.crossJoin(F.broadcast(sk))  # 1-row total: broadcast, no shuffle
        .select(
            "__s",
            F.least(
                F.col("__n"),
                F.floor(F.lit(float(total))
                        * F.round(F.col("__k").cast("double")
                                  / F.col("__sk").cast("double"), 9))
                .cast("long")).alias("__q"),
            "__n"))
    return _take_per_stratum(src_df, stratum_col, key_col, quota_df,
                             margin_sigmas)


def _auto_scratch_dir(spark) -> str | None:
    """Engine-provided default spill path for the boundary-sampling
    reliability hazard (see ``ranked_within_strata``): the Engine
    records its warehouse ``_scratch`` root in the session conf
    (``spark.metrique_spark.scratchDir``), and callers that pass no
    ``reliable_dir`` get a unique directory under it AUTOMATICALLY on
    any non-local master — correctness-by-default instead of
    correctness-by-knob. On ``local[*]`` the auto path stays off (a
    single-JVM session cannot lose a cached block to executor loss, so
    the extra write+read would buy nothing); set
    ``spark.metrique_spark.scratchDir.forceLocal=true`` to engage it
    locally (tests do)."""
    try:
        base = spark.conf.get("spark.metrique_spark.scratchDir", None)
    except Exception:
        return None
    if not base:
        return None
    master = spark.sparkContext.master or ""
    if master.startswith("local") and spark.conf.get(
            "spark.metrique_spark.scratchDir.forceLocal",
            "false") != "true":
        return None
    import uuid

    return base.rstrip("/") + "/ranked_" + uuid.uuid4().hex


def ranked_within_strata(
    df: DataFrame,
    stratum_col: str,
    order_cols: list[Column],
    rank_col: str = "__rn",
    n_partitions: int | None = None,
    reliable_dir: str | None = None,
) -> DataFrame:
    """Global rank of every row WITHIN its stratum by ``order_cols``,
    without ever sorting a whole stratum in one task. Returns the input
    plus ``rank_col`` (1-based) and a ``__pid`` range-partition id
    (callers drop it).

    This is the distributed-selection shape shared by ``mix_corpus``,
    ``stratum_quantiles`` and ``_prefix_under_budget``: a single-task
    ``row_number() OVER (PARTITION BY stratum)`` serializes each stratum
    onto one executor — at 100 TB with a handful of language strata that
    one window IS the job's wall clock. Instead:

    1. ``repartitionByRange(stratum, *order_cols)`` — every partition
       holds a contiguous slice of the sort order, sized by data volume
       (a 90%-of-corpus stratum spreads over ~90% of partitions);
    2. a tiny per-(partition, stratum) count aggregate becomes prefix
       offsets via a per-stratum cumulative-sum window — computed
       DISTRIBUTED (never collected; the driver sees nothing per-group,
       so web-scale stratum cardinality is fine);
    3. each partition ranks ONLY its own rows (parallel window) and adds
       its offset via a join (AQE broadcasts the count table when
       small) — never a literal CASE chain, which would not scale past
       a few hundred (partition, stratum) pairs.

    The persist (plus the one scalar ``count()`` that materializes it)
    is CORRECTNESS, not tuning: ``repartitionByRange`` samples
    boundaries per execution, so the offsets branch and the final rank
    job must see the SAME partitioning. The caller owns the
    block — the result is ``cache``-tracked; ``release()`` it after
    materializing. On a multi-executor cluster a LOST cached block
    recomputes through a fresh boundary-sampling pass with DIFFERENT
    partition ids — silently wrong ranks. When executor loss is in play,
    pass ``reliable_dir``: the ranged intermediate (WITH its materialized
    partition ids) is written to that storage path once and every
    downstream job reads the immutable copy — executor loss re-reads
    parquet instead of re-sampling, at the cost of one extra write+read
    of the data (the standard reliability trade; the caller owns the
    directory's lifetime, no persist/``release`` involved). Or use
    ``hash_ranked_within_strata`` (content-hash partition ids, fully
    deterministic, no persist and no spill) whenever the order key is
    the md5 bucket. Rows tied on ``order_cols`` get arbitrary-
    but-consistent distinct ranks (range partitioning may split ties
    across partitions; every rank still maps to a correctly-sorted
    value)."""
    from pyspark import StorageLevel

    from metrique_spark.functions.cache import track, track_dir
    from pyspark.sql import Window

    spark = df.sparkSession
    auto_dir = False
    if reliable_dir is None:
        # engine-managed default: a warehouse Engine in the session
        # publishes a scratch root, and on a real cluster the spill
        # engages WITHOUT the caller remembering the knob (the cached
        # boundary-sampling hazard silently corrupts ranks on executor
        # loss — see below); no-op on local[*] where it cannot bite
        reliable_dir = _auto_scratch_dir(spark)
        auto_dir = reliable_dir is not None
    nparts = n_partitions or spark.sparkContext.defaultParallelism
    stratum = F.col(stratum_col)
    ranged = (
        df.repartitionByRange(nparts, stratum, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    if reliable_dir is not None:
        ranged.write.mode("overwrite").parquet(reliable_dir)
        ranged = spark.read.parquet(reliable_dir)
    else:
        ranged = ranged.persist(StorageLevel.MEMORY_AND_DISK)
        # materialize ONCE before any dependent job: boundary sampling
        # must run exactly one time so the offsets branch and the rank
        # branch read identical partition ids. A scalar count replaces
        # the old per-(pid, stratum) collect — the driver sees one long.
        ranged.count()
    # rank offsets DISTRIBUTED (same cumulative-sum window as
    # hash_ranked_within_strata): per-(pid, stratum) counts → per-stratum
    # running sum over pid order → joined back (AQE broadcasts the count
    # table when small). Nothing per-group ever reaches the driver, so
    # web-scale stratum cardinality costs it nothing.
    woff = (Window.partitionBy("__s").orderBy("__opid")
            .rowsBetween(Window.unboundedPreceding, -1))
    cnts = (ranged.groupBy(F.col("__pid").alias("__opid"),
                           stratum.alias("__s"))
            .agg(F.count("*").alias("__c")))
    offs = (cnts.withColumn(
        "__off", F.coalesce(F.sum("__c").over(woff), F.lit(0)))
        .select("__opid", "__s", "__off"))
    w = Window.partitionBy("__pid", stratum_col).orderBy(*order_cols)
    out = (
        ranged.join(offs,
                    (F.col("__pid") == F.col("__opid"))
                    # null-safe: a NULL stratum is a legitimate group and
                    # must not be silently dropped by the offset join
                    & stratum.eqNullSafe(F.col("__s")))
        .drop("__opid", "__s")
        .withColumn(rank_col, F.row_number().over(w) + F.col("__off"))
        .drop("__off")
    )
    if reliable_dir is None:
        out = track(out, ranged)  # caller releases the cached block
    elif auto_dir:
        # auto-provisioned spill: release(result) deletes it; engine
        # vacuum sweeps the _scratch root as the crashed-job backstop
        out = track_dir(out, reliable_dir)
    # per-stratum totals as a DATAFRAME (``__s``, ``__n``) off the same
    # cached scan — callers that need group sizes (quantile targets)
    # join this instead of paying a second count pass or a driver trip
    out._stratum_totals_df = (cnts.groupBy("__s")
                              .agg(F.sum("__c").alias("__n")))
    return out


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
    ``margin_sigmas``-sigma binomial margin), so the exact ranking sees
    ~n_s rows, not the whole stratum — and the ranking itself is
    distributed (``hash_ranked_within_strata``: hash-range partition ids
    as pure scan-stage expressions, per-partition counts → driver prefix
    offsets, parallel per-partition windows), so no stratum's quota ever
    sorts in a single task, with no sampling job and no persist. The
    pre-cut is verified: any stratum whose cut undershoots its quota
    (probability ~3e-5 at 4 sigma) falls back to ranking the full
    stratum, keeping the result exact rather than probabilistic.
    """
    # this collect is bounded by |weights| — the user literally typed the
    # strata (target fractions are driver input by the API's nature), so
    # the driver reads back at most as many rows as the dict it sent
    counts = {
        r["s"]: r["c"]
        for r in df.where(F.col(stratum_col).isin(list(weights)))
        .groupBy(F.col(stratum_col).alias("s"))
        .agg(F.count("*").alias("c")).collect()
    }
    missing = set(weights) - set(counts)
    if missing:
        raise ValueError(f"strata absent from the corpus: {sorted(missing)}")
    total = min(counts[s] / w for s, w in weights.items() if w > 0)
    quotas = {s: int(w * total) for s, w in weights.items()}
    sdt = df.schema[stratum_col].dataType.simpleString()
    quota_df = df.sparkSession.createDataFrame(
        [(s, quotas[s], counts[s]) for s in sorted(quotas)],
        f"__s {sdt}, __q long, __n long")
    return _take_per_stratum(df, stratum_col, key_col, quota_df,
                             margin_sigmas)


def _take_per_stratum(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    quota_df: DataFrame,
    margin_sigmas: float = 4.0,
) -> DataFrame:
    """Exact per-stratum prefix selection shared by ``mix_corpus`` and
    ``temperature_mix``: keep each quota'd stratum's first ``quota_s``
    rows in ``(md5-bucket(key), key)`` order. ``quota_df`` carries one
    row per quota'd stratum — ``__s`` (stratum), ``__q`` (quota),
    ``__n`` (stratum size) — and quotas stay DATA end to end: the
    pre-cut threshold is a scan-stage expression over the joined quota
    row, the ranking prune and the final ``rank <= quota`` filter ride
    the joined column, and nothing per-stratum is ever collected or
    unrolled into a CASE chain (web-scale stratum cardinality is fine;
    AQE broadcasts the quota side when it is small).

    The exact ranking runs on a hash-threshold PRE-CUT of each stratum
    (quota fraction plus a ``margin_sigmas``-sigma binomial margin), so
    it sees ~quota_s rows, not the whole stratum. Shortfall check:
    undershoot (p ~3e-5 at 4 sigma) falls back to ranking the short
    strata in full, keeping the result exact — detected by ONE driver
    boolean (an any-short existence probe), never per-stratum rows.
    NULL strata are not supported (the joins compare with ``==``) —
    callers exclude them."""
    stratum = F.col(stratum_col)
    extra = [c for c in df.columns if c in ("__s", "__q", "__n")]
    if extra:
        raise ValueError(f"_take_per_stratum: reserved columns in input: {extra}")
    # materialize the quota table ONCE (it is |strata| rows): the
    # shortfall probe and the final plan both join it, and without this
    # each would re-run the corpus count aggregate that produced it
    quota_df = quota_df.localCheckpoint(eager=True)
    # cut fraction as a column over the joined (quota, size) pair —
    # identical formula to the old driver arithmetic; the cut is a
    # performance heuristic (the shortfall fallback restores exactness),
    # so 1-ulp float drift vs the old Python computation is immaterial
    fq = F.col("__q").cast("double") / F.col("__n").cast("double")
    cut = F.when(F.col("__q") <= 0, F.lit(0.0)).otherwise(
        F.least(F.lit(1.0),
                fq + F.lit(float(margin_sigmas))
                * F.sqrt(fq * (F.lit(1.0) - fq) / F.col("__n"))
                + F.lit(16.0) / F.col("__n")))
    # integer compare (hash as int vs floor(cut·16^8)) — cut >= 1.0
    # yields 16^8, above every hash value, so keep-all really keeps all
    hash_int = F.conv(hash_bucket(F.col(key_col)), 16, 10).cast("long")
    joined = df.join(quota_df, stratum == F.col("__s"))
    pre = joined.where(
        hash_int < F.floor(cut * F.lit(float(16 ** _PREC))).cast("long"))
    # shortfall probe: strata whose pre-cut undershot the quota, as a
    # DataFrame; the driver reads ONE row (exists/not), not the counts
    got = pre.groupBy(stratum.alias("__gs")).agg(F.count("*").alias("__got"))
    short_q = (quota_df.join(got, F.col("__s") == F.col("__gs"), "left")
               .where(F.coalesce(F.col("__got"), F.lit(0)) < F.col("__q"))
               .select("__s", "__q", "__n"))
    if short_q.limit(1).count() > 0:
        # anti-join on (stratum, key), not key alone: the exclusion must
        # only drop rows ALREADY in pre for the SAME stratum — a key value
        # shared across strata must not let stratum A's pre-cut row evict
        # short stratum B's fallback row (the quota would silently
        # undershoot for non-globally-unique keys)
        fallback = (df.join(short_q, stratum == F.col("__s"))
                    .join(pre.select(stratum_col, key_col),
                          [stratum_col, key_col], "anti"))
        pre = pre.unionByName(fallback)
    # only the quota column rides into the ranking (``__s``/``__n`` would
    # collide with the ranker's internal count-table aliases)
    pre = pre.drop("__s", "__n")
    ranked = hash_ranked_within_strata(pre, stratum_col, key_col,
                                       prune_rank_col="__q")
    return (ranked.where(F.col("__rn") <= F.col("__q"))
            .drop("__rn", "__pid", "__q"))


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
    Requires non-null quality and non-negative, non-null token counts
    (the running sum must be monotone for the prefix cut to be exact) —
    violations raise ``ValueError`` from the band aggregate, at no extra
    job cost. Cache lifetime: the returned plan reads the persisted
    scored input; ``functions.cache.release(result)`` after
    materializing.
    """
    from pyspark import StorageLevel

    from metrique_spark.functions.cache import track

    # three passes read the input (band aggregate, whole-band keep,
    # boundary-band cumsum); persist so a caller handing in a scored
    # projection with expression-heavy columns (quality regexes) pays
    # the compute once. The expected input is the NARROW scored table
    # (key, quality, tokens) — at scale that is GBs, not the corpus.
    df = narrow_small(df).persist(StorageLevel.MEMORY_AND_DISK)
    q = F.col(quality_col)
    band_of = F.floor(q * 1000).cast("int")
    # min/null-count ride the same tiny aggregate that finds the bands:
    # a null quality shows up as a NULL band key, a null token count as
    # count(*) != count(token), a negative one in the min — fail fast
    # with a real error instead of a TypeError (null band) or a silently
    # non-monotone running sum (null/negative tokens)
    stats = (df.groupBy(band_of.alias("b"))
             .agg(F.sum(token_col).alias("t"),
                  F.min(token_col).alias("mn"),
                  (F.count("*") - F.count(token_col)).alias("nulls"))
             .collect())
    null_q = any(r["b"] is None for r in stats)
    null_t = any(r["nulls"] for r in stats)
    neg_t = any(r["mn"] is not None and r["mn"] < 0 for r in stats)
    if null_q or null_t or neg_t:
        df.unpersist(blocking=False)
        problems = [p for p, hit in (
            (f"{quality_col} contains nulls", null_q),
            (f"{token_col} contains nulls", null_t),
            (f"{token_col} contains negative values", neg_t)) if hit]
        raise ValueError(
            "select_by_token_budget: " + "; ".join(problems)
            + " — the quality-band prefix cut requires non-null quality "
              "and non-null, non-negative token counts; filter or score "
              "those rows first")
    per_band = sorted(((r["b"], r["t"]) for r in stats), key=lambda x: -x[0])
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
        return track(kept, df)
    tail = _prefix_under_budget(df.where(band_of == boundary),
                                budget - prefix,
                                quality_col, token_col, key_col)
    # track(…, tail) chains tail's own tracked intermediate (the
    # range-partitioned band persist) onto the unioned plan
    return track(kept.unionByName(tail), df, tail)


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
    from metrique_spark.functions.cache import track

    return track(
        ranged.withColumn("__run", F.sum(token_col).over(w) + off)
        .where(F.col("__run") <= remaining)
        .drop("__run", "__pid"),
        ranged,
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


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    top_k: int = 20,
) -> DataFrame:
    """Shuffle-skew diagnostic for a prospective join/groupBy key: the
    ``top_k`` heaviest key values with exact counts and integer
    parts-per-million share. This is the measurement step before every
    salting / skew-hint decision at cluster scale — "is l_orderkey safe
    to shuffle on, and how hot is the hottest user?".

    Output: one row per heavy key — ``(key, cnt, share_ppm, n_rows,
    n_keys)`` (the two totals repeated per row keep the result a single
    flat table). ``share_ppm = floor(cnt * 1e6 / n_rows)`` stays in
    exact integer arithmetic — no float drift cross-engine (cnt ≤ 1e12
    keeps the product under int64).

    Scale shape: one map-combinable groupBy(key) count; totals are a
    second aggregate over the (small) per-key counts, broadcast back via
    a 1-row crossJoin; the top-k itself is ``orderBy(...).limit(k)``,
    which Spark executes as TakeOrderedAndProject — a per-partition
    heap + driver merge of k·partitions rows, never a global sort. Ties
    at the k boundary break key-ascending (string compare) so the
    selected SET is deterministic cross-engine."""
    counts = (df.groupBy(F.col(key_col).cast("string").alias("key"))
                .agg(F.count("*").alias("cnt")))
    totals = counts.agg(F.sum("cnt").alias("n_rows"),
                        F.count("*").alias("n_keys"))
    return (counts.crossJoin(F.broadcast(totals))
            .orderBy(F.col("cnt").desc(), F.col("key").asc())
            .limit(top_k)
            .select("key", F.col("cnt").cast("long").alias("cnt"),
                    # integer `div`, not `/`: float division loses exactness
                    # past 2^53 and this is an exactness-auditable profile
                    F.expr("cnt * CAST(1000000 AS BIGINT) div n_rows")
                    .cast("long").alias("share_ppm"),
                    F.col("n_rows").cast("long").alias("n_rows"),
                    F.col("n_keys").cast("long").alias("n_keys")))


def epoch_mix(
    df: DataFrame,
    source_col: str,
    epochs: dict,
    key_col: str = "doc_id",
    copy_col: str = "copy",
) -> DataFrame:
    """Epoch-aware source mixing for pretraining (the repeat-factor
    side of corpus weighting — LLaMA/DoReMi-style source epochs, where
    high-quality sources repeat >1× and bulk web <1×): source ``s``
    with epoch ``e`` emits ``floor(e)`` copies of every row, plus one
    extra copy for the deterministic ``frac(e)`` hash-fraction of keys
    — so expected volume is exactly ``e · n_s``, the selection nests
    (raising ``e`` only adds copies), and ``e < 1`` subsumes
    deterministic downsampling (rows above the threshold emit zero
    copies and drop). Sources absent from ``epochs`` pass through at
    one copy. Output rows carry ``copy_col`` (1-based copy index) so a
    downstream shuffle/shard can separate repeats.

    Scale shape: pure scan-stage arithmetic — a CASE chain over the
    (tiny) epochs dict picks ``floor(e)`` and the hash threshold, and
    ``explode(sequence(1, n_copies))`` materializes copies with no
    shuffle, no count job, and no driver state."""
    from functools import reduce as _reduce

    for s, e in epochs.items():
        if e < 0:
            raise ValueError(f"epoch_mix: negative epoch {e!r} for {s!r}")
    src = F.col(source_col)
    whole = _reduce(
        lambda acc, s: F.when(src == s, F.lit(int(epochs[s]))).otherwise(acc),
        sorted(epochs), F.lit(1))
    extra_thr = _reduce(
        lambda acc, s: F.when(
            src == s,
            F.lit(_hex_threshold(epochs[s] - int(epochs[s])))).otherwise(acc),
        sorted(epochs), F.lit("0"))
    # null keys have no sampling coordinate: they take floor(e) copies
    # and never the fractional extra (coalesce — otherwise the null
    # comparison nulls n_copies and the row silently vanishes, even for
    # pass-through sources)
    n_copies = whole + F.coalesce(
        (hash_bucket(F.col(key_col)) < extra_thr).cast("int"), F.lit(0))
    return (df.withColumn("__nc", n_copies)
            .where(F.col("__nc") >= 1)
            .withColumn(copy_col,
                        F.explode(F.sequence(F.lit(1), F.col("__nc"))))
            .drop("__nc"))
