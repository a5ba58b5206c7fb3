"""Temporal analytic operators over versioned-object DataFrames.

Rebuilds the reference's pandas ``Result`` layer (``metrique/result.py``) as
distributed DataFrame transformations. Every operator takes and returns a
DataFrame with ``_oid``/``_start``/``_end`` columns; nothing is collected to
the driver.

Scale notes baked into each op:

- per-oid operators use window functions partitioned by ``_oid`` — a single
  hash shuffle on the entity key, the minimum possible; consecutive per-oid
  windows reuse the same partitioning so Catalyst schedules one exchange.
- ``history`` replaces the reference's O(dates × rows) driver loop
  (``result.py:182-195``) with one interval join against a date spine and a
  single aggregation.
- as-of boundary semantics are the reference's *pandas* ones here
  (``_start <= d AND _end > d``, ``result.py:175-176``), intentionally
  distinct from the query-level ``date_range`` (``_start < d, _end >= d``,
  ``parse.py:109-114``) — the reference is asymmetric and both are pinned by
  its tests.
"""

from __future__ import annotations

from functools import reduce
from typing import Callable, Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from metrique_spark.mql import to_timestamp_lit

def _OID_WIN():
    return Window.partitionBy("_oid")


def _OID_BY_START():
    return Window.partitionBy("_oid").orderBy("_start")


def _OID_BY_START_DESC():
    return Window.partitionBy("_oid").orderBy(F.col("_start").desc())


# ---------------------------------------------------------------------------
# as-of / history


def on_date(df: DataFrame, date, only_count: bool = False):
    """Versions live at ``date``: ``_start <= d AND (_end > d OR _end IS
    NULL)`` (reference ``result.py:164-180``)."""
    d = to_timestamp_lit(date)
    out = df.where((F.col("_start") <= d) & ((F.col("_end") > d) | F.col("_end").isNull()))
    return out.count() if only_count else out


_SCALE_INTERVAL = {
    "daily": "interval 1 day",
    "weekly": "interval 7 days",
    "monthly": "interval 1 month",
    "quarterly": "interval 3 months",
    "yearly": "interval 1 year",
}


def date_spine(
    spark: SparkSession,
    start,
    end,
    scale: str = "daily",
    versions: DataFrame | None = None,
) -> DataFrame:
    """Date spine DataFrame with one ``_date`` timestamp column.

    Scales: daily/weekly/monthly/quarterly/yearly (reference
    ``result.py:227-275``) built with ``sequence()`` + ``explode`` —
    generated JVM-side, no driver loop. ``scale='maximum'`` = all distinct
    ``_start``/``_end`` instants of ``versions`` in-bounds
    (``result.py:256-263``).
    """
    if scale == "maximum":
        if versions is None:
            raise ValueError("scale='maximum' needs the versions DataFrame")
        lo, hi = to_timestamp_lit(start), to_timestamp_lit(end)
        pts = (
            versions.select(F.col("_start").alias("_date"))
            .unionAll(versions.where(F.col("_end").isNotNull())
                      .select(F.col("_end").alias("_date")))
            .where((F.col("_date") >= lo) & (F.col("_date") <= hi))
            .distinct()
        )
        return pts.orderBy("_date")
    if scale == "auto":
        scale = auto_select_scale(start, end)
    if scale not in _SCALE_INTERVAL:
        raise ValueError(f"unknown scale: {scale}")
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    to_timestamp_lit(start),
                    to_timestamp_lit(end),
                    F.expr(_SCALE_INTERVAL[scale]),
                )
            ).alias("_date")
        )
    )


def history(df: DataFrame, spine: DataFrame, count_col: str = "count") -> DataFrame:
    """Count of live objects at each spine date (reference
    ``result.py:182-195``).

    Two plans, picked by spine shape:

    - **Uniform spine** (daily/weekly — fixed step between consecutive
      points, probed with a short-circuiting ``limit`` so an unexpectedly
      huge spine is never collected): difference-array/prefix-sum. Each
      version row maps to its first/last covered spine index by integer
      arithmetic (all codegen) and emits exactly TWO delta rows (+1 at
      entry, −1 after exit); the live count per date is the running sum of
      deltas over the tiny spine. Aggregation input is 2·|versions| rows
      no matter how long the spine — versus |covered dates|·|versions| for
      the interval join, a ~|spine|/2× reduction (150× on a 300-point
      spine), and the big side still never shuffles (map-side combine
      reduces to ≤|spine| rows per partition before the exchange).
    - **Irregular spine** (monthly/quarterly/yearly/'maximum', or more
      than 10k points): broadcast interval join — a broadcast nested-loop
      over the versions scan, no shuffle of the big side at any scale.
    """
    # probe collects unix micros alongside the timestamp: uniformity must
    # be judged on the real-time axis (epoch micros), not on collected
    # naive datetimes — a spine that looks uniform in a DST driver
    # timezone but isn't in real time would otherwise pass the check with
    # wrong index arithmetic
    probe = (
        spine.select("_date", F.unix_micros(F.col("_date")).alias("__us"))
        .distinct().limit(10_001).collect()
    )
    if 2 <= len(probe) <= 10_000:
        rows = sorted(probe, key=lambda r: r["__us"])
        micros = [r["__us"] for r in rows]
        steps = {micros[i + 1] - micros[i] for i in range(len(micros) - 1)}
        if len(steps) == 1:
            return _history_prefix_sum(
                df, [r["_date"] for r in rows], micros, count_col)
    joined = df.join(
        F.broadcast(spine),
        (F.col("_start") <= F.col("_date"))
        & ((F.col("_end") > F.col("_date")) | F.col("_end").isNull()),
        "inner",
    )
    counts = joined.groupBy("_date").agg(F.count("*").alias(count_col))
    # zero-fill dates with no live versions (the reference's per-date scan
    # reports 0, result.py:164-180). Done as a tiny spine←counts equi-join
    # AFTER aggregation — a left interval-join with the spine broadcast is
    # not executable as a broadcast join (left-outer can only build right),
    # and would force broadcasting the big side.
    return (
        spine.join(counts, "_date", "left")
        .select("_date", F.coalesce(F.col(count_col), F.lit(0)).alias(count_col))
        .orderBy("_date")
    )


def _history_prefix_sum(
    df: DataFrame, dates: list, micros: list, count_col: str
) -> DataFrame:
    """Uniform-spine live counts via difference array. ``dates`` is the
    sorted spine (driver-side, ≤10k by the caller's probe) and ``micros``
    its Spark-computed epoch-microsecond values. A version covers spine
    index i iff ``dates[i] >= _start AND dates[i] < _end``; with a fixed
    step the first/last covered index is a ceil-division — exact int64
    micros arithmetic (step taken directly from the epoch-micros
    deltas, never through a float), no doubles, sub-second boundaries
    included."""
    from pyspark.sql import types as T

    spark = df.sparkSession
    n = len(dates)
    step_us = micros[1] - micros[0]
    t0 = F.lit(micros[0])
    rel = df.select(
        (F.unix_micros(F.col("_start")) - t0).alias("__s"),
        (F.unix_micros(F.col("_end")) - t0).alias("__e"),  # null stays null
    )
    # first covered index k = #{i : i*step < _start-t0} = ceil_div(s);
    # exclusive end m = #{i : i*step < _end-t0} = ceil_div(e); open-ended
    # versions cover through the last spine point
    c = step_us - 1
    idx = rel.select(
        F.expr(f"CASE WHEN __s <= 0 THEN 0L ELSE (__s + {c}) DIV {step_us} END")
        .alias("k"),
        F.expr(f"CASE WHEN __e IS NULL THEN {n}L WHEN __e <= 0 THEN 0L "
               f"ELSE least((__e + {c}) DIV {step_us}, {n}L) END").alias("m"),
    ).where(F.col("k") < F.col("m"))
    deltas = idx.select(
        F.explode(F.array(
            F.struct(F.col("k").alias("idx"), F.lit(1).alias("delta")),
            F.struct(F.col("m").alias("idx"), F.lit(-1).alias("delta")),
        )).alias("x")
    ).select("x.idx", "x.delta")
    sums = (deltas.groupBy("idx").agg(F.sum("delta").alias("__d"))
            .where(F.col("idx") < n))
    spine_idx = spark.createDataFrame(
        [(i, d) for i, d in enumerate(dates)],
        T.StructType([T.StructField("idx", T.LongType()),
                      T.StructField("_date", T.TimestampType())]),
    )
    w = Window.orderBy("idx").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine_idx.join(sums, "idx", "left")
        .withColumn("__d", F.coalesce("__d", F.lit(0)))
        .select("_date", F.sum("__d").over(w).alias(count_col))
        .orderBy("_date")
    )


def auto_select_scale(start, end, ideal: int = 300) -> str:
    """Pick a spine scale targeting ~``ideal`` points (reference
    ``result.py:277-298`` — same thresholds). Pure scalar heuristic."""
    import pandas as pd

    days = (pd.Timestamp(end) - pd.Timestamp(start)).days
    if days <= ideal:
        return "daily"
    if days / 7 <= ideal:
        return "weekly"
    if days / 30 <= ideal:
        return "monthly"
    if days / 91 <= ideal:
        return "quarterly"
    return "yearly"


def history_with_forecast(
    df: DataFrame,
    spine: DataFrame,
    since,
    days: int = 20,
    count_col: str = "count",
) -> DataFrame:
    """``history`` plus a linear-regression forecast for spine dates after
    ``since`` (reference ``_linreg_future``, ``result.py:197-223``).

    The regression basis is the daily history of the ``days`` days ending
    at ``since``; slope/intercept come from the built-in ``regr_slope`` /
    ``regr_intercept`` aggregates (distributed, no numpy/driver fitting).
    The basis and observed series share ONE interval-join history over the
    union of their date spines — the interval join is the only operator
    here that touches the big side, so it must not run twice. Forecast
    values are clamped at 0 like the reference (``result.py:221-222``)."""
    spark = df.sparkSession
    since_ts = to_timestamp_lit(since)
    basis_lo = since_ts - F.expr(f"interval {days - 1} days")
    basis_spine = spark.range(1).select(
        F.explode(
            F.sequence(basis_lo, since_ts, F.expr("interval 1 day"))
        ).alias("_date")
    )
    obs_dates = spine.where(F.col("_date") <= since_ts).select("_date")
    all_dates = obs_dates.unionByName(basis_spine).distinct()
    # persist the aggregated history (spine-sized, ~300 rows): it feeds both
    # the regression basis and the observed series, and without
    # materialization lazy evaluation re-runs the big-side interval join
    # once per consumer
    from metrique_spark.functions.cache import narrow_small

    hist = narrow_small(history(df, all_dates, count_col)).persist()
    basis = hist.where(
        (F.col("_date") >= basis_lo) & (F.col("_date") <= since_ts)
    )
    w = basis.agg(
        F.regr_slope(F.col(count_col).cast("double"),
                     F.col("_date").cast("double")).alias("w0"),
        F.regr_intercept(F.col(count_col).cast("double"),
                         F.col("_date").cast("double")).alias("w1"),
    )
    observed = (
        hist.join(F.broadcast(obs_dates), "_date", "left_semi")
        .select("_date", F.col(count_col).cast("double").alias(count_col))
    )
    predicted = (
        spine.where(F.col("_date") > since_ts)
        .join(F.broadcast(w))
        .select(
            "_date",
            F.greatest(
                F.col("w0") * F.col("_date").cast("double") + F.col("w1"),
                F.lit(0.0),
            ).alias(count_col),
        )
    )
    return observed.unionByName(predicted).orderBy("_date")


def persistent_oid_counts(df: DataFrame, spine: DataFrame) -> DataFrame:
    """Cumulative distinct-oid count existing on-or-before each spine date
    (reference ``result.py:324-337``). Aggregate to first-seen per oid
    (shuffle on ``_oid``), then broadcast-range-join the tiny spine."""
    first_seen = df.groupBy("_oid").agg(F.min("_start").alias("_first"))
    counts = (
        first_seen.join(F.broadcast(spine), F.col("_first") <= F.col("_date"))
        .groupBy("_date")
        .agg(F.countDistinct("_oid").alias("count"))
    )
    return (
        spine.join(counts, "_date", "left")
        .select("_date", F.coalesce(F.col("count"), F.lit(0)).alias("count"))
        .orderBy("_date")
    )


# ---------------------------------------------------------------------------
# per-oid version selection (single shuffle on _oid each)


def filter_oids(df: DataFrame, oids: Sequence) -> DataFrame:
    """Keep listed oids (reference ``result.py:302-310``). For large oid
    sets pass a DataFrame and use a semi-join instead — broadcast only
    under the shared key cap (a deptree_df closure can carry tens of
    millions of oids; forcing that into the build side is the
    executor-memory cliff the cap exists for)."""
    if isinstance(oids, DataFrame):
        from metrique_spark.upsert import maybe_broadcast_keys

        keys = maybe_broadcast_keys(oids.select("_oid").distinct())
        return df.join(keys, "_oid", "left_semi")
    return df.where(F.col("_oid").isin(list(oids)))


def unfinished_objects(df: DataFrame, rbound=None) -> DataFrame:
    """All versions of objects that have an open version (``_end`` NULL or
    beyond ``rbound``) (reference ``result.py:312-322``). Window-based: one
    shuffle on ``_oid``, no self-join."""
    open_pred = F.col("_end").isNull()
    if rbound is not None:
        open_pred = open_pred | (F.col("_end") > to_timestamp_lit(rbound))
    return (
        df.withColumn("__has_open", F.max(open_pred.cast("int")).over(_OID_WIN()))
        .where(F.col("__has_open") == 1)
        .drop("__has_open")
    )


def one_version(df: DataFrame, index: int = 0) -> DataFrame:
    """Version #index per oid by ``_start`` order; negative = from the end
    (reference ``result.py:429-452``)."""
    if index >= 0:
        win, k = _OID_BY_START(), index + 1
    else:
        win, k = _OID_BY_START_DESC(), -index
    return (
        df.withColumn("__rn", F.row_number().over(win))
        .where(F.col("__rn") == k)
        .drop("__rn")
    )


def first_version(df: DataFrame) -> DataFrame:
    return one_version(df, 0)


def last_version(df: DataFrame) -> DataFrame:
    return one_version(df, -1)


def started_after(df: DataFrame, date) -> DataFrame:
    """All versions of objects whose first ``_start`` > date (reference
    ``result.py:454-465``)."""
    d = to_timestamp_lit(date)
    return (
        df.withColumn("__first", F.min("_start").over(_OID_WIN()))
        .where(F.col("__first") > d)
        .drop("__first")
    )


def last_versions_with_age(
    df: DataFrame, col_name: str = "age", rbound=None
) -> DataFrame:
    """Latest version per oid plus an ``age`` column = min(_end, now/rbound)
    − min(_start) per oid, in seconds (reference ``result.py:339-392``;
    the reference drops sub-second precision — we keep whole seconds)."""
    now = to_timestamp_lit(rbound) if rbound is not None else F.current_timestamp()
    cutoff = F.least(F.coalesce(F.col("_end"), now), now)
    return (
        df.withColumn("__first", F.min("_start").over(_OID_WIN()))
        .withColumn("__rn", F.row_number().over(_OID_BY_START_DESC()))
        .where(F.col("__rn") == 1)
        .withColumn(
            col_name,
            F.floor(cutoff.cast("timestamp").cast("double")
                    - F.col("__first").cast("timestamp").cast("double")),
        )
        .drop("__first", "__rn")
    )


def last_chain(df: DataFrame) -> DataFrame:
    """Keep the last unbroken chain of versions per oid — consecutive
    versions where one's ``_end`` equals the next's ``_start`` (reference
    ``result.py:394-427``). Classic gaps-and-islands: gap flag via ``lag``,
    running sum → session id, keep the max session. Three window ops over
    the same ``_oid`` partitioning → one shuffle."""
    gap = F.when(
        F.lag("_end").over(_OID_BY_START()).isNull()
        | (F.lag("_end").over(_OID_BY_START()) == F.col("_start")),
        F.lit(0),
    ).otherwise(F.lit(1))
    with_chain = df.withColumn(
        "__chain", F.sum(gap).over(_OID_BY_START().rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_chain.withColumn("__last", F.max("__chain").over(_OID_WIN()))
        .where(F.col("__chain") == F.col("__last"))
        .drop("__chain", "__last")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str = "_start",
    payload: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """As-of join: for each ``left`` row, attach the nearest ``right`` row
    per ``on`` key — the latest with ``right_ts <= left_ts`` when
    ``direction='backward'`` (ASOF semantics, tie → match), the earliest
    with ``right_ts >= left_ts`` when ``'forward'``. ``tolerance`` (a
    ``Column`` interval or SQL interval string like ``'2 hours'``) nulls
    the payload when the matched row is further away than that — the
    pandas ``merge_asof`` knobs on the distributed implementation.

    SURVEY §2.6 names this one of the two temporal join patterns to make
    first-class (the reference reaches it via ``on_date`` per date).

    Implementation is the union+window trick, NOT a range join: tag and
    union both sides, sort within each ``on`` partition by (time,
    right-first), and carry the last seen right payload forward with
    ``last_value(ignorenulls)`` (forward = same machinery over the
    descending order). One shuffle on the key, linear work — no
    |left|×|versions| intermediate, which is what a naive range join
    produces at 100 TB.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction!r}")
    payload = list(payload) if payload is not None else [
        c for c in right.columns if c not in (on, right_ts)
    ]
    lcols = [c for c in left.columns]
    # the payload rides as ONE struct so the carried values always come from
    # a single right row — per-column last(ignorenulls) would stitch
    # together different rows when right columns are legitimately NULL;
    # the matched right_ts rides along for the tolerance check
    p_struct = F.struct(*[F.col(c) for c in payload],
                        F.col(right_ts).alias("__rts"))
    p_type = right.select(p_struct.alias("__p")).schema["__p"].dataType
    l = left.select(
        *lcols,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(p_type).alias("__p"),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c != on else F.col(on) for c in lcols],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        p_struct.alias("__p"),
    )
    unioned = l.unionByName(r)
    if direction == "backward":
        order = [F.col("__t").asc(), F.col("__side").asc()]
    else:
        # reversed scan: rights later in time come first; side still sorts
        # right-before-left at equal times so ties match (>= semantics)
        order = [F.col("__t").desc(), F.col("__side").asc()]
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *lcols,
        "__t",
        "__side",
        F.last(F.col("__p"), ignorenulls=True).over(w).alias("__p"),
    )
    matched = filled.where(F.col("__side") == 1)
    if tolerance is not None:
        tol = F.expr(f"INTERVAL {tolerance}") if isinstance(
            tolerance, str) else tolerance
        gap = (F.col("__t") - F.col("__p.__rts") if direction == "backward"
               else F.col("__p.__rts") - F.col("__t"))
        matched = matched.withColumn(
            "__p", F.when(gap <= tol, F.col("__p")))
    return matched.select(
        *lcols, *[F.col(f"__p.{c}").alias(c) for c in payload]
    )


# ---------------------------------------------------------------------------
# diffs / traversal / grouped apply


def dfind(df: DataFrame, fields: Iterable[str] | None = None) -> DataFrame:
    """Diff consecutive versions per oid (reference ``dfind``,
    ``sqlalchemy.py:694-704`` + ``DictDiffer`` ``utils.py:1446-1535``):
    for each version after the first, emit per-field previous/current values
    where they changed. ``lag`` window + a small array of change structs,
    exploded — all JVM-side.

    ``fields=None`` diffs every non-system field (the reference's
    ``include=None`` whole-object diff). Each row carries the DictDiffer
    classification in ``kind``: a NULL→value transition is an ``added``
    key, value→NULL is ``removed`` (fixed-schema columns model the
    reference's dynamic dict keys as NULLs), value→value is ``changed``."""
    from metrique_spark.objects import SYSTEM_FIELDS

    if fields is None:
        fields = [c for c in df.columns
                  if c not in SYSTEM_FIELDS and c != "_current"]
    fields = list(fields)
    diffs = []
    for f in fields:
        prev = F.lag(f).over(_OID_BY_START())
        cur = F.col(f)
        changed = ~prev.eqNullSafe(cur)
        diffs.append(
            F.when(
                changed,
                F.struct(
                    F.lit(f).alias("field"),
                    prev.cast("string").alias("old"),
                    cur.cast("string").alias("new"),
                    F.when(prev.isNull(), F.lit("added"))
                    .when(cur.isNull(), F.lit("removed"))
                    .otherwise(F.lit("changed"))
                    .alias("kind"),
                ),
            )
        )
    out = (
        df.withColumn("__rn", F.row_number().over(_OID_BY_START()))
        .withColumn("__changes", F.filter(F.array(*diffs), lambda x: x.isNotNull()))
        .where((F.col("__rn") > 1) & (F.size("__changes") > 0))
        .select(
            "_oid",
            "_start",
            F.explode("__changes").alias("__c"),
        )
        .select(
            "_oid",
            "_start",
            F.col("__c.field").alias("field"),
            F.col("__c.old").alias("old"),
            F.col("__c.new").alias("new"),
            F.col("__c.kind").alias("kind"),
        )
    )
    return out


# Distributed-BFS visited union: fold into one checkpointed frame once
# this many arms accrete, bounding the per-hop (and returned) plan at
# O(window) whatever the traversal depth (see _deptree_visited).
_VISITED_COLLAPSE_PARTS = 8


def _deptree_hop(scoped: DataFrame, field: str, fringe: DataFrame,
                 broadcast_fringe: bool = True) -> DataFrame:
    """One BFS hop: distinct children of the fringe oids. The fringe rides
    as a (broadcast) semi-join — never a driver-side ``isin`` literal, so
    the plan stays bounded however large the fringe grows. Past the
    broadcast comfort zone the caller drops the hint and AQE picks the
    join strategy (shuffle-hash on oid, typically)."""
    build = F.broadcast(fringe) if broadcast_fringe else fringe
    return (
        scoped.join(build, "_oid", "semi")
        .select(F.explode(F.col(field)).alias("_oid"))
        .where(F.col("_oid").isNotNull())
        .distinct()
    )


def deptree(
    df: DataFrame,
    field: str,
    oids: Sequence,
    level: int | None = None,
    date: str | None = None,
    driver_fringe_threshold: int = 100_000,
) -> list:
    """Recursive BFS from seed oids following a parent→children array field,
    up to ``level`` hops; returns the sorted visited oid list, seeds
    included (reference ``sqlalchemy.py:666-692`` returns
    ``sorted(checked)`` with the seeds in it). The list return is the
    reference-parity contract — a graph with tens of millions of
    reachable oids collects them ALL to the driver; use ``deptree_df``
    when the visited set feeds another plan (a semi-join against the
    result frame never leaves the executors).

    Hybrid driver loop of distributed hops, same shape as
    ``connected_components``' union-find hybrid:

    - While every hop's output stays under ``driver_fringe_threshold``
      rows, the fringe lives on the driver: each hop is ONE Spark job (a
      broadcast semi-join + explode + distinct with a short-circuiting
      ``limit`` probe), the visited set and the anti-join are plain Python
      set ops, and there is no per-hop checkpoint/count job. A fringe that
      fits the broadcast-join build side (which the distributed hop needs
      anyway) fits driver memory by the same argument, so this path costs
      no extra memory — it only removes ~3 scheduled jobs per hop, which
      is the entire cost on shallow/narrow graphs.
    - The moment a hop's output exceeds the threshold, the loop switches
      permanently to the distributed path: fringe and visited stay
      DataFrames, each hop is a semi-join + explode and an anti-join
      against visited, per-hop fringes are ``localCheckpoint``-ed (cutting
      lineage so the plan can't double every iteration), and only an
      emptiness count crosses to the driver. The full oid set is collected
      ONCE at the end, so a millions-wide fringe never becomes a giant
      ``IN`` literal in the plan. Wide fringes past the broadcast comfort
      zone (10M rows) drop the broadcast hint and let AQE pick the join
      strategy.
    """
    got = _deptree_visited(df, field, oids, level, date,
                           driver_fringe_threshold)
    if isinstance(got, DataFrame):
        return sorted(r["_oid"] for r in got.collect())
    return sorted(got)


def deptree_df(
    df: DataFrame,
    field: str,
    oids: Sequence,
    level: int | None = None,
    date: str | None = None,
    driver_fringe_threshold: int = 100_000,
) -> DataFrame:
    """``deptree`` returning the visited oids as a one-column ``_oid``
    DataFrame instead of a driver-side list: the distributed BFS
    already holds the visited set as a union of checkpointed per-hop
    fringes — hand THAT plan to the caller, so a multi-million-oid
    closure feeds the next join without ever crossing the driver (the
    list API's ``sorted(visited)`` collect is the reference-parity
    contract, not a necessity). Rows are distinct by construction (each
    hop anti-joins against visited before entering the set)."""
    got = _deptree_visited(df, field, oids, level, date,
                           driver_fringe_threshold)
    if isinstance(got, DataFrame):
        return got
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("_oid", df.schema["_oid"].dataType)])
    return df.sparkSession.createDataFrame(
        [(o,) for o in sorted(got)], schema)


def _deptree_visited(
    df: DataFrame,
    field: str,
    oids: Sequence,
    level: int | None,
    date: str | None,
    driver_fringe_threshold: int,
) -> "set | DataFrame":
    """Shared hybrid BFS: returns the visited oids as a driver set when
    every hop stayed under the threshold, else as the distributed
    union-of-checkpointed-fringes DataFrame."""
    from pyspark.sql import types as T

    from metrique_spark.mql import date_range_predicate

    from pyspark import StorageLevel

    pred = date_range_predicate(date)
    scoped = df.where(pred) if pred is not None else df
    spark = df.sparkSession
    oid_type = df.schema["_oid"].dataType
    # Every hop re-scans the edge table: persist the 2-column projection
    # once (MEMORY_AND_DISK — spills rather than OOMs) instead of
    # recomputing the caller's upstream plan per hop.
    from metrique_spark.functions.cache import narrow_small

    scoped = narrow_small(
        scoped.select("_oid", field)).persist(StorageLevel.MEMORY_AND_DISK)
    schema = T.StructType([T.StructField("_oid", oid_type)])
    cap = driver_fringe_threshold

    visited_set = set(oids)
    fringe_set = set(oids)
    depth = 0
    try:
        # Driver path: one Spark job per hop. The ``limit(cap + 1)`` probe
        # short-circuits, so overflow detection never materializes a wide
        # hop — it just hands the same fringe to the distributed loop.
        while fringe_set and (level is None or depth < level):
            if len(fringe_set) <= 1000:
                # a small fringe is better as a literal predicate than a
                # broadcast join: it pushes into the scan (parquet
                # row-group / cached-batch pruning — at scale this skips
                # most of the edge table instead of reading all of it)
                # and the hop is one single-stage job. Bounded at 1000
                # literals so the plan itself stays KB-sized; the
                # dedup/anti-join happens in the driver sets below.
                hop_df = (
                    scoped.where(F.col("_oid").isin(sorted(fringe_set)))
                    .select(F.explode(F.col(field)).alias("_oid"))
                    .where(F.col("_oid").isNotNull())
                )
            else:
                fringe_df = spark.createDataFrame(
                    [(o,) for o in sorted(fringe_set)], schema)
                hop_df = _deptree_hop(scoped, field, fringe_df)
            rows = hop_df.limit(cap + 1).collect()
            if len(rows) > cap:
                break  # this hop is wide — redo it distributed
            fringe_set = {r["_oid"] for r in rows} - visited_set
            visited_set |= fringe_set
            depth += 1
        if not fringe_set or (level is not None and depth >= level):
            return visited_set

        # Distributed path. visited stays a lazy union of per-hop
        # checkpointed fringes: each fringe is cut from its lineage
        # (otherwise the plan doubles every iteration), while the union
        # itself is k cheap checkpoint scans. A DEEP traversal would
        # still accrete one union arm per hop — an O(depth) plan fed to
        # every anti-join and handed to the caller — so whenever the
        # union reaches ``_VISITED_COLLAPSE_PARTS`` arms it is folded
        # into ONE checkpointed frame: the plan stays O(collapse
        # window) at any depth, and the fold's O(|visited|) rewrite
        # amortizes to ≤1/window of the per-hop anti-join work that
        # already scans visited.
        from metrique_spark.upsert import (broadcast_fits,
                                           key_row_bytes)

        fringe = spark.createDataFrame(
            [(o,) for o in fringe_set], schema).localCheckpoint(eager=True)
        visited = spark.createDataFrame(
            [(o,) for o in visited_set], schema).localCheckpoint(eager=True)
        parts = [visited]
        # byte-aware broadcast comfort zone (shared with the history
        # import's key frames): string oids — the reference's git-SHA
        # case — measure their average width in the same job the fringe
        # count already costs, so a wide-key fringe drops the hint well
        # before the row cap would
        str_oid = isinstance(oid_type, T.StringType)
        n_prev = len(fringe_set)
        w_prev = (sum(len(o) for o in fringe_set) / n_prev
                  if str_oid and n_prev else None)
        while level is None or depth < level:
            hop = _deptree_hop(
                scoped, field, fringe,
                broadcast_fringe=broadcast_fits(
                    n_prev, key_row_bytes(oid_type, w_prev)))
            new_fringe = (hop.join(visited, "_oid", "anti")
                          .localCheckpoint(eager=True))
            if str_oid:
                stat = new_fringe.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.avg(F.length("_oid")).alias("w")).first()
                n_prev, w_prev = stat["n"], stat["w"]
            else:
                n_prev = new_fringe.count()
            if not n_prev:
                break
            parts.append(new_fringe)
            if len(parts) >= _VISITED_COLLAPSE_PARTS:
                parts = [reduce(DataFrame.unionByName, parts)
                         .localCheckpoint(eager=True)]
            visited = reduce(DataFrame.unionByName, parts)
            fringe = new_fringe
            depth += 1
        # safe to hand out past the unpersist below: every part is an
        # eagerly checkpointed fringe — the union never re-reads scoped
        return visited
    finally:
        scoped.unpersist()


def object_apply(df: DataFrame, func: Callable, schema) -> DataFrame:
    """Apply a pandas DataFrame→DataFrame function per ``_oid`` group
    (reference ``result.py:475-483``) — ``applyInPandas`` grouped-map,
    Arrow-batched."""
    return df.groupBy("_oid").applyInPandas(func, schema=schema)
