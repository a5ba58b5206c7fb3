"""Temporal upsert — the reference's one genuinely custom operator,
re-expressed as a distributed merge.

Reference semantics (``metrique/sqlalchemy.py:906-975``):

- ``upsert(autosnap=True)`` (snapshot, branch ``:922-954``): for each
  incoming current-version object — if an open row (same ``_oid``,
  ``_end IS NULL``) exists with a different ``_hash``, close it
  (``_end = new._start``, ``_id = '{oid}:{start}'``) and insert the new row;
  same ``_hash`` → skip (dedup); unknown ``_oid`` → insert.
- ``upsert(autosnap=False)`` (history import, branch ``:955-963``): delete
  ALL versions of the incoming ``_oid``s, insert the supplied full history
  (the batch must contain the complete history per oid).
- ``autosnap=None`` auto-detects: True iff every incoming object is open
  (``:910-915``).

Scale design — the cube table is parquet partitioned by a ``_current``
boolean:

- snapshot upsert touches ONLY the ``_current=true`` partition (read it,
  merge, dynamically overwrite it) and *appends* newly-closed rows to the
  history partition. History — the ever-growing bulk at 100 TB — is never
  rewritten on the hot path.
- the merge itself is one join on ``_oid``. The incoming batch is typically
  small relative to the table, so it is broadcast when under the threshold;
  otherwise AQE picks the strategy.
- on a production cluster this maps 1:1 onto a Delta Lake ``MERGE INTO``
  (close-then-insert two-action merge); the parquet implementation keeps the
  same logical plan without requiring the Delta runtime in this container.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _regen_id(df: DataFrame) -> DataFrame:
    """Recompute ``_id`` after interval changes (reference ``gen_id``,
    ``core_api.py:73-82``)."""
    return df.withColumn(
        "_id",
        F.when(F.col("_end").isNull(), F.col("_oid").cast("string")).otherwise(
            F.concat_ws(":", F.col("_oid").cast("string"),
                        F.col("_start").cast("timestamp").cast("double")
                        .cast("string"))
        ),
    )


def latest_per_oid(incoming: DataFrame) -> DataFrame:
    """Last write wins within a batch: keep the latest ``_start`` per
    ``_oid`` (the reference's container buffer keyed by ``_id`` gives the
    same semantics, ``core_api.py:537-540``)."""
    return (
        incoming.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("_oid").orderBy(F.col("_start").desc())
            ),
        )
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def detect_autosnap(incoming: DataFrame) -> bool:
    """True iff all incoming objects are current versions (reference
    ``sqlalchemy.py:910-915``)."""
    return incoming.where(F.col("_end").isNotNull()).isEmpty()


def snapshot_merge_tagged(open_rows: DataFrame, incoming: DataFrame) -> DataFrame:
    """Single-pass snapshot merge: ONE full-outer join on ``_oid``; each
    joined row emits its output role(s) — kept / inserted / (closed +
    replacement) — as structs that are exploded out, with a ``__closed``
    flag distinguishing the newly-closed rows.

    The one-pass shape is load-bearing at scale: filtering the join three
    times (kept/inserted/closed as separate branches) re-executes the join
    per branch — measured 9 exchanges vs 4 for this plan. Both join inputs
    arrive already hash-partitioned by ``_oid`` from their dedup windows,
    so the join itself adds no exchange.
    """
    cols = open_rows.columns
    inc = latest_per_oid(incoming)

    o = open_rows.alias("o")
    n = inc.alias("n")
    joined = o.join(n, on=F.col("o._oid") == F.col("n._oid"), how="full_outer")

    has_old = F.col("o._oid").isNotNull()
    has_new = F.col("n._oid").isNotNull()
    # null-safe: a NULL _hash on either side must not void all three output
    # branches (plain == would make every when() condition NULL and the
    # joined row would emit nothing — the object silently disappears)
    same_hash = F.col("o._hash").eqNullSafe(F.col("n._hash"))
    changed = has_old & has_new & ~same_hash

    def side(prefix: str, closed: bool = False):
        fields = [
            (F.col("n._start") if closed and c == "_end" else F.col(f"{prefix}.{c}"))
            .alias(c)
            for c in cols
        ]
        return F.struct(*fields, F.lit(closed).alias("__closed"))

    outs = F.array(
        # open row survives unchanged: no incoming, or incoming is a dup
        F.when(has_old & (~has_new | same_hash), side("o")),
        # incoming lands: brand-new oid, or changed hash
        F.when(has_new & (~has_old | ~same_hash), side("n")),
        # changed: the old open row is closed at the incoming _start
        F.when(changed, side("o", closed=True)),
    )
    exploded = joined.select(
        F.explode(F.filter(outs, lambda x: x.isNotNull())).alias("r")
    ).select("r.*")
    return _regen_id(exploded)


def snapshot_merge(
    open_rows: DataFrame, incoming: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Snapshot merge split into ``(new_open, newly_closed)`` — thin facade
    over ``snapshot_merge_tagged``; callers that write both outputs should
    materialize the tagged frame once and filter it instead."""
    tagged = snapshot_merge_tagged(open_rows, incoming)
    new_open = tagged.where(~F.col("__closed")).drop("__closed")
    closed = tagged.where(F.col("__closed")).drop("__closed")
    return new_open, closed


BROADCAST_KEYS_CAP = 10_000_000
# estimated in-memory bytes of the broadcast build side a forced hint may
# claim on every executor. 10M longs (~160 MB at 16 B/row) stay under it;
# 10M git-SHA string oids (~1 GB as JVM strings) do not — the row cap
# alone would force-broadcast exactly the memory cliff it exists to avoid
BROADCAST_KEYS_BYTES = 256 * 1024 * 1024


def key_row_bytes(dtype, avg_len: float | None) -> float:
    """Estimated per-row in-memory footprint of a one-column key frame on
    the broadcast build side: JVM object/row overhead (~16 B) plus UTF-16
    payload for string keys (2 B/char at ``avg_len``); fixed-width
    numerics/timestamps are overhead-only. Deliberately rough — it only
    needs to separate "tens of MB" from "a GB"."""
    from pyspark.sql import types as T

    if isinstance(dtype, (T.StringType, T.BinaryType)):
        return 16.0 + 2.0 * (avg_len or 0.0)
    return 16.0


def broadcast_fits(n: int, row_bytes: float) -> bool:
    """True while a key frame of ``n`` rows at ``row_bytes`` each stays
    inside both the row cap and the byte cap."""
    return n <= BROADCAST_KEYS_CAP and n * row_bytes <= BROADCAST_KEYS_BYTES


def maybe_broadcast_keys(keys: DataFrame) -> DataFrame:
    """Broadcast-hint a slim key frame only while it plausibly fits the
    build side: a bulk history import can carry hundreds of millions of
    oids, and a FORCED broadcast of that set is an executor-memory cliff —
    beyond the cap the anti-join falls back to a plain shuffle join, which
    is exactly the right plan at that volume. The cap is BYTE-aware, not
    just row-count-aware: the same 10M rows are ~160 MB as longs but a GB+
    as the reference's git-SHA string oids, so string keys also measure
    their average width (same single aggregate job the row count already
    cost) and fall back to shuffle when the estimated build side outgrows
    ``BROADCAST_KEYS_BYTES``."""
    from pyspark.sql import types as T

    key = keys.columns[0]
    dtype = keys.schema[0].dataType
    if isinstance(dtype, (T.StringType, T.BinaryType)):
        row = keys.agg(F.count(F.lit(1)).alias("n"),
                       F.avg(F.length(key)).alias("w")).first()
        n, rb = row["n"], key_row_bytes(dtype, row["w"])
    else:
        n, rb = keys.count(), key_row_bytes(dtype, None)
    return F.broadcast(keys) if broadcast_fits(n, rb) else keys


def history_replace(table: DataFrame, incoming: DataFrame) -> DataFrame:
    """History import: drop every stored version of the incoming oids, then
    union the supplied full history (reference ``sqlalchemy.py:955-963``).
    Anti-join on ``_oid`` (broadcast when under the cap, shuffle
    beyond — see ``maybe_broadcast_keys``) + union — no per-row
    logic."""
    keys = incoming.select("_oid").distinct()
    kept = table.join(maybe_broadcast_keys(keys), "_oid", "left_anti")
    return kept.unionByName(_regen_id(incoming).select(*table.columns))
