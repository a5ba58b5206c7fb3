"""Event-stream operators: tumbling/sliding windows, sessionization, and a
streaming ingest path for the cube model.

Every operator has one implementation that works in BOTH batch and
streaming mode — the transformations are identical DataFrame ops; only the
source (``read`` vs ``readStream``) differs. Watermarks bound state for
late data in streaming; in batch they're no-ops.

Sessionization uses the built-in ``session_window`` (Spark 3.2+) — state
store managed, no custom ``applyInPandasWithState`` needed for gap
sessions. A custom stateful example (running per-user counters) shows the
``applyInPandasWithState`` path for semantics the built-ins can't express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def read_events_stream(spark: SparkSession, path: str,
                       max_files_per_trigger: int = 4) -> DataFrame:
    """File-source stream over an events directory (exactly-once via file
    tracking; at scale this is the same code against Kafka/Kinesis).

    The physical ``ts`` encoding has shipped both as nanosecond parquet
    (surfaced as long under ``nanosAsLong``) and as microsecond
    TIMESTAMP_NTZ; the schema is taken from the files themselves (a
    footer-only batch read) and either encoding is normalized to
    ``TimestampType`` before any watermark/window sees it."""
    static_schema = spark.read.parquet(path).schema
    raw = (
        spark.readStream.schema(static_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    ts_type = static_schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, T.TimestampNTZType):
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Per-window, per-type counts + value sum. Streaming-safe (watermark
    bounds state); in batch mode the watermark is ignored by Spark."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("value_sum"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "value_sum")
    )


def session_stats(events: DataFrame, gap: str = "30 minutes",
                  watermark: str = "2 hours") -> DataFrame:
    """Gap-based sessions per user via built-in ``session_window``."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("value_sum"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "value_sum",
        )
    )


def dedup_stream(events: DataFrame, keys=("event_id",),
                 watermark: str = "2 hours", ts_col: str = "ts") -> DataFrame:
    """Exactly-once event dedup — the standard ingestion guard against
    at-least-once sources (replayed Kafka offsets, retried file drops).

    Streaming: ``dropDuplicatesWithinWatermark`` keeps one state entry per
    key only until the watermark passes it, so state is bounded by the
    horizon × key arrival rate, not by stream lifetime — the property that
    makes this runnable forever at 100 TB/day. Batch: plain
    ``dropDuplicates`` (same semantics, no horizon needed)."""
    keys = list(keys)
    if events.isStreaming:
        return (events.withWatermark(ts_col, watermark)
                .dropDuplicatesWithinWatermark(keys))
    return events.dropDuplicates(keys)


def user_running_totals(events: DataFrame) -> DataFrame:
    """Custom stateful op demo: running per-user event count/value via
    ``applyInPandasWithState`` in streaming, plain window agg in batch.
    Illustrates the escape hatch for semantics built-ins can't express
    (reference has no analog; SURVEY.md §2.7 extension)."""
    if not events.isStreaming:
        return (
            events.groupBy("user_id")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("value_sum"))
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    import pandas as pd

    out_schema = "user_id long, n_events long, value_sum double"
    state_schema = "n long, s double"

    def update(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].fillna(0).sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "value_sum": [round(s, 2)]})

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout)


def stream_upsert_sink(engine, cube: str, checkpoint_dir: str):
    """foreachBatch sink: each micro-batch flows through the engine's
    temporal snapshot upsert — streaming ingest of versioned objects
    (the streaming analog of the reference's delta batch sync)."""

    def _sink(batch_df: DataFrame, batch_id: int):
        if not batch_df.isEmpty():
            engine.upsert(cube, batch_df, stamped=True)

    return _sink


def correlate_events(
    events: DataFrame,
    first_type: str = "click",
    then_type: str = "purchase",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event correlation — every (first, then) pair for the same user where
    the ``then`` event follows a ``first`` event within ``within`` (e.g.
    attribute each purchase to the clicks in the preceding hour).

    One implementation, both modes. Batch: a plain self-join with the
    interval condition (keyed by user, never a cartesian). Streaming: a
    watermarked stream-stream inner join — BOTH sides carry watermarks and
    the join condition bounds event-time distance, which is exactly what
    lets Spark expire join state: a buffered ``first`` event can be
    dropped once the watermark passes its ts + ``within``. Without the
    time-range condition the state would grow forever."""
    iv = F.expr(f"INTERVAL {within}")
    # NTZ-proof: a raw TIMESTAMP_NTZ ts (the round-2 regression shape)
    # can't cast to double for the gap; normalize to TimestampType first
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    a = events.select(
        F.col("user_id").alias("a_user"),
        F.col("event_id").alias(f"{first_type}_id"),
        F.col("ts").alias("a_ts"),
        F.col("event_type").alias("a_type"),
    ).where(F.col("a_type") == first_type).drop("a_type")
    b = events.select(
        F.col("user_id").alias("b_user"),
        F.col("event_id").alias(f"{then_type}_id"),
        F.col("ts").alias("b_ts"),
        F.col("event_type").alias("b_type"),
    ).where(F.col("b_type") == then_type).drop("b_type")
    if events.isStreaming:
        a = a.withWatermark("a_ts", watermark)
        b = b.withWatermark("b_ts", watermark)
    joined = a.join(
        b,
        (F.col("a_user") == F.col("b_user"))
        & (F.col("a_ts") <= F.col("b_ts"))
        & (F.col("a_ts") >= F.col("b_ts") - iv),
    )
    return joined.select(
        F.col("a_user").alias("user_id"),
        f"{first_type}_id",
        f"{then_type}_id",
        (F.col("b_ts").cast("double") - F.col("a_ts").cast("double"))
        .cast("long").alias("gap_seconds"),
    )
