"""Streaming operator tests — batch/stream parity + a real micro-batch run."""

import pytest
from pyspark.sql import functions as F

from metrique_spark.streaming import events as ev


@pytest.fixture(scope="module")
def batch_events(spark, sf_dir):
    from metrique_spark.sources.testdata import load_table

    return load_table(spark, sf_dir, "events")


def test_tumbling_counts_batch(batch_events):
    out = ev.tumbling_counts(batch_events, "1 hour")
    rows = out.collect()
    assert len(rows) > 0
    total = sum(r["n"] for r in rows)
    assert total == batch_events.count()


def test_session_stats_batch(batch_events):
    out = ev.session_stats(batch_events, "30 minutes")
    assert out.count() > 0
    # sessions never overlap per user: end_i <= start_{i+1}
    w = out.orderBy("user_id", "session_start").collect()
    by_user = {}
    for r in w:
        by_user.setdefault(r["user_id"], []).append(r)
    for sess in by_user.values():
        for a, b in zip(sess, sess[1:]):
            assert a["session_end"] <= b["session_start"]


def test_user_running_totals_batch(batch_events):
    out = ev.user_running_totals(batch_events)
    n_users = batch_events.select("user_id").distinct().count()
    assert out.count() == n_users


def test_streaming_micro_batch(spark, sf_dir, tmp_path):
    """Real readStream → windowed agg → memory sink round trip."""
    import shutil

    src_dir = tmp_path / "events_src"
    src_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src_dir / "part-0.parquet")
    stream = ev.read_events_stream(spark, str(src_dir))
    assert stream.isStreaming
    agg = ev.tumbling_counts(stream, "1 hour")
    q = (
        agg.writeStream.format("memory").queryName("tc")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only watermark-closed windows; all but the last
    # 2h of event-time should be present
    got = spark.sql("select sum(n) as s from tc").first()["s"]
    assert got is not None and got > 0


def test_stream_upsert_sink(spark, sf_dir, tmp_path):
    """readStream → foreachBatch → Engine temporal upsert: streaming ingest
    of versioned objects lands in the warehouse with snapshot semantics."""
    import shutil

    from pyspark.sql import functions as F

    from metrique_spark.engine import Engine

    src_dir = tmp_path / "events_src"
    src_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src_dir / "part-0.parquet")
    eng = Engine(spark, warehouse=str(tmp_path / "wh"))

    stream = ev.read_events_stream(spark, str(src_dir))
    objs = stream.select(
        F.col("user_id").alias("_oid"),
        "event_type",
        F.col("ts").alias("_start"),
    )

    def sink(batch_df, batch_id):
        if not batch_df.isEmpty():
            eng.upsert("user_state", batch_df)

    q = (
        objs.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    n_users = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id").distinct().count()
    # one open version per user (last-write-wins within the batch)
    assert eng.count("user_state", date=None) == n_users
    assert eng.count("user_state", date="~") >= n_users
