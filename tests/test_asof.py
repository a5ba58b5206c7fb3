"""as-of join tests (SURVEY §2.6 temporal join pattern)."""

import datetime as dt

from metrique_spark import temporal


def ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_asof_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, ts(10)), (1, ts(20)), (2, ts(10))], "k long, t timestamp")
    right = spark.createDataFrame(
        [(1, ts(5), "a"), (1, ts(15), "b"), (2, ts(12), "x")],
        "k long, rt timestamp, v string")
    out = temporal.asof_join(left, right, on="k", left_ts="t", right_ts="rt")
    got = {(r["k"], r["t"]): r["v"] for r in out.collect()}
    assert got == {
        (1, ts(10)): "a",     # rt=5 latest <= 10
        (1, ts(20)): "b",     # rt=15 latest <= 20
        (2, ts(10)): None,    # no state yet -> left-join null
    }


def test_asof_tie_matches_right(spark):
    left = spark.createDataFrame([(1, ts(10))], "k long, t timestamp")
    right = spark.createDataFrame(
        [(1, ts(10), "same-instant")], "k long, rt timestamp, v string")
    out = temporal.asof_join(left, right, on="k", left_ts="t", right_ts="rt")
    assert out.first()["v"] == "same-instant"  # >= semantics


def test_asof_payload_is_atomic(spark):
    # v2 is NULL in the later right row: both payload columns must still
    # come from that same row, not mix with the earlier one
    left = spark.createDataFrame([(1, ts(20))], "k long, t timestamp")
    right = spark.createDataFrame(
        [(1, ts(5), "old", "old2"), (1, ts(15), "new", None)],
        "k long, rt timestamp, v string, v2 string")
    out = temporal.asof_join(left, right, on="k", left_ts="t", right_ts="rt")
    row = out.first()
    assert row["v"] == "new" and row["v2"] is None


def test_asof_preserves_left_rows_and_columns(spark):
    left = spark.createDataFrame(
        [(1, ts(10), "extra")], "k long, t timestamp, note string")
    right = spark.createDataFrame([], "k long, rt timestamp, v string")
    out = temporal.asof_join(left, right, on="k", left_ts="t", right_ts="rt")
    row = out.first()
    assert row["note"] == "extra" and row["v"] is None and out.count() == 1
