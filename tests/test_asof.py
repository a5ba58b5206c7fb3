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


def test_asof_forward_direction(spark):
    """forward = earliest right with right_ts >= left_ts; ties match."""
    import datetime as dt

    from metrique_spark.temporal import asof_join

    T = lambda h: dt.datetime(2024, 1, 1, h)
    right = spark.createDataFrame(
        [(1, T(2), "a"), (1, T(5), "b"), (1, T(9), "c")],
        "k long, ts timestamp, val string")
    left = spark.createDataFrame(
        [(1, T(1)), (1, T(5)), (1, T(6)), (1, T(10))],
        "k long, t timestamp")
    got = {r["t"].hour: r["val"]
           for r in asof_join(left, right, "k", "t", "ts",
                              direction="forward").collect()}
    assert got == {1: "a", 5: "b", 6: "c", 10: None}


def test_asof_tolerance(spark):
    """matches further away than the tolerance null out (merge_asof
    parity), both directions."""
    import datetime as dt

    from metrique_spark.temporal import asof_join

    T = lambda h: dt.datetime(2024, 1, 1, h)
    right = spark.createDataFrame(
        [(1, T(2), "a"), (1, T(10), "b")], "k long, ts timestamp, val string")
    left = spark.createDataFrame(
        [(1, T(3)), (1, T(8))], "k long, t timestamp")
    back = {r["t"].hour: r["val"]
            for r in asof_join(left, right, "k", "t", "ts",
                               tolerance="2 HOURS").collect()}
    assert back == {3: "a", 8: None}           # 8 is 6h from 'a'
    fwd = {r["t"].hour: r["val"]
           for r in asof_join(left, right, "k", "t", "ts",
                              direction="forward",
                              tolerance="2 HOURS").collect()}
    assert fwd == {3: None, 8: "b"}            # 3 is 7h from 'b'
