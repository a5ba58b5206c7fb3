"""Temporal operator tests — semantics pinned from reference
metrique/result.py (as-of asymmetry, chains, version windows)."""

from pyspark.sql import functions as F

from metrique_spark import temporal


def test_on_date_boundary(versions):
    # pandas-layer semantics: _start <= d AND _end > d (result.py:175-176)
    # — note <= on start (vs < in SQL date_range), > on end (vs >=).
    # at exactly 2014-02-01: v1 rows END there (end > d false), v2/oid3
    # rows START there (start <= d true) -> oid1 v2, oid3
    live = temporal.on_date(versions, "2014-02-01")
    rows = {(r["_oid"], r["val"]) for r in live.collect()}
    assert rows == {(1, "b"), (3, "a")}
    assert temporal.on_date(versions, "2014-02-01", only_count=True) == 2


def test_date_spine_and_history(spark, versions):
    spine = temporal.date_spine(spark, "2014-01-01", "2014-04-01", "weekly")
    n_points = spine.count()
    assert n_points == 13  # floor(90/7) + 1 weekly points in [01-01, 04-01]

    hist = temporal.history(versions, spine).collect()
    by_date = {str(r["_date"])[:10]: r["count"] for r in hist}
    assert by_date["2014-01-01"] == 2          # oid1 v1, oid2 v1
    assert by_date["2014-02-05"] == 2          # oid1 v2, oid3
    assert by_date["2014-03-05"] == 3          # oid1 v3, oid2 v2, oid3


def test_date_spine_maximum(spark, versions):
    spine = temporal.date_spine(
        spark, "2014-01-01", "2014-12-31", "maximum", versions=versions
    )
    # distinct instants: 01-01, 02-01, 03-01, 04-01
    assert spine.count() == 4


def test_first_last_version(versions):
    first = temporal.first_version(versions)
    assert {(r["_oid"], r["val"]) for r in first.collect()} == {
        (1, "a"), (2, "a"), (3, "a")}
    last = temporal.last_version(versions)
    assert {(r["_oid"], r["val"]) for r in last.collect()} == {
        (1, "c"), (2, "b"), (3, "a")}
    second = temporal.one_version(versions, 1)
    assert {(r["_oid"], r["val"]) for r in second.collect()} == {
        (1, "b"), (2, "b")}


def test_unfinished_objects(versions):
    # oids 1 and 3 have an open version; keep ALL their versions
    out = temporal.unfinished_objects(versions)
    assert out.count() == 4
    assert {r["_oid"] for r in out.select("_oid").distinct().collect()} == {1, 3}


def test_started_after(versions):
    out = temporal.started_after(versions, "2014-01-15")
    assert {r["_oid"] for r in out.select("_oid").distinct().collect()} == {3}


def test_last_chain(versions):
    # oid1: unbroken chain of 3 -> all kept
    # oid2: gap between v1 and v2 -> only v2
    # oid3: single version
    out = temporal.last_chain(versions)
    got = {(r["_oid"], r["val"]) for r in out.collect()}
    assert got == {(1, "a"), (1, "b"), (1, "c"), (2, "b"), (3, "a")}


def test_last_versions_with_age(versions):
    out = temporal.last_versions_with_age(versions, rbound="2014-05-01")
    by_oid = {r["_oid"]: r for r in out.collect()}
    assert by_oid[1]["val"] == "c"
    # oid1: first start 01-01, open -> age = 05-01 - 01-01 = 120 days
    assert by_oid[1]["age"] == 120 * 86400
    # oid2: first 01-01, last end 04-01 -> 90 days
    assert by_oid[2]["age"] == 90 * 86400


def test_persistent_oid_counts(spark, versions):
    spine = temporal.date_spine(spark, "2014-01-01", "2014-03-01", "monthly")
    rows = temporal.persistent_oid_counts(versions, spine).collect()
    by_date = {str(r["_date"])[:10]: r["count"] for r in rows}
    assert by_date == {"2014-01-01": 2, "2014-02-01": 3, "2014-03-01": 3}


def test_dfind(versions):
    out = temporal.dfind(versions, ["val"]).collect()
    changes = {(r["_oid"], r["old"], r["new"]) for r in out}
    assert (1, "a", "b") in changes
    assert (1, "b", "c") in changes
    assert (2, "a", "b") in changes
    assert len(changes) == 3
    assert all(r["kind"] == "changed" for r in out)


def test_dfind_whole_object_added_removed(spark):
    # fields=None diffs every non-system field; NULL transitions classify
    # as added/removed keys (reference DictDiffer, utils.py:1446-1535)
    rows = [
        (1, "a", None, "2014-01-01"),
        (1, "b", 5, "2014-02-01"),     # size appears  -> added
        (1, "b", None, "2014-03-01"),  # size vanishes -> removed
    ]
    df = spark.createDataFrame(rows, "_oid long, val string, size long, s string")
    df = df.withColumn("_start", F.to_timestamp("s")).withColumn(
        "_end", F.lit(None).cast("timestamp")).drop("s")
    out = temporal.dfind(df, None).collect()
    got = {(r["field"], r["old"], r["new"], r["kind"]) for r in out}
    assert got == {
        ("val", "a", "b", "changed"),
        ("size", None, "5", "added"),
        ("size", "5", None, "removed"),
    }


def test_object_apply(spark, versions):
    def count_versions(pdf):
        import pandas as pd

        return pd.DataFrame({"_oid": [pdf["_oid"].iloc[0]], "n": [len(pdf)]})

    out = temporal.object_apply(versions, count_versions, "_oid long, n long")
    assert {(r["_oid"], r["n"]) for r in out.collect()} == {(1, 3), (2, 2), (3, 1)}


def test_deptree(spark):
    # parent -> children array field; BFS semantics from sqlalchemy.py:666-692
    rows = [
        (1, [2, 3]), (2, [4]), (3, []), (4, [5]), (5, []), (6, [1]),
    ]
    df = spark.createDataFrame(rows, "_oid long, children array<long>")
    df = df.withColumn("_start", F.to_timestamp(F.lit("2014-01-01"))).withColumn(
        "_end", F.lit(None).cast("timestamp"))
    # reference returns sorted(checked) with the seeds included
    assert temporal.deptree(df, "children", [1]) == [1, 2, 3, 4, 5]
    assert temporal.deptree(df, "children", [1], level=1) == [1, 2, 3]
    assert temporal.deptree(df, "children", [1], level=2) == [1, 2, 3, 4]
    # cycles terminate (6 -> 1 -> ... -> back pointers never re-expand)
    assert temporal.deptree(df, "children", [6]) == [1, 2, 3, 4, 5, 6]


def test_deptree_distributed_path_matches_driver(spark):
    # driver_fringe_threshold=0 forces the first hop to overflow the
    # limit probe and escalate to the distributed checkpoint loop; both
    # paths must return the same visited set, level cut included
    rows = [
        (1, [2, 3]), (2, [4]), (3, []), (4, [5]), (5, []), (6, [1]),
        (7, [1, 6]),
    ]
    df = spark.createDataFrame(rows, "_oid long, children array<long>")
    df = df.withColumn("_start", F.to_timestamp(F.lit("2014-01-01"))).withColumn(
        "_end", F.lit(None).cast("timestamp"))
    for seeds, level in [([1], None), ([1], 1), ([1], 2), ([6], None), ([7], 1)]:
        want = temporal.deptree(df, "children", seeds, level=level)
        got = temporal.deptree(df, "children", seeds, level=level,
                               driver_fringe_threshold=0)
        assert got == want, (seeds, level)


def test_deptree_mid_walk_escalation(spark):
    # threshold between hop sizes: hop 1 (2 children) stays on the driver,
    # hop 2 (3 children) overflows and is redone distributed — the
    # handoff must not lose or duplicate visited oids
    rows = [(1, [2, 3]), (2, [4, 5, 6]), (3, []), (4, []), (5, []), (6, [])]
    df = spark.createDataFrame(rows, "_oid long, children array<long>")
    df = df.withColumn("_start", F.to_timestamp(F.lit("2014-01-01"))).withColumn(
        "_end", F.lit(None).cast("timestamp"))
    assert temporal.deptree(df, "children", [1],
                            driver_fringe_threshold=2) == [1, 2, 3, 4, 5, 6]


def test_history_sub_second_uniform_spine_exact(spark):
    # a 1001-microsecond-step spine is uniform in real time; the
    # prefix-sum path must take the step EXACTLY from epoch-micros deltas
    # (int(total_seconds()*1e6) float-truncates 1001us to 1000us and
    # silently mis-indexes every version)
    import datetime as dt

    base = dt.datetime(2020, 1, 1)
    us = dt.timedelta(microseconds=1)
    dates = [base + i * 1001 * us for i in range(10)]
    spine = spark.createDataFrame([(d,) for d in dates], "_date timestamp")
    intervals = [(0, 2000), (500, 5005), (3003, None), (9009, 9010)]
    df = spark.createDataFrame(
        [(base + a * us, base + b * us if b is not None else None)
         for a, b in intervals],
        "_start timestamp, _end timestamp")
    got = {r["_date"]: r["count"]
           for r in temporal.history(df, spine).collect()}
    for i, d in enumerate(dates):
        t = i * 1001
        want = sum(1 for a, b in intervals
                   if a <= t and (b is None or b > t))
        assert got[d] == want, (i, got[d], want)


def test_filter_oids_list_and_frame(spark):
    """filter_oids keeps exactly the listed oids — literal-predicate
    path for sequences, capped-broadcast semi-join for DataFrames (the
    deptree_df closure handoff)."""
    from metrique_spark.temporal import filter_oids

    df = spark.createDataFrame([(i, i * 10) for i in range(8)],
                               "_oid long, col_1 long")
    assert sorted(r["_oid"] for r in
                  filter_oids(df, [1, 3, 5]).collect()) == [1, 3, 5]
    keys = spark.createDataFrame([(2,), (4,), (4,)], "_oid long")
    assert sorted(r["_oid"] for r in
                  filter_oids(df, keys).collect()) == [2, 4]
