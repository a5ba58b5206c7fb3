"""Engine facade tests: find/count/distinct/get_last_field/catalog ops."""

import pytest
from pyspark.sql import functions as F

from metrique_spark.engine import Engine


@pytest.fixture()
def engine(spark, versions, tmp_path):
    e = Engine(spark, warehouse=str(tmp_path / "wh"))
    e.register("v", versions)
    return e


def test_find_projection_defaults(engine):
    df = engine.find("v", fields="val", date="~")
    # default fields appended (sqlalchemy.py:264-273)
    assert set(df.columns) == {"val", "_start", "_end", "_oid"}


def test_find_sort_limit(engine):
    rows = engine.find("v", date="~", sort="_start", descending=True, limit=2).collect()
    assert len(rows) == 2
    assert all(str(r["_start"]).startswith("2014-03-01") for r in rows)


def test_find_date_default_current(engine):
    # no date -> current versions only (_end is null)
    assert engine.find("v").count() == 2


def test_count_with_query(engine):
    assert engine.count("v", query='val == "a"', date="~") == 3
    assert engine.count("v", query='val == "a"') == 1  # current only: oid3


def test_distinct_scalar_and_array(engine):
    vals = [r["val"] for r in engine.distinct("v", "val").collect()]
    assert vals == ["a", "b", "c"]
    # array field flattened (sqlalchemy.py:706-721)
    tags = [r["tags"] for r in engine.distinct("v", "tags").collect()]
    assert tags == ["x", "y", "z"]


def test_get_last_field(engine):
    assert str(engine.get_last_field("v", "_start")).startswith("2014-03-01")
    assert engine.get_last_field("v", "_oid") == 3


def test_catalog(engine, spark):
    assert "v" in engine.ls()
    assert engine.exists("v")
    assert not engine.exists("nope")
    assert "tags" in engine.columns("v")


def test_sql_over_registered_cubes(engine):
    out = engine.sql("select _oid, count(*) as n from v group by _oid order by _oid")
    assert [(r["_oid"], r["n"]) for r in out.collect()] == [(1, 3), (2, 2), (3, 1)]


def test_distinct_multi_field_flattens_arrays(engine):
    # reference reduce-adds per-field lists into one flat sorted set
    out = engine.distinct("v", ["tags", "val"])
    assert out.columns == ["value"]
    vals = [r["value"] for r in out.collect()]
    assert vals == sorted({"x", "y", "z", "a", "b", "c"})


def test_dfind_via_engine(engine):
    out = engine.dfind("v", ["val"])
    assert out.count() == 3


def test_find_one_and_scalar(spark, versions):
    from metrique_spark.engine import Engine

    eng = Engine(spark)
    one = eng.find_one(versions, "val == 'c'", date="~")
    assert one is not None and one["val"] == "c" and one["_oid"] == 1
    assert eng.find_one(versions, "val == 'zzz'", date="~") is None
    n = eng.find_scalar(versions, "val == 'a'", fields="_oid", date="~",
                        sort="_oid")
    assert n == 1


def test_index_and_index_list(spark, tmp_path):
    """Advisory index registry (reference index/index_list,
    sqlalchemy.py:826-863): declarations are recorded, listed per cube,
    persisted in the warehouse, and invisible to the parquet reader."""
    from metrique_spark.engine import Engine

    eng = Engine(spark, warehouse=str(tmp_path))
    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    eng.insert("c1", df, oid="k")
    eng.index("c1", ["k"])
    eng.index("c1", "v", name="ix_custom")
    listed = eng.index_list()
    assert [e["name"] for e in listed["c1"]] == ["ix_c1_k", "ix_custom"]
    assert listed["c1"][0]["column_names"] == ["k"]
    # sidecar survives a fresh Engine over the same warehouse
    eng2 = Engine(spark, warehouse=str(tmp_path))
    assert [e["name"] for e in eng2.index_list()["c1"]] == ["ix_c1_k",
                                                            "ix_custom"]
    # and does not pollute reads
    assert eng2.table("c1").count() == 1
    # a fresh Engine's first index() call must MERGE with the persisted
    # sidecar, not overwrite it (its in-memory registry starts empty)
    eng2.index("c1", ["k", "v"], name="ix_new")
    eng3 = Engine(spark, warehouse=str(tmp_path))
    assert {e["name"] for e in eng3.index_list()["c1"]} == {
        "ix_c1_k", "ix_custom", "ix_new"}


def test_auto_compact_hook(spark, tmp_path):
    """auto_compact_batches: repeated snapshot upserts must not accumulate
    one history directory per batch — the hook compacts once the count
    exceeds the threshold, and no history rows are lost."""
    import os

    from pyspark.sql import functions as F

    from metrique_spark.engine import Engine

    eng = Engine(spark, warehouse=str(tmp_path), auto_compact_batches=2)
    for i in range(5):
        df = spark.createDataFrame(
            [(k, f"v{i}") for k in range(3)], ["k", "val"])
        eng.upsert("c", df, oid="k",
                   start=F.to_timestamp(F.lit(f"2024-0{i + 1}-01")))
    hist_root = os.path.join(str(tmp_path), "c", "_current=false")
    n_dirs = sum(1 for d in os.listdir(hist_root) if d.startswith("__batch="))
    assert n_dirs <= 2
    # nothing lost: 4 closed versions per key + 1 open = 15 rows
    assert eng.count("c", date="~") == 15
    assert eng.count("c", date=None) == 3
    # un-hooked engine over the same sequence accumulates one dir per batch
    eng2 = Engine(spark, warehouse=str(tmp_path / "wh2"))
    for i in range(5):
        df = spark.createDataFrame(
            [(k, f"v{i}") for k in range(3)], ["k", "val"])
        eng2.upsert("c", df, oid="k",
                    start=F.to_timestamp(F.lit(f"2024-0{i + 1}-01")))
    hist2 = os.path.join(str(tmp_path / "wh2"), "c", "_current=false")
    assert sum(1 for d in os.listdir(hist2)
               if d.startswith("__batch=")) == 4


def test_concurrent_writer_fails_fast(spark, tmp_path):
    import os

    from metrique_spark.engine import ConcurrentWriteError, Engine

    wh = str(tmp_path / "wh_lock")
    e1 = Engine(spark, warehouse=wh)
    df = spark.createDataFrame(
        [(1, "a", "2014-01-01", None)],
        "_oid long, val string, _start string, _end string")
    from pyspark.sql import functions as F

    stamped = (df.withColumn("_start", F.col("_start").cast("timestamp"))
               .withColumn("_end", F.col("_end").cast("timestamp")))
    e1.upsert("c", stamped)

    # a LIVE competing writer (this very pid) holds the lock -> the
    # second upsert must fail fast, not interleave snapshot merges
    lock = os.path.join(wh, ".c.lock")
    with open(lock, "w") as fh:
        fh.write(str(os.getpid()))
    e2 = Engine(spark, warehouse=wh)
    import pytest as _pytest

    with _pytest.raises(ConcurrentWriteError, match="locked by writer"):
        e2.upsert("c", stamped)
    os.unlink(lock)

    # a STALE lock (holder pid no longer exists) is reclaimed: the
    # upsert proceeds and leaves the lock released afterwards
    with open(lock, "w") as fh:
        fh.write("999999999")
    e2.upsert("c", stamped)
    assert not os.path.exists(lock)

    # reentrancy: auto-compact inside upsert acquires the same cube lock
    e3 = Engine(spark, warehouse=wh, auto_compact_batches=1)
    for day in ["2014-02-01", "2014-03-01", "2014-04-01"]:
        batch = spark.createDataFrame(
            [(1, f"v{day}", day, None)],
            "_oid long, val string, _start string, _end string")
        e3.upsert("c", batch
                  .withColumn("_start", F.col("_start").cast("timestamp"))
                  .withColumn("_end", F.col("_end").cast("timestamp")))
    assert not os.path.exists(lock)
