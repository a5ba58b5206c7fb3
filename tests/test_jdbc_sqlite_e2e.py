"""End-to-end delta sync against a REAL database file (sqlite3, the
same engine the reference's own proxy fixtures use —
``reference/tests/test_sqla_proxy.py:173-190``): the three delta plans
(full, new-oid, changed-by-mtime — ``reference/cubes/sqldata/
generic.py:201-364``) drive real source queries whose predicates are
the module's own builders, the results flow through the engine's
temporal upsert, and every step is value-compared against sqlite3
executing the same predicate directly. Closes the "predicate strings
are the unit surface" gap — here they hit a real SQL engine."""

import os
import sqlite3

from pyspark.sql import functions as F

from metrique_spark.engine import Engine
from metrique_spark.objects import stamp
from metrique_spark.sources import jdbc


def _mkdb(path):
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE task (_oid INTEGER PRIMARY KEY, "
                "value TEXT, score REAL, mtime TEXT)")
    con.executemany(
        "INSERT INTO task VALUES (?,?,?,?)",
        [(i, f"v{i}", i * 1.5, "2014-01-01 00:00:00") for i in range(20)])
    con.commit()
    return con


def _sqlite_rows(con, predicate=None):
    q = "SELECT _oid, value, score, mtime FROM task"
    if predicate:
        q += f" WHERE {predicate}"
    return sorted(tuple(r) for r in con.execute(q))


def _spark_rows(df):
    return sorted(
        (r["_oid"], r["value"], r["score"], r["mtime"])
        for r in df.select("_oid", "value", "score", "mtime").collect())


def _sync(spark, eng, db, predicate=None, start="2014-01-01"):
    batch = jdbc.read_sqlite(spark, db, "task", predicate=predicate)
    if batch.isEmpty():
        return 0
    eng.upsert("task", stamp(
        batch, oid="_oid",
        start=F.to_timestamp(F.lit(start))), stamped=True)
    return batch.count()


def test_delta_sync_e2e_against_sqlite(spark, tmp_path):
    db = str(tmp_path / "src.sqlite")
    con = _mkdb(db)
    eng = Engine(spark, warehouse=str(tmp_path / "wh"), oid_buckets=4)
    ckpt = str(tmp_path / "wh" / "_etl" / "task.json")

    # --- plan 1: no checkpoint -> FULL sync ---------------------------
    assert jdbc.delta_plan(force=False,
                           last_update=jdbc.load_checkpoint(ckpt)) == "full"
    n = _sync(spark, eng, db)
    assert n == 20
    assert _spark_rows(eng.find("task", fields="*")) == _sqlite_rows(con)
    last = jdbc.save_checkpoint(ckpt, "2014-01-02 00:00:00")
    # checkpoint round-trips and switches the plan to delta
    assert jdbc.load_checkpoint(ckpt) == last
    assert jdbc.delta_plan(force=False, last_update=last) == "delta"
    assert jdbc.delta_plan(force=True, last_update=last) == "full"

    # --- plan 2: NEW-OID delta ----------------------------------------
    con.executemany(
        "INSERT INTO task VALUES (?,?,?,?)",
        [(i, f"v{i}", i * 1.5, "2014-02-01 00:00:00")
         for i in range(20, 26)])
    con.commit()
    last_max = eng.get_last_field("task", "_oid")
    assert last_max == 19
    pred = jdbc.new_oids_predicate(last_max)
    # the SAME predicate string means the same rows to BOTH engines:
    # sqlite executing it at the source == Spark filtering the full load
    src = _sqlite_rows(con, pred)
    full = jdbc.read_sqlite(spark, db, "task")
    assert _spark_rows(full.where(pred)) == src
    n = _sync(spark, eng, db, predicate=pred, start="2014-02-01")
    assert n == 6 == len(src)
    assert _spark_rows(eng.find("task", fields="*")) == _sqlite_rows(con)

    # --- plan 3: CHANGED-BY-MTIME delta (OR-combined columns) ---------
    con.executemany(
        "UPDATE task SET value = ?, mtime = ? WHERE _oid = ?",
        [(f"upd{o}", "2014-03-01 00:00:00", o) for o in (3, 21)])
    con.commit()
    pred = jdbc.changed_oids_predicate(["mtime"], "2014-02-15 00:00:00")
    src = _sqlite_rows(con, pred)
    assert len(src) == 2
    full = jdbc.read_sqlite(spark, db, "task")
    assert _spark_rows(full.where(pred)) == src
    n = _sync(spark, eng, db, predicate=pred, start="2014-03-01")
    assert n == 2
    # the snapshot upsert closed the superseded versions: current state
    # matches the source table exactly, history keeps the old values
    assert _spark_rows(eng.find("task", fields="*")) == _sqlite_rows(con)
    hist3 = eng.find("task", oids=[3], date="~", fields="value").collect()
    assert sorted(r["value"] for r in hist3) == ["upd3", "v3"]
    assert eng.count("task", date="~") == 26 + 2

    # --- empty delta: schema-stable zero-row frame --------------------
    pred = jdbc.new_oids_predicate(eng.get_last_field("task", "_oid"))
    empty = jdbc.read_sqlite(spark, db, "task", predicate=pred)
    assert empty.isEmpty()
    assert empty.columns == ["_oid", "value", "score", "mtime"]
    assert _sync(spark, eng, db, predicate=pred) == 0

    # --- multi-column OR predicate agrees across engines --------------
    pred = jdbc.changed_oids_predicate(["mtime", "value"],
                                       "2014-02-01 00:00:00")
    assert (_spark_rows(jdbc.read_sqlite(spark, db, "task")
                        .where(pred))
            == _sqlite_rows(con, pred))
    # string-typed last-oid quoting path
    assert jdbc.new_oids_predicate("abc") == "_oid > 'abc'"
    con.close()
    os.unlink(db)
