"""Schema-dict application tests (reference core_api.py:186-214,341-351,
466-524 semantics, columnar)."""

import datetime as dt

from pyspark.sql import functions as F

from metrique_spark.schema import apply_schema, autoschema


def test_typecast_and_convert(spark):
    df = spark.createDataFrame([("5", "x"), ("7", "y")], "n string, s string")
    out = apply_schema(df, {
        "n": {"type": int, "convert": lambda c: c.cast("int") * 2},
        "s": {"type": str},
    })
    rows = {r["s"]: r["n"] for r in out.collect()}
    assert rows == {"x": 10, "y": 14}
    assert dict(out.dtypes)["n"] == "bigint"


def test_container_wraps_sorts_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, ["b", "a"]), (2, None)], "id long, tags array<string>")
    out = apply_schema(df, {"tags": {"type": str, "container": True}})
    rows = {r["id"]: r["tags"] for r in out.collect()}
    assert rows == {1: ["a", "b"], 2: []}  # sorted; null -> []


def test_scalar_promoted_to_container(spark):
    df = spark.createDataFrame([(1, "only")], "id long, tag string")
    out = apply_schema(df, {"tag": {"container": True}})
    assert out.first()["tag"] == ["only"]


def test_variants_derive_columns(spark):
    df = spark.createDataFrame([("Alice",)], "name string")
    out = apply_schema(df, {
        "name": {"type": str,
                 "variants": {"name_lower": lambda c: F.lower(c)}},
    })
    row = out.first()
    assert row["name_lower"] == "alice"


def test_missing_declared_field_created_null(spark):
    df = spark.createDataFrame([(1,)], "id long")
    out = apply_schema(df, {"extra": {"type": float}})
    assert out.first()["extra"] is None and dict(out.dtypes)["extra"] == "double"


def test_datetime_normalized(spark):
    df = spark.createDataFrame([("2024-01-02 03:04:05",)], "ts string")
    out = apply_schema(df, {"ts": {"type": dt.datetime}})
    assert out.first()["ts"] == dt.datetime(2024, 1, 2, 3, 4, 5)


def test_autoschema_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, 1.5, "s", ["a"], dt.datetime(2024, 1, 1))],
        "i long, f double, s string, arr array<string>, ts timestamp")
    got = autoschema(df)
    assert got["i"] == {"type": int, "container": False}
    assert got["arr"] == {"type": str, "container": True}
    assert got["ts"]["type"] is dt.datetime
