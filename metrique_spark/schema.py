"""Declarative field schemas — the reference's per-field schema dict
``{field: {'type': t, 'container': bool, 'convert': fn, 'variants': {...}}}``
(``core_api.py:186-214``, valid keys ``metrique.py:151``) applied as one
columnar ``select`` instead of a per-value Python loop
(``core_api.py:393-410,341-351,466-524``).

- ``type``: python type (str/int/float/bool/datetime) or Spark type string;
  values are cast (datetimes normalized to TimestampType — the reference
  normalizes to UTC epoch floats, ``utils.py:432-457``).
- ``container``: field becomes a sorted array of ``type``
  (``core_api.py:490-498``; sorting keeps hashes order-insensitive).
- ``convert``: a Column→Column callable applied before the cast. Spark-first
  replacement for the reference's per-value callables — pass
  ``F.udf``-wrapped functions only when no builtin expression exists.
  Applied per element (``transform``) on container fields
  (``core_api.py:466-479``).
- ``variants``: ``{name: Column→Column}`` derived fields computed from the
  (converted) source column (``core_api.py:207-214,341-351``; the
  reference's second ``store`` argument is dropped — documented ingest-stage
  column expressions replace whole-container access).
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PY2SPARK: dict[object, T.DataType] = {
    str: T.StringType(),
    int: T.LongType(),
    float: T.DoubleType(),
    bool: T.BooleanType(),
    bytes: T.BinaryType(),
    datetime.datetime: T.TimestampType(),
    datetime.date: T.TimestampType(),
    dict: T.MapType(T.StringType(), T.StringType()),
    None: None,  # keep inferred type
}


def spark_type(t) -> T.DataType | None:
    """Python type / type-name string → Spark type."""
    if t is None or isinstance(t, T.DataType):
        return t if t is None or isinstance(t, T.DataType) else None
    if isinstance(t, str):
        return T._parse_datatype_string(t)
    if t in _PY2SPARK:
        return _PY2SPARK[t]
    raise ValueError(f"unsupported schema type: {t!r}")


def apply_schema(df: DataFrame, schema: dict) -> DataFrame:
    """Apply a reference-style schema dict in a single ``select``."""
    exprs: list[Column] = []
    variant_exprs: list[Column] = []
    declared = set(schema)
    for name in df.columns:
        if name not in declared:
            exprs.append(F.col(name))
            continue
        spec = schema[name] or {}
        col: Column = F.col(name)
        target = spark_type(spec.get("type"))
        convert = spec.get("convert")
        container = spec.get("container", False)
        if container:
            src_is_array = isinstance(df.schema[name].dataType, T.ArrayType)
            if not src_is_array:
                # scalars wrap to single-element lists; nulls become []
                # (core_api.py:367-377,492-494)
                col = F.when(col.isNull(), F.array().cast(
                    T.ArrayType(df.schema[name].dataType))
                ).otherwise(F.array(col))
            else:
                col = F.coalesce(col, F.array().cast(df.schema[name].dataType))
            if convert is not None:
                col = F.transform(col, convert)
            if target is not None:
                col = col.cast(T.ArrayType(target))
            col = F.array_sort(col)  # core_api.py:498
        else:
            if convert is not None:
                col = convert(col)
            if target is not None:
                col = col.cast(target)
        exprs.append(col.alias(name))
        for vname, vfn in (spec.get("variants") or {}).items():
            variant_exprs.append(vfn(col).alias(vname))
    # declared fields absent from df: create as typed nulls
    for name in declared - set(df.columns):
        spec = schema[name] or {}
        target = spark_type(spec.get("type")) or T.StringType()
        if spec.get("container", False):
            target = T.ArrayType(target)
        exprs.append(F.lit(None).cast(target).alias(name))
    return df.select(*exprs, *variant_exprs)


def autoschema(df: DataFrame) -> dict:
    """Derive a reference-style ``{field: {type, container}}`` dict from a
    DataFrame's schema (reference ``autoschema``, ``utils.py:121-157`` —
    there inferred from sample objects; Spark's readers already infer)."""
    _SPARK2PY = {
        T.StringType: str, T.LongType: int, T.IntegerType: int,
        T.ShortType: int, T.DoubleType: float, T.FloatType: float,
        T.BooleanType: bool, T.TimestampType: datetime.datetime,
        T.BinaryType: bytes,
    }

    def pytype(dt: T.DataType):
        return _SPARK2PY.get(type(dt))

    out: dict = {}
    for f in df.schema.fields:
        if isinstance(f.dataType, T.ArrayType):
            out[f.name] = {"type": pytype(f.dataType.elementType),
                           "container": True}
        else:
            out[f.name] = {"type": pytype(f.dataType), "container": False}
    return out
