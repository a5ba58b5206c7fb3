"""MQL compiler tests — semantics pinned from the reference
(tests/test_parse.py, tests/test_sqla_proxy.py:90-110)."""

import pytest
from pyspark.sql import functions as F

from metrique_spark.mql import MQLError, compile_mql, date_range_predicate, parse_fields


def q(df, query):
    return df.where(compile_mql(query, df))


def test_comparisons(versions):
    assert q(versions, 'val == "a"').count() == 3
    assert q(versions, 'val != "a"').count() == 3
    assert q(versions, '_oid > 1').count() == 3
    assert q(versions, '_oid >= 2').count() == 3
    assert q(versions, '_oid < 2').count() == 3
    assert q(versions, '_oid <= 1').count() == 3


def test_bool_logic(versions):
    assert q(versions, 'val == "a" and _oid == 1').count() == 1
    assert q(versions, 'val == "a" or val == "b"').count() == 5
    assert q(versions, 'not (val == "a")').count() == 3
    assert q(versions, 'val == "a" and (_oid == 1 or _oid == 2)').count() == 2


def test_membership(versions):
    assert q(versions, 'val in ["a", "b"]').count() == 5
    assert q(versions, 'val not in ["a", "b"]').count() == 1
    assert q(versions, '_oid in [1, 3]').count() == 4


def test_array_semantics(versions):
    # Eq on array = ANY element equals (reference parse.py:201-202)
    assert q(versions, 'tags == "x"').count() == 3
    # NotEq on array = ALL elements differ (parse.py:202-203)
    assert q(versions, 'tags != "x"').count() == 3
    # In on array = overlap
    assert q(versions, 'tags in ["x", "z"]').count() == 4
    assert q(versions, 'tags not in ["x", "z"]').count() == 2
    assert q(versions, 'empty(tags)').count() == 1


def test_array_null_three_valued(spark):
    # reference backend: `v != ALL(arr)` / NOT IN over a NULL array (or an
    # array with NULL elements and no match) yields NULL -> row excluded
    rows = [(1, ["x"]), (2, None), (3, [None]), (4, ["y"])]
    df = spark.createDataFrame(rows, "o long, tags array<string>")
    assert {r["o"] for r in q(df, 'tags != "x"').collect()} == {4}
    assert {r["o"] for r in q(df, 'tags not in ["x"]').collect()} == {4}
    # positive forms unaffected
    assert {r["o"] for r in q(df, 'tags == "x"').collect()} == {1}
    assert {r["o"] for r in q(df, 'tags in ["x", "y"]').collect()} == {1, 4}


def test_regex(versions):
    assert q(versions, 'val == regex("^[ab]$")').count() == 5
    assert q(versions, 'val != regex("^[ab]$")').count() == 1
    assert q(versions, 'val == iregex("^A$")').count() == 3
    # regex over array field: any element matches
    assert q(versions, 'tags == regex("^x$")').count() == 3


def test_null_comparisons(versions):
    assert q(versions, '_end == None').count() == 2
    assert q(versions, '_end != None').count() == 4


def test_date_call(versions):
    assert q(versions, '_start < date("2014-02-01")').count() == 2
    assert q(versions, '_start <= date("2014-02-01T00:00:00")').count() == 4


def test_unknown_field_raises(versions):
    with pytest.raises(MQLError):
        compile_mql("nope == 1", versions)


def test_date_range_semantics(versions):
    # pinned from reference tests/test_parse.py:54-76 and
    # tests/test_sqla_proxy.py:100-110
    def n(date):
        pred = date_range_predicate(date)
        return versions.where(pred).count() if pred is not None else versions.count()

    assert n(None) == 2          # current only (_end is null)
    assert n("~") == 6           # all history
    # as-of: _start < d and (_end >= d or null); on 2014-02-01 —
    # oid1 v1 [01-01,02-01): start<d yes, end>=d yes -> in
    # oid1 v2 [02-01,...): start<d no -> out
    # oid2 v1: same as oid1 v1 -> in
    # oid2 v2 [03-01,..): out; oid3 [02-01,None): start<d no -> out
    assert n("2014-02-01") == 2
    # as-of 02-02: oid1 v2 [02-01,03-01) and oid3 [02-01,None) are live;
    # oid1/oid2 v1 ended 02-01 < 02-02
    assert n("2014-02-02") == 2
    assert n("~2014-02-01") == 2   # _start < d
    assert n("2014-03-15~") == 3   # _end >= d or null: oid1 v3, oid2 v2, oid3
    assert n("2014-01-15~2014-02-15") == 4


def test_parse_fields():
    assert parse_fields("a,b,c") == ["a", "b", "c"]
    assert parse_fields(["b", "a"]) == ["a", "b"]
    assert parse_fields({"a": 1, "b": 0}) == ["a"]
    assert parse_fields("~") is None
    assert parse_fields(None) is None
    assert parse_fields([]) is None


def test_oid_literal_set_bounds():
    """oid_literal_set derives the conjunctively-implied _oid set used
    for bucket-directory pruning — sound rules only."""
    from metrique_spark.mql import oid_literal_set as ols

    assert ols("_oid == 7") == {7}
    assert ols("_oid == -7") == {-7}
    assert ols('_oid == "k1"') == {"k1"}
    assert ols("_oid in [1, 2, 3]") == {1, 2, 3}
    # a conjunct can only narrow: the bound side wins / intersects
    assert ols('_oid == 7 and status == "open"') == {7}
    assert ols("_oid in [1, 2, 3] and _oid in [2, 3, 4]") == {2, 3}
    assert ols("_oid == 1 and _oid == 2") == set()  # no row can match
    # OR bounds only when every branch does
    assert ols("_oid == 1 or _oid == 2") == {1, 2}
    assert ols('_oid == 1 or status == "open"') is None
    # everything else is unbounded
    assert ols("_oid != 7") is None
    assert ols("_oid not in [1, 2]") is None
    assert ols("_oid > 5") is None
    assert ols("not (_oid == 7)") is None
    assert ols("_oid == other_field") is None
    assert ols("_oid in [1, other]") is None
    assert ols("_oid == None") is None
    assert ols("_oid == True") is None
    assert ols('status == "open"') is None
    assert ols("") is None
    assert ols(None) is None
    assert ols("this is not valid python (") is None
    # nested composition
    assert ols('(_oid == 1 or _oid == 2) and status == "x"') == {1, 2}
    assert ols("(_oid == 1 or _oid == 2) and _oid in [2, 9]") == {2}
