"""Driver-side XXH64 vs Spark's own xxhash64 expression — the
property that makes the listing-free point-lookup prune sound: the
Python hash must agree with the JVM hash for every string the engine
can render an oid into (``_obucket`` hashes ``cast(_oid AS string)``,
seed 42)."""
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from metrique_spark.xxh64 import obucket_of, xxh64


def spark_hashes(spark, strs):
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    return [r["h"] for r in
            df.select(F.xxhash64("s").alias("h")).collect()]


def test_xxh64_matches_spark_across_lengths_and_unicode(spark):
    # every tail-path of the algorithm: 0..40 byte lengths cross the
    # 4-byte word, 8-byte word, and 32-byte stripe boundaries; unicode
    # exercises multi-byte UTF-8; digits cover the oid rendering
    cases = ["", "a", "ab", "abc", "abcd", "abcde", "abcdefg",
             "abcdefgh", "abcdefghi", "0123456789abcdef",
             "0123456789abcdef0123456789abcde",
             "0123456789abcdef0123456789abcdef",
             "0123456789abcdef0123456789abcdefX",
             "x" * 40, "x" * 64, "x" * 65,
             "héllo wörld", "数据立方体", "🦊" * 9,
             "-9223372036854775808", "9223372036854775807", "0", "-1"]
    got = [xxh64(s.encode("utf-8")) for s in cases]
    assert got == spark_hashes(pytest.importorskip(
        "pyspark").sql.SparkSession.getActiveSession() and spark, cases)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(
    st.text(max_size=48),
    st.integers(min_value=-2**63, max_value=2**63 - 1)
           .map(str)), min_size=1, max_size=8, unique=True))
def test_xxh64_property_random_strings(spark, strs):
    assert [xxh64(s.encode("utf-8")) for s in strs] == \
        spark_hashes(spark, strs)


def test_obucket_of_matches_engine_expression(spark):
    from metrique_spark.engine import Engine

    oids = [0, 1, 7, -3, 2**33 + 5, 2**62, -2**62, "a", "01", "1",
            "git-sha-0123456789abcdef", "数据"]
    for buckets in (2, 16, 500, 1000):
        df = spark.createDataFrame(
            [(str(o) if isinstance(o, int) else o,) for o in oids],
            "_oid string")
        want = [r["b"] for r in df.select(
            Engine._obucket(buckets).alias("b")).collect()]
        assert [obucket_of(o, buckets) for o in oids] == want
