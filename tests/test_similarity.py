"""Similarity search tests: brute-force cosine top-k + IVF approximate."""

import math

import pytest
from pyspark.sql import functions as F

from metrique_spark.functions import similarity as sim


@pytest.fixture()
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # close to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.95, 0.05]),  # close to 2
        (4, [0.0, 0.0, 1.0]),
        (5, [0.5, 0.5, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_exact(spark):
    df = spark.createDataFrame([(1, [1.0, 0.0], [0.0, 1.0]),
                                (2, [1.0, 1.0], [1.0, 1.0])],
                               "i long, a array<double>, b array<double>")
    got = df.select("i", F.round(sim.cosine(F.col("a"), F.col("b")), 6).alias("c")).collect()
    by_i = {r["i"]: r["c"] for r in got}
    assert by_i[1] == 0.0
    assert by_i[2] == 1.0


def test_cosine_topk(vectors):
    out = sim.cosine_topk(vectors, vectors.where("vec_id in (0, 2)"), k=2)
    rows = {(r["query_id"], r["neighbor_id"]) for r in out.collect()}
    # nearest to 0 is 1; nearest to 2 is 3
    assert (0, 1) in rows
    assert (2, 3) in rows
    # k=2 per query
    assert len(rows) == 4


def test_topk_excludes_self(vectors):
    out = sim.cosine_topk(vectors, vectors, k=3)
    assert out.where("query_id == neighbor_id").count() == 0


def test_ivf_recall_on_small_data(spark):
    import random

    rnd = random.Random(7)
    rows = [(i, [rnd.gauss(0, 1) for _ in range(8)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.where("vec_id < 5")
    exact = sim.cosine_topk(df, queries, k=3)
    approx = sim.ivf_topk(df, queries, k=3, nlist=8, nprobe=8)
    # with nprobe == nlist IVF degenerates to exact search
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert e == a


def test_ivf_partial_probe_is_subset(spark):
    import random

    rnd = random.Random(9)
    rows = [(i, [rnd.gauss(0, 1) for _ in range(8)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.where("vec_id < 3")
    out = sim.ivf_topk(df, queries, k=3, nlist=8, nprobe=2)
    # right shape: ≤k rows per query, no self matches
    counts = {r["query_id"]: r["n"] for r in
              out.groupBy("query_id").agg(F.count("*").alias("n")).collect()}
    assert all(v <= 3 for v in counts.values())
    assert out.where("query_id == neighbor_id").count() == 0
