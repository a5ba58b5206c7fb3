"""Randomized pipeline-operator tests against independent Python oracles
(same style as test_property_temporal): random inputs, naive recomputation,
exact comparison. Seeds fixed so failures reproduce."""

import hashlib
import random

import pytest

from pyspark.sql import functions as F


def _random_pairs(seed, n_vertices=60, n_edges=50):
    rng = random.Random(seed)
    return [(rng.randrange(n_vertices), rng.randrange(n_vertices))
            for _ in range(n_edges)]


def _naive_components(pairs):
    """Brute-force: repeatedly merge overlapping sets."""
    comps = []
    for a, b in pairs:
        hit = [c for c in comps if a in c or b in c]
        merged = {a, b}.union(*hit) if hit else {a, b}
        comps = [c for c in comps if c not in hit] + [merged]
    out = {}
    for c in comps:
        m = min(c)
        for v in c:
            out[v] = m
    return out


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_components_match_naive_oracle(spark, seed):
    from metrique_spark.functions.dedup import connected_components

    raw = [(a, b) for a, b in _random_pairs(seed) if a != b]
    pairs = spark.createDataFrame(raw, ["id_a", "id_b"])
    expected = _naive_components(raw)
    for thr in (0, 10**6):          # distributed loop and driver union-find
        got = {r["id"]: r["component"]
               for r in connected_components(
                   pairs, driver_edge_threshold=thr).collect()}
        assert got == expected, f"threshold={thr}"


@pytest.mark.parametrize("seed", [3, 11])
def test_sampling_matches_python_md5(spark, seed):
    """The Spark sample must contain exactly the keys whose Python-side
    md5 prefix clears the threshold — engine-portability is the whole
    point of the md5 design."""
    from metrique_spark.functions.sampling import (_hex_threshold,
                                                   deterministic_sample)

    rng = random.Random(seed)
    keys = rng.sample(range(10**9), 500)
    frac = rng.choice([0.1, 0.33, 0.5, 0.9])
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = {r["k"] for r in deterministic_sample(df, "k", frac).collect()}
    thr = _hex_threshold(frac)
    expected = {k for k in keys
                if hashlib.md5(str(k).encode()).hexdigest()[:8] < thr}
    assert got == expected


@pytest.mark.parametrize("seed", [5, 19])
def test_repetition_stats_match_naive(spark, seed):
    from metrique_spark.functions.text import repetition_stats

    rng = random.Random(seed)
    vocab = ["aa", "bb", "cc", "dd"]
    docs = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(0, 12))))
            for i in range(30)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in repetition_stats(df, n=2).collect()}
    for doc_id, text in docs:
        toks = text.split()
        grams = [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]
        row = got[doc_id]
        if not grams:
            assert (row["top_ngram_frac"], row["dup_ngram_frac"],
                    row["n_ngrams"]) == (0.0, 0.0, 0)
            continue
        counts = {g: grams.count(g) for g in set(grams)}
        assert row["n_ngrams"] == len(grams)
        assert row["top_ngram_frac"] == round(max(counts.values())
                                              / len(grams), 4)
        dup = sum(c for c in counts.values() if c > 1)
        assert row["dup_ngram_frac"] == round(dup / len(grams), 4)


@pytest.mark.parametrize("seed", [2, 13])
def test_containment_matches_naive(spark, seed):
    from metrique_spark.functions.dedup import containment_scores

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]

    def doc(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    train = [(i, doc(rng.randint(5, 20))) for i in range(10)]
    hold = [(100 + i, doc(rng.randint(5, 20))) for i in range(6)]

    def sh3(text):
        toks = text.split()
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    got = {r["doc_id"]: r for r in containment_scores(
        spark.createDataFrame(train, ["doc_id", "text"]),
        spark.createDataFrame(hold, ["doc_id", "text"]), n=3).collect()}
    for hid, htext in hold:
        hs = sh3(htext)
        best = (0.0, None)
        for tid, ttext in train:
            inter = len(hs & sh3(ttext))
            if not hs or not inter:
                continue
            c = round(inter / len(hs), 4)
            # max containment, min train id on ties
            if c > best[0] or (c == best[0] and (best[1] is None
                                                 or tid < best[1])):
                best = (c, tid)
        assert got[hid]["max_containment"] == best[0]
        assert got[hid]["train_id"] == best[1]
