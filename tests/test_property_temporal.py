"""Randomized version-chain tests against an independent pandas oracle —
the reference's test style (``tests/test_result.py:23-63``): generate
random per-oid version chains, recompute each operator naively in pandas,
and compare. Seeds are fixed so failures reproduce.
"""

import datetime as dt
import random

import pandas as pd
import pytest

from metrique_spark import temporal

T0 = dt.datetime(2024, 1, 1)


def random_chains(seed, n_oids=40):
    """Per oid: a chain of versions; ~1/3 of boundaries introduce a gap,
    ~1/4 of chains end closed."""
    rng = random.Random(seed)
    rows = []
    for oid in range(n_oids):
        t = T0 + dt.timedelta(hours=rng.randint(0, 240))
        n = rng.randint(1, 6)
        for i in range(n):
            start = t
            dur = dt.timedelta(hours=rng.randint(1, 72))
            is_last = i == n - 1
            end = None if (is_last and rng.random() < 0.75) else start + dur
            rows.append((oid, f"v{i}", start, end))
            if end is None:
                break
            t = end + (dt.timedelta(hours=rng.randint(1, 48))
                       if rng.random() < 0.33 else dt.timedelta(0))
    return rows


@pytest.fixture(params=[1, 2, 7], scope="module")
def chain_data(request):
    return random_chains(request.param)


@pytest.fixture(scope="module")
def chain_df(spark, chain_data):
    return spark.createDataFrame(
        chain_data, "_oid long, val string, _start timestamp, _end timestamp")


@pytest.fixture(scope="module")
def chain_pdf(chain_data):
    return pd.DataFrame(chain_data, columns=["_oid", "val", "_start", "_end"])


def test_on_date_matches_pandas(chain_df, chain_pdf):
    d = T0 + dt.timedelta(days=5)
    got = {(r["_oid"], r["_start"]) for r in
           temporal.on_date(chain_df, d).collect()}
    mask = (chain_pdf["_start"] <= d) & (
        chain_pdf["_end"].isna() | (chain_pdf["_end"] > d))
    sel = chain_pdf[mask]
    want = {(o, s.to_pydatetime()) for o, s in zip(sel["_oid"], sel["_start"])}
    assert got == want


def test_last_version_matches_pandas(chain_df, chain_pdf):
    got = {(r["_oid"], r["_start"]) for r in
           temporal.last_version(chain_df).collect()}
    idx = chain_pdf.groupby("_oid")["_start"].idxmax()
    sel = chain_pdf.loc[idx]
    want = {(o, s.to_pydatetime()) for o, s in zip(sel["_oid"], sel["_start"])}
    assert got == want


def test_started_after_matches_pandas(chain_df, chain_pdf):
    d = T0 + dt.timedelta(days=3)
    got = {(r["_oid"], r["_start"]) for r in
           temporal.started_after(chain_df, d).collect()}
    firsts = chain_pdf.groupby("_oid")["_start"].min()
    keep = set(firsts[firsts > d].index)
    sel = chain_pdf[chain_pdf["_oid"].isin(keep)]
    want = {(o, s.to_pydatetime()) for o, s in zip(sel["_oid"], sel["_start"])}
    assert got == want


def test_history_matches_pandas(spark, chain_df, chain_pdf):
    spine = temporal.date_spine(
        spark, T0, T0 + dt.timedelta(days=20), "daily")
    got = {r["_date"]: r["n"] for r in
           temporal.history(chain_df, spine, "n").collect()}
    for i in range(21):
        d = T0 + dt.timedelta(days=i)
        mask = (chain_pdf["_start"] <= d) & (
            chain_pdf["_end"].isna() | (chain_pdf["_end"] > d))
        assert got[d] == int(mask.sum()), f"mismatch at {d}"


def test_last_chain_matches_pandas(chain_df, chain_pdf):
    got = {(r["_oid"], r["_start"]) for r in
           temporal.last_chain(chain_df).collect()}
    want = set()
    for oid, grp in chain_pdf.sort_values("_start").groupby("_oid"):
        chain = []
        prev_end = None
        for o, st, en in zip(grp["_oid"], grp["_start"], grp["_end"]):
            if prev_end is not None and st != prev_end:
                chain = []  # gap: restart chain
            chain.append((o, st.to_pydatetime()))
            prev_end = en
        want.update(chain)
    assert got == want


def test_unfinished_matches_pandas(chain_df, chain_pdf):
    got = {(r["_oid"], r["_start"]) for r in
           temporal.unfinished_objects(chain_df).collect()}
    open_oids = set(chain_pdf.loc[chain_pdf["_end"].isna(), "_oid"])
    sel = chain_pdf[chain_pdf["_oid"].isin(open_oids)]
    want = {(o, s.to_pydatetime()) for o, s in zip(sel["_oid"], sel["_start"])}
    assert got == want
