"""Model-based storage-layer fuzz: a seeded-random sequence of snapshot
upserts, history replaces, compactions and vacuums runs against a cube
(time-partitioned, bucketed, retention on) AND a driver-side reference
model of the temporal-versioning semantics; after every mutation the
cube's find() must equal the model under current / all-history / as-of
probes. Catches cross-feature interaction bugs (merge × bounded replace
× manifest generations × period partitioning) no single-feature test
composes."""

import random

import pytest
from pyspark.sql import functions as F

from metrique_spark.engine import Engine
from metrique_spark.objects import stamp


def _snap_batch(spark, pairs, start):
    df = spark.createDataFrame(pairs, "oid long, col_1 long")
    return stamp(df, oid="oid", start=F.to_timestamp(F.lit(start)))


def _hist_batch(spark, rows):
    df = spark.createDataFrame(
        rows, "oid long, col_1 long, s string, e string")
    return stamp(df, oid="oid", start="s", end="e")


class _Model:
    """Reference semantics: snapshot merge closes a changed open version
    at the incoming start (same-value incoming is a no-op); history
    replace drops every version of the incoming oids and unions the
    supplied history; compact/vacuum are storage-only."""

    def __init__(self):
        self.versions: list[dict] = []

    def snapshot(self, pairs, start):
        for oid, val in pairs:
            cur = next((v for v in self.versions
                        if v["oid"] == oid and v["end"] is None), None)
            if cur is not None:
                if cur["val"] == val:
                    continue
                cur["end"] = start
            self.versions.append(
                dict(oid=oid, val=val, start=start, end=None))

    def replace(self, rows):
        oids = {r[0] for r in rows}
        self.versions = [v for v in self.versions if v["oid"] not in oids]
        for oid, val, s, e in rows:
            self.versions.append(dict(oid=oid, val=val, start=s, end=e))

    def rows(self, date):
        if date is None:
            sel = [v for v in self.versions if v["end"] is None]
        elif date == "~":
            sel = self.versions
        else:
            sel = [v for v in self.versions
                   if v["start"] < date
                   and (v["end"] is None or v["end"] >= date)]
        return sorted((v["oid"], v["val"], v["start"], v["end"] or "")
                      for v in sel)


def _cube_rows(eng, cube, date):
    df = eng.find(cube, date=date, fields="col_1")
    out = df.select(
        "_oid", "col_1",
        F.date_format("_start", "yyyy-MM-dd").alias("s"),
        F.coalesce(F.date_format("_end", "yyyy-MM-dd"), F.lit(""))
        .alias("e"))
    return sorted(map(tuple, out.collect()))


@pytest.mark.slow
def test_random_op_sequence_matches_model(spark, tmp_path):
    rng = random.Random(20260815)
    eng = Engine(spark, warehouse=str(tmp_path / "wh"), oid_buckets=4,
                 time_partition="month", keep_generations=2)
    model = _Model()
    oids = list(range(1, 13))
    cube = "mdl"

    def date_of(step, offset=0):
        m = (step + offset) % 12 + 1
        y = 2014 + (step + offset) // 12
        return f"{y}-{m:02d}-{rng.randint(1, 28):02d}"

    first = True
    import copy

    gen_states: dict[int, list] = {}   # engine gen -> model snapshot
    for step in range(14):
        op = rng.choice(["snap", "snap", "snap", "replace", "compact",
                         "vacuum"])
        if first:
            op = "snap"
        if op == "snap":
            pairs = sorted((o, rng.randint(0, 3) * 100 + o)
                           for o in rng.sample(oids, rng.randint(1, 6)))
            start = date_of(step)
            eng.upsert(cube, _snap_batch(spark, pairs, start),
                       stamped=True)
            model.snapshot(pairs, start)
            first = False
        elif op == "replace":
            oid = rng.choice(oids)
            n = rng.randint(1, 3)
            # contiguous chain ending open or closed
            starts = sorted({date_of(step, -k) for k in range(n, 0, -1)})
            rows = []
            for vi, s in enumerate(starts):
                e = (starts[vi + 1] if vi + 1 < len(starts)
                     else (None if rng.random() < 0.6 else date_of(step)))
                if e is not None and e <= s:
                    e = None
                rows.append((oid, 1000 + vi, s, e))
            eng.upsert(cube, _hist_batch(spark, rows), autosnap=False,
                       stamped=True)
            model.replace(rows)
        elif op == "compact":
            eng.compact(cube, sort_by=["_start"] if rng.random() < 0.5
                        else None)
        else:
            eng.vacuum(cube)

        # record the model state for the engine's CURRENT generation
        gens = eng.generations(cube)
        if gens:
            gen_states[gens[0]] = copy.deepcopy(model.versions)

        probes = [None, "~", date_of(rng.randrange(14))]
        for date in probes:
            assert _cube_rows(eng, cube, date) == model.rows(date), (
                step, op, date)
        # concurrent-read probe: a reader whose resolved generation has
        # been fully swept by a later commit must retry onto the live
        # pointer and read exactly the current model — never error,
        # never mix generations (see Engine._retry_swept / _read_raw)
        if step % 4 == 2:
            swept_meta = {"gen": -1,
                          "dirs": ["_current=true/__batch=__swept__"]}
            real_manifest = eng._manifest
            calls = {"n": 0}

            def stale_first(path, _r=real_manifest, _c=calls):
                _c["n"] += 1
                return swept_meta if _c["n"] == 1 else _r(path)

            eng._manifest = stale_first
            try:
                got = eng.count(cube, date="~")
            finally:
                eng._manifest = real_manifest
            assert got == len(model.versions), (step, op, "swept-read")
        # time travel: every RETAINED generation must read exactly the
        # model state at its commit (compact keeps content identical,
        # so a gen recorded pre-compact still matches)
        for g in gens:
            if g not in gen_states:
                continue
            snap = _Model()
            snap.versions = gen_states[g]
            got = sorted(map(tuple, eng.find(
                cube, date="~", fields="col_1", generation=g).select(
                "_oid", "col_1",
                F.date_format("_start", "yyyy-MM-dd").alias("s"),
                F.coalesce(F.date_format("_end", "yyyy-MM-dd"),
                           F.lit("")).alias("e")).collect()))
            assert got == snap.rows("~"), (step, op, "gen", g)
