"""MQL fuzzer: random predicate trees run through the MQL→Column compiler
on Spark AND through an independent MQL→SQL translation on DuckDB over the
same parquet, comparing matched row sets exactly. Catches operator-
precedence, NULL-semantics, and literal-handling drift the fixed oracle
queries can't. Seeds fixed so failures reproduce."""

import random

import duckdb
import pytest

from metrique_spark.mql import compile_mql

SF = "/root/testdata/sf0.001"

# leaf generators: (mql_fragment, sql_fragment) pairs built together so the
# two sides are independent renderings of the same predicate
NUM_COLS = ["l_quantity", "l_linenumber", "l_discount"]
STR_COLS = ["l_returnflag", "l_linestatus"]
STR_VALS = {"l_returnflag": ["R", "A", "N"], "l_linestatus": ["O", "F"]}
CMPS = ["==", "!=", ">", ">=", "<", "<="]
SQL_CMP = {"==": "=", "!=": "<>", ">": ">", ">=": ">=", "<": "<", "<=": "<="}


def _leaf(rng):
    kind = rng.choice(["num", "str", "str_in", "num_in", "date"])
    if kind == "num":
        c = rng.choice(NUM_COLS)
        v = {"l_quantity": rng.randint(1, 50), "l_linenumber": rng.randint(1, 7),
             "l_discount": round(rng.uniform(0, 0.1), 2)}[c]
        op = rng.choice(CMPS)
        return f"{c} {op} {v}", f"{c} {SQL_CMP[op]} {v}"
    if kind == "str":
        c = rng.choice(STR_COLS)
        v = rng.choice(STR_VALS[c])
        op = rng.choice(["==", "!="])
        return f"{c} {op} '{v}'", f"{c} {SQL_CMP[op]} '{v}'"
    if kind == "str_in":
        c = rng.choice(STR_COLS)
        vs = rng.sample(STR_VALS[c], rng.randint(1, len(STR_VALS[c])))
        neg = rng.random() < 0.3
        mql_vs = ", ".join(f"'{v}'" for v in vs)
        word = "not in" if neg else "in"
        sql = f"{c} {'NOT ' if neg else ''}IN ({mql_vs})"
        return f"{c} {word} [{mql_vs}]", sql
    if kind == "num_in":
        vs = sorted(rng.sample(range(1, 8), rng.randint(1, 3)))
        lst = ", ".join(map(str, vs))
        return (f"l_linenumber in [{lst}]", f"l_linenumber IN ({lst})")
    d = f"1996-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"
    op = rng.choice([">", ">=", "<", "<="])
    return (f"l_shipdate {op} date('{d}')",
            f"l_shipdate {SQL_CMP[op]} TIMESTAMP '{d} 00:00:00'")


def _tree(rng, depth):
    if depth <= 0 or rng.random() < 0.35:
        return _leaf(rng)
    op = rng.choice(["and", "or", "not"])
    if op == "not":
        m, s = _tree(rng, depth - 1)
        return f"not ({m})", f"NOT ({s})"
    lm, ls = _tree(rng, depth - 1)
    rm, rs = _tree(rng, depth - 1)
    return f"({lm}) {op} ({rm})", f"({ls}) {op.upper()} ({rs})"


@pytest.mark.parametrize("seed", [17, 99, 2024])
def test_mql_fuzz_matches_sql(spark, seed):
    rng = random.Random(seed)
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    con = duckdb.connect()
    con.execute("CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{SF}/lineitem.parquet')")
    for i in range(12):
        mql, sql = _tree(rng, 3)
        got = {(r["l_orderkey"], r["l_linenumber"])
               for r in li.where(compile_mql(mql, li))
               .select("l_orderkey", "l_linenumber").collect()}
        exp = set(map(tuple, con.execute(
            f"SELECT l_orderkey, l_linenumber FROM lineitem WHERE {sql}"
        ).fetchall()))
        assert got == exp, f"seed={seed} i={i} mql={mql!r} sql={sql!r}"


@pytest.mark.parametrize("seed", [4, 81])
def test_date_range_fuzz_matches_sql(spark, seed):
    """Random date ranges (point, open-left, open-right, closed, all,
    current) through date_range_predicate vs an independent SQL rendering
    of the reference boundary rules (strict < on _start, >= on _end)."""
    from metrique_spark.mql import date_range_predicate
    from metrique_spark.sources.testdata import load_table
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rng = random.Random(seed)
    ev = load_table(spark, SF, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = ev.select(
        F.col("user_id").alias("_oid"), "event_type",
        F.col("ts").alias("_start"), F.lead("ts").over(w).alias("_end"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    con.execute(
        "CREATE VIEW v AS SELECT user_id AS _oid, event_type, "
        "ts AS _start, lead(ts) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS _end FROM events")

    def d():
        return f"2024-01-{rng.randint(1, 28):02d}"

    for _ in range(10):
        a, b = sorted((d(), d()))
        kind = rng.choice(["point", "left", "right", "closed", "all", "cur"])
        date = {"point": a, "left": f"~{b}", "right": f"{a}~",
                "closed": f"{a}~{b}", "all": "~", "cur": None}[kind]
        sql = {
            "point": f"_start < TIMESTAMP '{a}' AND "
                     f"(_end >= TIMESTAMP '{a}' OR _end IS NULL)",
            "left": f"_start < TIMESTAMP '{b}'",
            "right": f"(_end >= TIMESTAMP '{a}' OR _end IS NULL)",
            "closed": f"_start < TIMESTAMP '{b}' AND "
                      f"(_end >= TIMESTAMP '{a}' OR _end IS NULL)",
            "all": "TRUE",
            "cur": "_end IS NULL",
        }[kind]
        pred = date_range_predicate(date)
        got = (v.where(pred) if pred is not None else v).count()
        exp = con.execute(f"SELECT count(*) FROM v WHERE {sql}").fetchone()[0]
        assert got == exp, f"seed={seed} date={date!r}"
