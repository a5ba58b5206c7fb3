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
