"""Opt-in oracle parity sweep at sf0.01 — ``pytest -m oracle_sf01``.

The default-suite sweep (``test_oracle.py``) runs at sf0.001, where some
value-hash comparisons see only a handful of rows; the driver's per-round
gate runs at sf0.01 but SAMPLES ~50 of the registered entries. This
marker closes the gap: the complete entry list against DuckDB at sf0.01,
where the hash check has real data volume. It is opt-in (auto-skipped
unless selected with ``-m oracle_sf01`` — see conftest) because the full
sweep at this scale is a multi-minute run that would dominate local CI.
"""

import os

import pytest

duckdb = pytest.importorskip("duckdb")

SF_DIR = "/root/testdata/sf0.01"

pytestmark = [
    pytest.mark.oracle_sf01,
    pytest.mark.skipif(not os.path.isdir(SF_DIR),
                       reason="driver testdata not present"),
]


def _entry_names():
    if not os.path.isdir(SF_DIR):
        return ["missing-testdata"]
    import __spark_entry__ as e

    return sorted(e.queries())


@pytest.fixture(scope="module")
def oracle_con():
    from scripts.check_correctness import oracle_connection

    con = oracle_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", _entry_names())
def test_entry_matches_oracle_sf01(name, spark, oracle_con):
    from scripts.check_correctness import check_entry

    res = check_entry(name, spark, oracle_con, SF_DIR)
    assert res["status"] != "fail", res["problems"]
    if res["status"] == "weak":
        assert res["rows"] is not None and res["rows"] >= 0
