"""Pins the bench stdout contract: the driver retains only the last 2,000
characters of stdout and parses the contract JSON line out of that window.
Round 7's line grew to 2,373 chars and the driver recorded ``parsed: null``
(BENCH_r07.json) — these tests make that failure mode impossible to
reintroduce silently.
"""

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def test_contract_line_fits_driver_window_worst_case():
    # worst case the formatter can emit: every timing at 6 chars ("999.99")
    # and a 5-digit total — still has to clear the 2,000-char window with
    # margin for envelope growth
    timings = {n: 999.99 for n in bench.BENCH_QUERIES}
    line = bench.contract_line(timings, 99999.99, 0.1, 31.99)
    assert len(line) < 1800, (
        f"contract line is {len(line)} chars; the driver parses only the "
        "last 2000 chars of stdout — move entries to CONTRACT_EXCLUDE"
    )
    assert "\n" not in line


def test_contract_line_roundtrips_with_required_keys():
    timings = {n: 1.234 for n in bench.BENCH_QUERIES}
    parsed = json.loads(bench.contract_line(timings, 75.25, 0.1, 4.2))
    assert parsed["metric"] == "headline_queries_total"
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    assert parsed["value"] == 75.25
    assert parsed["detail"] == "BENCH_DETAIL.json"
    assert parsed["load"] == 4.2
    # 2-decimal rounding applied per query
    assert set(parsed["queries"]) == set(bench.CONTRACT_QUERIES)
    assert all(v == 1.23 for v in parsed["queries"].values())


def test_bench_sets_are_consistent():
    qs = entrymod.queries()
    missing = [n for n in bench.BENCH_QUERIES if n not in qs]
    assert not missing, f"bench names not registered in queries(): {missing}"
    assert len(set(bench.BENCH_QUERIES)) == len(bench.BENCH_QUERIES)
    # every exclusion must name a real bench entry (no stale excludes)
    stale = bench.CONTRACT_EXCLUDE - set(bench.BENCH_QUERIES)
    assert not stale, f"CONTRACT_EXCLUDE names not in BENCH_QUERIES: {stale}"
    # the contract set is the bench set minus the documented twins
    assert set(bench.CONTRACT_QUERIES) | bench.CONTRACT_EXCLUDE == set(
        bench.BENCH_QUERIES
    )


def test_contract_line_skips_absent_timings():
    # a partial run (e.g. bench interrupted) must still emit valid JSON
    timings = {bench.CONTRACT_QUERIES[0]: 1.0}
    parsed = json.loads(bench.contract_line(timings, 1.0, None, 0.0))
    assert parsed["queries"] == {bench.CONTRACT_QUERIES[0]: 1.0}
    assert parsed["sf"] is None


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-q"]))
