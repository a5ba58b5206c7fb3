"""Rotating independent value-check: every round, 10 ``queries()``
entries OUTSIDE the driver's fixed correctness sample get a full
Spark-vs-DuckDB value comparison at sf0.01, committed as
``SPOTCHECK_r{N}.json``. The rotation is deterministic in the round
number (a sliding window over the sorted unsampled names), so across
rounds the whole unsampled set cycles through a committed value-oracle
— closing the gate-breadth gap the driver's 50-entry sample leaves.

Usage: SPARK_GRAFT_ROUND=11 python -u scripts/run_spotcheck.py [sf_dir]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from check_correctness import check_entry, oracle_connection  # noqa: E402

N_PICK = 10


def rotation(names: list[str], rnd: int, n: int = N_PICK) -> list[str]:
    """Deterministic sliding window over the sorted names, wrapping."""
    names = sorted(names)
    if not names:
        return []
    start = (rnd * n) % len(names)
    picked = (names + names)[start:start + min(n, len(names))]
    return picked


def driver_sampled() -> set[str]:
    """Entry names the driver's correctness gate already covers — union
    of every committed CORRECTNESS_r*.json's keys."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sampled: set[str] = set()
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        try:
            body = json.load(open(p))
        except ValueError:
            continue
        qs = body.get("queries", body)
        if isinstance(qs, dict):
            sampled.update(qs.keys())
    return sampled


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rnd_env = os.environ.get("SPARK_GRAFT_ROUND", "")
    m = re.search(r"\d+", rnd_env)
    rnd = int(m.group()) if m else 0

    import __spark_entry__ as entrymod

    all_names = sorted(entrymod.queries())
    unsampled = sorted(set(all_names) - driver_sampled())
    picked = rotation(unsampled if unsampled else all_names, rnd)
    print(f"# round {rnd}: {len(unsampled)} unsampled entries, "
          f"checking {picked}", file=sys.stderr)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("spotcheck")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = oracle_connection(sf_dir)
    results: dict[str, dict] = {}
    for name in picked:
        t0 = time.time()
        res = check_entry(name, spark, con, sf_dir)
        res["secs"] = round(time.time() - t0, 2)
        if not res.get("problems"):
            res.pop("problems", None)
        results[name] = res
        print(f"{res['status']:<5} {name}: rows={res['rows']} "
              f"[{res['secs']}s]", file=sys.stderr)
    summary = {
        "round": rnd,
        "sf_dir": sf_dir,
        "rotation": picked,
        "unsampled_pool": len(unsampled),
        "ok": sum(r["status"] == "ok" for r in results.values()),
        "weak": sum(r["status"] == "weak" for r in results.values()),
        "fail": sum(r["status"] == "fail" for r in results.values()),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), f"SPOTCHECK_r{rnd}.json")
    with open(out, "w") as f:
        json.dump({"summary": summary, "results": results}, f, indent=1,
                  sort_keys=True)
    print(json.dumps(summary))
    return 1 if summary["fail"] else 0


if __name__ == "__main__":
    sys.exit(main())
