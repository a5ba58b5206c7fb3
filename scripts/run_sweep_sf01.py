"""Run the FULL oracle sweep at sf0.01 and commit the result as a round
artifact: every ``queries()`` entry on Spark vs its DuckDB twin over
``/root/testdata/sf0.01``, written to ``SWEEP_SF01.json`` at the repo
root as ``{entry: {status, rows, secs, problems}}`` plus a summary
block. The driver's correctness gate samples ~50 entries at this scale;
this artifact is the committed value-check for the rest at real data
volume (the in-suite ``pytest -m oracle_sf01`` marker runs the same
comparison without leaving a file behind).

Usage: python -u scripts/run_sweep_sf01.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from check_correctness import check_entry, oracle_connection  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("sweep-sf01")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "12g")
        .config("spark.cleaner.periodicGC.interval", "1min")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = oracle_connection(sf_dir)

    import __spark_entry__ as entrymod

    results: dict[str, dict] = {}
    t_all = time.time()
    for name in entrymod.queries():
        t0 = time.time()
        res = check_entry(name, spark, con, sf_dir)
        res["secs"] = round(time.time() - t0, 2)
        if not res["problems"]:
            res.pop("problems")
        results[name] = res
        print(f"{res['status']:<5} {name}: rows={res['rows']} "
              f"[{res['secs']}s]", file=sys.stderr)

    summary = {
        "sf_dir": sf_dir,
        # round stamp: re-run and re-commit this artifact at each
        # round's end so staleness is impossible to miss
        "round": os.environ.get("SPARK_GRAFT_ROUND"),
        "entries": len(results),
        "ok": sum(r["status"] == "ok" for r in results.values()),
        "weak": sum(r["status"] == "weak" for r in results.values()),
        "fail": sum(r["status"] == "fail" for r in results.values()),
        "total_secs": round(time.time() - t_all, 1),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SWEEP_SF01.json")
    with open(out, "w") as f:
        json.dump({"summary": summary, "results": results}, f, indent=1,
                  sort_keys=True)
    print(json.dumps(summary))
    return 1 if summary["fail"] else 0


if __name__ == "__main__":
    sys.exit(main())
