"""Scale-curve rehearsal for the storage layer: run the maintenance and
point-access ops at several synthetic cube sizes and record wall time
AND physical touch cost (bytes written / directories touched, from the
manifest's own per-directory stats) per op. The claims under test:

- trickle upsert cost is FLAT as the cube grows (bucket-granular merge:
  O(open rows of hit buckets + delta), never O(snapshot));
- tiered compaction cost tracks the RECENT trickle, not the cube
  (size-tiered levels: consolidated levels carry forward untouched);
- point lookup reads a constant number of directories (bucket prune);
- metadata-only count() and describe() stay at manifest-read cost.

Any op whose touch-cost grows linearly with cube size is a scale
killer and fails the curve. Writes ``SCALING.json`` at the repo root;
the README table is derived from it.

Usage: python scripts/run_scaling.py [rows,rows,...]  (default
250k,1M,4M — spans 16x so a linear cost is unmistakable)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sizes = [int(s) for s in
             (sys.argv[1].split(",") if len(sys.argv) > 1
              else ["250000", "1000000", "4000000"])]
    import shutil
    import tempfile

    from pyspark.sql import SparkSession, functions as F

    from metrique_spark.engine import Engine
    from metrique_spark.objects import stamp

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .appName("metrique-spark-scaling")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def commit_cost(eng, cube, before_dirs):
        """(dirs touched, bytes written) of the commit that moved the
        manifest past ``before_dirs`` — from manifest stats alone."""
        meta = eng._manifest(eng._path(cube))
        new = set(meta["dirs"]) - before_dirs
        sizes_m = (meta.get("stats") or {}).get("bytes") or {}
        return len(new), sum(sizes_m.get(d, 0) for d in new)

    def snap(n, lo, day, tag):
        df = (spark.range(lo, lo + n)
              .select(F.col("id").alias("oid"),
                      (F.col("id") % 1000).alias("v"),
                      F.sha2(F.col("id").cast("string"), 256)
                      .alias("payload")))
        return stamp(df, oid="oid",
                     start=F.to_timestamp(F.lit(day)))

    results = []
    for n in sizes:
        wh = tempfile.mkdtemp(prefix="mtq_scaling_")
        eng = Engine(spark, warehouse=wh, oid_buckets=64,
                     bloom_oid_ndv="auto")
        rec: dict = {"rows": n}
        t0 = time.monotonic()
        eng.upsert("c", snap(n, 0, "2024-01-01", "bulk"), stamped=True)
        rec["bulk_load_s"] = round(time.monotonic() - t0, 3)
        cube_bytes = sum(((eng._manifest(eng._path("c")).get("stats")
                           or {}).get("bytes") or {}).values())
        rec["cube_bytes"] = cube_bytes

        # trickle: three 100-row snapshot commits against the full cube
        trickle = []
        for i in range(3):
            before = set(eng._manifest(eng._path("c"))["dirs"])
            t0 = time.monotonic()
            eng.upsert("c", snap(100, i * 100,
                                 f"2024-02-0{i + 1}", "trickle"),
                       stamped=True)
            wall = time.monotonic() - t0
            dirs, bts = commit_cost(eng, "c", before)
            trickle.append((wall, dirs, bts))
        rec["trickle_s"] = round(min(w for w, _d, _b in trickle), 3)
        rec["trickle_dirs"] = max(d for _w, d, _b in trickle)
        rec["trickle_bytes"] = max(b for _w, _d, b in trickle)

        # tiered compact of the trickle (levels above threshold carry
        # forward untouched — bytes rewritten must track the trickle)
        before = set(eng._manifest(eng._path("c"))["dirs"])
        t0 = time.monotonic()
        eng.compact("c")
        rec["compact_s"] = round(time.monotonic() - t0, 3)
        dirs, bts = commit_cost(eng, "c", before)
        rec["compact_dirs"] = dirs
        rec["compact_bytes"] = bts

        # point lookup (bucket-pruned scan)
        t0 = time.monotonic()
        assert eng.find("c", oids=[n // 2]).count() == 1
        rec["point_lookup_s"] = round(time.monotonic() - t0, 3)

        # metadata-only count + describe (zero data files)
        t0 = time.monotonic()
        assert eng.count("c") >= n
        rec["count_meta_s"] = round(time.monotonic() - t0, 4)
        t0 = time.monotonic()
        d = eng.describe("c")
        assert d["rows_total"] >= n
        rec["describe_s"] = round(time.monotonic() - t0, 4)

        # incremental doubling migration: start is metadata-only
        # whatever the cube size; one bounded step touches O(chunk)
        t0 = time.monotonic()
        eng.rebucket("c", 128, incremental=True)
        rec["migration_start_s"] = round(time.monotonic() - t0, 4)
        before = set(eng._manifest(eng._path("c"))["dirs"])
        t0 = time.monotonic()
        st = eng.rebucket_step("c", max_dirs=2)
        rec["migration_step_s"] = round(time.monotonic() - t0, 3)
        rec["migration_step_bytes"] = st["migrated_bytes"]

        results.append(rec)
        print(json.dumps(rec))
        shutil.rmtree(wh, ignore_errors=True)

    out = {"sizes": sizes, "cpus": cpus, "results": results}
    # the curve verdicts the README table quotes: cost ratios across
    # the size span (flat ≈ 1x while the cube grows 16x)
    lo, hi = results[0], results[-1]
    span = hi["rows"] / lo["rows"]
    out["span"] = span
    out["ratios"] = {
        k: round(hi[k] / max(lo[k], 1e-9), 2)
        for k in ("trickle_bytes", "compact_bytes", "trickle_s",
                  "compact_s", "point_lookup_s", "count_meta_s",
                  "describe_s", "migration_start_s")}
    with open(os.path.join(ROOT, "SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["ratios"]))


if __name__ == "__main__":
    main()
