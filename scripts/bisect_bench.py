"""Round-15 bisect harness: run the FULL bench (cold JVM, min-of-3,
driver-identical contract) under named env variants and collect the
per-query walls side by side.

Usage: python scripts/bisect_bench.py <variant> [...]
Variants (one-factor-at-a-time from the r14 configuration, per the r14
verdict's "Next round #1"):
  r14       conf on,  chunk 32768, concurrent explicit GC  (round-14 ship)
  confoff   conf OFF, chunk 32768, concurrent explicit GC
  flatspread conf on, chunk 1 (=flat cores width), concurrent GC
  gcstw     conf on,  chunk 32768, stop-the-world explicit GC (r13 GC)
  r13cfg    conf OFF, chunk 1, stop-the-world GC  (r13 config on r14 code)
  candidate conf OFF, chunk default (module), concurrent GC

Each run is a fresh process; results land in /tmp/bisect_<variant>.json
(a copy of BENCH_DETAIL.json) plus stdout/err logs.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = {
    "r14": {"SPARK_METRIQUE_CACHED_PLAN_AQE": "true"},
    "confoff": {"SPARK_METRIQUE_CACHED_PLAN_AQE": "false"},
    "flatspread": {"SPARK_METRIQUE_CACHED_PLAN_AQE": "true",
                   "SPARK_METRIQUE_SPREAD_CHUNK": "1"},
    "gcstw": {"SPARK_METRIQUE_CACHED_PLAN_AQE": "true",
              "SPARK_METRIQUE_GC_OPTS": "-Dmetrique.gc=default"},
    "r13cfg": {"SPARK_METRIQUE_CACHED_PLAN_AQE": "false",
               "SPARK_METRIQUE_SPREAD_CHUNK": "1",
               "SPARK_METRIQUE_GC_OPTS": "-Dmetrique.gc=default"},
    "candidate": {"SPARK_METRIQUE_CACHED_PLAN_AQE": "false"},
    # round 2: the 2x2 of (spread) x (GC) under conf-off
    "confoff_gcstw": {"SPARK_METRIQUE_CACHED_PLAN_AQE": "false",
                      "SPARK_METRIQUE_GC_OPTS": "-Dmetrique.gc=default"},
    "confoff_flat": {"SPARK_METRIQUE_CACHED_PLAN_AQE": "false",
                     "SPARK_METRIQUE_SPREAD_CHUNK": "1"},
    # repeat of the winner for run-to-run noise estimation
    "confoff_rep": {"SPARK_METRIQUE_CACHED_PLAN_AQE": "false"},
}


def run(variant: str) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    env.update(VARIANTS[variant])
    out = f"/tmp/bisect_{variant}.out"
    err = f"/tmp/bisect_{variant}.err"
    with open(out, "w") as fo, open(err, "w") as fe:
        rc = subprocess.call([sys.executable, os.path.join(REPO, "bench.py")],
                             env=env, stdout=fo, stderr=fe, cwd=REPO)
    detail = os.path.join(REPO, "BENCH_DETAIL.json")
    dst = f"/tmp/bisect_{variant}.json"
    if rc == 0 and os.path.exists(detail):
        shutil.copy(detail, dst)
        with open(dst) as f:
            d = json.load(f)
        print(f"{variant}: total={d['value']} load_start="
              f"{d['load']['start']} load_end={d['load']['end']}")
        return d
    print(f"{variant}: FAILED rc={rc} (see {err})")
    return {}


if __name__ == "__main__":
    for v in sys.argv[1:]:
        run(v)
