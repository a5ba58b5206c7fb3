"""Compare per-query walls across BENCH_DETAIL-shaped JSON files.

Usage: python scripts/compare_bench.py ref.json other.json [more.json ...]
Prints a table of per-query seconds (ref first), the ratio of each run
vs ref, totals, and geomean speedups vs ref.
"""

from __future__ import annotations

import json
import math
import os
import sys


def load(p):
    with open(p) as f:
        return json.load(f)


def main():
    paths = sys.argv[1:]
    runs = [load(p) for p in paths]
    names = [os.path.basename(p).replace(".json", "") for p in paths]
    qs = [r["queries"] for r in runs]
    keys = [k for k in qs[0] if all(k in q for q in qs)]
    w = max(len(k) for k in keys)
    print(f"{'query':{w}s} " + " ".join(f"{n[:12]:>12s}" for n in names))
    rows = []
    for k in keys:
        vals = [q[k] for q in qs]
        rows.append((k, vals))
    rows.sort(key=lambda r: -r[1][0])
    for k, vals in rows:
        marks = ""
        if len(vals) > 1 and vals[0] > 0.2:
            worst = max(v / vals[0] for v in vals[1:])
            best = min(v / vals[0] for v in vals[1:])
            if best < 0.8:
                marks += " <<"
            if worst > 1.25:
                marks += " !!"
        print(f"{k:{w}s} " + " ".join(f"{v:12.2f}" for v in vals) + marks)
    print(f"{'TOTAL':{w}s} " + " ".join(
        f"{sum(q.values()):12.2f}" for q in qs))
    for i in range(1, len(qs)):
        ratios = [qs[0][k] / qs[i][k] for k in keys
                  if qs[0][k] > 0.05 and qs[i][k] > 0.05]
        gm = math.exp(sum(math.log(r) for r in ratios) / len(ratios))
        print(f"geomean speedup {names[i]} vs {names[0]}: {gm:.3f}")
    for n, r in zip(names, runs):
        cpu = r.get("cpu_total")
        tcpu = r.get("task_cpu_contract_total")
        ld = r.get("load", {})
        print(f"{n}: total={r['value']} cpu={cpu} task_cpu={tcpu} "
              f"load={ld.get('start')}->{ld.get('end')}")


if __name__ == "__main__":
    main()
