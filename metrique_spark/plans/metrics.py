"""Task-attributed measurement via Spark's public monitoring REST API
(``/api/v1/applications/{app}/stages`` — monitoring.html): per-stage
``executorCpuTime`` / ``executorRunTime`` and shuffle / scan byte
counters, attributed to exactly the stages a measured callable ran.

Why this exists: process-global CPU clocks (JVM ProcessCpuTime + driver
rusage) charge concurrent GC and background JVM work to whichever query
holds the wall clock — between two bench rounds that showed as ±40%
two-sided per-query "regressions" confined to untouched modules. Spark's
own task metrics attribute to the stage that did the work, so the
per-query CPU gate becomes sound. Byte counters additionally give
scale-curve runs the SHUFFLE/SCAN footprint of an operator — the number
that predicts 100 TB behavior better than local wall time.

Requires ``spark.ui.enabled=true`` (the REST endpoint lives on the UI
port). When the UI is off or the endpoint unreachable, every probe
returns zeros and the caller's wall/CPU totals still stand — measurement
must never fail the run.
"""

from __future__ import annotations

ZERO = {
    "task_cpu_s": 0.0,       # executorCpuTime (ns) summed, in seconds
    "task_run_s": 0.0,       # executorRunTime (ms) summed, in seconds
    "input_bytes": 0,        # bytes read from sources (scan footprint)
    "output_bytes": 0,       # bytes written to sinks
    "shuffle_read_bytes": 0,
    "shuffle_write_bytes": 0,
}


class StageMetricsProbe:
    """Delta-reads the completed-stage list around a measured section:

        probe = StageMetricsProbe(spark)
        probe.start()
        ...run the query to completion (an action)...
        m = probe.finish()   # metrics of exactly the new stages

    Stage attribution is by (stageId, attemptId) set difference, so
    overlapping probes on the same session would double-count — bench
    and scaling runs are sequential by construction."""

    def __init__(self, spark):
        self._base = None
        self._seen: set = set()
        try:
            sc = spark.sparkContext
            url = sc.uiWebUrl
            if url:
                self._base = (f"{url}/api/v1/applications/"
                              f"{sc.applicationId}")
        except Exception:
            self._base = None

    @property
    def available(self) -> bool:
        return self._base is not None

    def _stages(self) -> list[dict]:
        import json
        import urllib.request

        with urllib.request.urlopen(
                self._base + "/stages?status=complete", timeout=10) as r:
            return json.loads(r.read().decode())

    def start(self) -> None:
        if self._base is None:
            return
        try:
            self._seen = {(s["stageId"], s["attemptId"])
                          for s in self._stages()}
        except Exception:
            self._seen = set()
            self._base = None  # endpoint unusable: stay zero, don't spam

    def finish(self) -> dict:
        out = dict(ZERO)
        if self._base is None:
            return out
        try:
            stages = self._stages()
        except Exception:
            return out
        for s in stages:
            if (s["stageId"], s["attemptId"]) in self._seen:
                continue
            out["task_cpu_s"] += s.get("executorCpuTime", 0) / 1e9
            out["task_run_s"] += s.get("executorRunTime", 0) / 1e3
            out["input_bytes"] += s.get("inputBytes", 0)
            out["output_bytes"] += s.get("outputBytes", 0)
            out["shuffle_read_bytes"] += s.get("shuffleReadBytes", 0)
            out["shuffle_write_bytes"] += s.get("shuffleWriteBytes", 0)
        out["task_cpu_s"] = round(out["task_cpu_s"], 3)
        out["task_run_s"] = round(out["task_run_s"], 3)
        return out

    def measure(self, fn):
        """(fn(), metrics) — run a callable to completion and return the
        task metrics of exactly the stages it scheduled."""
        self.start()
        result = fn()
        return result, self.finish()
