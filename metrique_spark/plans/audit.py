"""Plan audits: machine-checkable assertions that a query's physical plan
keeps the shape that scales — filters pushed to the scan, columns pruned,
small sides broadcast, no accidental cartesian products, no redundant
shuffles.

These exist because plan regressions are silent: a lost broadcast hint or
an un-pushable predicate still returns correct rows at sf0.01 while
becoming the bottleneck at 100 TB. `tests/test_plans.py` pins the shape of
every headline query; a diff that changes a plan for the worse fails CI,
not the cluster.

Note (also in the repo gotchas): the plan string BEFORE an action shows
``AdaptiveSparkPlan isFinalPlan=false`` — runtime re-planning (AQE) may
still convert sort-merge joins to broadcast, coalesce partitions, or split
skewed ones. ``executed_plan`` therefore runs the query and reads the
final adaptive plan; ``static_plan`` reads the compile-time plan (enough
for pushed-filter / read-schema checks, which don't change at runtime).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _plan_string(df: DataFrame) -> str:
    # scan metadata (PushedFilters / ReadSchema) is elided with "..." at
    # spark.sql.maxMetadataStringLength chars; the limit is captured at
    # the node's first render, so it must be raised at session build
    # (sessions from metrique_spark.session.get_spark already do). The
    # runtime set below only helps sessions that haven't rendered yet.
    conf = df.sparkSession.conf
    if conf.get("spark.sql.maxMetadataStringLength", "100") == "100":
        conf.set("spark.sql.maxMetadataStringLength", "100000")
    s = df._jdf.queryExecution().executedPlan().toString()
    # an executed AdaptiveSparkPlan prints "== Final Plan ==" followed by
    # "== Initial Plan ==" — keep only the final section, else every node
    # (scans, joins, exchanges) is counted twice
    return s.split("== Initial Plan ==", 1)[0]


def static_plan(df: DataFrame) -> str:
    """Compile-time physical plan (pre-AQE finalization)."""
    return _plan_string(df)


def executed_plan(df: DataFrame) -> str:
    """Final physical plan after running the query (AQE decisions baked
    in). Executes a count-style action — call on test-scale data."""
    df.collect()
    return _plan_string(df)


def count_exchanges(plan: str) -> int:
    """Number of shuffle exchanges. Excludes broadcast exchanges (those are
    the cheap kind) and AQE shuffle-reads of an existing exchange."""
    return len(re.findall(r"^\s*[+:\-|\s]*Exchange (?:hash|range|Single|RoundRobin)",
                          plan, re.M))


def broadcast_join_count(plan: str) -> int:
    return plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")


def has_cartesian(plan: str) -> bool:
    return "CartesianProduct" in plan


def pushed_filters(plan: str) -> list[str]:
    """Every non-empty PushedFilters list on the scans, flattened."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            # split between atoms only — a naive "," split would cut
            # multi-argument filters like EqualTo(l_returnflag,R) in half
            out.extend(s.strip() for s in re.split(r",\s+(?=[A-Z])", body))
    return out


def partition_filters(plan: str) -> list[str]:
    """Every non-empty PartitionFilters list on the scans, flattened —
    the partition-pruning check (a filter here skips whole directories
    before any file is opened)."""
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def read_schemas(plan: str) -> list[str]:
    """ReadSchema struct strings of the file scans (column-pruning check).
    ReadSchema is the last metadata item on a scan line, so match to the
    line's final ``>`` (``[^>]*`` would stop inside ``array<float>``)."""
    return re.findall(r"ReadSchema: (struct<.*>)\s*$", plan, re.M)
