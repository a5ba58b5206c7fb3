"""Git commit source — the reference's gitdata cube
(``cubes/gitdata/commit.py:54-131``) rebuilt as log-dump parsing.

The reference shells out ``git rev-list`` + ``git log`` per repo and builds
objects in a Python loop. Here the driver dumps ``git log`` once with a
machine-parseable record separator, and Spark parses it distributed: one
``spark.read.text`` scan + regex extraction — so a million-commit monorepo
parses in parallel.

Commit objects carry the reference's fields: ``_oid`` (sha), tree,
parents[], author, committer, author_time, message, added/removed totals,
and regex-extracted trailers (acked_by / signed_off_by / resolves /
related — patterns from ``commit.py:26-30``).
"""

from __future__ import annotations

import os
import subprocess
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# record/unit separators that cannot appear in commit text
_RS = "\x1e"
_FS = "\x1f"

_LOG_FORMAT = _RS + _FS.join(["%H", "%T", "%P", "%an <%ae>", "%cn <%ce>",
                              "%at", "%ct", "%B"]) + _FS

# trailer regexes (reference cubes/gitdata/commit.py:26-30)
_TRAILERS = {
    "acked_by": r"(?im)^\s*acked-by:\s*(.+)$",
    "signed_off_by": r"(?im)^\s*signed-off-by:\s*(.+)$",
    "resolves": r"(?im)^\s*resolves:\s*(.+)$",
    "related": r"(?im)^\s*related:\s*(.+)$",
}


def dump_git_log(repo_path: str, out_path: str | None = None) -> str:
    """Driver-side: dump the repo's full log (with numstat) to a text file
    Spark can scan. The only non-distributed step, O(repo) once."""
    out_path = out_path or os.path.join(
        tempfile.mkdtemp(prefix="gitlog_"), "log.txt")
    with open(out_path, "w", encoding="utf-8", errors="replace") as fh:
        subprocess.run(
            ["git", "log", "--all", "--numstat", f"--pretty=format:{_LOG_FORMAT}"],
            cwd=repo_path, stdout=fh, check=True,
        )
    return out_path


def commits(spark: SparkSession, log_path: str, repo_uri: str = "") -> DataFrame:
    """Parse a ``dump_git_log`` file into commit objects."""
    raw = spark.read.text(log_path, lineSep=_RS).where(F.length("value") > 0)
    parts = F.split(F.col("value"), _FS)
    df = raw.select(
        parts.getItem(0).alias("_oid"),
        parts.getItem(1).alias("tree"),
        F.when(F.length(parts.getItem(2)) > 0,
               F.split(parts.getItem(2), " ")).otherwise(
                   F.array().cast("array<string>")).alias("parents"),
        parts.getItem(3).alias("author"),
        parts.getItem(4).alias("committer"),
        F.timestamp_seconds(parts.getItem(5).cast("long")).alias("author_time"),
        F.timestamp_seconds(parts.getItem(6).cast("long")).alias("_start"),
        parts.getItem(7).alias("message"),
        parts.getItem(8).alias("numstat_raw"),
    )
    # numstat lines: "<added>\t<removed>\t<path>"; '-' for binary
    stat_lines = F.filter(
        F.split(F.coalesce(F.col("numstat_raw"), F.lit("")), "\n"),
        lambda l: l.rlike(r"^[0-9-]+\t[0-9-]+\t"),
    )
    stats = F.transform(
        stat_lines,
        lambda l: F.struct(
            F.split(l, "\t").getItem(2).alias("path"),
            F.nullif(F.split(l, "\t").getItem(0), F.lit("-")).cast("int").alias("added"),
            F.nullif(F.split(l, "\t").getItem(1), F.lit("-")).cast("int").alias("removed"),
        ),
    )
    out = df.withColumn("files", stats).withColumn(
        "added",
        F.coalesce(F.aggregate("files", F.lit(0),
                               lambda a, x: a + F.coalesce(x["added"], F.lit(0))),
                   F.lit(0)),
    ).withColumn(
        "removed",
        F.coalesce(F.aggregate("files", F.lit(0),
                               lambda a, x: a + F.coalesce(x["removed"], F.lit(0))),
                   F.lit(0)),
    )
    for name, pat in _TRAILERS.items():
        out = out.withColumn(
            name, F.array_sort(F.regexp_extract_all(F.col("message"), F.lit(pat), 1)))
    out = (
        out.withColumn("repo_uri", F.lit(repo_uri))
        .withColumn("_end", F.lit(None).cast("timestamp"))
        .drop("numstat_raw")
    )
    return out


def commits_from_repo(spark: SparkSession, repo_path: str) -> DataFrame:
    """Convenience: dump + parse a local repo."""
    return commits(spark, dump_git_log(repo_path), repo_uri=repo_path)
