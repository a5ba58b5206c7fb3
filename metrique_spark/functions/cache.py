"""Cache lifetime for lazily-returned plans.

Several operators persist an intermediate (``MEMORY_AND_DISK``) that the
RETURNED plan still reads — e.g. ``dedup_against_index`` persists the
candidate-pair set because two downstream joins consume it, and
``_prefix_under_budget`` persists its range-partitioned band because the
driver offsets and the final cumsum MUST see identical range boundaries.
Those blocks cannot be unpersisted inside the function (the caller has
not materialized the plan yet), so the caller owns the lifetime:

    result = dedup_against_index(batch, index, corpus)
    result.write.parquet(out)          # materialize
    release(result)                    # free the intermediates

Without ``release``, blocks are reclaimed only by executor-storage LRU
eviction or session shutdown — fine for a one-shot job, a slow leak in a
long-lived session that calls these operators repeatedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_metrique_cached_intermediates"
_DIRS = "_metrique_scratch_dirs"


def track(result: DataFrame, *frames: DataFrame) -> DataFrame:
    """Record persisted ``frames`` as intermediates of ``result`` so
    ``release(result)`` can unpersist them once the caller is done.
    Chains: intermediates already tracked on any of ``frames`` move onto
    ``result`` (a pipeline of cache-owning operators releases in one
    call) — scratch DIRECTORIES tracked on the frames chain the same
    way."""
    owned = list(getattr(result, _ATTR, []))
    dirs = list(getattr(result, _DIRS, []))
    for f in frames:
        owned.extend(getattr(f, _ATTR, []))
        dirs.extend(getattr(f, _DIRS, []))
        owned.append(f)
    setattr(result, _ATTR, owned)
    if dirs:
        setattr(result, _DIRS, dirs)
    return result


def track_dir(result: DataFrame, *paths: str, deleter=None) -> DataFrame:
    """Record scratch DIRECTORIES the returned plan reads (the
    auto-provisioned reliable spill of ``ranked_within_strata``) so
    ``release(result)`` deletes them once the caller has materialized.
    ``deleter`` (a ``path -> None`` callable) deletes through the same
    storage abstraction the spill was written with; without one,
    ``release`` falls back to the path's Hadoop FileSystem (resolved
    per-scheme through the frame's session — the same layer Spark wrote
    the parquet with, so an object-store spill deletes remotely instead
    of silently no-op'ing through a driver-local rmtree). Engine
    ``vacuum`` sweeps the warehouse ``_scratch`` root as the backstop
    for dirs a crashed job never released."""
    owned = list(getattr(result, _DIRS, []))
    owned.extend((p, deleter) for p in paths)
    setattr(result, _DIRS, owned)
    return result


def _fs_delete(spark, path: str) -> None:
    """Delete ``path`` recursively through its Hadoop FileSystem (the
    layer that wrote it — works for any scheme Spark can write:
    file://, hdfs://, s3a://, ...); driver-local rmtree as the last
    resort when no JVM is reachable (session already stopped)."""
    try:
        jvm = spark.sparkContext._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        hfs = jpath.getFileSystem(
            spark.sparkContext._jsc.hadoopConfiguration())
        hfs.delete(jpath, True)
    except Exception:
        import shutil

        shutil.rmtree(path, ignore_errors=True)


def release(result: DataFrame) -> int:
    """Unpersist every intermediate tracked on ``result`` and delete its
    tracked scratch directories (idempotent; non-blocking). Returns the
    number of frames unpersisted. Call AFTER materializing — the plan
    recomputes from source if acted on again."""
    owned = getattr(result, _ATTR, [])
    for f in owned:
        try:
            f.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped
    setattr(result, _ATTR, [])
    for entry in getattr(result, _DIRS, []):
        # entries are (path, deleter) pairs (bare strings accepted for
        # pre-existing callers); deleter=None resolves to the path's
        # Hadoop FileSystem so remote-FS spills actually delete
        p, deleter = entry if isinstance(entry, tuple) else (entry, None)
        if deleter is not None:
            try:
                deleter(p)
            except Exception:
                pass  # vacuum sweeps the backstop
        else:
            _fs_delete(result.sparkSession, p)
    setattr(result, _DIRS, [])
    return len(owned)
