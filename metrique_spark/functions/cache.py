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


def track_dir(result: DataFrame, *paths: str) -> DataFrame:
    """Record scratch DIRECTORIES the returned plan reads (the
    auto-provisioned reliable spill of ``ranked_within_strata``) so
    ``release(result)`` deletes them once the caller has materialized.
    Engine ``vacuum`` sweeps the warehouse ``_scratch`` root as the
    backstop for dirs a crashed job never released."""
    owned = list(getattr(result, _DIRS, []))
    owned.extend(paths)
    setattr(result, _DIRS, owned)
    return result


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
    import shutil

    for p in getattr(result, _DIRS, []):
        # local paths delete here; object-store scratch is swept by the
        # engine's vacuum backstop instead
        shutil.rmtree(p, ignore_errors=True)
    setattr(result, _DIRS, [])
    return len(owned)
