"""Size-tiered compaction policy (shared by the cube-history and
ANN-index compactors).

The upsert/refresh write paths append one content-token-keyed batch
directory per commit. Compaction must bound the directory count WITHOUT
becoming the O(everything) rewrite it replaces, so selection is
size-tiered, two rules (the Cassandra/RocksDB size-tiered shape):

1. every batch at or below ``small_bytes`` merges into one consolidated
   level (the trickle rule — routine maintenance cost is O(recent
   small batches));
2. batches ABOVE the threshold merge only when at least ``min_merge``
   of them are of SIMILAR size (each within ~2x of the group's running
   average, ascending greedy grouping) — the promotion rule, which
   keeps the level count bounded as data grows: 4 similar levels fold
   into one ~4x level, so steady state holds ≲ (min_merge-1) levels
   per ~2x size class ≈ O(log(total / small_bytes)) directories, and
   each byte is rewritten O(log_min_merge(total / small_bytes)) times
   over its lifetime (~9 rewrites for 100 TB over a 256 MiB threshold),
   never per-commit.

Similar-size grouping (not fixed log-scale tiers) avoids the boundary
split where two near-equal levels land in adjacent tiers and never
qualify for a merge.
"""

from __future__ import annotations


def tier_groups(sizes: dict[str, int], small_bytes: int,
                min_merge: int = 4) -> list[set[str]]:
    """Partition batch tokens into merge groups per the policy above.
    Returns a list of disjoint token sets, each to be consolidated into
    one new batch; tokens in no group carry forward untouched. Empty
    list when nothing qualifies."""
    groups: list[set[str]] = []
    smalls = {t for t, s in sizes.items() if s <= small_bytes}
    if len(smalls) >= 2:
        groups.append(smalls)
    big = sorted((s, t) for t, s in sizes.items() if s > small_bytes)
    cur: list[tuple[int, str]] = []

    def flush():
        if len(cur) >= min_merge:
            groups.append({t for _, t in cur})

    for s, t in big:  # ascending: group while within 2x of the average
        if cur:
            avg = sum(x for x, _ in cur) / len(cur)
            if s > 2.0 * avg:
                flush()
                cur.clear()
        cur.append((s, t))
    flush()
    return groups
