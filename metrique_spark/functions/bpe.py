"""Distributed BPE merge learning (public algorithm: Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units") —
the real learned companion to ``text.bpe_token_estimate``'s regex
heuristic, built on the repo's deterministic-iterative pattern
(``kmeans_fit``, ``train_logreg``): driver-resident merge rules, one
map-side-combinable aggregate per iteration, a SQL oracle that replays
the identical trajectory as a chained-CTE unroll.

BPE's classic optimization is that merges operate on the TYPE
vocabulary (distinct tokens weighted by corpus frequency), not the
corpus: the corpus is touched exactly once (the type-count aggregate);
every iteration then runs over the types table — bounded by vocabulary
size, not corpus size. Here the types table additionally stays
DISTRIBUTED (a web-scale corpus has 100M+ types): re-segmentation under
a new rule is a map-only higher-order fold with the rule inlined as
literals, pair counting is one (left, right)-keyed combinable shuffle,
and only the single argmax row is collected per iteration.

Determinism: pair counts are exact longs; the argmax tie-breaks by
(count desc, left, right) — no floats anywhere, so cross-engine parity
is exact by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metrique_spark.functions.text import tokens


def _chars(col: Column) -> Column:
    # '.' = one codepoint in both Java regex and RE2 for BMP text; tokens
    # come from the word tokenizer so there is no whitespace/newline
    return F.regexp_extract_all(col, F.lit("."), 0)


def _apply_merge(pieces: Column, left: str, right: str) -> Column:
    """Greedy left-to-right application of ONE merge rule to a piece
    array via a seeded fold — the canonical BPE re-segmentation: in
    'aaa' under rule (a,a) the first pair merges and the remainder does
    not ('aa','a'). Mirrors the oracle's ``list_reduce`` exactly."""
    seeded = F.array(F.element_at(pieces, 1))
    rest = F.slice(pieces, 2, F.greatest(F.size(pieces) - 1, F.lit(0)))
    return F.aggregate(
        rest, seeded,
        lambda acc, x: F.when(
            (F.element_at(acc, -1) == F.lit(left)) & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(left + right))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _pair_counts(types: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-piece pair counts over the types
    table — overlapping pairs included, per the canonical algorithm
    ('aaaa' contributes (a,a) three times). Map-side combinable."""
    z = F.zip_with(
        F.slice("pieces", 1, F.size("pieces") - 1),
        F.slice("pieces", 2, F.size("pieces") - 1),
        lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")))
    return (
        types.where(F.size("pieces") >= 2)
        .select("n", F.explode(z).alias("p"))
        .groupBy("p.lhs", "p.rhs")
        .agg(F.sum("n").cast("long").alias("pair_count"))
    )


def bpe_train(
    df: DataFrame,
    num_merges: int = 8,
    text_col: str = "text",
    return_types: bool = False,
) -> list | tuple:
    """Learn ``num_merges`` BPE merge rules from the corpus; returns
    ``[(lhs, rhs, pair_count), ...]`` in learning order — or, with
    ``return_types=True``, ``(merges, types)`` where ``types`` is the
    final ``(token, n, pieces)`` segmented vocabulary (the input to
    ``bpe_segment_with_vocab``, the cheap application path). Raises if
    the corpus exhausts its pairs early (every type fully merged) —
    callers wanting best-effort can catch and retry with fewer merges.

    Scale: ONE corpus-wide token-count shuffle builds the weighted types
    table; each iteration is a map-only re-segmentation (rule literals)
    + one combinable pair-count shuffle + a 1-row argmax collect. The
    types table is localCheckpointed per round so the plan stays flat
    over ``num_merges``; a superseded round's checkpoint blocks are
    released by the ContextCleaner once its driver reference drops
    (immediate under CPython refcounting at the reassignment below —
    there is no public API to unpersist a localCheckpoint), so steady
    state holds ~2 copies of the vocabulary-sized table, not
    ``num_merges``. (A lazy-persist chain was MEASURED SLOWER here
    despite saving the per-round checkpoint job: every round's action
    canonicalizes the growing lineage against every registered cache
    entry — quadratic driver work that outweighs the job it saves.)"""
    from metrique_spark.functions.cache import narrow_small

    t0 = (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token").agg(F.count("*").cast("long").alias("n"))
        .select("token", "n", _chars(F.col("token")).alias("pieces"))
    )
    # narrow the vocabulary table before the first checkpoint: every
    # round's re-segmentation + checkpoint + pair-count map side then
    # runs at the size-derived width instead of the session's full
    # shuffle-partition count (8 rounds x 3 passes of fixed per-task
    # overhead at sf0.1; exact no-op at scale — see narrow_small)
    types = narrow_small(t0).localCheckpoint(eager=True)
    merges = []
    for i in range(num_merges):
        best = (_pair_counts(types)
                .orderBy(F.col("pair_count").desc(), "lhs", "rhs")
                .limit(1).collect())
        if not best:
            raise ValueError(
                f"bpe_train: pairs exhausted after {i} merges "
                f"(requested {num_merges})")
        b = best[0]
        merges.append((b["lhs"], b["rhs"], b["pair_count"]))
        types = types.select(
            "token", "n",
            _apply_merge(F.col("pieces"), b["lhs"], b["rhs"])
            .alias("pieces")).localCheckpoint(eager=True)
    return (merges, types) if return_types else merges


def bpe_learned_merges(
    df: DataFrame,
    num_merges: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """``bpe_train`` as a DataFrame: (merge_idx, lhs, rhs, pair_count)
    — the gate/reporting surface."""
    merges = bpe_train(df, num_merges=num_merges, text_col=text_col)
    return df.sparkSession.createDataFrame(
        [(i + 1, l, r, c) for i, (l, r, c) in enumerate(merges)],
        "merge_idx int, lhs string, rhs string, pair_count long")


def bpe_segment(
    df: DataFrame,
    merges: list,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply learned merges to a corpus: (id, n_tokens, n_pieces) — the
    honest learned-BPE token count (vs ``bpe_token_estimate``'s regex
    proxy). Map-only: every merge rule is a literal fold chained in
    learning order over each token's pieces; nothing shuffles. NULL
    text counts as (0, 0) — the ``bpe_token_estimate`` coalesce
    convention, matching the SQL oracle's left join."""
    def _rule(left: str, right: str):
        # closure factory, NOT default-arg capture: PySpark counts a
        # lambda's parameters to type the higher-order function, so
        # `lambda p, l=l: ...` reads as a 2-arg lambda and fails analysis
        return lambda p: _apply_merge(p, left, right)

    raw = F.coalesce(F.col(text_col), F.lit(""))
    pieces = F.transform(tokens(raw), lambda t: _chars(t))
    for left, right, _ in merges:
        pieces = F.transform(pieces, _rule(left, right))
    # materialize the chained fold ONCE: n_tokens is the outer size of
    # the same array (one inner array per token), so the corpus is
    # tokenized a single time — CollapseProject keeps the projection
    # because the alias is multi-use and non-cheap
    seg = df.select(F.col(id_col), pieces.alias("__p"))
    return seg.select(
        F.col(id_col),
        F.size("__p").cast("long").alias("n_tokens"),
        F.aggregate("__p", F.lit(0).cast("long"),
                    lambda acc, p: acc + F.size(p)).alias("n_pieces"),
    )


def bpe_segment_with_vocab(
    df: DataFrame,
    types: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, n_pieces) via the trained segmented vocabulary —
    the cheap application path when segmenting the corpus the rules were
    learned from (or any mostly-in-vocabulary corpus): one token-keyed
    join against the ``(token, n, pieces)`` types table replaces
    ``bpe_segment``'s per-token chained folds (8 merges cost ~8 nested
    interpreted higher-order passes per token — ~5× slower end to end on
    the gate corpus). Out-of-vocabulary tokens fall back to their
    character count (unmerged); NULL/token-less docs count (0, 0).

    Scale: the types table is vocabulary-sized — AQE broadcasts it when
    small, else this is a plain token-keyed equi-join; the per-doc
    re-aggregation is map-side combinable."""
    occ = df.select(F.col(id_col).alias("__id"),
                    F.explode(tokens(F.coalesce(F.col(text_col),
                                                F.lit("")))).alias("token"))
    seg = (
        occ.join(types.select("token", F.size("pieces").alias("__np")),
                 "token", "left")
        .select("__id",
                F.coalesce(F.col("__np"),
                           F.length("token")).cast("long").alias("np"))
        .groupBy("__id")
        .agg(F.count("*").cast("long").alias("n_tokens"),
             F.sum("np").cast("long").alias("n_pieces"))
    )
    return (
        df.select(F.col(id_col)).join(
            seg, F.col(id_col) == F.col("__id"), "left")
        .select(F.col(id_col),
                F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                F.coalesce("n_pieces", F.lit(0)).alias("n_pieces"))
    )


def bpe_vocab_from_merges(
    df: DataFrame,
    merges: list,
    text_col: str = "text",
) -> DataFrame:
    """Recomputable segmented vocabulary ``(token, pieces)``: the
    corpus's distinct tokens re-segmented by applying the learned merge
    list in order (driver literals in chained folds). Identical output
    to ``bpe_train(..., return_types=True)``'s types table — by
    determinism of greedy application — but with FULL lineage: the plan
    recomputes from source on executor loss, where the trained types
    table is a localCheckpoint whose blocks die with their executors
    (and cannot be explicitly unpersisted). Prefer this as the
    ``bpe_segment_with_vocab`` input whenever the result outlives the
    training session. Cost: ``|merges|`` folds over vocabulary-sized
    rows — independent of corpus size."""

    toks = (df.select(F.explode(tokens(F.coalesce(F.col(text_col),
                                                  F.lit(""))))
            .alias("token")).distinct())
    # one PROJECTION per merge layer, never nested expressions:
    # _apply_merge references its input 3× (seed, slice, size), so
    # direct nesting copies the inner tree 3^|merges| times — the
    # multi-use non-cheap alias keeps CollapseProject from re-inlining,
    # so evaluation stays linear in |merges|
    out = toks.select("token", _chars(F.col("token")).alias("pieces"))
    for left, right, _ in merges:
        out = out.select(
            "token",
            _apply_merge(F.col("pieces"), left, right).alias("pieces"))
    return out
