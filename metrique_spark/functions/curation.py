"""Composed corpus-curation pipeline — the CCNet-shaped end-to-end pass
(Wenzek et al. 2020) assembled from this package's proven operators:

1. heuristic quality gate (``gopher_quality_flags``, Rae 2021 A1.1),
2. LM fluency scoring (``unigram_logprob_scores``) bucketed into
   per-language head/middle/tail terciles (exact type-7 quantiles via
   ``stratum_quantiles`` — the CCNet perplexity-bucket step),
3. exact deduplication (canonical-token fingerprint, min-id keeps),

folded into one decision table: every document, every signal, one
``keep`` verdict. The point of returning signals rather than a filtered
corpus is the same 100 TB argument ``gopher_quality_flags`` makes —
re-cutting thresholds must not mean recomputing the pipeline.

Everything here is composition: each stage's scale shape and oracle
parity are established where the stage lives; this module adds only
id-keyed joins (AQE-broadcast when small), one tiny per-language
boundary broadcast, and the fingerprint min-aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metrique_spark.functions.cache import track
from metrique_spark.functions.text import (
    fingerprint,
    gopher_quality_flags,
    stratum_quantiles,
    unigram_logprob_scores,
)


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    min_words: int = 50,
    max_words: int = 100_000,
    min_stopword_hits: int = 2,
    reliable_dir: str | None = None,
) -> DataFrame:
    """One row per input document:
    ``(id, lang, n_tokens, mean_logprob, ppl_bucket, gopher_pass,
    is_canonical, keep)`` where ``ppl_bucket`` is the CCNet-style
    per-language fluency tercile (``head`` = most corpus-typical third,
    then ``middle``/``tail``; token-less documents land in ``tail``),
    ``is_canonical`` marks the min-id representative of each exact
    fingerprint group, and ``keep`` = gopher pass AND canonical AND not
    ``tail``.

    Deterministic and engine-portable end to end: scores are rounded at
    4 decimals, tercile boundaries at 6 (see ``stratum_quantiles`` on
    why the asymmetry), so the bucket comparisons agree bit-for-bit
    across engines.

    Scale shape: the LM pass is two map-side-combinable shuffles; its
    per-doc scores are persisted because BOTH the tercile ranking and
    the final decision join consume them (cache lifetime:
    ``functions.cache.release(result)`` after materializing, or pass
    ``reliable_dir`` on executor-loss-prone clusters — it flows through
    to the ranking primitive). Tercile boundaries are |languages|·2 rows
    — broadcast. The gopher gate is scan-stage. The fingerprint owner
    pass is one md5-keyed min-aggregate (map-side combined) joined back
    on the fingerprint. No stage widens beyond the slim
    (id, lang, score) projections."""
    from pyspark import StorageLevel

    # ONE signal scan carries the gopher gate (its own single-scan
    # projection), the language, and the dedup fingerprint — the former
    # shape ran THREE text passes (gopher, fingerprint, and the LM's)
    # and joined the first two back by id; identical expressions, so
    # every output value is unchanged
    sig = gopher_quality_flags(
        df.withColumn("__fp", fingerprint(text_col)),
        text_col=text_col, id_col=id_col, min_words=min_words,
        max_words=max_words, min_stopword_hits=min_stopword_hits,
        keep=(lang_col, "__fp"),
    ).select(F.col(id_col).alias("id"),
             F.col(lang_col).alias("lang"), "__fp",
             F.col("passes").alias("gopher_pass"))

    scores = (
        unigram_logprob_scores(df, text_col=text_col, id_col=id_col)
        .withColumnRenamed(id_col, "id")
        .join(sig.select("id", "lang"), "id")
    )
    from metrique_spark.functions.cache import narrow_small

    scores = narrow_small(scores).persist(StorageLevel.MEMORY_AND_DISK)

    terciles = stratum_quantiles(
        scores, "lang", "mean_logprob",
        quantiles=(1 / 3, 2 / 3), reliable_dir=reliable_dir)
    bounds = (
        terciles.groupBy("stratum")
        .agg(F.min(F.when(F.col("q") < 0.5, F.col("value"))).alias("b33"),
             F.min(F.when(F.col("q") > 0.5, F.col("value"))).alias("b67"))
        .withColumnRenamed("stratum", "lang")
    )

    owners = sig.groupBy("__fp").agg(F.min("id").alias("__own"))

    # NULL-safe bucketing: a token-less doc has no LM row (NULL score →
    # both WHENs null-false → tail), a lang with no scored docs has no
    # boundary row (NULL bounds → tail) — identical CASE semantics in SQL
    bucket = (
        F.when(F.col("mean_logprob") >= F.col("b67"), F.lit("head"))
        .when(F.col("mean_logprob") >= F.col("b33"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    out = (
        sig.join(scores.select("id", "n_tokens", "mean_logprob"), "id",
                 "left")
        .join(F.broadcast(bounds), "lang", "left")
        .join(owners, "__fp")
        .withColumn("is_canonical", F.col("id") == F.col("__own"))
        .withColumn("ppl_bucket", bucket)
        .withColumn(
            "keep",
            F.col("gopher_pass") & F.col("is_canonical")
            & (F.col("ppl_bucket") != "tail"))
        .select(F.col("id").alias(id_col), "lang", "n_tokens",
                "mean_logprob", "ppl_bucket", "gopher_pass",
                "is_canonical", "keep")
    )
    return track(out, scores, terciles)
