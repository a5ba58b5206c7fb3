"""Distributed hashed-token logistic-regression quality classifier —
the fastText/CCNet-shaped "distill a cheap heuristic into a model"
step (public technique: Joulin et al. 2016 fastText; CCNet/DataComp
style quality-classifier filtering), built deterministic and
cross-engine reproducible with the same machinery as ``kmeans_fit``:

- features: per-document normalized counts over ``n_buckets`` hashed
  token buckets (``md5_long % B`` — the 60-bit md5 trick, so a SQL
  oracle hashes identically), rounded at fixed decimals;
- training: full-batch gradient descent with DRIVER-RESIDENT weights
  (B+1 doubles); each iteration is one map-only scoring pass over the
  persisted features (weights ride in as literals) plus one map-side-
  combinable per-dimension gradient shuffle collected as B+1 rows;
- reproducibility: per-doc dots and gradient sums accumulate as
  DECIMAL(38,12) (order-independent), z/p/x/w are rounded at fixed
  decimals, so the whole training trajectory — and therefore the final
  scores — replays bit-identically in a DuckDB oracle as a chained-CTE
  GD unroll.

The corpus never shuffles after the one-time feature build; weight
updates are driver arithmetic (IEEE doubles, half-away-from-zero
rounding — matching both engines' ``round``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metrique_spark.functions.cache import narrow_small, track
from metrique_spark.functions.num import round_half_away as _round_half_away
from metrique_spark.functions.text import md5_long, tokens

_DEC = "decimal(38,12)"


def hashed_token_features(
    df: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 32,
    len_cap: int = 500,
    use_bigrams: bool = False,
    x_decimals: int = 6,
) -> DataFrame:
    """(id, y, x) — dense features: ``n_buckets`` normalized
    hashed-bucket token fractions plus one saturating length feature
    ``min(n_grams/len_cap, 1)`` (fractions alone are length-blind, and
    document length is the dominant heuristic-quality signal), so
    ``len(x) == n_buckets + 1``. Documents with zero tokens have no
    features and are excluded (a classifier over token statistics has
    nothing to say about them — gate them upstream).

    ``use_bigrams=True`` additionally hashes adjacent token pairs
    (space-joined — tokens never contain spaces) into the SAME bucket
    space, the fastText word-n-gram trick (Joulin 2016): word order
    enters the bag-of-buckets at zero extra dimensionality; unigram and
    bigram mass share the normalization total.

    Two doc-keyed map-side-combinable shuffles, built ONCE; training
    iterations reuse the persisted result. The dense ``array<double>``
    keeps every later pass map-only (a sparse (id, bucket, x) layout
    would re-shuffle per iteration to rebuild per-doc dots)."""
    from metrique_spark.functions.dedup import spread_small_scan

    # spread BEFORE tokenizing: a single-row-group parquet source scans
    # as one task, which serializes the tokenize+hash explode (the
    # dominant feature-build cost) onto one core — exact no-op at real
    # scale where the input already has ≥cores splits
    src = spread_small_scan(
        df.select(F.col(id_col).alias("id"),
                  F.col(label_col).cast("double").alias("y"),
                  F.col(text_col).alias("__t")))
    if use_bigrams:
        toks = tokens("__t")
        bigrams = F.zip_with(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b))
        grams = F.concat(toks, bigrams)
    else:
        grams = tokens("__t")
    occ = src.select("id", F.explode(grams).alias("tok"))
    bc = (occ.select("id", F.pmod(md5_long(F.col("tok")),
                                  F.lit(n_buckets)).alias("b"))
          .groupBy("id", "b").agg(F.count("*").alias("c")))
    # total tokens = sum of the doc's bucket counts — folded into the
    # same aggregation rather than a second tot-and-join pass, which
    # would re-run the tokenize+hash scan (no subplan CSE across joins)
    m = bc.groupBy("id").agg(
        F.map_from_entries(F.collect_list(F.struct("b", "c"))).alias("m"),
        F.sum("c").alias("t"))
    dense = m.select(
        "id",
        F.concat(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_buckets - 1)),
                # element_at on a MAP keys directly (the +1 convention is
                # for arrays only — off-by-one here silently shifts every
                # bucket and drops the last one)
                lambda j: F.round(
                    F.coalesce(F.element_at("m", j), F.lit(0))
                    .cast("double") / F.col("t"),
                    x_decimals),
            ),
            F.array(F.round(
                F.least(F.col("t") / F.lit(float(len_cap)), F.lit(1.0)),
                x_decimals)),
        ).alias("x"),
    )
    return dense.join(src.select("id", "y"), "id")


def _dlit(vals) -> str:
    """SQL double-array literal — ONE parsed expression instead of a
    py4j ``F.lit`` round trip per element (measured ~1 s of driver time
    per softmax iteration at K=5×34 literals). ``repr(float)`` is the
    shortest round-trip rendering, so the parsed doubles are
    bit-identical to the ``F.lit`` path."""
    return "array({})".format(",".join(f"{float(v)!r}D" for v in vals))


def _scored(feats: DataFrame, w: list, bias: float, z_decimals: int,
            p_decimals: int) -> DataFrame:
    """Map-only sigmoid scores under driver-resident weights: the
    per-doc dot accumulates as DECIMAL(38,12) (exact, order-free — a
    SQL sum over the sparse terms produces the identical value because
    the zero-feature terms cast to decimal zero)."""
    w_lit = F.expr(_dlit(w))
    dot = F.aggregate(
        F.zip_with(F.col("x"), w_lit, lambda a, b: (a * b).cast(_DEC)),
        F.lit(0).cast(_DEC),
        lambda acc, t: (acc + t).cast(_DEC),
    )
    z = F.round(dot.cast("double") + F.lit(float(bias)), z_decimals)
    sc = feats.select("id", "y", "x", z.alias("z"))
    return sc.withColumn(
        "p", F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))),
                     p_decimals))


def train_logreg(
    feats: DataFrame,
    n_dims: int = 33,
    iters: int = 2,
    lr: float = 0.5,
    w_decimals: int = 8,
    z_decimals: int = 6,
    p_decimals: int = 8,
) -> tuple[list, float]:
    """Full-batch GD on the (persisted) feature frame; returns
    ``(weights, bias)``. Per iteration: one map-only scoring pass + one
    (dimension)-keyed gradient shuffle whose B+1 decimal partials are
    map-side combined and collected — the bias gradient rides along as
    dimension B with a constant 1.0 feature. Weight updates are driver
    arithmetic: ``w - lr * (g / n)`` rounded half-away at
    ``w_decimals`` — the exact expression the SQL oracle replays.
    ``n_dims`` is the feature length (``n_buckets + 1`` for
    ``hashed_token_features``)."""
    w = [0.0] * n_dims
    bias = 0.0
    if iters == 0 and not feats.head(1):
        raise ValueError("train_logreg: empty feature frame")
    n = None
    from pyspark import StorageLevel

    for _ in range(iters):
        # persist barrier before the gradient explode (see train_softmax:
        # Generate re-evaluates the sigmoid chain per output row — here
        # B+1 times per document without it)
        sc = _scored(feats, w, bias, z_decimals, p_decimals).persist(
            StorageLevel.MEMORY_AND_DISK)
        grad = (
            sc.withColumn("err", F.col("p") - F.col("y"))
            .select("err", F.posexplode(
                F.concat("x", F.array(F.lit(1.0)))).alias("j", "xj"))
            .groupBy("j")
            .agg(F.sum((F.col("err") * F.col("xj")).cast(_DEC)).alias("g"),
                 # every doc emits every dimension once, so any group's
                 # count IS the doc count — rides the gradient shuffle,
                 # replacing the separate feats.count() job
                 F.count("*").alias("c"))
        ).collect()
        sc.unpersist(blocking=False)
        if n is None:
            n = int(grad[0]["c"]) if grad else 0
            if n == 0:
                raise ValueError("train_logreg: empty feature frame")
        gmap = {r["j"]: float(r["g"]) for r in grad}
        w = [_round_half_away(w[j] - lr * (gmap.get(j, 0.0) / n),
                              w_decimals)
             for j in range(n_dims)]
        bias = _round_half_away(
            bias - lr * (gmap.get(n_dims, 0.0) / n), w_decimals)
    return w, bias


def score_logreg(
    feats: DataFrame,
    weights: list,
    bias: float,
    z_decimals: int = 6,
    p_decimals: int = 8,
) -> DataFrame:
    """(id, label, prob, pred) under trained weights — one map-only
    pass."""
    sc = _scored(feats, weights, bias, z_decimals, p_decimals)
    return sc.select("id", (F.col("y") >= 0.5).alias("label"),
                     F.col("p").alias("prob"),
                     (F.col("p") >= 0.5).alias("pred"))


def _softmax_scored(feats: DataFrame, W: list, biases: list,
                    z_decimals: int, e_decimals: int,
                    p_decimals: int) -> DataFrame:
    """Map-only K-class softmax scores under driver-resident weights
    (K·(B+1) doubles riding in as literals). Reproducibility recipe,
    mirroring the binary ``_scored``: per-class dots accumulate as
    DECIMAL(38,12) (order-free), z is rounded, the max-shifted
    exponentials are rounded then summed as DECIMAL (order-free), and
    the final probabilities are rounded — so a SQL engine replaying the
    same expressions produces bit-identical probabilities."""
    # K unrolled per-class chains over ONE parsed weight literal each
    # (`_dlit`): the parse keeps the driver cost at K expression parses
    # (not K×B py4j round trips), while the unrolled shape keeps the
    # per-row executor cost at exactly one fold per class. The
    # alternative — one `transform` over a (w, b) struct-array literal —
    # was tried and REVERTED: it shrank the tree K× but measured 3.2×
    # the task CPU per scoring pass (5.30 vs 1.66 s at sf0.1, 32-way;
    # lambda-variable struct access + the extra HOF layer are
    # interpreted per row per class), and executor CPU is what scales
    # with corpus size. z values are bit-identical in both shapes.
    zs = F.array(*[
        F.round(
            F.aggregate(
                F.zip_with(F.col("x"), F.expr(_dlit(W[k])),
                           lambda a, b: (a * b).cast(_DEC)),
                F.lit(0).cast(_DEC),
                lambda acc, t: (acc + t).cast(_DEC),
            ).cast("double") + F.lit(float(biases[k])),
            z_decimals)
        for k in range(len(W))])
    sc = feats.select("id", "y", "x", zs.alias("zs"))
    # max-shift before exp: keeps every exponential in (0, 1] so the
    # fixed-decimal rounding below loses no dynamic range
    m = F.array_max(F.col("zs"))
    sc = sc.withColumn(
        "es", F.transform(F.col("zs"),
                          lambda z: F.round(F.exp(z - m), e_decimals)))
    tot = F.aggregate(F.col("es"), F.lit(0).cast(_DEC),
                      lambda acc, e: (acc + e.cast(_DEC)).cast(_DEC))
    sc = sc.withColumn(
        "ps", F.transform(F.col("es"),
                          lambda e: F.round(e / tot.cast("double"),
                                            p_decimals)))
    return sc.drop("es", "zs")


def train_softmax(
    feats: DataFrame,
    n_classes: int,
    n_dims: int = 33,
    iters: int = 2,
    lr: float = 0.5,
    w_decimals: int = 8,
    z_decimals: int = 6,
    e_decimals: int = 8,
    p_decimals: int = 8,
) -> tuple[list, list]:
    """Full-batch GD for K-class softmax regression (multinomial
    cross-entropy; dL/dz_k = p_k - [y == k], the direct multi-class
    generalization of ``train_logreg``'s p - y). Returns
    ``(W, biases)`` with ``W`` a K×n_dims list-of-lists. Per iteration:
    one map-only scoring pass + ONE (class, dimension)-keyed gradient
    shuffle whose K·(n_dims+1) decimal partials are map-side combined
    and collected — the bias gradient rides along as dimension n_dims
    with a constant 1.0 feature. The corpus never re-shuffles: weights
    stay on the driver (K·(B+1) doubles), exactly the
    driver-resident-state + map-only-scan scale pattern of the binary
    classifier and kmeans."""
    W = [[0.0] * n_dims for _ in range(n_classes)]
    biases = [0.0] * n_classes
    if iters == 0 and not feats.head(1):
        raise ValueError("train_softmax: empty feature frame")
    n = None
    from pyspark import StorageLevel

    for _ in range(iters):
        # persist barrier before the gradient's generators: a Generate
        # re-evaluates its input expressions per OUTPUT row, so without
        # materialization the whole K-dot softmax chain runs ~K·(B+1)
        # times per document inside the explode stage (measured 10×
        # the scoring pass at sf0.1). Persist (not localCheckpoint):
        # a lost block recomputes instead of killing the job.
        sc = _softmax_scored(feats, W, biases, z_decimals, e_decimals,
                             p_decimals).persist(
            StorageLevel.MEMORY_AND_DISK)
        grad = (
            sc.select("y", "x", F.posexplode("ps").alias("k", "pk"))
            .withColumn("err", F.col("pk") -
                        (F.col("y") == F.col("k")).cast("double"))
            .select("k", "err", F.posexplode(
                F.concat("x", F.array(F.lit(1.0)))).alias("j", "xj"))
            .groupBy("k", "j")
            .agg(F.sum((F.col("err") * F.col("xj")).cast(_DEC)).alias("g"),
                 # every doc emits every (class, dimension) once — any
                 # group's count IS the doc count (see train_logreg)
                 F.count("*").alias("c"))
        ).collect()
        sc.unpersist(blocking=False)
        if n is None:
            n = int(grad[0]["c"]) if grad else 0
            if n == 0:
                raise ValueError("train_softmax: empty feature frame")
        g = {(r["k"], r["j"]): float(r["g"]) for r in grad}
        W = [[_round_half_away(
                W[k][j] - lr * (g.get((k, j), 0.0) / n), w_decimals)
              for j in range(n_dims)] for k in range(n_classes)]
        biases = [_round_half_away(
            biases[k] - lr * (g.get((k, n_dims), 0.0) / n), w_decimals)
            for k in range(n_classes)]
    return W, biases


def score_softmax(
    feats: DataFrame,
    W: list,
    biases: list,
    z_decimals: int = 6,
    e_decimals: int = 8,
    p_decimals: int = 8,
) -> DataFrame:
    """(id, label, pred, prob) under trained softmax weights — one
    map-only pass. ``pred`` is the argmax class with the LOWEST-index
    tie-break (``array_position`` returns the first occurrence), the
    deterministic rule a SQL oracle mirrors as
    ``min(k) WHERE p = max(p)``."""
    sc = _softmax_scored(feats, W, biases, z_decimals, e_decimals,
                         p_decimals)
    return sc.select(
        "id",
        F.col("y").cast("int").alias("label"),
        (F.array_position(F.col("ps"), F.array_max("ps")) - 1)
        .cast("int").alias("pred"),
        F.array_max("ps").alias("prob"))


def softmax_eval(scored: DataFrame) -> DataFrame:
    """Per-class evaluation rollup over ``score_softmax`` output:
    support, correct count, and rounded accuracy per TRUE class — the
    per-class quality view a lang-id / domain-router needs (macro
    accuracy hides a collapsed minority class)."""
    return (scored.groupBy("label").agg(
        F.count("*").alias("n"),
        F.sum((F.col("pred") == F.col("label")).cast("long"))
        .alias("n_correct"))
        .withColumn("accuracy",
                    F.round(F.col("n_correct") / F.col("n"), 6)))


def softmax_classifier_scores(
    df: DataFrame,
    label_col: str,
    n_classes: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 32,
    len_cap: int = 500,
    iters: int = 2,
    lr: float = 0.5,
    use_bigrams: bool = False,
    holdout_mod: int | None = None,
) -> DataFrame:
    """Train-and-score convenience for the K-class model:
    ``label_col`` holds integer class ids 0..K-1 (e.g. a language
    rank). Same feature build, persistence and holdout contract as
    ``quality_classifier_scores``."""
    from pyspark import StorageLevel

    feats = narrow_small(hashed_token_features(
        df, label_col, id_col=id_col, text_col=text_col,
        n_buckets=n_buckets, len_cap=len_cap,
        use_bigrams=use_bigrams)).persist(StorageLevel.MEMORY_AND_DISK)
    train = feats if holdout_mod is None else feats.where(
        F.col("id") % holdout_mod != 0)
    target = feats if holdout_mod is None else feats.where(
        F.col("id") % holdout_mod == 0)
    W, b = train_softmax(train, n_classes, n_dims=n_buckets + 1,
                         iters=iters, lr=lr)
    out = score_softmax(target, W, b).withColumnRenamed("id", id_col)
    return track(out, feats)


def quality_classifier_scores(
    df: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 32,
    len_cap: int = 500,
    iters: int = 2,
    lr: float = 0.5,
    holdout_mod: int | None = None,
) -> DataFrame:
    """Train-and-score convenience: distill ``label_col`` (e.g. a Gopher
    pass flag) into a hashed-token linear model and score every
    featurizable document. ``holdout_mod=k`` switches to out-of-sample
    evaluation: train on ``id % k != 0``, score only the held-out
    ``id % k == 0`` slice (ids must be numeric). Cache lifetime: the
    feature frame is persisted for the training loop;
    ``functions.cache.release(result)`` after materializing."""
    from pyspark import StorageLevel

    feats = narrow_small(hashed_token_features(
        df, label_col, id_col=id_col, text_col=text_col,
        n_buckets=n_buckets,
        len_cap=len_cap)).persist(StorageLevel.MEMORY_AND_DISK)
    train = feats if holdout_mod is None else feats.where(
        F.col("id") % holdout_mod != 0)
    target = feats if holdout_mod is None else feats.where(
        F.col("id") % holdout_mod == 0)
    w, b = train_logreg(train, n_dims=n_buckets + 1, iters=iters, lr=lr)
    out = score_logreg(target, w, b).withColumnRenamed("id", id_col)
    return track(out, feats)
