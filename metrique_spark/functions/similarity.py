"""Similarity search over embedding columns (``array<float>``).

Two paths, same contract:

- ``cosine_topk`` — exact brute-force: query set × corpus with the dot
  product as ``zip_with``/``aggregate`` higher-order functions (JVM-side,
  codegen) and a window top-k. The query side is broadcast — the corpus is
  scanned once, never shuffled. This is the correctness baseline and is
  fine whenever |queries| × |corpus| partitions fit the cluster.
- ``ivf_topk`` — the scale path: k-means-style inverted file. Centroids are
  sampled deterministically, every vector is assigned to its nearest
  centroid (one broadcast pass), and a query only scans its ``nprobe``
  closest buckets. At 100 TB the bucket assignment is the partition key, so
  a probe touches ``nprobe/nlist`` of the data instead of all of it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0).cast("double"),
                              lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays, built-ins only."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(col: str) -> Column:
    return F.col(col).cast("array<double>")


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, sim) — self-matches excluded, ties
    broken by neighbor id for determinism. The query side is broadcast;
    ranking is a window over query_id (shuffle of |Q|·|C| slim rows — at
    scale prefer ``ivf_topk``).
    """
    # norms precomputed once per row: cosine() inline would re-evaluate the
    # interpreted higher-order norm lambda for every candidate pair —
    # |Q|+|C| norm computations instead of 2·|Q|·|C|
    q = queries.select(F.col(id_col).alias("query_id"),
                       _as_double(vec_col).alias("qv"))
    q = q.select("query_id", "qv", _norm(F.col("qv")).alias("qn"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      _as_double(vec_col).alias("cv"))
    c = c.select("neighbor_id", "cv", _norm(F.col("cv")).alias("cn"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", F.round(
            _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
            decimals))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .select("query_id", "neighbor_id", "sim")
    )


_PAIRS_SCHEMA = "id_a bigint, id_b bigint, sim double"


def _pairs_above(ids, mat, other_ids, other_mat, threshold, decimals):
    """All (id_a < id_b) cosine pairs between two raw blocks via one numpy
    matmul; returns a pandas DataFrame. Shared by the exact and bucketed
    paths — BLAS does the n·m·d work, Python touches only the survivors.

    Cosine is computed as dot/(‖a‖·‖b‖) — the same algebraic form as the
    SQL oracle — rather than normalize-then-dot, so the two engines agree
    bit-for-bit more often before the 4dp round."""
    import numpy as np
    import pandas as pd

    na = np.linalg.norm(mat, axis=1)
    nb = np.linalg.norm(other_mat, axis=1)
    # round half-UP like Spark's F.round / DuckDB's round — np.round is
    # banker's (half-even) and would drift on exact ties
    scale = 10.0 ** decimals
    sims = np.floor((mat @ other_mat.T) / (na[:, None] * nb[None, :])
                    * scale + 0.5) / scale
    ia, ib = np.nonzero((sims >= threshold)
                        & (ids[:, None] < other_ids[None, :]))
    return pd.DataFrame({"id_a": ids[ia], "id_b": other_ids[ib],
                         "sim": sims[ia, ib]})


def cosine_pairs(
    df: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 4,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: every (id_a, id_b),
    id_a < id_b, with cosine ≥ threshold.

    All-pairs is O(n²) by definition; the question is only the constant.
    The corpus streams through ``mapInPandas`` in Arrow batches and each
    batch is one BLAS matmul against a broadcast of the corpus matrix —
    measured ~4× end-to-end over evaluating the dot product as interpreted
    higher-order-function lambdas per joined pair, and nothing but the
    surviving pairs ever materializes. Broadcasting the matrix caps this
    at broadcast size (same ceiling as any broadcast join); past that,
    block both sides (outer loop over matrix blocks of this same
    function) or drop to ``cosine_pairs_bucketed``."""
    import numpy as np

    base = df.select(F.col(id_col).cast("long").alias("id"),
                     _as_double(vec_col).alias("v"))
    rows = base.collect()  # small side of the broadcast, like any dim table
    all_ids = np.array([r.id for r in rows], dtype=np.int64)
    m = np.array([r.v for r in rows], dtype=np.float64)
    bc = df.sparkSession.sparkContext.broadcast((all_ids, m))

    def gen(batches):
        import numpy as np

        ids_all, mat_all = bc.value
        pos = {v: i for i, v in enumerate(ids_all)}
        for pdf in batches:
            idx = pdf["id"].map(pos).to_numpy()
            yield _pairs_above(ids_all[idx], mat_all[idx],
                               ids_all, mat_all, threshold, decimals)

    return base.select("id").mapInPandas(gen, schema=_PAIRS_SCHEMA)


def auto_nlist(n_rows: int, target_bucket_rows: int = 100_000) -> int:
    """Bucket count that keeps the EXPECTED bucket ≤ ``target_bucket_rows``
    rows — the knob that stops a fixed ``nlist`` from becoming a hidden
    per-executor memory bound as the corpus grows."""
    import math

    return max(2, math.ceil(max(0, n_rows) / max(1, target_bucket_rows)))


def cosine_pairs_bucketed(
    df: DataFrame,
    threshold: float = 0.45,
    nlist: int | None = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 4,
    target_bucket_rows: int = 100_000,
) -> DataFrame:
    """Scale path for embedding near-dup pairs: assign every vector to its
    ``nprobe`` nearest of ``nlist`` IVF buckets, generate candidates only
    within a bucket (the bucket id is the shuffle key — work is
    n²/nlist-ish per bucket instead of n² global, and no broadcast of the
    full matrix), then verify with the exact dot product (one BLAS matmul
    per bucket group). Output precision is exact; recall misses pairs whose
    members share no probed bucket (raise ``nprobe`` to trade cost for
    recall). Same contract as ``cosine_pairs``.

    MEMORY CONTRACT: each bucket group materializes as ONE pandas frame
    inside ``applyInPandas`` — a bucket must fit in executor memory.
    ``nlist=None`` sizes it automatically from the corpus count so the
    expected bucket stays ≤ ``target_bucket_rows`` (hot buckets still
    need headroom; lower ``target_bucket_rows`` for wide vectors). A
    fixed ``nlist`` (like the test-gate's exact mode ``nlist=2,
    nprobe=2``, where every vector lands in every bucket) is a
    small-corpus/oracle configuration, NOT the scale configuration."""
    if nlist is None:
        nlist = auto_nlist(df.count(), target_bucket_rows)
    _, centroids = ivf_assign(df, nlist, id_col, vec_col)
    vecs = df.select(F.col(id_col).cast("long").alias("__vid"),
                     _as_double(vec_col).alias("v"))
    if nprobe >= nlist:
        # exact mode (every vector probes every bucket): skip the centroid
        # scoring + per-vector ranking window — tagging each vector with all
        # bucket ids needs no shuffle at all, just a broadcast of nlist ids
        probed = vecs.join(
            F.broadcast(centroids.select(F.col("centroid_id").alias("bucket")))
        ).select(F.col("__vid").alias("id"), "v", "bucket")
    else:
        probed = _nearest_buckets(vecs, centroids, "v", nprobe).select(
            F.col("__vid").alias("id"), "v", F.col("centroid_id").alias("bucket"))

    def per_bucket(pdf):
        import numpy as np

        ids = pdf["id"].to_numpy(dtype=np.int64)
        m = np.array(list(pdf["v"]), dtype=np.float64)
        return _pairs_above(ids, m, ids, m, threshold, decimals)

    return (
        probed.groupBy("bucket").applyInPandas(per_bucket, schema=_PAIRS_SCHEMA)
        .distinct()  # a pair can co-occur in several probed buckets
    )


def _nearest_buckets(
    vectors: DataFrame, centroids: DataFrame, vec_alias: str, n_keep: int
) -> DataFrame:
    """Broadcast-join every vector against the (tiny) centroid set, keep the
    ``n_keep`` most-similar centroid ids per vector. All data-side rows are
    scanned once; nothing but slim (id, bucket) rows shuffle."""
    w = Window.partitionBy("__vid").orderBy(
        F.col("__csim").desc(), F.col("centroid_id"))
    return (
        vectors.join(F.broadcast(centroids))
        .withColumn("__csim", cosine(F.col(vec_alias), F.col("cvec")))
        .withColumn("__crk", F.row_number().over(w))
        .where(F.col("__crk") <= n_keep)
        .drop("__csim", "__crk", "cvec")
    )


def ivf_assign(
    df: DataFrame,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Assign each vector to its nearest of ``nlist`` centroids.

    Initial centroids are the vectors whose id hashes lowest
    (deterministic seeded sample — no wall-clock/random dependence,
    reproducible across runs). ``train_iters`` > 0 runs that many Lloyd
    (k-means) refinement rounds — better-balanced buckets, better recall
    at fixed nprobe, and a guard against the hot-bucket memory bound in
    ``cosine_pairs_bucketed``. Left at 0 by default: refined centroid
    means sum floats across partitions, whose order Spark does not fix,
    so bit-exact rerun determinism (which the oracle gates rely on) only
    holds for the sampled init.

    Returns (assigned_df with ``bucket`` column, centroids_df). The
    assignment is a broadcast join + per-vector top-1 — no driver-side
    literal expressions, so plan size is independent of ``nlist``/dim. At
    scale, persist the result partitioned by ``bucket``.
    """
    ranked = df.select(
        F.col(id_col), _as_double(vec_col).alias("v"),
        F.xxhash64(F.col(id_col).cast("string")).alias("h"),
    )
    centroids = (
        ranked.orderBy("h").limit(nlist)
        .select(F.col(id_col).alias("centroid_id"), F.col("v").alias("cvec"))
    )
    vectors = df.select(
        F.col(id_col).alias("__vid"), _as_double(vec_col).alias("v"))
    for _ in range(train_iters):
        centroids = _lloyd_round(vectors, centroids).localCheckpoint(
            eager=True)
    assigned = (
        _nearest_buckets(vectors, centroids, "v", 1)
        .select(F.col("__vid").alias(id_col), "v",
                F.col("centroid_id").alias("bucket"))
    )
    return assigned, centroids


def _lloyd_round(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """One k-means round: assign each vector to its nearest centroid, then
    recompute each centroid as the per-dimension mean of its bucket.

    The mean is computed via posexplode → avg over (bucket, dim) →
    re-assemble sorted by dim: two map-side-combinable shuffles whose keys
    are (bucket, dim) and bucket — never a whole bucket's vectors in one
    place, so a hot bucket costs shuffle volume, not executor memory.
    Empty buckets keep their previous centroid (standard Lloyd fix)."""
    assigned = _nearest_buckets(vectors, centroids, "v", 1).select(
        F.col("centroid_id").alias("bucket"), "v")
    dims = (
        assigned.select("bucket", F.posexplode("v").alias("dim", "x"))
        .groupBy("bucket", "dim").agg(F.avg("x").alias("m"))
    )
    means = (
        dims.groupBy("bucket")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
        .select(F.col("bucket").alias("centroid_id"),
                F.transform("dm", lambda s: s["m"]).alias("cvec"))
    )
    # empty buckets vanish from `means`; keep their old centroid so nlist
    # stays constant
    kept = centroids.join(means.select("centroid_id"), "centroid_id",
                          "anti")
    return means.unionByName(kept)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 4,
) -> DataFrame:
    """Approximate top-k: probe only the ``nprobe`` nearest buckets per
    query. Same output contract as ``cosine_topk``; probes touch
    ~``nprobe/nlist`` of the corpus instead of all of it."""
    assigned, centroids = ivf_assign(corpus, nlist, id_col, vec_col)
    q = queries.select(F.col(id_col).alias("__vid"),
                       _as_double(vec_col).alias("qv"))
    q_probed = (
        _nearest_buckets(q, centroids, "qv", nprobe)
        .select(F.col("__vid").alias("query_id"), "qv",
                F.col("centroid_id").alias("qbucket"))
    )
    scored = (
        assigned.withColumnRenamed(id_col, "neighbor_id")
        .join(F.broadcast(q_probed),
              (F.col("bucket") == F.col("qbucket"))
              & (F.col("query_id") != F.col("neighbor_id")))
        .withColumn("sim", F.round(cosine(F.col("qv"), F.col("v")), decimals))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .select("query_id", "neighbor_id", "sim")
    )


def ivf_knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    nlist: int | None = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 4,
    target_bucket_rows: int = 100_000,
) -> DataFrame:
    """k-NN JOIN for two LARGE embedding tables — the case
    ``cosine_topk`` can't cover (it broadcasts the query side; fine for
    10 queries, impossible for 100M). Both sides bucket against the same
    IVF centroids: the right side is assigned to its nearest bucket, each
    left vector probes its ``nprobe`` nearest buckets, candidates join on
    the bucket id, and a per-left window keeps the top-k. Exact when
    ``nprobe >= nlist``; otherwise recall follows the probe ratio.

    Scale shape: the join key is the bucket id, so the candidate volume
    is ~|L|·|R|·nprobe/nlist with both sides shuffled once — no broadcast
    of either table, no cartesian. ``nlist=None`` auto-sizes from the
    right-side count (``auto_nlist``). Output: (left id aliased
    ``query_id``, ``neighbor_id``, ``sim``); a left row also present in
    right does not match itself."""
    if nlist is None:
        nlist = auto_nlist(right.count(), target_bucket_rows)
    assigned, centroids = ivf_assign(right, nlist, id_col, vec_col)
    lvec = left.select(F.col(id_col).cast("long").alias("__vid"),
                       _as_double(vec_col).alias("lv"))
    if nprobe >= nlist:
        probed = lvec.join(
            F.broadcast(centroids.select(
                F.col("centroid_id").alias("bucket")))
        ).select(F.col("__vid").alias("query_id"), "lv", "bucket")
    else:
        probed = _nearest_buckets(lvec, centroids, "lv", nprobe).select(
            F.col("__vid").alias("query_id"), "lv",
            F.col("centroid_id").alias("bucket"))
    # Scoring rides one applyInPandas per bucket (same BLAS-per-group shape
    # and memory contract as cosine_pairs_bucketed): both roles union into
    # the group, one matmul scores the block, and only each left's bucket-
    # local top-k leaves Python — the global top-k is a subset of the
    # per-bucket top-k unions, so the final window ranks k·nprobe rows per
    # left instead of every candidate. Measured ~4× over evaluating the
    # dot product as interpreted higher-order lambdas per joined pair.
    tagged = probed.select(
        "bucket", F.lit(1).alias("role"),
        F.col("query_id").alias("id"), F.col("lv").alias("v"),
    ).unionByName(assigned.select(
        "bucket", F.lit(0).alias("role"),
        F.col(id_col).cast("long").alias("id"), "v"))

    def per_bucket(pdf):
        import numpy as np
        import pandas as pd

        L = pdf[pdf["role"] == 1]
        R = pdf[pdf["role"] == 0]
        if not len(L) or not len(R):
            return pd.DataFrame(
                {"query_id": pd.Series(dtype="int64"),
                 "neighbor_id": pd.Series(dtype="int64"),
                 "sim": pd.Series(dtype="float64")})
        lids = L["id"].to_numpy(dtype=np.int64)
        rids = R["id"].to_numpy(dtype=np.int64)
        lmat = np.array(list(L["v"]), dtype=np.float64)
        rmat = np.array(list(R["v"]), dtype=np.float64)
        scale = 10.0 ** decimals
        # half-UP rounding like Spark F.round / DuckDB round (np.round is
        # banker's) — keeps exact-mode oracle parity
        sims = np.floor(
            (lmat @ rmat.T)
            / (np.linalg.norm(lmat, axis=1)[:, None]
               * np.linalg.norm(rmat, axis=1)[None, :])
            * scale + 0.5) / scale
        sims[lids[:, None] == rids[None, :]] = -np.inf  # no self-match
        # per-left top-k by (sim desc, neighbor_id asc) — the same order
        # the global window uses, so the union stays a superset of the
        # true top-k
        order = np.lexsort((rids[None, :].repeat(len(lids), 0), -sims),
                           axis=1)[:, :k]
        qi = np.repeat(lids, order.shape[1])
        ni = rids[order.ravel()]
        sv = np.take_along_axis(sims, order, axis=1).ravel()
        keep = sv > -np.inf
        return pd.DataFrame({"query_id": qi[keep], "neighbor_id": ni[keep],
                             "sim": sv[keep]})

    cand = tagged.groupBy("bucket").applyInPandas(
        per_bucket, schema="query_id bigint, neighbor_id bigint, sim double")
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id"))
    return (
        cand.distinct()  # a pair can meet in several probed buckets
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )
