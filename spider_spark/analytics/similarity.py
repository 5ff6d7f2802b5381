"""Approximate nearest-neighbor search over an embedding column.

Two paths over ``embeddings(vec_id, embedding: array<float>, ...)``:

  brute-force top-k — broadcast the (small) query set, JVM-side cosine
      via zip_with/aggregate, per-query top-k window.  The correctness
      baseline, and the right plan whenever |queries| is small: one scan
      of the corpus, no shuffle until the final (tiny) top-k.

  LSH-bucketed      — random-hyperplane signatures (seeded, Arrow UDF)
      → probe only matching buckets (multi-probe: flip each bit once) →
      exact cosine verify on candidates.  The scale path: candidate set
      per query is |bucket| rather than |corpus|.

  IVF (coarse k-means) — deterministic seeded centroid init from data
      sample, few Lloyd iterations in numpy on a driver sample, then
      assignment is a broadcast-matmul Arrow UDF; queries probe the
      nearest n_probe cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, IntegerType, LongType


def cosine_expr(a, b):
    """JVM-side cosine similarity between two array<float/double> cols
    (zip_with dot product; stays in whole-stage codegen).

    Inputs are cast to array<double> BEFORE the products so the whole
    computation (product, sequential left fold, norms) runs in float64
    — bit-identical to DuckDB's list_cosine_similarity over DOUBLE[],
    which the oracle twins rely on (float32 products differ by ~1e-7
    and can flip a value across the 1e-6 rounding boundary)."""
    a = a.cast("array<double>")
    b = b.cast("array<double>")
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / F.greatest(na * nb, F.lit(1e-12))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, rank,
    cosine).  Queries are broadcast; corpus is scanned once."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cosine", cosine_expr(F.col("qvec"), F.col("cvec"))
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                F.col("cosine").cast("double").alias("cosine"))
    )


def make_hyperplane_udf(dim: int, n_bits: int = 16, seed: int = 42):
    """Arrow UDF: embedding -> int LSH signature (sign of n_bits random
    projections).  Batch matmul in numpy."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_bits))

    def _batch(vecs: pd.Series) -> pd.Series:
        mat = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (mat @ planes) > 0
        sig = np.zeros(len(vecs), dtype=np.int64)
        for b in range(n_bits):
            sig |= bits[:, b].astype(np.int64) << b
        return pd.Series(sig)

    return pandas_udf(_batch, LongType())


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_bits: int = 12,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH buckets + exact cosine verify.
    With multiprobe, each query also probes the n_bits single-bit-flip
    neighbor buckets (recall boost at n_bits extra candidates/query)."""
    sig = make_hyperplane_udf(dim, n_bits, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    ).withColumn("bucket", sig("cvec"))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    ).withColumn("sig", sig("qvec"))
    if multiprobe:
        probes = F.array(
            F.col("sig"),
            *[F.col("sig").bitwiseXOR(F.lit(1 << b)) for b in range(n_bits)],
        )
    else:
        probes = F.array(F.col("sig"))
    q = q.select("query_id", "qvec", F.explode(probes).alias("bucket"))
    cand = c.join(F.broadcast(q), "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cand.withColumn("cosine", cosine_expr(F.col("qvec"), F.col("cvec")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                F.col("cosine").cast("double").alias("cosine"))
    )


def embedding_near_duplicates(
    corpus: DataFrame,
    dim: int,
    cosine_threshold: float = 0.95,
    n_bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH self-join + exact verify:
    (doc_id, doc_id2, cosine)."""
    sig = make_hyperplane_udf(dim, n_bits, seed)
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")) \
        .withColumn("bucket", sig("vec"))
    l, r = c.alias("l"), c.alias("r")
    cand = l.join(
        r,
        (F.col("l.bucket") == F.col("r.bucket"))
        & (F.col("l.id") < F.col("r.id")),
    ).select(
        F.col("l.id").alias("doc_id"), F.col("r.id").alias("doc_id2"),
        F.col("l.vec").alias("v1"), F.col("r.vec").alias("v2"),
    )
    return (
        cand.withColumn("cosine", cosine_expr(F.col("v1"), F.col("v2")))
        .filter(F.col("cosine") >= cosine_threshold)
        .select("doc_id", "doc_id2", F.col("cosine").cast("double").alias("cosine"))
    )


def ivf_build(
    corpus: DataFrame,
    dim: int,
    n_cells: int = 16,
    sample: int = 2048,
    iters: int = 5,
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Coarse k-means centroids from a deterministic sample (driver-side
    numpy Lloyd iterations — centroids are tiny; assignment stays
    distributed)."""
    rows = (
        corpus.select(vec_col).orderBy(F.xxhash64(vec_col)).limit(sample).collect()
    )
    x = np.vstack([np.asarray(r[0], dtype=np.float64) for r in rows])
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = x[m].mean(0)
    return cent


def make_ivf_assign_udf(centroids: np.ndarray):
    cent = centroids

    def _batch(vecs: pd.Series) -> pd.Series:
        mat = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        d = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        return pd.Series(d.argmin(1).astype(np.int32))

    return pandas_udf(_batch, IntegerType())


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: assign corpus to cells once; queries probe their
    n_probe nearest cells; exact cosine within probed cells."""
    assign = make_ivf_assign_udf(centroids)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    ).withColumn("cell", assign("cvec"))

    cent = centroids

    def _probe(vecs: pd.Series) -> pd.Series:
        mat = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        d = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        order = np.argsort(d, axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(order))

    probe_udf = pandas_udf(_probe, ArrayType(IntegerType()))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    ).withColumn("cell", F.explode(probe_udf(F.col("qvec"))))

    cand = c.join(F.broadcast(q), "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cand.withColumn("cosine", cosine_expr(F.col("qvec"), F.col("cvec")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                F.col("cosine").cast("double").alias("cosine"))
    )


def kmeans_lloyd(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd k-means over an embedding column: returns the
    final (id, cluster) assignment after ``iters`` iterations.

    This is the fully-distributed complement to ``ivf_build`` (which
    trains on a driver-side sample): here every assignment pass is one
    narrow, shuffle-free scan — per-centroid squared-L2 distances are
    JVM ``zip_with``/``aggregate`` expressions over broadcast-literal
    centroids, argmin is ``array_position(dists, array_min(dists))``
    (ties break to the lowest cluster id) — and every update pass is
    one ``groupBy(cluster)`` with per-dimension ``avg``, i.e. a single
    map-side-combined shuffle of k×dim partial sums.  Only the k×dim
    centroid matrix ever reaches the driver (k rows per iteration),
    the same collect-the-tiny-state pattern as pagerank's vertex
    count: at 10^10 vectors the per-iteration cost is one scan + one
    k-row shuffle, and nothing driver-side grows with the corpus.

    Determinism contract (shared with the DuckDB oracle twin): init
    centroids are the first k vectors by id; every centroid (including
    init) is rounded to 6 decimals before use, and distances are
    rounded to 9 decimals before the argmin, so sum-order float drift
    (JVM left-fold vs SQL SUM) can never flip an assignment.

    Empty clusters keep their previous centroid (no re-seeding), so a
    run is a pure function of (corpus, k, iters).
    """
    pts = corpus.select(
        F.col(id_col).alias("_kid"), F.col(vec_col).cast("array<double>").alias("_kv")
    )
    pts = pts.persist()
    try:
        seed_rows = pts.orderBy("_kid").limit(k).collect()
        dim = len(seed_rows[0]["_kv"])
        cent = [[round(float(x), 6) for x in r["_kv"]] for r in seed_rows]

        def assign_col(cent):
            dists = [
                F.round(
                    F.aggregate(
                        F.zip_with(
                            F.col("_kv"),
                            F.array(*[F.lit(c) for c in cj]),
                            lambda x, y: (x - y) * (x - y),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ),
                    9,
                )
                for cj in cent
            ]
            darr = F.array(*dists)
            return (F.array_position(darr, F.array_min(darr)) - 1).cast("int")

        assigned = None
        for it in range(iters):
            assigned = pts.withColumn("cluster", assign_col(cent))
            if it == iters - 1:
                break
            means = (
                assigned.groupBy("cluster")
                .agg(*[F.avg(F.element_at("_kv", i + 1)).alias(f"m{i}")
                       for i in range(dim)])
                .collect()
            )
            new_cent = list(cent)  # empty cluster -> keep old centroid
            for r in means:
                new_cent[r["cluster"]] = [round(float(r[f"m{i}"]), 6)
                                          for i in range(dim)]
            cent = new_cent
        return assigned.select(F.col("_kid").alias(id_col), "cluster")
    finally:
        pts.unpersist()
