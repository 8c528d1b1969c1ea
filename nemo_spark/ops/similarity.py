"""Similarity search over embedding columns (array<float>).

- :func:`cosine` — Catalyst-only cosine between two array columns (zip_with +
  aggregate, computed in double).
- :func:`brute_force_topk` — exact top-k vs one query vector: broadcast the
  query, score every row, take top-k. One pass, no shuffle except the final
  top-k (which is a driver-side k-row takeOrdered — cheap).
- :func:`lsh_buckets` / :func:`bucketed_topk` — the scale path: random-
  hyperplane LSH (sign of dot with deterministic seed planes) buckets vectors;
  queries only scan their bucket. Plane seeds are hash-derived (stable across
  runs/executors, no RNG state).
- :func:`pandas_cosine_scores` — Arrow-batched vectorized scorer (numpy dot),
  the faster path when k or the candidate set is large.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors of a literal query vector, cosine-scored."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(F.col(id_col), cosine(F.col(vec_col), q).alias("score"))
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def pandas_cosine_scores(
    embeddings: DataFrame, query_vec: list[float], id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Arrow-batched numpy scorer — same output as the Catalyst path."""
    import numpy as np

    qv = np.asarray(query_vec, dtype="float64")
    qn = float(np.linalg.norm(qv))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype="float64")).to_numpy())
            norms = np.linalg.norm(m, axis=1) * qn
            s = np.divide(m @ qv, norms, out=np.zeros(len(m)), where=norms > 0)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "score": s})

    return embeddings.select(id_col, vec_col).mapInPandas(score, schema=f"{id_col} long, score double")


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_lsh: bool = False,
    n_planes: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b, score) with a < b and
    cosine >= threshold.

    Exact mode joins all pairs (quadratic — fine for dimension-sized or
    per-bucket sets). ``use_lsh=True`` is the scale path: only pairs sharing
    a random-hyperplane LSH bucket are scored, turning the self-join into a
    bucket-local one (recall < 1 near the threshold boundary)."""
    src = embeddings.select(F.col(id_col), F.col(vec_col))
    if use_lsh:
        dim = len(src.first()[vec_col])
        src = lsh_buckets(src, n_planes=n_planes, dim=dim, vec_col=vec_col)
        join_cond = ["bucket"]
        a = src.select(F.col(id_col).alias("a"), F.col(vec_col).alias("__va"), "bucket")
        b = src.select(F.col(id_col).alias("b"), F.col(vec_col).alias("__vb"), "bucket")
        pairs = a.join(b, on=join_cond).filter(F.col("a") < F.col("b"))
    else:
        a = src.select(F.col(id_col).alias("a"), F.col(vec_col).alias("__va"))
        b = src.select(F.col(id_col).alias("b"), F.col(vec_col).alias("__vb"))
        pairs = a.join(b, a["a"] < b["b"])
    scored = pairs.withColumn("score", cosine(F.col("__va"), F.col("__vb")))
    return scored.filter(F.col("score") >= threshold).select("a", "b", "score")


def lsh_buckets(embeddings: DataFrame, n_planes: int = 8, dim: int = 64, vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane LSH bucket id per row (deterministic planes).

    Plane p component j = hash-derived pseudo-random in [-1, 1]:
    sin(xxhash64(p, j) mod 10^6) style — stable, seedless, engine-local."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[_plane_component(p, j) for j in range(dim)])
        d = dot(F.col(vec_col), plane)
        bucket = bucket + F.when(d > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return embeddings.withColumn("bucket", bucket)


def _plane_component(p: int, j: int) -> Column:
    return F.sin(F.lit(float(p * 1_000_003 + j * 7_919 + 1)))


def bucketed_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: score only rows in the query's LSH bucket (recall < 1, ~2^planes
    speedup). At 100 TB: partition the table by bucket (Iceberg partition
    spec) so a query prunes to one partition's files."""
    dim = len(query_vec)
    with_b = lsh_buckets(embeddings, n_planes=n_planes, dim=dim, vec_col=vec_col)
    import math

    qb = 0
    for p in range(n_planes):
        d = sum(query_vec[j] * math.sin(float(p * 1_000_003 + j * 7_919 + 1)) for j in range(dim))
        if d > 0:
            qb |= 1 << p
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = with_b.filter(F.col("bucket") == qb).select(F.col(id_col), cosine(F.col(vec_col), q).alias("score"))
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
