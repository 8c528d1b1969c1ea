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

    dim = len(query_vec)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            # NULL embedding => zero vector => score 0.0, matching the
            # Catalyst path's when(norm > 0) guard instead of crashing
            m = np.stack(
                pdf[vec_col]
                .map(lambda v: np.zeros(dim) if v is None else np.asarray(v, dtype="float64"))
                .to_numpy()
            )
            norms = np.linalg.norm(m, axis=1) * qn
            s = np.divide(m @ qv, norms, out=np.zeros(len(m)), where=norms > 0)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "score": s})

    id_type = embeddings.schema[id_col].dataType.simpleString()
    return embeddings.select(id_col, vec_col).mapInPandas(
        score, schema=f"{id_col} {id_type}, score double"
    )


def plane_component(p: int, j: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1].

    Pure integer arithmetic (splitmix64 finalizer over the packed (p, j)
    seed), computed driver-side and embedded as a literal — so an external
    oracle (DuckDB) can reproduce the exact same plane, bit-for-bit, with no
    libm (sin/cos) cross-engine drift.

    The finalizer's avalanche matters, not just determinism: an earlier
    AFFINE hash (h linear in p) made plane p+22 nearly parallel to plane p
    (measured |cos| up to 0.9993), so "independent" LSH bands shared bits
    and band-OR recall silently degraded by an order of magnitude."""
    mask = (1 << 64) - 1
    x = (((p & 0xFFFFFFFF) << 32) | (j & 0xFFFFFFFF)) & mask
    x = (x + 0x9E3779B97F4A7C15) & mask
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & mask
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & mask
    x = x ^ (x >> 31)
    return (x >> 11) / float((1 << 53) - 1) * 2.0 - 1.0


def plane(p: int, dim: int) -> list[float]:
    return [plane_component(p, j) for j in range(dim)]


def _dim_checked(vec: Column, dim: int) -> Column:
    """Fail LOUDLY when a vector's length disagrees with ``dim``.

    ``zip_with`` null-pads the shorter array, one null poisons the dot
    product to NULL, and the sign test's otherwise-branch then writes
    sig/bucket 0 for EVERY row — silently degenerating the (band, sig)
    equi-join into a per-band cross product and making bucketed top-k
    return empty. assert_true raises at the first mismatched row instead.
    A NULL vector also fails (the banded path has no zero-vector
    convention to degrade to) — coalesce keeps the error message readable
    instead of letting NULL poison it to a literal null message."""
    ok = F.assert_true(
        F.size(vec) == dim,
        F.concat(
            F.lit(f"embedding dim mismatch: expected {dim}, got "),
            F.coalesce(F.size(vec).cast("string"), F.lit("NULL vector")),
        ),
    )
    return F.when(ok.isNull(), vec)


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    exact: bool = False,
    n_bands: int = 16,
    band_planes: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b, score) with a < b and
    cosine >= threshold.

    DEFAULT (scale path): banded random-hyperplane LSH — ``n_bands`` bands of
    ``band_planes`` sign bits each; a pair is a candidate iff it agrees on all
    bits of at least one band (band-OR recall). Candidates come from an
    equi-self-join on (band, signature) — never an all-pairs cartesian /
    BroadcastNestedLoopJoin — then pair-dedup and exact cosine verify.

    Sizing (sign-LSH math, planes independent): a true pair at angle θ
    agrees per plane with prob 1-θ/π, so recall = 1-(1-(1-θ/π)^r)^b; an
    UNRELATED (near-orthogonal) pair collides per band with prob ~0.5^r,
    feeding ~b/2^r of all pairs into the exact verify. Defaults r=8, b=16:
    recall 0.996 at cosine 0.9 and ~6% random-pair candidate rate with
    16x256 join keys. r=4 halves the work per row but admits ~40% of ALL
    pairs as candidates (effectively quadratic) — never use r<8 beyond
    dimension-sized inputs. At >= 1M rows push r to 12-16 and raise b to
    hold the recall target; join-key cardinality b*2^r must comfortably
    exceed the shuffle partition count or the verify stage skews.

    ``exact=True``: all-pairs quadratic path (only for dimension-sized or
    per-bucket candidate sets — this is the correctness oracle, not the
    100-TB plan)."""
    if not exact:
        # the banded signature is n_bands*band_planes interpreted dot
        # products of dim components PER ROW — the heaviest per-row math in
        # this module; spread a single-split source across the cores
        # (gated: no-op when the scan already has >= cores splits)
        from nemo_spark.session import fan_out

        embeddings = fan_out(embeddings)
    # the exact path is dim-agnostic (pure pairwise cosine) — only the LSH
    # branch projects onto dim-sized planes and needs the guard
    src = embeddings.select(
        F.col(id_col),
        (F.col(vec_col) if exact else _dim_checked(F.col(vec_col), dim)).alias(vec_col),
    )
    if exact:
        a = src.select(F.col(id_col).alias("a"), F.col(vec_col).alias("__va"))
        b = src.select(F.col(id_col).alias("b"), F.col(vec_col).alias("__vb"))
        pairs = a.join(b, a["a"] < b["b"])
    else:
        sigs = []
        for band in range(n_bands):
            sig = F.lit(0).cast("long")
            for p in range(band_planes):
                pl = F.array(
                    *[F.lit(plane_component(band * band_planes + p, j)) for j in range(dim)]
                )
                sig = sig + F.when(
                    dot(F.col(vec_col), pl) > 0, F.lit(1 << p).cast("long")
                ).otherwise(F.lit(0).cast("long"))
            sigs.append(F.struct(F.lit(band).alias("band"), sig.alias("sig")))
        # explode (id, band, sig) ONLY — carrying the vector through the
        # explode would replicate the dominant payload n_bands times into
        # the self-join shuffle (~16x shuffle bytes); vectors rejoin by id
        # after pair-dedup, which re-scans the (columnar, pruned) source
        # twice instead — far cheaper than shuffling 16x vectors
        e = src.select(F.col(id_col), F.explode(F.array(*sigs)).alias("bs")).select(
            F.col(id_col), F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
        )
        a = e.select(F.col(id_col).alias("a"), "band", "sig")
        b = e.select(F.col(id_col).alias("b"), "band", "sig")
        cand = (
            a.join(b, on=["band", "sig"])
            .filter(F.col("a") < F.col("b"))
            .dropDuplicates(["a", "b"])  # same pair may collide in several bands
        )
        va = src.select(F.col(id_col).alias("a"), F.col(vec_col).alias("__va"))
        vb = src.select(F.col(id_col).alias("b"), F.col(vec_col).alias("__vb"))
        pairs = cand.join(va, on="a").join(vb, on="b")
    scored = pairs.withColumn("score", cosine(F.col("__va"), F.col("__vb")))
    return scored.filter(F.col("score") >= threshold).select("a", "b", "score")


def lsh_buckets(embeddings: DataFrame, n_planes: int = 8, dim: int = 64, vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane LSH bucket id per row (deterministic integer-hash
    planes — reproducible by an external SQL oracle, see plane_component)."""
    from nemo_spark.session import fan_out

    embeddings = fan_out(embeddings)  # n_planes interpreted dots per row
    checked = _dim_checked(F.col(vec_col), dim)
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        pl = F.array(*[F.lit(plane_component(p, j)) for j in range(dim)])
        d = dot(checked, pl)
        bucket = bucket + F.when(d > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return embeddings.withColumn("bucket", bucket)


def query_bucket(query_vec: list[float], n_planes: int = 8) -> int:
    """Driver-side bucket id of a query vector (same planes as lsh_buckets)."""
    qb = 0
    for p in range(n_planes):
        d = sum(query_vec[j] * plane_component(p, j) for j in range(len(query_vec)))
        if d > 0:
            qb |= 1 << p
    return qb


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
    qb = query_bucket(query_vec, n_planes=n_planes)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = with_b.filter(F.col("bucket") == qb).select(F.col(id_col), cosine(F.col(vec_col), q).alias("score"))
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
