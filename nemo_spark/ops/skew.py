"""Explicit skew handling: salted joins and hot-key detection.

The session enables AQE skew-join splitting (session.py), which handles
skewed SORT-MERGE joins at runtime by splitting oversized partitions — that
is the first line of defense and needs no code. Explicit SALTING is the
complement for the cases AQE cannot fix:

- a shuffled hash/merge join where one key is so hot that even a split
  partition's build side is a single giant hash bucket,
- pre-partitioning a dataset by a skewed key for downstream stages that
  reuse the partitioning (AQE only fixes the one join it re-plans).

``salted_join`` replicates the SMALL side ``salt_factor`` ways (explode over
the salt range) and tags the big side with a deterministic per-row salt, so
the hot key's rows spread across ``salt_factor`` reducers; the join result
is row-identical to the unsalted join (inner/left semantics preserved —
every big-side row meets exactly one replica of each matching small row).

North-rule context: entity linking normally BROADCASTS the alias dictionary
(kg/link.py), which is immune to skew; salting is the documented fallback
when a dimension outgrows the broadcast threshold but a handful of entities
(hot conversations, celebrity entities) dominate the key distribution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "top_keys"]


def top_keys(df: DataFrame, key: str, n: int = 20) -> DataFrame:
    """The n heaviest keys with their row counts — the cheap skew probe to
    decide whether salting is worth a plan change (one partial-aggregated
    shuffle + TakeOrdered, no full sort)."""
    return df.groupBy(key).agg(F.count(F.lit(1)).alias("n_rows")).orderBy(
        F.col("n_rows").desc()
    ).limit(n)


def _row_salt(df: DataFrame, salt_factor: int) -> Column:
    # deterministic per-row salt beats rand(): retries/speculative tasks
    # recompute identical salts, so the join stays exactly-once under
    # failure (rand() re-rolls per attempt and can drop/duplicate matches
    # mid-stage). Hash the hashable columns (xxhash64 rejects MapType —
    # a properties map column must not break the join); modulo spreads
    # uniformly.
    from pyspark.sql.types import ArrayType, MapType, StructType

    def hashable(dt) -> bool:
        # xxhash64 rejects MapType RECURSIVELY (maps nested inside structs
        # or arrays fail analysis too)
        if isinstance(dt, MapType):
            return False
        if isinstance(dt, ArrayType):
            return hashable(dt.elementType)
        if isinstance(dt, StructType):
            return all(hashable(f.dataType) for f in dt.fields)
        return True

    cols = [f.name for f in df.schema.fields if hashable(f.dataType)]
    if not cols:  # degenerate all-map frame: constant salt, still correct
        return F.lit(0)
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt_factor))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    salt_factor: int = 16,
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``salt_factor``
    reducers. Row-identical to ``big.join(small, on, how)``.

    ``small`` is replicated salt_factor times (explode), so its shuffle
    volume grows by that factor — use for dimension-vs-fact joins where the
    dimension exceeds the broadcast threshold but replication is still
    cheap. ``how`` supports inner / left / left_semi / left_anti (the
    replicated-right shapes that preserve row identity).

    Caveat: the salt is a CONTENT hash (deterministic => retry-safe), so
    byte-identical duplicate rows of a hot key all land on one salt and are
    not spread. Dedupe first, or carry a unique id column — it is hashed
    automatically and restores the spread."""
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(f"salted_join does not preserve semantics for how={how!r}")
    if salt_factor < 1:
        # salt_factor=0 would explode small to ZERO rows and pmod to NULL —
        # a silently empty (inner) or all-null-matched (left) join
        raise ValueError(f"salt_factor must be >= 1, got {salt_factor}")
    b = big.withColumn("__salt", _row_salt(big, salt_factor))
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )
    out = b.join(s, on=keys + ["__salt"], how=how)
    return out.drop("__salt")
