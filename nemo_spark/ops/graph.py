"""Graph operators: distributed transitive closure with path doubling.

The generic rule engine evaluates linear recursion in O(diameter) rounds
(nemo's round-robin fixpoint). For the KG pipeline's closure stage we use the
non-linear doubling form instead::

    tc_{t+1} = tc_t UNION (tc_t JOIN tc_t)

which converges in O(log diameter) rounds — at cluster scale, rounds are
synchronization barriers, so halving round count beats shaving per-round cost.
Semi-naive refinement: a new pair must involve last round's delta on at least
one side (delta JOIN tc  UNION  tc JOIN delta).

Dedup-vs-history / checkpoint cadence follow the engine's pattern
(``nemo/src/execution/planning/operations/duplicates.rs``, defrag
``execution_engine.rs:263-292``).
"""

from __future__ import annotations

import logging
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger("nemo_spark.graph")


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    broadcast_threshold: int = 2_000_000,
    broadcast_max_bytes: int = 64 << 20,
    max_rounds: int = 64,
    small_graph_threshold: int = 10_000,
) -> DataFrame:
    """All (src, dst) pairs reachable via 1+ edges. Columns preserved.

    ``small_graph_threshold`` > 0 (default 10k edges): dimension-sized edge
    lists close on a single task (one job) instead of O(log d) distributed
    rounds — same output; data-sized inputs take the distributed doubling
    path automatically. The default is deliberately smaller than the CC
    threshold: closure OUTPUT is worst-case quadratic in nodes (a 100k-node
    chain closes to 5x10^9 pairs), so the single-task path must stay bounded;
    CC output is linear in nodes, so its threshold can be 10x higher."""
    if (
        small_graph_threshold
        # the single-task path types its output columns from src's type
        # (closure composes dst back into src positions, so the types must
        # agree for the operation to be meaningful anyway)
        and edges.schema[src].dataType == edges.schema[dst].dataType
    ):
        # probe at most threshold+1 rows — never a full count of a
        # 100-TB edge relation just to decide the gate. The same bounded
        # scan counts NULL endpoints, so the small path's separate null
        # probe (a second full derivation of the edge frame = one extra
        # Spark job per closure call) is answered for free.
        both = F.col(src).isNotNull() & F.col(dst).isNotNull()
        row = (
            edges.limit(small_graph_threshold + 1)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.count(F.when(~both, F.lit(1))).alias("n_bad"),
            )
            .first()
        )
        if row["n"] <= small_graph_threshold:
            return _small_graph_tc(edges, src, dst, has_nulls=bool(row["n_bad"]))
    tc = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    delta = tc
    delta_cnt = tc.count()
    rounds = 0
    est_row: float | None = None
    while delta_cnt and rounds < max_rounds:
        rounds += 1
        t0 = time.time()
        d = delta
        if delta_cnt <= broadcast_threshold:
            # the row gate alone would let wide string keys (KG IRIs run
            # 100+ bytes) force multi-hundred-MB broadcasts — an explicit
            # F.broadcast bypasses autoBroadcastJoinThreshold entirely, so
            # estimate bytes from one sample of the (checkpointed) input
            # (key width is stable across rounds; don't re-sample each one)
            if est_row is None:
                sample = tc.limit(256).collect()
                est_row = (
                    sum(
                        sum(len(str(v)) if v is not None else 4 for v in r) + 16
                        for r in sample
                    )
                    / len(sample)
                    if sample
                    else 0.0
                )
            if delta_cnt * est_row <= broadcast_max_bytes:
                d = F.broadcast(delta)
        left = d.alias("l").join(tc.alias("r"), F.col("l.b") == F.col("r.a")).select(
            F.col("l.a").alias("a"), F.col("r.b").alias("b")
        )
        right = tc.alias("l").join(d.alias("r"), F.col("l.b") == F.col("r.a")).select(
            F.col("l.a").alias("a"), F.col("r.b").alias("b")
        )
        cand = left.unionByName(right).dropDuplicates().alias("__d")
        fresh = cand.join(
            tc.alias("__e"),
            # null-safe: plain key equality never matches NULL endpoints, so a
            # null-carrying pair would be "fresh" every round (fixpoint spin)
            F.col("__d.a").eqNullSafe(F.col("__e.a")) & F.col("__d.b").eqNullSafe(F.col("__e.b")),
            how="left_anti",
        ).localCheckpoint(eager=True)
        delta_cnt = fresh.count()
        if delta_cnt:
            tc = tc.unionByName(fresh).localCheckpoint(eager=True)
        delta = fresh
        log.debug("tc doubling round %d fresh=%d %.2fs", rounds, delta_cnt, time.time() - t0)
    return tc.select(F.col("a").alias(src), F.col("b").alias(dst))


def _small_graph_tc(
    edges: DataFrame, src: str, dst: str, has_nulls: bool | None = None
) -> DataFrame:
    """Single-task closure for broadcast-scale graphs (BFS per source).
    ``has_nulls``: pass the caller's probe answer when it already scanned
    every edge (the small-graph gate does) so no second probe job runs.

    NULL endpoints are split off BEFORE the Python task so pandas never sees
    a null-bearing int column (Arrow would widen it to float64, corrupting
    the output dtype). The null algebra then mirrors the distributed path's
    SQL join semantics exactly: a NULL endpoint is carried OUTWARD through
    compositions whose shared key is non-null — (NULL,y)∘(y,z) = (NULL,z),
    (w,x)∘(x,NULL) = (w,NULL), and (NULL,y)…(x,NULL) = (NULL,NULL) — but a
    path never continues THROUGH a NULL (the join key never matches)."""

    def close(parts):
        import pandas as pd

        adj: dict = {}
        for part in parts:
            # positional access: src/dst may not be valid Python
            # identifiers (itertuples would rename them)
            for a, b in zip(part.iloc[:, 0], part.iloc[:, 1]):
                adj.setdefault(a, set()).add(b)
        out_a, out_b = [], []
        for s in adj:
            seen: set = set()
            stack = list(adj[s])
            while stack:
                x = stack.pop()
                if x in seen:
                    continue
                seen.add(x)
                stack.extend(adj.get(x, ()))
            out_a.extend([s] * len(seen))
            out_b.extend(seen)
        yield pd.DataFrame({"a": out_a, "b": out_b})

    from pyspark.sql.types import StructField, StructType

    dt = edges.schema[src].dataType
    schema = StructType([StructField("a", dt), StructField("b", dt)])
    two = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    a_n, b_n = F.col("a").isNotNull(), F.col("b").isNotNull()
    # common case: no NULL endpoints — one cheap short-circuit probe beats
    # carrying the 3-join null algebra in every small closure's plan
    if has_nulls is None:
        has_nulls = not two.where(~a_n | ~b_n).limit(1).isEmpty()
    if not has_nulls:
        return two.coalesce(1).mapInPandas(close, schema=schema).select(
            F.col("a").alias(src), F.col("b").alias(dst)
        )
    closed = two.where(a_n & b_n).coalesce(1).mapInPandas(close, schema=schema)
    s_null = two.where(~a_n & b_n).dropDuplicates()  # (NULL, y)
    d_null = two.where(a_n & ~b_n).dropDuplicates()  # (x, NULL)
    s_ext = s_null.unionByName(
        s_null.alias("s")
        .join(closed.alias("c"), F.col("s.b") == F.col("c.a"))
        .select(F.col("s.a").alias("a"), F.col("c.b").alias("b"))
    )
    d_ext = d_null.unionByName(
        closed.alias("c")
        .join(d_null.alias("d"), F.col("c.b") == F.col("d.a"))
        .select(F.col("c.a").alias("a"), F.col("d.b").alias("b"))
    )
    # (NULL, NULL): a null-source reach meeting a null-sink edge (s_ext
    # already contains every (NULL, w) with w reachable, so one join covers
    # both the direct and the path case), plus literal (NULL, NULL) edges
    sd = (
        s_ext.alias("s")
        .join(d_null.alias("d"), F.col("s.b") == F.col("d.a"))
        .select(F.col("s.a").alias("a"), F.col("d.b").alias("b"))
    )
    both_null = two.where(~a_n & ~b_n)
    nulls = s_ext.unionByName(d_ext).unionByName(sd).unionByName(both_null).dropDuplicates()
    return closed.unionByName(nulls).select(F.col("a").alias(src), F.col("b").alias(dst))
