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
        # probe at most threshold+1 rows — never a full count of a
        # 100-TB edge relation just to decide the gate
        and edges.limit(small_graph_threshold + 1).count() <= small_graph_threshold
    ):
        return _small_graph_tc(edges, src, dst)
    tc = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    delta = tc
    delta_cnt = tc.count()
    rounds = 0
    while delta_cnt and rounds < max_rounds:
        rounds += 1
        t0 = time.time()
        d = F.broadcast(delta) if delta_cnt <= broadcast_threshold else delta
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


def _small_graph_tc(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Single-task closure for broadcast-scale graphs (BFS per source)."""

    def close(parts):
        import pandas as pd
        from collections import defaultdict

        adj = defaultdict(set)
        for part in parts:
            for r in part.itertuples(index=False):
                adj[getattr(r, src)].add(getattr(r, dst))
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
        yield pd.DataFrame({src: out_a, dst: out_b})

    typ = edges.schema[src].dataType.simpleString()
    return edges.coalesce(1).mapInPandas(close, schema=f"{src} {typ}, {dst} {typ}")
