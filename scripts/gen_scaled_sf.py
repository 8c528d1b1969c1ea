#!/usr/bin/env python
"""Synthesize a larger SF directory from an existing one by key-shifted
replication — the plan-linearity harness behind BENCH_SF1.json.

``python scripts/gen_scaled_sf.py SRC_DIR DST_DIR FACTOR`` writes FACTOR
key-disjoint copies of every fact table in SRC_DIR (dimension tables
``region``/``nation`` stay fixed, exactly as TPC-H holds them constant):

- every synthetic key (``*_orderkey``, ``*_custkey``, ``doc_id``, ...)
  shifts by ``copy * 2**32`` so intra-copy join relationships are preserved
  and cross-copy keys never collide;
- ``documents.text`` gets a per-copy suffix so copies are distinct content —
  exact-dedup groups scale linearly (note: copies of the same document ARE
  near-duplicates of each other, so near-dup PAIR counts scale with
  FACTOR^2 by construction; the headline bench runs signature generation,
  not pair generation, at this scale);
- ``embeddings.embedding`` is rolled by ``copy`` positions (norm-preserving,
  direction-changing) so cross-copy cosine structure stays incidental.

The point is an empirical super-linearity check: run bench.py on DST_DIR
and compare per-query walls against SRC_DIR — a query whose plan hides a
quadratic stage shows a FACTOR^2 ratio here long before it melts a cluster.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, functions as F

STRIDE = 2**32

# per-table key columns to shift by copy*STRIDE; dims (region, nation) fixed
KEYS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]


def scaled_copies(df: DataFrame, table: str, factor: int) -> DataFrame:
    copies = []
    for i in range(factor):
        c = df
        for k in KEYS[table]:
            c = c.withColumn(k, (F.col(k).cast("bigint") + F.lit(i * STRIDE)).alias(k))
        if table == "documents" and i > 0:
            c = c.withColumn("text", F.concat(F.col("text"), F.lit(f" copy {i}")))
            c = c.withColumn("n_chars", F.length("text").cast("long"))
        if table == "embeddings" and i > 0:
            n = F.size("embedding")
            roll = F.lit(i)
            c = c.withColumn(
                "embedding",
                F.when(n > roll, F.concat(F.slice("embedding", roll + 1, n - roll), F.slice("embedding", 1, roll)))
                .otherwise(F.col("embedding")),
            )
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def main(src: str, dst: str, factor: int) -> None:
    from nemo_spark.session import get_spark

    spark = get_spark(app_name="gen_scaled_sf")
    os.makedirs(dst, exist_ok=True)
    for table in DIMS:
        spark.read.parquet(os.path.join(src, f"{table}.parquet")).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(dst, f"{table}.parquet"))
    for table, _ in KEYS.items():
        df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
        scaled_copies(df, table, factor).write.mode("overwrite").parquet(
            os.path.join(dst, f"{table}.parquet")
        )
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
