"""Entity linking: mention alias -> candidate entities with scores.

Design (north-star contract): candidates come from a broadcast-joined alias
dictionary; fuzzy candidates are scored with character-3-gram Jaccard
similarity computed as Catalyst array ops (JVM-side); an Arrow-batched scorer
is provided for pluggable similarity models. The dictionary is the small side
(entities/aliases ≪ mentions), so the join is always a broadcast hash join —
no shuffle of the mention table.

nemo analogy: linking-by-dictionary is a join against an EDB relation;
the score column is a nemo Function op (``tabular/operations/function.rs``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def char_ngrams(col, n: int = 3):
    """Distinct character n-grams of a string column, as array<string> (Catalyst)."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(col) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substr(col, i, F.lit(n))))


def jaccard(a, b):
    """Jaccard similarity of two array<string> columns (Catalyst, no UDF)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(F.lit(0.0))


def link_exact(mentions: DataFrame, alias_dict: DataFrame, mention_col: str = "subj_alias") -> DataFrame:
    """Exact-alias candidates: broadcast hash join mention -> entity."""
    d = F.broadcast(alias_dict)
    return mentions.join(d, on=mentions[mention_col] == d["alias"], how="inner").drop("alias")


def link_scored(
    mentions: DataFrame,
    alias_dict: DataFrame,
    mention_col: str = "mention",
    min_score: float = 0.5,
) -> DataFrame:
    """Fuzzy candidates: score every (mention, alias) pair whose aliases share
    a first character (cheap blocking), by char-3gram Jaccard. Input mentions
    must have a ``mention`` column; output adds (entity_id, score).

    At scale the dictionary stays broadcastable (entity vocabularies are
    dimension-sized); the blocking key keeps the candidate blow-up linear.

    Failure mode to watch: blocking on the FIRST CHARACTER gives only a
    ~36-way split, so each mention still meets ~1/36 of the dictionary. That
    is fine while the dictionary is dimension-sized (10k–1M aliases), but a
    10M-alias dictionary makes per-block candidate sets quadratic-ish; at
    that size switch the blocking key to the first character PAIR (~1300-way)
    or reuse the 3-gram LSH banding from ops/dedup.py, both of which keep
    this join's output linear without changing its semantics.
    """
    m = mentions.withColumn("__mg", char_ngrams(F.col(mention_col))).withColumn(
        "__blk", F.substr(F.col(mention_col), F.lit(1), F.lit(1))
    )
    d = alias_dict.withColumn("__ag", char_ngrams(F.col("alias"))).withColumn(
        "__blk", F.substr(F.col("alias"), F.lit(1), F.lit(1))
    )
    cand = m.join(F.broadcast(d), on="__blk", how="inner")
    scored = cand.withColumn("score", jaccard(F.col("__mg"), F.col("__ag"))).filter(
        F.col("score") >= F.lit(min_score)
    )
    return scored.drop("__mg", "__ag", "__blk")


def best_candidate(scored: DataFrame, key_cols: list[str], score_col: str = "score") -> DataFrame:
    """Keep the best-scoring candidate per key; ties broken by MIN entity_id
    (matches the hash-min canonicalization convention).

    min(struct(-score, entity_id)) — a single partial-aggregating groupBy,
    no window sort."""
    strukt = F.struct((-F.col(score_col)).alias("ns"), F.col("entity_id").alias("e"))
    return (
        scored.groupBy(*key_cols)
        .agg(F.min(strukt).alias("__best"))
        .select(*key_cols, F.col("__best.e").alias("entity_id"), (-F.col("__best.ns")).alias(score_col))
    )
