"""Text-analysis operators for training-data pipelines, all Catalyst-side.

Language-ID (stopword n-gram heuristic), quality scoring (length / punctuation
/ stopword ratios), token counting, and rolling-hash document fingerprinting —
every operator is a pure DataFrame transform (whole-stage codegen, no Python),
so it scales linearly with input splits at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_tokens / n_distinct_tokens (whitespace tokenization)."""
    t = tokens(F.col(text_col))
    return df.withColumn("n_tokens", F.size(t).cast("long")).withColumn(
        "n_distinct_tokens", F.size(F.array_distinct(t)).cast("long")
    )


def stopword_count(text: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    return F.size(F.filter(tokens(text), lambda x: x.isin(*stopwords))).cast("long")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword quality signals per document."""
    t = F.col(text_col)
    n_tok = F.size(tokens(t)).cast("long")
    n_stop = stopword_count(t)
    return (
        df.withColumn("n_chars_actual", F.length(t).cast("long"))
        .withColumn("n_dots", (F.length(t) - F.length(F.replace(t, F.lit("."), F.lit("")))).cast("long"))
        .withColumn("n_tokens", n_tok)
        .withColumn("n_stopwords", n_stop)
        .withColumn(
            "stopword_ratio",
            F.when(n_tok > 0, n_stop.cast("double") / n_tok.cast("double")).otherwise(F.lit(0.0)),
        )
    )


def langid_heuristic(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Tiny deterministic language-ID: English stopword density threshold.
    (A real model would be an Arrow-batched UDF; the heuristic keeps the
    operator JVM-side and exactly reproducible.)"""
    t = F.col(text_col)
    n_tok = F.size(tokens(t)).cast("long")
    n_stop = stopword_count(t)
    ratio = F.when(n_tok > 0, n_stop.cast("double") / n_tok.cast("double")).otherwise(F.lit(0.0))
    return df.withColumn("en_score", ratio).withColumn("pred_lang", F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("other")))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the token-normalized text
    (the exact-dedup key) + a 64-bit rolling-style hash (xxhash64)."""
    norm = F.array_join(tokens(F.col(text_col)), " ")
    return df.withColumn("fp_md5", F.md5(F.encode(norm, "UTF-8"))).withColumn(
        "fp_xx64", F.xxhash64(norm)
    )
