"""Deduplication operators for web-scale corpora.

All families are DataFrame-native and shuffle-minimal:

- exact:      hash-groupBy on a content digest (one shuffle on the digest)
- minhash:    token-shingle MinHash signatures, banded for LSH; candidate
              pairs come from a self-join on (band, band_minhash) buckets —
              only bucket-colliding docs ever meet, never O(n^2)
- simhash:    64-bit per-token-hash bit-majority signature; near-dups share
              signatures or low Hamming distance within buckets
- ngram jaccard: exact verification of LSH candidates (array_intersect/union)

Hash function choice: md5 (not xxhash) for anything oracle-checked — md5 is
bit-identical across Spark, DuckDB and Python, making every operator
cross-engine verifiable. Swap to xxhash64 for pure-Spark production speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nemo_spark.ops.text import tokens


def exact_dedup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(h, canonical_id, n): one row per distinct content digest; canonical =
    min id in the group. Filter n > 1 for duplicate clusters."""
    return (
        df.groupBy(F.md5(F.encode(F.col(text_col), "UTF-8")).alias("h"))
        .agg(F.min(id_col).cast("long").alias("canonical_id"), F.count(F.lit(1)).alias("n"))
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one representative (min id) per exact content group."""
    h = F.md5(F.encode(F.col(text_col), "UTF-8"))
    strukt = F.struct(F.col(id_col).alias("i"))
    keep = df.withColumn("__h", h).groupBy("__h").agg(F.min(strukt).alias("__k"))
    return (
        df.withColumn("__h", h)
        .join(keep.select("__h", F.col("__k.i").alias(id_col)), on=["__h", id_col], how="inner")
        .drop("__h")
    )


def token_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-token shingles as array<string> (empty when < k tokens —
    guards ANSI out-of-bounds element_at)."""
    toks = tokens(text)
    n = F.size(toks)
    shingle = lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)])  # noqa: E731
    return F.when(
        n >= k, F.array_distinct(F.transform(F.sequence(F.lit(1), n - (k - 1)), shingle))
    ).otherwise(F.array().cast("array<string>"))


def minhash_signature(text: Column, bands: int = 4, k: int = 3) -> list[Column]:
    """One MinHash value per band: min over shingles of md5(band_salt|shingle).

    String-min over hex digests == numeric min over the 128-bit hash —
    portable to any engine with md5."""
    sh = token_shingles(text, k)

    def salted(b: int):
        prefix = f"b{b}|"
        # single-parameter lambda: pyspark passes (element, index) to
        # two-parameter callables, which would corrupt a default-arg capture
        return lambda s: F.md5(F.encode(F.concat(F.lit(prefix), s), "UTF-8"))

    return [F.array_min(F.transform(sh, salted(b))).alias(f"band{b}") for b in range(bands)]


def minhash_bands(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bands: int = 4) -> DataFrame:
    return df.select(F.col(id_col), *minhash_signature(F.col(text_col), bands=bands))


def lsh_candidate_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bands: int = 4) -> DataFrame:
    """(a, b) candidate near-dup pairs: docs sharing any band minhash.
    Self-join per band on the band value — bucket sizes bound the work."""
    sig = minhash_bands(df, id_col, text_col, bands)
    pairs = None
    for b in range(bands):
        left = sig.select(F.col(id_col).alias("a"), F.col(f"band{b}").alias("__v"))
        right = sig.select(F.col(id_col).alias("b"), F.col(f"band{b}").alias("__v"))
        p = left.join(right, on="__v").filter(F.col("a") < F.col("b")).select("a", "b")
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.dropDuplicates()


def jaccard_verify(
    pairs: DataFrame, df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3, threshold: float = 0.8
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs; keeps pairs >= threshold."""
    sh = df.select(F.col(id_col).alias("__id"), token_shingles(F.col(text_col), k).alias("__sh"))
    a = sh.select(F.col("__id").alias("a"), F.col("__sh").alias("__sa"))
    b = sh.select(F.col("__id").alias("b"), F.col("__sh").alias("__sb"))
    j = (
        pairs.join(a, on="a").join(b, on="b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("__sa", "__sb")).cast("double")
            / F.size(F.array_union("__sa", "__sb")).cast("double"),
        )
        .select("a", "b", "jaccard")
    )
    return j.filter(F.col("jaccard") >= threshold)


def simhash64(text: Column, k: int = 1) -> Column:
    """64-bit SimHash over token k-grams (k=1: tokens), pure Catalyst.

    Per bit i: majority of shingle-hash bit i. Computed via an aggregate over
    the shingle array: sum per bit of (+1/-1), then sign -> bit."""
    sh = token_shingles(text, k) if k > 1 else F.array_distinct(tokens(text))
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
    def vote(i: int):
        mask = 1 << i
        return lambda acc, h: acc + F.when(h.bitwiseAND(F.lit(mask)) != 0, F.lit(1)).otherwise(F.lit(-1))

    bit_votes = [F.aggregate(hashes, F.lit(0).cast("long"), vote(i)) for i in range(64)]
    out = F.lit(0).cast("long")
    for i, v in enumerate(bit_votes):
        out = out + F.when(v > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def simhash_dedup_candidates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Candidate pairs with identical SimHash (cheap first pass; at scale,
    rotate-and-bucket for Hamming distance <= d)."""
    s = df.select(F.col(id_col), simhash64(F.col(text_col)).alias("simhash"))
    a = s.select(F.col(id_col).alias("a"), "simhash")
    b = s.select(F.col(id_col).alias("b"), "simhash")
    return a.join(b, on="simhash").filter(F.col("a") < F.col("b")).select("a", "b", "simhash")
