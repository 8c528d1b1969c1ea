from nemo_spark.ops import dedup, similarity, text

__all__ = ["dedup", "similarity", "text"]
