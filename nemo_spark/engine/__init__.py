from nemo_spark.engine.seminaive import SemiNaiveEngine

__all__ = ["SemiNaiveEngine"]
