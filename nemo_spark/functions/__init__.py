from nemo_spark.functions import ops

__all__ = ["ops"]
