from nemo_spark.streaming.incremental import stream_facts_into

__all__ = ["stream_facts_into"]
