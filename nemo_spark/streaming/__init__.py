from nemo_spark.streaming.incremental import restore_streamed_facts, stream_facts_into

__all__ = ["restore_streamed_facts", "stream_facts_into"]
