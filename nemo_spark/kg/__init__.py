from nemo_spark.kg import transcripts, extract, link, canonicalize, pipeline

__all__ = ["transcripts", "extract", "link", "canonicalize", "pipeline"]
