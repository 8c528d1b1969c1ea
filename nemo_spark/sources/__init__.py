from nemo_spark.sources import dsv, json_source, rdf

__all__ = ["dsv", "json_source", "rdf"]
