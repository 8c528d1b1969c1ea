from nemo_spark.sources import dsv, json_source, rdf, sparql

__all__ = ["dsv", "json_source", "rdf", "sparql"]
