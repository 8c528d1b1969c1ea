"""JSON fact import.

Mirrors nemo's JSON reader (reference: ``nemo/src/io/formats/json.rs:24``,
``json/reader.rs``): JSON values become facts. Spark-native:
``spark.read.json`` + explicit field selection; nested structures address
nemo's Tuple/Map values via ArrayType/MapType columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_json_facts(spark: SparkSession, path: str, fields: list[str]) -> DataFrame:
    """Read JSON(L) and project ``fields`` (dot paths allowed) to c0..cn-1."""
    df = spark.read.json(path)
    return df.select(*[F.col(f).alias(f"c{i}") for i, f in enumerate(fields)]).dropDuplicates()


def from_json_column(df: DataFrame, col: str, schema: str) -> DataFrame:
    """Parse an embedded JSON string column (like the events.props field)."""
    return df.withColumn(f"{col}_parsed", F.from_json(F.col(col), schema))
