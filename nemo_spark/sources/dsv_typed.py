"""DSV import into typed value structs — the parser-driven engine's reader.

Replicates nemo's DSV reader semantics exactly
(``nemo/src/io/formats/dsv/reader.rs`` + ``dsv/value_format.rs``):

- per-column value formats ``any | string | int | double | skip``
- flexible records: rows whose field count differs from the format arity are
  skipped (reference behaviour for missing columns), as are rows where a
  typed format fails to parse (int/double) — error = no fact
- ``quoting=false``: fields are raw delimiter splits, no quote processing
- ``ignore_headers``: drop the first record of each file
- gzip transparently (Spark text source decompresses ``.gz``)

Implementation: ``spark.read.text`` + Arrow-batched ``mapInPandas`` running a
csv-dialect field splitter per batch. This is the same architecture as any
distributed text-format decoder (Spark's own CSV datasource is per-line
parsing behind columnar batches); header rows are identified scalably via
``input_file_name``/``input_file_block_start`` (no driver-side read, no
global sort). For plain machine-typed CSV at scale prefer
:mod:`nemo_spark.sources.dsv` (native Spark CSV reader + Catalyst decode).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nemo_spark.model.values import (
    VALUE_SCHEMA,
    Value,
    ValueError_,
    parse_dsv_any,
    parse_dsv_double,
    parse_dsv_int,
    parse_dsv_string,
)

_PARSERS = {
    "any": parse_dsv_any,
    "anything": parse_dsv_any,
    "string": parse_dsv_string,
    "int": parse_dsv_int,
    "integer": parse_dsv_int,
    "double": parse_dsv_double,
}


def read_dsv_typed(
    spark: SparkSession,
    path: str,
    formats: list[str],
    delimiter: str = ",",
    quoting: bool = True,
    ignore_headers: bool = False,
    multiline: str | bool = "auto",
) -> DataFrame:
    """Read a DSV file into typed value-struct columns c0..c{n-1} (n = number
    of non-skip formats).

    ``multiline``: quoted fields may contain embedded newlines (csv-crate
    semantics — the reference parses them as one record, a line-based scan
    would shred them into two skipped fragments). ``'auto'`` (default)
    probes for an odd-quote-count line and switches to the per-file reader
    only when one exists, so clean data keeps the splittable line path; pass
    ``False`` to skip the probe scan when the data is known single-line, or
    ``True`` to force the per-file reader."""
    import csv as _csv

    keep = [i for i, f in enumerate(formats) if f != "skip"]
    parsers = [(_PARSERS[formats[i]], i) for i in keep]
    total = len(formats)
    out_schema = ", ".join(f"c{j} {VALUE_SCHEMA}" for j in range(len(keep)))

    src = spark.read.text(path).select(
        "value",
        F.input_file_name().alias("__f"),
        F.input_file_block_start().alias("__o"),
    )

    if quoting and multiline != False:  # noqa: E712  ('auto' is truthy)
        if multiline == "auto":
            # a record that continues past its line has an ODD number of
            # quote chars on the break line; single-line records always
            # balance. limit(1) short-circuits on the first hit.
            nq = F.length("value") - F.length(F.replace(F.col("value"), F.lit('"'), F.lit("")))
            multiline = not src.where(nq % 2 == 1).limit(1).isEmpty()
        if multiline:
            return _read_dsv_whole_files(
                spark, path, parsers, keep, total, delimiter, ignore_headers, out_schema
            )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # the header is the first NON-BLANK record (the csv crate skips
        # blank lines before taking the header), so a file starting with a
        # blank line must not burn its header-skip on the blank — the real
        # header row would then import as a fact. `awaiting` arms on the
        # file's offset-0 line and fires on its first non-blank line.
        awaiting: set[str] = set()
        armed: set[str] = set()
        for pdf in batches:
            if pdf.empty:
                continue
            cols: list[list] = [[] for _ in keep]
            for val, fname, off in zip(pdf["value"], pdf["__f"], pdf["__o"]):
                # __o is the file-BLOCK start (same value for every line of
                # the block), so arm once per file, on its first seen line
                if ignore_headers and off == 0 and fname not in armed:
                    armed.add(fname)
                    awaiting.add(fname)
                if val is None or val == "":
                    continue
                if ignore_headers and fname in awaiting:
                    awaiting.discard(fname)
                    continue
                if quoting:
                    try:
                        rec = next(_csv.reader([val], delimiter=delimiter))
                    except (StopIteration, _csv.Error):
                        continue
                else:
                    rec = val.split(delimiter)
                if len(rec) != total:
                    continue  # flexible records: wrong arity => row skipped
                try:
                    vals = [p(rec[i]) for p, i in parsers]
                except ValueError_:
                    continue  # typed format parse error => row skipped
                for c, v in zip(cols, vals):
                    c.append({"t": v.t, "i": v.i, "d": v.d, "s": v.s})
            yield pd.DataFrame({f"c{j}": pd.Series(cols[j], dtype="object") for j in range(len(keep))})

    return src.mapInPandas(parse, schema=out_schema)


def _read_dsv_whole_files(
    spark: SparkSession,
    path: str,
    parsers,
    keep,
    total: int,
    delimiter: str,
    ignore_headers: bool,
    out_schema: str,
) -> DataFrame:
    """Per-file csv parse (``wholetext``): the fallback for quoted records
    with embedded newlines. Parallelism is per FILE — exactly the
    reference's sequential-reader granularity — so it only runs when the
    data actually needs it (see read_dsv_typed's multiline probe)."""
    import csv as _csv
    import io as _io

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            cols: list[list] = [[] for _ in keep]
            for text in pdf["value"]:
                first = True
                for rec in _csv.reader(_io.StringIO(text), delimiter=delimiter):
                    if not rec:
                        continue  # blank line — never consumes the header skip
                    is_first, first = first, False
                    if ignore_headers and is_first:
                        continue
                    if len(rec) != total:
                        continue  # flexible records: wrong arity => skipped
                    try:
                        vals = [p(rec[i]) for p, i in parsers]
                    except ValueError_:
                        continue  # typed format parse error => row skipped
                    for c, v in zip(cols, vals):
                        c.append({"t": v.t, "i": v.i, "d": v.d, "s": v.s})
            yield pd.DataFrame({f"c{j}": pd.Series(cols[j], dtype="object") for j in range(len(keep))})

    return spark.read.text(path, wholetext=True).mapInPandas(parse, schema=out_schema)


def typed_rows_df(spark: SparkSession, rows: list[tuple], arity: int) -> DataFrame:
    """DataFrame of typed value structs from driver-side Value tuples."""
    schema = ", ".join(f"c{i} {VALUE_SCHEMA}" for i in range(arity))
    data = [tuple(v.as_row() for v in row) for row in rows]
    return spark.createDataFrame(data, schema)


def empty_typed_df(spark: SparkSession, arity: int) -> DataFrame:
    schema = ", ".join(f"c{i} {VALUE_SCHEMA}" for i in range(max(arity, 1)))
    return spark.createDataFrame([], schema)


def peek_field_count(spark: SparkSession, path: str, delimiter: str = ",") -> int:
    """Arity inference for predicates with no declared/derived arity: field
    count of the file's first NON-BLANK record (one tiny Spark job — a
    leading empty line would otherwise infer a zero-column import; nemo's
    csv reader skips blank lines)."""
    import csv as _csv

    first = (
        spark.read.text(path)
        .where(F.length(F.trim(F.col("value"))) > 0)
        .limit(1)
        .collect()
    )
    if not first:
        return 1
    return len(next(_csv.reader([first[0].value], delimiter=delimiter)))
