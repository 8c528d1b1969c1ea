"""RDF N-Triples / N-Quads import & export.

Mirrors nemo's RDF handler (reference: ``nemo/src/io/formats/rdf.rs:67-91``,
``rdf/reader.rs``) for the line-based serializations. Spark has no RDF
reader, so parsing is a vectorized Arrow-batched regex over ``spark.read.text``
lines — per-batch pandas ``str.extract``, no per-row Python.

Terms are kept in canonical lexical form (nemo's export convention):
IRIs as ``<...>``-stripped strings, literals with quotes/datatype/lang intact.
Turtle/RDF-XML/TriG (full grammars) are out of scope for v0 — nemo lists them
but the tested corpus is N-Triples (SURVEY §non-goals).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# subject: IRI or blank node; predicate: IRI; object: IRI, blank or literal
_NT_RE = re.compile(
    r"^\s*(<[^>]*>|_:\S+)\s+(<[^>]*>)\s+"
    r"(<[^>]*>|_:\S+|\"(?:[^\"\\]|\\.)*\"(?:\^\^<[^>]*>|@[A-Za-z0-9-]+)?)\s*\.\s*$"
)


def _strip_iri(s: pd.Series) -> pd.Series:
    iri = s.str.startswith("<")
    return s.where(~iri, s.str.slice(1, -1))


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """(subj, pred, obj) facts from an N-Triples file (comments/blank lines
    skipped; malformed lines dropped — nemo skips unparseable triples)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            lines = pdf["value"]
            lines = lines[~lines.str.match(r"^\s*(#|$)")]
            if lines.empty:
                continue
            m = lines.str.extract(_NT_RE)
            m = m.dropna()
            if m.empty:
                continue
            yield pd.DataFrame(
                {
                    "subj": _strip_iri(m[0]),
                    "pred": _strip_iri(m[1]),
                    "obj": _strip_iri(m[2]),
                }
            )

    return spark.read.text(path).mapInPandas(parse, schema="subj string, pred string, obj string")


def write_ntriples(df: DataFrame, path: str) -> None:
    """Serialize (subj, pred, obj) to N-Triples. Literals (leading ``"``) and
    blank nodes (leading ``_:``) pass through; values matching an absolute-IRI
    pattern get angle brackets; anything else (plain strings, numbers) is
    emitted as an escaped quoted literal — never as an invalid ``<42>`` IRI."""

    def term(c, always_iri: bool = False):
        col = F.col(c)
        passthrough = col.startswith('"') | col.startswith("_:")
        is_abs_iri = col.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:[^\s<>\"{}|^`\\]*$")
        wrapped = F.concat(F.lit("<"), col, F.lit(">"))
        quoted = F.concat(
            F.lit('"'),
            F.regexp_replace(F.regexp_replace(col, r"\\", r"\\\\"), r'"', r'\\"'),
            F.lit('"'),
        )
        if always_iri:
            return wrapped
        return F.when(passthrough, col).when(is_abs_iri, wrapped).otherwise(quoted)

    line = F.concat_ws(" ", term("subj"), term("pred", always_iri=True), term("obj"), F.lit("."))
    df.select(line.alias("value")).write.mode("overwrite").text(path)
