"""RDF import into typed value structs (N-Triples / N-Quads).

Typed counterpart of :mod:`nemo_spark.sources.rdf` for the parser-driven
engine: terms become proper Values (IRI / labeled null for blank nodes /
typed literals via the shared literal constructors), matching nemo's RDF
reader (``nemo/src/io/formats/rdf/reader.rs``). Turtle / RDF-XML / TriG
require full grammar parsers and are not supported here (reference lists
them; the tested corpus beyond these two is small)."""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from nemo_spark.model.values import (
    VALUE_SCHEMA,
    Value,
    ValueError_,
    from_typed_literal,
    unescape_string,
)

_TERM = r'(<[^>]*>|_:\S+|"(?:[^"\\]|\\.)*"(?:\^\^<[^>]*>|@[A-Za-z0-9-]+)?)'
_NT_RE = re.compile(rf"^\s*{_TERM}\s+(<[^>]*>)\s+{_TERM}\s*(?:(<[^>]*>|_:\S+)\s*)?\.\s*(?:#.*)?$")
_LIT_RE = re.compile(r'^"((?:[^"\\]|\\.)*)"(?:\^\^<([^>]*)>|@([A-Za-z0-9-]+))?$')


def _term_value(tok: str) -> Value:
    if tok.startswith("<"):
        return Value.iri(tok[1:-1])
    if tok.startswith("_:"):
        return Value.null(tok[2:])
    m = _LIT_RE.match(tok)
    if not m:
        raise ValueError_(f"bad RDF term {tok!r}")
    lex = unescape_string(m.group(1))
    if m.group(3):
        return Value.lang_string(lex, m.group(3))
    if m.group(2):
        return from_typed_literal(lex, m.group(2))
    return Value.string(lex)


def read_rdf_typed(spark: SparkSession, path: str, fmt: str = "rdf") -> DataFrame:
    """(subj, pred, obj[, graph]) typed facts from N-Triples / N-Quads."""
    if fmt == "rdf":
        ext = path.rsplit(".", 1)[-1].lower()
        fmt = {"nt": "ntriples", "nq": "nquads"}.get(ext, ext)
    if fmt not in ("ntriples", "nquads"):
        raise ValueError(f"RDF format {fmt!r} not supported (N-Triples/N-Quads only)")
    quads = fmt == "nquads"
    ncols = 4 if quads else 3
    schema = ", ".join(f"c{i} {VALUE_SCHEMA}" for i in range(ncols))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: list[list] = [[] for _ in range(ncols)]
            for line in pdf["value"]:
                if not line or line.lstrip().startswith("#"):
                    continue
                m = _NT_RE.match(line)
                if not m:
                    continue  # malformed triples are skipped (reference behaviour)
                toks = [m.group(1), m.group(2), m.group(3)]
                if quads:
                    # graph name comes FIRST in the predicate layout
                    # (reference rdf reader; see nquads testcase rule shape)
                    toks = [m.group(4) or "<>"] + toks
                try:
                    vals = [_term_value(t) for t in toks[:ncols]]
                except ValueError_:
                    continue
                for c, v in zip(cols, vals):
                    c.append({"t": v.t, "i": v.i, "d": v.d, "s": v.s})
            yield pd.DataFrame({f"c{i}": cols[i] for i in range(ncols)})

    return spark.read.text(path).mapInPandas(parse, schema=schema)
