"""JSON import into typed value structs.

Replicates nemo's JSON reader (``nemo/src/io/formats/json/reader.rs``):
a document flattens into ternary facts (node, key, value) where

- every node asserts (id, <type>, "null|bool|number|string|array|object")
- objects assert (id, member_key_string, child_id) per member
- arrays assert (id, index_int, child_id) per element
- leaves assert (id, <value>, leaf_value)

Node ids are integers assigned in the reader's DFS order — engine-local
identifiers (never exported as stable data), so only consistency matters.
Each file flattens independently inside an Arrow batch (one task per file,
parallel across files at scale)."""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from nemo_spark.model.values import VALUE_SCHEMA, Value


def _flatten(doc) -> list[tuple[Value, Value, Value]]:
    type_iri = Value.iri("type")
    value_iri = Value.iri("value")
    out = []
    counter = [0]
    stack = [(0, doc)]
    while stack:
        oid, cur = stack.pop()
        idv = Value.int(oid)
        if cur is None:
            out.append((idv, type_iri, Value.string("null")))
        elif isinstance(cur, bool):
            out.append((idv, type_iri, Value.string("bool")))
            out.append((idv, value_iri, Value.boolean(cur)))
        elif isinstance(cur, (int, float)):
            out.append((idv, type_iri, Value.string("number")))
            v = Value.int(cur) if isinstance(cur, int) else Value.double(cur)
            out.append((idv, value_iri, v))
        elif isinstance(cur, str):
            out.append((idv, type_iri, Value.string("string")))
            out.append((idv, value_iri, Value.string(cur)))
        elif isinstance(cur, list):
            out.append((idv, type_iri, Value.string("array")))
            for i, el in enumerate(cur):
                counter[0] += 1
                stack.append((counter[0], el))
                out.append((idv, Value.int(i), Value.int(counter[0])))
        elif isinstance(cur, dict):
            out.append((idv, type_iri, Value.string("object")))
            for k, el in cur.items():
                counter[0] += 1
                stack.append((counter[0], el))
                out.append((idv, Value.string(k), Value.int(counter[0])))
    return out


def read_json_typed(spark: SparkSession, path: str, patterns=None) -> DataFrame:
    """``patterns``: reader-side :class:`FilterTransformPattern` list
    (``nemo/src/io/formats/json.rs:24-27`` JsonHandler carries patterns
    into its reader). Applied per flattened row INSIDE the parse task, so
    dropped rows never cross the Arrow boundary and transformed rows ship
    at output arity — a Catalyst Filter above this reader could only run
    after the full ternary expansion was transferred."""
    from nemo_spark.sources.patterns import apply_patterns, pattern_output_arity

    patterns = tuple(patterns or ())
    ncols = pattern_output_arity(patterns, 3)
    schema = ", ".join(f"c{i} {VALUE_SCHEMA}" for i in range(ncols))
    src = spark.read.text(path, wholetext=True)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: list[list] = [[] for _ in range(ncols)]
            for text in pdf["value"]:
                if not text or not text.strip():
                    continue
                doc = json.loads(text)
                for row in _flatten(doc):
                    out = apply_patterns(row, patterns)
                    if out is None:
                        continue
                    for c, v in zip(cols, out):
                        c.append({"t": v.t, "i": v.i, "d": v.d, "s": v.s})
            yield pd.DataFrame({f"c{i}": cols[i] for i in range(ncols)})

    return src.mapInPandas(parse, schema=schema)
