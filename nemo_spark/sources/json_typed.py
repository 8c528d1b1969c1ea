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


def _flatten(doc, base: int = 0) -> list[tuple[Value, Value, Value]]:
    """Flatten one document; node ids are ``base + DFS index``. ``base``
    keeps ids from different documents of one multi-file read disjoint —
    the reference reads ONE document per import (ids 0..n), so base=0
    reproduces it exactly for single-file reads."""
    from nemo_spark.model.values import ValueError_

    type_iri = Value.iri("type")
    value_iri = Value.iri("value")
    out = []
    counter = [base]
    stack = [(base, doc)]
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
            if isinstance(cur, int):
                # reader.rs:108-118 number dispatch: i64, else u64, else
                # f64 (serde_json parses arbitrary-size ints; past u64 the
                # reference stores the lossy double, not an import error)
                try:
                    v = Value.int(cur)
                except ValueError_:
                    v = Value.double(float(cur))
            else:
                v = Value.double(cur)
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

    from pyspark.sql import functions as F

    patterns = tuple(patterns or ())
    ncols = pattern_output_arity(patterns, 3)
    schema = ", ".join(f"c{i} {VALUE_SCHEMA}" for i in range(ncols))
    src = spark.read.text(path, wholetext=True).select(
        "value", F.input_file_name().alias("__file")
    )
    # per-document node-id bases: ids restart at 0 per document, so a
    # multi-file read would merge unrelated nodes (node 0 of file A ==
    # node 0 of file B). Enumerate the files once driver-side (one tiny
    # job over file NAMES only) and give each document a disjoint 2^40
    # id range; a single-file read keeps base 0 = reference-exact ids.
    files = sorted(r["__file"] for r in src.select("__file").distinct().collect())
    bases = {f: i << 40 for i, f in enumerate(files)} if len(files) > 1 else {}

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: list[list] = [[] for _ in range(ncols)]
            for text, fname in zip(pdf["value"], pdf["__file"]):
                if not text or not text.strip():
                    continue
                doc = json.loads(text)
                for row in _flatten(doc, bases.get(fname, 0)):
                    out = apply_patterns(row, patterns)
                    if out is None:
                        continue
                    for c, v in zip(cols, out):
                        c.append({"t": v.t, "i": v.i, "d": v.d, "s": v.s})
            yield pd.DataFrame({f"c{i}": pd.Series(cols[i], dtype="object") for i in range(ncols)})

    return src.mapInPandas(parse, schema=schema)
