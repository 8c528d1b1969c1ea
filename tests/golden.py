"""Golden-output comparison helpers.

Replicates the reference harness's order-insensitive sorted-line CSV compare
(``nemo-cli/tests/blackbox_integration.rs:107-133``): expected CSVs from the
reference's testcases under ``/root/reference/resources/testcases`` are
compared against our engine's output as sorted sets of comma-joined lines.
"""

from __future__ import annotations

import csv
import os

from pyspark.sql import DataFrame, SparkSession

TESTCASES = "/root/reference/resources/testcases"

reference_available = os.path.isdir(TESTCASES)


def load_csv_facts(
    spark: SparkSession, relpath: str, arity: int, types: str | None = None
) -> DataFrame:
    """Load a reference testcase CSV the way nemo's DSV reader does with the
    default `anything` value format (int if it parses as int, else string —
    ``nemo/src/io/formats/dsv/value_format.rs:31-51``). ``types``: one char
    per column, 's' (string) or 'i' (int64); default all strings (string
    semantics suffice where the testcase never does arithmetic)."""
    path = os.path.join(TESTCASES, relpath)
    types = types or "s" * arity
    rows = []
    with open(path, newline="") as f:
        for rec in csv.reader(f):
            if rec:
                rows.append(tuple(int(v) if t == "i" else v for v, t in zip(rec, types)))
    cols = [f"c{i}" for i in range(arity)]
    schema = ", ".join(f"{c} {'long' if t == 'i' else 'string'}" for c, t in zip(cols, types))
    return spark.createDataFrame(rows, schema)


def expected_lines(relpath: str) -> list[str]:
    path = os.path.join(TESTCASES, relpath)
    with open(path) as f:
        lines = [ln.rstrip("\n") for ln in f if ln.strip()]
    return sorted(lines)


def df_lines(df: DataFrame) -> list[str]:
    out = []
    for row in df.collect():
        out.append(",".join("" if v is None else _fmt(v) for v in row))
    return sorted(out)


def _fmt(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def assert_golden(df: DataFrame, relpath: str) -> None:
    got = df_lines(df)
    want = expected_lines(relpath)
    assert got == want, (
        f"golden mismatch for {relpath}:\n  missing: {sorted(set(want) - set(got))[:10]}"
        f"\n  extra:   {sorted(set(got) - set(want))[:10]}"
        f"\n  ({len(got)} got vs {len(want)} want)"
    )
