"""Reader-side filter/transform patterns (FilterTransformPattern parity).

Reference: ``nemo-physical/src/tabular/filters.rs`` defines a pattern as a
filter program plus per-position transformations, applied by the tuple
buffer while a reader streams rows in
(``nemo-physical/src/tabular/buffer/tuple_buffer.rs:474``
``match_filters_and_transform``): patterns are tried in order, the FIRST
matching pattern wins and its transformations produce the output row; an
evaluation error inside a pattern skips that pattern; a row matching no
pattern is dropped.

Why this exists on Spark: our whole-document readers (JSON) parse inside
``mapInPandas``, so a Catalyst ``Filter`` above them runs only AFTER every
flattened row crossed the Arrow boundary. Applying the pattern inside the
reader drops/projects rows before they are ever transferred — the same
reason the reference pushes patterns into its readers. Formats that scan
Spark-natively (DSV via the csv reader) keep Catalyst pushdown instead.

Patterns hold plain-Python closures over tuples of
:class:`~nemo_spark.model.values.Value`; they are cloudpickled to executors,
so builders must only capture primitives, Values, and module-level
functions.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from nemo_spark.model.values import Value, ValueError_

Row = tuple  # tuple[Value, ...]


@dataclass(frozen=True)
class FilterTransformPattern:
    """One internalized rule: conjunctive filters + output projections.

    ``filters``: each callable returns a bool (raise :class:`ValueError_`
    to make the pattern not match this row). ``transforms``: one callable
    per OUTPUT position, or ``None`` for pass-through (a filter-only
    pattern keeps the input arity, filters.rs ``expected_arity``)."""

    filters: tuple[Callable[[Row], bool], ...]
    transforms: tuple[Callable[[Row], Value], ...] | None = None


def pattern_output_arity(patterns, input_arity: int) -> int:
    """tuple_buffer.rs:309 ``output_columns_from_patterns``: the first
    pattern's transformation count, else the input arity — with every OTHER
    pattern validated against it. A filter-only pattern mixed with a
    transforming one would emit rows of two different widths into one
    reader schema (ragged columns crash the Arrow batch assembly), so
    inconsistency is a loud error here instead."""
    if not patterns:
        return input_arity
    out = (
        len(patterns[0].transforms)
        if patterns[0].transforms is not None
        else input_arity
    )
    for i, p in enumerate(patterns[1:], start=1):
        p_out = len(p.transforms) if p.transforms is not None else input_arity
        if p_out != out:
            raise ValueError(
                f"filter/transform pattern {i} produces arity {p_out}, "
                f"pattern 0 produces {out} — patterns must agree"
            )
    return out


def apply_patterns(row: Row, patterns) -> Row | None:
    """``match_filters_and_transform`` (tuple_buffer.rs:474): first match
    wins, errors skip the pattern, no match drops the row (None)."""
    if not patterns:
        return row
    for p in patterns:
        try:
            if not all(f(row) for f in p.filters):
                continue
            if p.transforms is None:
                return row
            return tuple(t(row) for t in p.transforms)
        except ValueError_:
            continue  # evaluation error => try the next pattern
    return None
