"""JSON import filter/transform patterns (filter_imports.rs parity).

Covers the pattern semantics of the reference tuple buffer
(``nemo-physical/src/tabular/buffer/tuple_buffer.rs:474``: first match wins,
evaluation errors skip the pattern, unmatched rows drop), the JSON reader
applying patterns inside the parse task (``nemo/src/io/formats/json.rs:24``),
and the runner internalizing qualifying rules into the import
(``nemo/src/rule_model/pipeline/transformations/filter_imports.rs``)."""

from __future__ import annotations

import json

import pytest

from nemo_spark.model.values import Value, ValueError_
from nemo_spark.sources.patterns import (
    FilterTransformPattern,
    apply_patterns,
    pattern_output_arity,
)

V = Value


def test_apply_patterns_semantics():
    row = (V.int(1), V.string("k"), V.int(9))
    # no patterns: pass-through
    assert apply_patterns(row, ()) == row
    # filter-only pattern keeps input arity
    keep = FilterTransformPattern((lambda r: r[2].i > 5,))
    drop = FilterTransformPattern((lambda r: r[2].i > 100,))
    assert apply_patterns(row, (keep,)) == row
    assert apply_patterns(row, (drop,)) is None
    assert pattern_output_arity((keep,), 3) == 3
    # first matching pattern wins
    first = FilterTransformPattern((lambda r: True,), (lambda r: V.string("first"),))
    second = FilterTransformPattern((lambda r: True,), (lambda r: V.string("second"),))
    assert apply_patterns(row, (first, second)) == (V.string("first"),)
    assert pattern_output_arity((first, second), 3) == 1
    # an evaluation error skips the pattern (next one is tried)
    def boom(r):
        raise ValueError_("nope")

    erroring = FilterTransformPattern((boom,), (lambda r: V.string("never"),))
    assert apply_patterns(row, (erroring, second)) == (V.string("second"),)
    # error in the transform also skips (continue 'pattern)
    t_error = FilterTransformPattern((), (boom,))
    assert apply_patterns(row, (t_error, second)) == (V.string("second"),)
    assert apply_patterns(row, (t_error,)) is None


@pytest.fixture()
def json_file(tmp_path):
    doc = {"items": [{"n": 1}, {"n": 5}, {"n": 12}]}
    p = tmp_path / "data.json"
    p.write_text(json.dumps(doc))
    return str(p)


def test_reader_applies_patterns_in_task(spark, json_file):
    from nemo_spark.sources.json_typed import read_json_typed

    full = read_json_typed(spark, json_file)
    # keep only integer leaf values > 4, project to (value)
    pat = FilterTransformPattern(
        (
            lambda r: r[1] == V.iri("value"),
            lambda r: r[2].t == V.int(0).t and r[2].i > 4,
        ),
        (lambda r: r[2],),
    )
    slim = read_json_typed(spark, json_file, patterns=(pat,))
    assert len(slim.columns) == 1
    got = sorted(row[0]["i"] for row in slim.collect())
    assert got == [5, 12]
    assert full.count() > slim.count()
    # the filter runs inside the reader: no Catalyst Filter node exists
    # (FileScan always prints a "PushedFilters:" attribute — match node
    # names at line starts, not the substring)
    plan = slim._jdf.queryExecution().executedPlan().toString()
    assert not any(
        line.strip().lstrip("+-*: ").startswith("Filter") for line in plan.splitlines()
    )


_PROG = """
@import data :- json {{resource="{path}"}} .
big(?v, ?v * 10) :- data(?n, <value>, ?v), ?v >= 4 .
@export big :- csv {{}} .
"""


def test_runner_internalizes_json_filter_rule(spark, json_file):
    from nemo_spark.parser.runner import RlsRunner

    r = RlsRunner(spark, source=_PROG.format(path=json_file)).run()
    # the rule was internalized: no rules remain, the import was retargeted
    assert r.compiled.program.rules == []
    (imp,) = r.compiled.imports
    assert imp.pred == "big" and len(imp.filter_rules) == 1
    got = sorted(tuple(t) for t in r.serialized("big").collect())
    assert got == [("12", "120"), ("5", "50")]


def test_internalized_matches_regular_evaluation(spark, json_file):
    """Blocking internalization (import predicate also an @output) must
    yield the identical result through regular rule evaluation."""
    from nemo_spark.parser.runner import RlsRunner

    blocked = _PROG.format(path=json_file) + "@output data .\n"
    r = RlsRunner(spark, source=blocked).run()
    assert len(r.compiled.program.rules) == 1  # NOT internalized
    got = sorted(tuple(t) for t in r.serialized("big").collect())
    assert got == [("12", "120"), ("5", "50")]


def test_forbidden_shapes_not_internalized(spark, json_file):
    from nemo_spark.parser.filter_imports import internalize_filter_imports
    from nemo_spark.parser.rls import parse_rls

    base = _PROG.format(path=json_file)
    # import predicate used by a second, non-internalizable rule
    ast = parse_rls(base + "pairs(?a, ?b) :- data(?a, ?k, ?b), data(?b, ?k2, ?c) .")
    assert internalize_filter_imports(ast) == 0
    # import predicate exported
    ast = parse_rls(base + "@export data :- csv {} .")
    assert internalize_filter_imports(ast) == 0
    # negation in the body
    ast = parse_rls(base + "other(?n) :- data(?n, <value>, ?v), ~excl(?n) .")
    assert internalize_filter_imports(ast) == 0
    # two internalizable rules with different head predicates
    ast = parse_rls(base + "small(?v) :- data(?n, <value>, ?v), ?v < 4 .")
    assert internalize_filter_imports(ast) == 0
    # the happy shape internalizes
    ast = parse_rls(base)
    assert internalize_filter_imports(ast) == 1
    assert ast.rules == []


def test_multiple_rules_same_head_become_ordered_patterns(spark, json_file):
    """Two internalizable rules over one import with the same head union
    their patterns (first match wins per row; both project to arity 1)."""
    from nemo_spark.parser.runner import RlsRunner

    src = f"""
@import data :- json {{resource="{json_file}"}} .
picked(?v) :- data(?n, <value>, ?v), ?v >= 4 .
picked(?v) :- data(?n, <value>, ?v), ?v = 1 .
@export picked :- csv {{}} .
"""
    r = RlsRunner(spark, source=src).run()
    assert r.compiled.program.rules == []
    got = sorted(tuple(t) for t in r.serialized("picked").collect())
    assert got == [("1",), ("12",), ("5",)]


def test_nullary_and_mixed_arity_heads_not_internalized(spark, json_file):
    from nemo_spark.parser.filter_imports import internalize_filter_imports
    from nemo_spark.parser.rls import parse_rls

    base = f'@import data :- json {{resource="{json_file}"}} .\n'
    # nullary head: must stay a rule (the engine's nullary rewrite handles it)
    ast = parse_rls(base + "seen() :- data(?n, <value>, ?v), ?v >= 100 .\n@output seen .")
    assert internalize_filter_imports(ast) == 0
    # mixed head arities: invalid program — leave for compile's arity error
    ast = parse_rls(
        base
        + "h(?v) :- data(?n, <value>, ?v) .\n"
        + "h(?v, ?n) :- data(?n, <value>, ?v) .\n@output h ."
    )
    assert internalize_filter_imports(ast) == 0


def test_nullary_head_program_still_runs(spark, json_file):
    from nemo_spark.parser.runner import RlsRunner

    src = f"""
@import data :- json {{resource="{json_file}"}} .
seen() :- data(?n, <value>, ?v), ?v >= 5 .
@output seen .
"""
    r = RlsRunner(spark, source=src).run()
    assert r.serialized("seen").count() == 1  # derivable: values 5 and 12
