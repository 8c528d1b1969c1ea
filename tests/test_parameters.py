"""External @parameter overrides (``nmo --param key=value`` parity).

Reference semantics (nemo-cli/src/cli.rs:220, execution_parameters.rs:53,
rule_model/pipeline/transformations/global.rs, programs.rs:317
validate_parameters): externally supplied values are parsed as ground terms
and take precedence over in-program ``@parameter`` defaults; parameters may
reference each other in any declaration order; an expressionless
``@parameter $x .`` must be supplied externally; redefinition and cyclic
definitions are errors. We additionally reject unknown external keys loudly
(a typoed ``--param`` must not silently no-op)."""

from __future__ import annotations

import pytest

from nemo_spark.model.values import Value
from nemo_spark.parser.compile import CompileError, compile_program
from nemo_spark.parser.rls import parse_rls

_PROG = """
@parameter $i = 30 .
@parameter $a = $i + 12 .
the_answer($a) .
@output the_answer .
"""


def _answer(src: str, params=None) -> list[tuple]:
    compiled = compile_program(parse_rls(src), params=params)
    return compiled.fact_rows["the_answer"]


def test_defaults_evaluate():
    assert _answer(_PROG) == [(Value.int(42),)]


def test_external_override_wins():
    assert _answer(_PROG, params={"i": "100"}) == [(Value.int(112),)]
    # overriding the dependent parameter directly bypasses its expression
    assert _answer(_PROG, params={"a": "7"}) == [(Value.int(7),)]


def test_declaration_order_independent():
    src = """
@parameter $a = $i + 12 .
@parameter $i = 30 .
the_answer($a) .
@output the_answer .
"""
    assert _answer(src) == [(Value.int(42),)]


def test_value_kinds_parse_as_ground_terms():
    src = 'the_answer($x) . @output the_answer .'
    assert _answer(src, params={"x": "<http://ex/a>"}) == [(Value.iri("http://ex/a"),)]
    assert _answer(src, params={"x": '"hi"'}) == [(Value.string("hi"),)]
    assert _answer(src, params={"x": Value.int(5)}) == [(Value.int(5),)]
    with pytest.raises(CompileError, match=r"invalid value for parameter \$x"):
        _answer(src, params={"x": '"unterminated'})


def test_expressionless_parameter_requires_external():
    src = """
@parameter $x .
the_answer($x) .
@output the_answer .
"""
    assert _answer(src, params={"x": "1"}) == [(Value.int(1),)]
    with pytest.raises(CompileError, match=r"\$x has no expression"):
        _answer(src)


def test_unknown_external_parameter_rejected():
    with pytest.raises(CompileError, match=r"unknown external parameter.*\$typo"):
        _answer(_PROG, params={"typo": "1"})


def test_undeclared_but_used_parameter_supplied_externally():
    # a global may be used without @parameter when defined externally
    # (validate_parameters counts external keys as defined)
    src = "the_answer($x) . @output the_answer ."
    assert _answer(src, params={"x": "9"}) == [(Value.int(9),)]
    with pytest.raises(CompileError, match=r"undefined parameter \$x"):
        _answer(src)


def test_redefinition_rejected():
    src = """
@parameter $i = 1 .
@parameter $i = 2 .
the_answer($i) .
"""
    with pytest.raises(CompileError, match=r"\$i declared twice"):
        _answer(src)


def test_cyclic_definitions_rejected():
    src = """
@parameter $a = $b + 1 .
@parameter $b = $a + 1 .
the_answer($a) .
"""
    with pytest.raises(CompileError, match="cyclic or undefined"):
        _answer(src)


def test_runner_params_end_to_end(spark, tmp_path):
    """The reference's own parameter testcase run twice with different
    external values through the full runner."""
    path = "/root/reference/resources/testcases/basic/parameter_declaration.rls"
    from nemo_spark.parser.runner import RlsRunner

    r1 = RlsRunner(spark, rls_path=path).run()
    assert [tuple(t) for t in r1.serialized("the_answer").collect()] == [("42",)]
    r2 = RlsRunner(spark, rls_path=path, params={"i": "1000"}).run()
    assert [tuple(t) for t in r2.serialized("the_answer").collect()] == [("1012",)]
