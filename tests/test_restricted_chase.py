"""Golden parity for the restricted chase
(testcases/regression/restricted_chase/*) — nemo's default existential-rule
semantics: a rule only invents fresh nulls for bindings whose head conjunction
is not already satisfied.

Null tokens are engine-specific (nemo `_:0..` counters vs our skolem hashes),
so rows are compared with nulls wildcarded (multiset equality) plus equality
of the distinct-null count — which pins down the blocking behaviour exactly
on these fixtures."""

from __future__ import annotations

import re

import pytest

from nemo_spark import Atom, Program, Rule, SemiNaiveEngine, Var
from nemo_spark.model.rules import EVar
from tests.golden import df_lines, expected_lines, load_csv_facts, reference_available

pytestmark = pytest.mark.skipif(not reference_available, reason="reference testcases not present")

RC = "regression/restricted_chase"
NULL_RE = re.compile(r"_:\S+")

X, Y = Var("X"), Var("Y")
V, W, Z = EVar("V"), EVar("W"), EVar("Z")


def _wildcard(lines: list[str]) -> tuple[list[str], int]:
    nulls = set()
    out = []
    for ln in lines:
        nulls.update(NULL_RE.findall(ln))
        out.append(NULL_RE.sub("*", ln))
    return sorted(out), len(nulls)


def assert_golden_nulls(df, relpath: str) -> None:
    got, got_nulls = _wildcard(df_lines(df))
    want, want_nulls = _wildcard(expected_lines(relpath))
    assert got == want, f"{relpath}: {got[:6]} vs {want[:6]}"
    assert got_nulls == want_nulls, f"{relpath}: distinct nulls {got_nulls} vs {want_nulls}"


def _data_engine(spark):
    eng = SemiNaiveEngine(spark)
    eng.register("data", load_csv_facts(spark, f"{RC}/sources/data.csv", 2))
    return eng


def test_simple(spark):
    eng = _data_engine(spark)
    eng.run(Program(rules=[Rule(Atom("result", X, V), [Atom("data", X, Y)])]))
    assert_golden_nulls(eng.table("result"), f"{RC}/simple/result.csv")


def test_block(spark):
    # the (A,A) fact satisfies result(A, ?) -> no null for A
    eng = _data_engine(spark)
    eng.run(
        Program(
            rules=[
                Rule(Atom("result", X, X), [Atom("data", X, X)]),
                Rule(Atom("result", X, V), [Atom("data", X, Y)]),
            ]
        )
    )
    assert_golden_nulls(eng.table("result"), f"{RC}/block/result.csv")


def test_block2(spark):
    # S(b,c) already satisfies S(b, ?) -> rule entirely blocked
    eng = SemiNaiveEngine(spark)
    eng.run(
        Program(
            rules=[Rule(Atom("S", Y, Z), [Atom("R", X, Y)])],
            facts={"R": [("a", "b")], "S": [("b", "c")]},
        )
    )
    assert_golden_nulls(eng.table("S"), f"{RC}/block2/S.csv")


def test_datalog_head(spark):
    # satisfaction checks the WHOLE head conjunction: datalog(A) missing
    # means the rule still fires for X=A despite result(A,A) existing
    eng = _data_engine(spark)
    eng.run(
        Program(
            rules=[
                Rule(Atom("result", X, X), [Atom("data", X, X)]),
                Rule(Atom("datalog", X), [Atom("data", X, Y)], extra_heads=[Atom("result", X, V)]),
            ]
        )
    )
    assert_golden_nulls(eng.table("result"), f"{RC}/datalog_head/result.csv")
    assert_golden_nulls(eng.table("datalog"), f"{RC}/datalog_head/datalog.csv")


def test_multinulls_via_test_pred(spark):
    # the reference checks a derived predicate because null tokens are random
    A_, B_, C_ = "A", "B", "C"
    eng = _data_engine(spark)
    rules = [
        Rule(Atom("result", X, X), [Atom("data", X, X)]),
        Rule(Atom("result", W, X), [Atom("data", X, Y)], extra_heads=[Atom("result", X, V)]),
    ]
    for const in (A_, B_, C_):
        rules.append(Rule(Atom("test", X), [Atom("result", const, X)]))
        rules.append(Rule(Atom("test", X), [Atom("result", X, const)]))
    eng.run(Program(rules=rules))
    assert_golden_nulls(eng.table("test"), f"{RC}/multinulls/test.csv")


def test_doctors(spark):
    eng = SemiNaiveEngine(spark)
    Id, Patient, Hospital, Npi, Conf1 = _vars = [Var(n) for n in ["Id", "Patient", "Hospital", "Npi", "Conf1"]]
    Name, Spec, Conf2, Doctor, Conf = [Var(n) for n in ["Name", "Spec", "Conf2", "Doctor", "Conf"]]
    C1 = EVar("C1")
    eng.run(
        Program(
            rules=[
                Rule(
                    Atom("prescription", Id, Patient, Npi, C1),
                    [
                        Atom("treatment", Id, Patient, Hospital, Npi, Conf1),
                        Atom("physician", Npi, Name, Spec, Conf2),
                    ],
                ),
                Rule(
                    Atom("prescription", Id, Patient, Npi, C1),
                    [Atom("medprescription", Id, Patient, Npi, Doctor, Spec, Conf)],
                ),
            ],
            facts={
                "treatment": [("Id", "Patient", "Hospital", "Npi", "Conf1")],
                "physician": [("Npi", "Name", "Spec", "Conf2")],
                "medprescription": [("Id", "Patient", "Npi", "Doctor", "Spec", "Conf")],
            },
        )
    )
    assert_golden_nulls(eng.table("prescription"), f"{RC}/doctors/prescription.csv")
