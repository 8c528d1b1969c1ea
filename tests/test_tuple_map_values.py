"""Tuple / Map value domains.

Mirrors the reference unit tests (nemo-physical/src/datavalues/
tuple_datavalue.rs:126-199, map_datavalue.rs:140-199) and exercises ground
structured terms through the full .rls path: construction in facts,
propagation through rules, equality selection, DATATYPE/fullStr
introspection, and DSV export serialization."""

from __future__ import annotations

from nemo_spark.model.values import NEMO_MAP, NEMO_TUPLE, T_MAP, T_TUPLE, Value


def test_tuple_value_lexical_and_canonical():
    # tuple_datavalue.rs test_tuple (42, "test", true) labeled
    dv1, dv2, dv3 = Value.int(42), Value.string("test"), Value.boolean(True)
    label = Value.iri("http://example.org/label")
    t = Value.tuple_of([dv1, dv2, dv3], label=label)
    assert t.t == T_TUPLE
    assert t.i == 3
    assert t.datatype_iri() == NEMO_TUPLE
    assert t.lexical() == (
        "<http://example.org/label>"
        '(42,"test","true"^^<http://www.w3.org/2001/XMLSchema#boolean>)'
    )
    assert t.canonical().endswith("^^<nemo:tuple>")


def test_tuple_equality_semantics():
    # tuple_datavalue.rs test_tuple_eq: same label+elements equal; extra
    # element or different label unequal
    dv = [Value.int(42), Value.string("test"), Value.boolean(True)]
    l1 = Value.iri("http://example.org/label1")
    l2 = Value.iri("http://example.org/label2")
    assert Value.tuple_of(dv, l1) == Value.tuple_of(list(dv), l1)
    assert Value.tuple_of(dv, l1) != Value.tuple_of(dv + [dv[2]], l1)
    assert Value.tuple_of(dv, l1) != Value.tuple_of(dv, l2)


def test_empty_tuple_canonical():
    # tuple_datavalue.rs test_empty_tuple
    t = Value.tuple_of([])
    assert t.lexical() == "()"
    assert t.canonical() == '"()"^^<nemo:tuple>'


def test_map_key_order_and_duplicates():
    # map_datavalue.rs test_map_equality: duplicate keys keep the LAST
    # value; pair order does not matter; key-sorted lexical form
    dv1, dv2 = Value.int(42), Value.string("test")
    dv3, dv4 = Value.boolean(True), Value.string("test2")
    m1 = Value.map_of([(dv1, dv2), (dv1, dv3), (dv2, dv4)])
    m2 = Value.map_of([(dv2, dv4), (dv1, dv3)])
    m3 = Value.map_of([(dv1, dv2), (dv2, dv4)])
    assert m1 == m2
    assert m1.lexical() == m2.lexical()
    assert m1 != m3
    assert m1.i == 2  # length after key dedup
    assert m1.datatype_iri() == NEMO_MAP
    assert m1.t == T_MAP
    # cross-domain key order: strings (20) sort before integers (100)
    assert m1.lexical().startswith('{"test"=')


def test_rls_program_tuples_and_maps(spark):
    """Ground structured terms end-to-end: facts with function terms,
    tuples, empty tuple, and maps; rule propagation; equality selection
    (the destructuring form the reference supports — whole-value
    unification); serialization matches nemo's canonical DSV export."""
    from nemo_spark.parser.runner import RlsRunner

    src = """
p(f(1, 2)) .
p((3, "x")) .
p(()) .
p({a = 1, b = 2}) .
q(?x) :- p(?x) .
sel(?x) :- p(?x), ?x = (3, "x") .
dt(DATATYPE(?x)) :- p(?x) .
"""
    r = RlsRunner(spark, source=src, workdir="/tmp").run()
    got = sorted(t[0] for t in r.serialized("q").collect())
    assert got == [
        '"()"^^<nemo:tuple>',
        '"(3,\\"x\\")"^^<nemo:tuple>',
        '"<f>(1,2)"^^<nemo:tuple>',
        '"{<a>=1,<b>=2}"^^<nemo:map>',
    ]
    assert [t[0] for t in r.serialized("sel").collect()] == ['"(3,\\"x\\")"^^<nemo:tuple>']
    dts = sorted(t[0] for t in r.serialized("dt").collect())
    assert dts == ["nemo:map", "nemo:tuple"]


def test_rls_nonground_tuple_rejected(spark):
    """Structured terms containing variables are invalid programs in the
    reference (normalization/atom/head.rs:144 panic); we raise CompileError."""
    import pytest

    from nemo_spark.parser.compile import CompileError
    from nemo_spark.parser.runner import RlsRunner

    src = """
p(1, 2) .
q((?x, ?y)) :- p(?x, ?y) .
"""
    with pytest.raises(CompileError):
        RlsRunner(spark, source=src, workdir="/tmp").run()


def test_nested_tuples(spark):
    """Tuples nest (elements are canonical strings of any value, including
    other tuples)."""
    inner = Value.tuple_of([Value.int(1)])
    outer = Value.tuple_of([inner, Value.int(2)])
    assert outer.lexical() == '("(1)"^^<nemo:tuple>,2)'
