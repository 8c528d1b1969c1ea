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


def test_min_max_over_tuples_elementwise(spark):
    """#min/#max over tuple values follow nemo's ELEMENT-WISE tuple order
    (derived slice Ord over AnyDataValue), not the canonical-string order:
    (2,9) < (2,10) even though "(2,10)" < "(2,9)" as strings. Verified
    through the full .rls path on both the distributed and local engines."""
    from nemo_spark.parser.runner import RlsRunner

    src = """
p((2, 9)) .
p((2, 10)) .
p((1, 100)) .
lo(#min(?x)) :- p(?x) .
hi(#max(?x)) :- p(?x) .
"""
    for threshold in (0, 1_000_000):  # distributed vs local fixpoint
        r = RlsRunner(
            spark, source=src, workdir="/tmp", local_stratum_threshold=threshold
        ).run()
        assert [t[0] for t in r.serialized("lo").collect()] == ['"(1,100)"^^<nemo:tuple>']
        assert [t[0] for t in r.serialized("hi").collect()] == ['"(2,10)"^^<nemo:tuple>']


def test_min_max_random_value_sets_match_python_model(spark):
    """Property check (seeded random, one Spark job per set): Spark #min /
    #max over mixed scalar+tuple+map value sets equal the Python value
    model's min/max under Value.order_key — on random sets including
    nested/labeled tuples and maps."""
    import random

    from nemo_spark.engine.seminaive import SemiNaiveEngine
    from nemo_spark.model.rules import Atom, Program, Rule, Var, agg
    from nemo_spark.model.values import Value
    from nemo_spark.sources.dsv_typed import typed_rows_df

    rng = random.Random(42)

    def rand_value(depth=0):
        kinds = ["int", "str", "iri", "double", "bool"]
        if depth < 2:
            kinds += ["tuple", "tuple", "ltuple", "map"]
        k = rng.choice(kinds)
        if k == "int":
            return Value.int(rng.randrange(-50, 50))
        if k == "str":
            return Value.string(rng.choice(["a", "b", "ab", "z", ""]))
        if k == "iri":
            return Value.iri("http://ex/" + rng.choice("xyz"))
        if k == "double":
            return Value.double(rng.choice([-1.5, 0.0, 2.25, 99.0]))
        if k == "bool":
            return Value.boolean(rng.random() < 0.5)
        if k == "map":
            return Value.map_of(
                [(rand_value(2), rand_value(2)) for _ in range(rng.randrange(3))]
            )
        label = Value.iri("f") if k == "ltuple" else None
        return Value.tuple_of(
            [rand_value(depth + 1) for _ in range(rng.randrange(4))], label=label
        )

    X = Var("x")
    for trial in range(8):
        vals = [rand_value() for _ in range(rng.randrange(2, 9))]
        eng = SemiNaiveEngine(spark, local_stratum_threshold=0)
        eng.register("p", typed_rows_df(spark, [(v,) for v in vals], 1))
        eng.run(
            Program(
                rules=[
                    Rule(Atom("lo", agg.min(X)), [Atom("p", X)]),
                    Rule(Atom("hi", agg.max(X)), [Atom("p", X)]),
                ]
            )
        )
        want_lo = min(vals, key=lambda v: v.order_key()).as_row()
        want_hi = max(vals, key=lambda v: v.order_key()).as_row()
        got_lo = [tuple(r.c0) for r in eng.table("lo").collect()]
        got_hi = [tuple(r.c0) for r in eng.table("hi").collect()]
        assert got_lo == [want_lo], f"trial {trial}: {got_lo} != {want_lo}"
        assert got_hi == [want_hi], f"trial {trial}: {got_hi} != {want_hi}"


def test_declare_arity_validation(spark):
    """@declare participates in arity consistency checking (validate_arity,
    programs.rs:208): a declared arity conflicting with a fact or rule use
    is a compile error; a consistent declaration runs normally."""
    import pytest

    from nemo_spark.parser.compile import CompileError
    from nemo_spark.parser.runner import RlsRunner

    ok = """
@declare p(int, int) .
p(1, 2) .
q(?x) :- p(?x, ?y) .
"""
    r = RlsRunner(spark, source=ok, workdir="/tmp").run()
    assert r.table("q").count() == 1

    bad_fact = '@declare p(int, int) .\np(1) .\n'
    with pytest.raises(CompileError, match="arity"):
        RlsRunner(spark, source=bad_fact, workdir="/tmp")

    bad_use = '@declare p(int) .\nq(?x) :- p(?x, ?y) .\n'
    with pytest.raises(CompileError, match="arity"):
        RlsRunner(spark, source=bad_use, workdir="/tmp")


def test_declare_nullary_consistent(spark):
    """A 0-arity declaration of a nullary predicate matches the unit-column
    rewrite (must not be rejected as an arity conflict)."""
    from nemo_spark.parser.runner import RlsRunner

    src = """
@declare p() .
p() .
q(1) :- p() .
"""
    r = RlsRunner(spark, source=src, workdir="/tmp").run()
    assert r.table("q").count() == 1


def test_export_serialization_exact_ints_with_nulls(spark):
    """Integers above 2^53 serialize exactly even when the batch contains
    NULL value cells (the Arrow->pandas float64 conversion trap)."""
    from nemo_spark.parser.runner import _flatten_values, _serialize_batches
    from nemo_spark.model.values import Value

    big = 9007199254740993  # 2^53 + 1: float64 would round it
    rows = [
        (Value.int(big).as_row(),),
        (None,),
        (Value.int(-big).as_row(),),
        (Value.int(2**63 - 1).as_row(),),
    ]
    df = spark.createDataFrame(rows, "c0 struct<t:int,i:bigint,d:double,s:string>")
    ser = _flatten_values(df).mapInPandas(_serialize_batches(["c0"]), schema="c0 string")
    got = sorted((r.c0 for r in ser.collect()), key=lambda x: (x is None, x))
    assert got == sorted(
        [str(big), str(-big), str(2**63 - 1), None], key=lambda x: (x is None, x)
    )


def test_typed_sum_ulong_semantics(spark):
    """#sum with u64-range operands: integer-only groups overflow i64 and
    are no-result (previously ULONG rows were silently EXCLUDED from the
    total); mixed with doubles the sum is f64 including the u64 value."""
    from nemo_spark.engine.seminaive import SemiNaiveEngine
    from nemo_spark.model.rules import Atom, Program, Rule, Var, agg
    from nemo_spark.model.values import T_DOUBLE, Value
    from nemo_spark.sources.dsv_typed import typed_rows_df

    X, G = Var("x"), Var("g")
    prog = Program(rules=[Rule(Atom("s", G, agg.sum(X)), [Atom("p", G, X)])])

    big = Value.int(2**63)  # T_ULONG
    rows = [
        (Value.string("ints"), Value.int(1)),
        (Value.string("ints"), big),
        (Value.string("mixed"), Value.double(1.5)),
        (Value.string("mixed"), big),
        (Value.string("plain"), Value.int(7)),
    ]
    eng = SemiNaiveEngine(spark, local_stratum_threshold=0)
    eng.register("p", typed_rows_df(spark, rows, 2))
    eng.run(prog)
    got = {r.c0["s"]: r.c1 for r in eng.table("s").collect()}
    assert "ints" not in got  # i64 overflow: group dropped (no-result)
    assert got["plain"]["i"] == 7
    assert got["mixed"]["t"] == T_DOUBLE
    assert got["mixed"]["d"] == 1.5 + float(2**63)


def test_trace_tree_typed_values(spark):
    """trace_tree over a TYPED program: witness rows come back as struct
    Rows and must compare as struct literals (F.lit(Row) built an array
    literal and the trace crashed)."""
    from nemo_spark.engine.seminaive import SemiNaiveEngine
    from nemo_spark.model.rules import Atom, Program, Rule, Var
    from nemo_spark.model.values import Value
    from nemo_spark.sources.dsv_typed import typed_rows_df

    X, Y, Z = Var("x"), Var("y"), Var("z")
    prog = Program(
        rules=[
            Rule(Atom("tc", X, Y), [Atom("edge", X, Y)], name="base"),
            Rule(Atom("tc", X, Z), [Atom("tc", X, Y), Atom("edge", Y, Z)], name="step"),
        ]
    )
    a, b, c = Value.iri("a"), Value.iri("b"), Value.iri("c")
    eng = SemiNaiveEngine(spark, trace=True, local_stratum_threshold=0)
    eng.register("edge", typed_rows_df(spark, [(a, b), (b, c)], 2))
    eng.run(prog)
    tree = eng.trace_tree("tc", (a, c))
    assert tree is not None and tree["rule"] == "step"
    assert tree["premises"], tree
