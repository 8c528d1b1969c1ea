"""``nmo_python`` bindings parity (``/root/reference/nemo-python``).

Mirrors the reference's own binding test
(``nemo-python/tests/test_example.py``) through the ``nmo_python`` shim:
``result()`` value conversion, ``write_result`` via an output manager,
``trace().dict()`` with ``#[name(...)]`` / ``#[display(...)]`` rule
attributes, and the ``timing()`` tree.

Deliberate divergence (documented in :mod:`nemo_spark.python_api`):
``result()`` yields rows sorted by nemo's cross-domain total order
(``AnyDataValue::cmp``), not the reference's internal trie-scan order —
the reference's own blackbox harness treats row order as irrelevant
(nemo-python/tests/test_blackbox.py:45-56). Labeled-null names are
engine-assigned; tests compare them up to bijection like the golden
harness does.
"""

from __future__ import annotations

import csv
import os

import pytest

from nmo_python import (
    NemoEngine,
    NemoError,
    NemoLiteral,
    NemoOutputManager,
    load_string,
)

RULES = """
data(1, 2) .
data(hi, 42) .
data(hello, world) .
data(py, 3.14) .
data(msg, "hello world"@en) .
data(3.14, circle).

calculated(?x, !v) :- data(?y, ?x) .
@export calculated :- csv {}.

interesting(py).
interesting(msg).

interesting(?x) :- data(?x, ?y), interesting(?y).

#[name("interesting rule")]
#[display(f"data: {?x}, {?y}")]
interesting(?y) :- data(?x, ?y), interesting(?x).

@output interesting.
"""


@pytest.fixture(scope="module")
def engine(spark):
    eng = NemoEngine(load_string(RULES), spark=spark)
    eng.reason()
    return eng


def test_result(engine):
    # test_example.py:76 with rows in our documented total order:
    # IRIs < plain strings < lang strings < doubles < ints; nulls numbered
    # in first-conversion order
    assert list(engine.result("calculated")) == [
        ["<circle>", "_:0"],
        ["<world>", "_:1"],
        [NemoLiteral("hello world", lang="en"), "_:2"],
        [3.14, "_:3"],
        [2, "_:4"],
        [42, "_:5"],
    ]


def test_result_is_stable_across_calls(engine):
    # null numbering is per-engine: a second result() call yields the
    # identical rows (the property scripts rely on, lib.rs dictionary ids)
    assert list(engine.result("calculated")) == list(engine.result("calculated"))


def test_output(engine, tmp_path):
    # test_example.py:80: one CSV per predicate in the manager's directory,
    # nemo DSV serialization; null names compared up to bijection
    engine.write_result("calculated", NemoOutputManager(str(tmp_path)))
    target = os.path.join(str(tmp_path), "calculated.csv")
    assert os.path.exists(target)
    with open(target) as f:
        rows = list(csv.reader(f))
    values = sorted(r[0] for r in rows)
    assert values == sorted(
        [
            "circle",
            "world",
            '"hello world"@en',
            "2",
            "42",
            '"3.14"^^<http://www.w3.org/2001/XMLSchema#double>',
        ]
    )
    nulls = [r[1] for r in rows]
    assert all(n.startswith("_:") for n in nulls)
    assert len(set(nulls)) == 6  # one fresh null per row


def test_output_no_overwrite(engine, tmp_path):
    engine.write_result("calculated", NemoOutputManager(str(tmp_path)))
    with pytest.raises(NemoError, match="exists"):
        engine.write_result("calculated", NemoOutputManager(str(tmp_path)))
    # overwrite=True replaces
    engine.write_result("calculated", NemoOutputManager(str(tmp_path), overwrite=True))


def test_output_gzip(engine, tmp_path):
    import gzip

    engine.write_result("calculated", NemoOutputManager(str(tmp_path), gzip=True))
    target = os.path.join(str(tmp_path), "calculated.csv.gz")
    assert os.path.exists(target)
    with gzip.open(target, "rt") as f:
        assert len(list(csv.reader(f))) == 6


def test_write_result_unknown_is_noop(engine, tmp_path):
    # lib.rs:464: unknown predicate / no @export handler => silent no-op
    engine.write_result("nosuch", NemoOutputManager(str(tmp_path)))
    engine.write_result("interesting", NemoOutputManager(str(tmp_path)))  # no @export
    assert os.listdir(str(tmp_path)) == []


def test_trace(engine):
    # test_example.py:92 — byte-identical expected dict, including the
    # #[name]/#[display] attribute instantiation
    trace = engine.trace("interesting(circle)")
    assert trace.dict() == {
        "rule": "interesting(?y) :- data(?x, ?y), interesting(?x) .",
        "assignment": {"?x": 3.14, "?y": "<circle>"},
        "name": "interesting rule",
        "display": "data: 3.14, circle",
        "subtraces": [
            {"fact": 'data("3.14"^^<http://www.w3.org/2001/XMLSchema#double>, circle)'},
            {
                "rule": "interesting(?y) :- data(?x, ?y), interesting(?x) .",
                "assignment": {"?x": "<py>", "?y": 3.14},
                "name": "interesting rule",
                "display": "data: py, 3.14",
                "subtraces": [
                    {"fact": 'data(py, "3.14"^^<http://www.w3.org/2001/XMLSchema#double>)'},
                    {"fact": "interesting(py)"},
                ],
            },
        ],
    }


def test_trace_api_surface(engine):
    trace = engine.trace("interesting(circle)")
    assert trace.fact() is None  # rule-application node
    subs = trace.subtraces()
    leaf = subs[0]
    assert leaf.subtraces() is None and leaf.rule() is None
    fact = leaf.fact()
    assert fact.predicate() == "data"
    assert fact.constants() == [3.14, "<circle>"]
    # unknown / underivable fact => None (lib.rs:440)
    assert engine.trace("interesting(nosuchthing)") is None
    assert engine.trace("not a fact ((") is None


def test_trace_backend_errors_surface(engine, monkeypatch):
    # ADVICE r6: lib.rs:440 maps only parse/validation failures to None;
    # genuine backend failures must raise NemoError, not masquerade as
    # "fact not derived"
    from nemo_spark.python_api import NemoError

    def boom(fact):
        raise RuntimeError("executor lost")

    monkeypatch.setattr(engine._runner, "trace", boom)
    with pytest.raises(NemoError, match="executor lost"):
        engine.trace("interesting(circle)")


def test_timing(engine):
    # test_example.py:120: one Reasoning/Rules/Rule {i} node per source rule
    timing = engine.timing()
    rules = timing.subnode("Reasoning/Rules")
    assert [n.name for n in rules.subnodes] == ["Rule 0", "Rule 1", "Rule 2"]
    # per-rule walls are attributed (local-fixpoint path included) and the
    # three clocks alias wall time
    assert timing.subnode("Reasoning").system_time.total_seconds() > 0
    assert sum(n.process_time.total_seconds() for n in rules.subnodes) > 0
    assert timing.subnode("Reasoning/Rules/Rule 1") is not None
    assert timing.subnode("Reasoning/NoSuch") is None


def test_literal_semantics():
    # lib.rs:109-162
    lit = NemoLiteral("hello", lang="en")
    assert lit.value() == "hello"
    assert lit.language() == "en"
    assert lit.datatype() == "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
    plain = NemoLiteral("x")
    assert plain.datatype() == "http://www.w3.org/2001/XMLSchema#string"
    assert plain.language() is None
    typed = NemoLiteral("5", datatype="http://example.org/t")
    assert typed.datatype() == "http://example.org/t"
    assert NemoLiteral("a", lang="en") == NemoLiteral("a", lang="en")
    assert NemoLiteral("a", lang="en") != NemoLiteral("a", lang="de")
    with pytest.raises(NemoError):
        NemoLiteral(5)  # type: ignore[arg-type]
    with pytest.raises(NotImplementedError):
        NemoLiteral("a") < NemoLiteral("b")


def test_program_introspection():
    prog = load_string(RULES)
    assert prog.output_predicates() == ["interesting"]
    # no @output/@export: every derived predicate (set_default_outputs.rs)
    prog2 = load_string("p(1) . q(?x) :- p(?x) . r(?x) :- q(?x) .")
    assert prog2.output_predicates() == ["q", "r"]
    assert load_string('@import p :- csv {resource = "x.csv"} . q(?x) :- p(?x) .').edb_predicates() == {"p"}


def test_load_string_errors():
    with pytest.raises(NemoError):
        load_string("p(1")  # syntax error
    with pytest.raises(NemoError):
        load_string('#[name("x")] fact(1) .')  # attributes only on rules


@pytest.mark.parametrize(
    "case", ["basic/join.rls", "basic/union.rls", "aggregate/groupBy.rls"]
)
def test_blackbox_via_bindings(spark, tmp_path, case):
    """nemo-python/tests/test_blackbox.py:21 through the shim: load_file,
    reason, write_result per golden relation, multiset-compare against the
    reference's own golden CSVs (null-bearing cases are covered by the main
    blackbox harness in test_rls_blackbox.py).

    These programs declare only ``@export`` (no ``@output``), so
    ``output_predicates()`` is EMPTY — SetDefaultOutputs only fires when
    neither is present (set_default_outputs.rs:23), and the reference's own
    blackbox harness silently compares nothing for them. We assert that
    parity quirk, then drive ``write_result`` (which keys on @export
    handlers, lib.rs:464) over each golden relation directly so the bindings
    path is actually exercised."""
    from nmo_python import load_file
    from tests.golden import TESTCASES, reference_available

    if not reference_available:
        pytest.skip("reference testcases not present")
    program = load_file(os.path.join(TESTCASES, case))
    assert program.output_predicates() == []  # exports-only => no @output
    engine = NemoEngine(program, spark=spark)
    engine.reason()
    golden_dir = os.path.join(TESTCASES, case.removesuffix(".rls"))
    compared = 0
    for fname in sorted(os.listdir(golden_dir)):
        if not fname.endswith(".csv"):
            continue
        relation = fname.removesuffix(".csv")
        golden = os.path.join(golden_dir, fname)
        out = tmp_path / relation
        out.mkdir()
        engine.write_result(relation, NemoOutputManager(str(out)))
        with open(out / f"{relation}.csv") as f:
            got = sorted(map(tuple, csv.reader(f)))
        with open(golden) as f:
            want = sorted(map(tuple, csv.reader(f)))
        assert got == want, f"{case}:{relation}"
        compared += 1
    assert compared > 0


def test_result_unknown_predicate(engine):
    # execution_engine.rs:367 predicate_rows: unknown predicate => Ok(None)
    # => lib.rs:511 flattens to an EMPTY result, not an error
    assert list(engine.result("nosuch")) == []


def test_write_result_honors_export_limit(spark, tmp_path):
    # the @export limit= option must cap the written file, exactly as
    # write_exports does (shared serialize_export path)
    prog = load_string(
        "p(1). p(2). p(3). p(4). p(5).\n@export p :- csv {limit = 2} ."
    )
    eng = NemoEngine(prog, spark=spark)
    eng.reason()
    eng.write_result("p", NemoOutputManager(str(tmp_path)))
    with open(tmp_path / "p.csv") as f:
        assert len(list(csv.reader(f))) == 2


def test_write_result_honors_export_compression(spark, tmp_path):
    # compression="gzip" on the export itself gzips the stream even when the
    # output manager's gzip flag is off — a .csv.gz that gunzips correctly
    import gzip

    prog = load_string(
        'p(1). p(2).\n@export p :- csv {resource = "out.csv.gz", compression = "gzip"} .'
    )
    eng = NemoEngine(prog, spark=spark)
    eng.reason()
    eng.write_result("p", NemoOutputManager(str(tmp_path)))
    with gzip.open(tmp_path / "out.csv.gz", "rt") as f:
        assert sorted(r[0] for r in csv.reader(f)) == ["1", "2"]


def test_write_result_first_matching_export_only(spark, tmp_path):
    # lib.rs write_result uses .find(): with two @export declarations for
    # one predicate, only the FIRST is written
    prog = load_string(
        'p(1).\n@export p :- csv {resource = "a.csv"} .\n'
        '@export p :- csv {resource = "b.csv"} .'
    )
    eng = NemoEngine(prog, spark=spark)
    eng.reason()
    eng.write_result("p", NemoOutputManager(str(tmp_path)))
    assert sorted(os.listdir(str(tmp_path))) == ["a.csv"]


def test_default_outputs_hide_compiled_intermediates():
    # nested-aggregate rules split into __agg_rN intermediates at compile
    # time; SetDefaultOutputs works on the SOURCE model, so they must not
    # leak into output_predicates()
    prog = load_string("p(1, 2). q(?x, 2 * #sum(?y)) :- p(?x, ?y).")
    assert prog.output_predicates() == ["q"]


def test_reason_wraps_engine_errors(spark, tmp_path):
    # lib.rs py_res: every engine error (including import failures, which
    # arrive as pyspark AnalysisException here) surfaces as NemoError
    prog = load_string('@import p :- csv {resource = "no_such_file.csv"} .\nq(?x) :- p(?x).')
    prog._workdir = str(tmp_path)
    eng = NemoEngine(prog, spark=spark)
    with pytest.raises(NemoError):
        eng.reason()


def test_negative_zero_conversion():
    # ``d or 0.0`` would fold -0.0 (falsy) into +0.0 during struct->Value
    # reconstruction. Note the ENGINE's stored representative for a -0.0
    # fact is +0.0 anyway: IEEE equality makes -0.0/+0.0 ONE fact under set
    # semantics and Catalyst's NormalizeFloatingNumbers picks +0.0 at the
    # dedup boundary — but trace premises and computed values travel
    # driver-side through _as_value and must keep their sign.
    import math

    from nemo_spark.python_api import _as_value

    class Cell:
        t, i, d, s = 52, 0, -0.0, ""

    v = _as_value(Cell())
    assert math.copysign(1.0, v.d) == -1.0


def test_timing_splits_merged_rule_labels(spark):
    # rounds >= 1 on the distributed path record several rules deriving one
    # head under a '+'-joined label (seminaive merged application); the wall
    # is joint, so it is split evenly instead of all crediting the first rule
    prog = load_string("e(1,2). p(?x,?y) :- e(?x,?y). p(?x,?y) :- p(?y,?x).")
    eng = NemoEngine(prog, spark=spark)
    eng.reason()
    eng._runner.report = lambda: {
        "rules": {"r0+r1": {"wall_ms": 8.0}},
        "total_wall_ms": 8.0,
        "rounds": 2,
        "derived_total": 3,
    }
    timing = eng.timing()
    assert timing.subnode("Reasoning/Rules/Rule 0").system_time.total_seconds() == pytest.approx(0.004)
    assert timing.subnode("Reasoning/Rules/Rule 1").system_time.total_seconds() == pytest.approx(0.004)


def test_bracketed_iri_predicates(spark):
    """<urn:uuid:...> is an absolute-IRI predicate, not an undeclared
    'urn' prefix; <ex:local> stays the literal IRI ex:local even when
    @prefix ex: is declared (brackets suppress prefix resolution)."""
    prog = load_string(
        "@prefix ex: <http://example.org/> .\n"
        "<urn:uuid:1234>(1) .\n<ex:local>(2) .\nex:p(3) .\n"
        "out(?x) :- <urn:uuid:1234>(?x) .\nout(?x) :- <ex:local>(?x) .\n"
        "out(?x) :- ex:p(?x) .\n@output out ."
    )
    eng = NemoEngine(prog, spark=spark)
    eng.reason()
    assert list(eng.result("out")) == [[1], [2], [3]]


def test_multiple_aggregates_in_one_term_rejected():
    # #sum(?x) + #count(?y) previously aliased BOTH aggregates to the one
    # computed value (2*sum instead of an error)
    with pytest.raises(NemoError, match="one aggregate"):
        load_string("q(1,2) . p(#sum(?x) + #count(?y)) :- q(?x, ?y) .")


def test_typed_literal_integer_domains():
    from nemo_spark.model.values import ValueError_, XSD, from_typed_literal

    assert from_typed_literal("5", XSD + "positiveInteger").i == 5
    assert from_typed_literal("0", XSD + "nonNegativeInteger").i == 0
    assert from_typed_literal("-1", XSD + "negativeInteger").i == -1
    for lex, t in [("-5", "nonNegativeInteger"), ("0", "positiveInteger"),
                   ("5", "negativeInteger"), ("1", "nonPositiveInteger")]:
        with pytest.raises(ValueError_):
            from_typed_literal(lex, XSD + t)


def test_tuple_map_value_conversion(spark):
    # Beyond the reference: lib.rs:193-194 todo!()s tuple conversion — the
    # bindings here convert tuple/map values to Python tuples/dicts (labels
    # on .label), round-tripping a tuple-valued program end to end.
    from nmo_python import NemoEngine, NemoMap, NemoTuple, load_string

    prog = load_string(
        """
        p(f(1, 2)) .
        p((3, "x")) .
        p(()) .
        p({a = 1, b = 2}) .
        q(?x) :- p(?x) .
        @output q .
        """
    )
    eng = NemoEngine(prog, spark=spark)
    eng.reason()
    rows = [r[0] for r in eng.result("q")]
    labeled = NemoTuple((1, 2), label="<f>")
    # tuple elements follow the bindings' string contract (lib.rs:167
    # datavalue_to_python): plain strings arrive as their CANONICAL quoted
    # form, exactly as top-level string results do
    plain = (3, '"x"')
    empty = ()
    m = NemoMap({"<a>": 1, "<b>": 2})
    assert labeled in rows and plain in rows and empty in rows and m in rows
    got_labeled = next(r for r in rows if r == labeled)
    assert got_labeled.label == "<f>"
    # labels participate in equality: f(1,2) != (1,2) and != g(1,2)
    assert labeled != (1, 2)
    assert labeled != NemoTuple((1, 2), label="<g>")
    assert NemoTuple((3, '"x"')) == plain  # unlabeled == plain tuple
    # ... and therefore must HASH like one (hash/eq contract): set/dict
    # membership with plain-tuple keys works both ways
    assert hash(NemoTuple((3, '"x"'))) == hash(plain)
    assert NemoTuple((3, '"x"')) in {plain} and plain in {NemoTuple((3, '"x"'))}
    assert hash(labeled) != hash((1, 2))  # labeled tuples fold the label in
    got_map = next(r for r in rows if isinstance(r, NemoMap))
    assert got_map == {"<a>": 1, "<b>": 2} and got_map.label is None
    assert list(got_map) == ["<a>", "<b>"]  # BTreeMap key order preserved
