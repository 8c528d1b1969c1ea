"""Blackbox golden tests: run the reference's OWN ``.rls`` testcase programs
through the parser-driven engine with ZERO hand translation, and compare each
``@export`` against the reference's golden CSVs.

Mirror of the reference harness (``nemo-cli/tests/blackbox_integration.rs:56-135``):
order-insensitive comparison of export files; cells are compared as csv-parsed
fields (equivalent to the reference's sorted-raw-line compare up to CSV
quoting canonicalization). Labeled nulls are engine-specific tokens, so they
are compared up to bijective renaming (wildcard + distinct-count, the same
scheme as test_restricted_chase.py)."""

from __future__ import annotations

import csv
import os
import re

import pytest

from tests.golden import TESTCASES, reference_available

pytestmark = pytest.mark.skipif(not reference_available, reason="reference testcases not present")

NULL_RE = re.compile(r"^_:\S+$")

# suite/case entries: each is an .rls path relative to TESTCASES whose golden
# directory sits next to it (same name, no extension)
CASES = [
    "basic/join.rls",
    "basic/union.rls",
    "basic/projection.rls",
    "basic/negation.rls",
    "basic/assignment.rls",
    "basic/encodings.rls",
    "basic/parameter_declaration.rls",
    "aggregate/groupBy.rls",
    "aggregate/firstVariable.rls",
    "aggregate/lastVariable.rls",
    "aggregate/anyCount.rls",
    "aggregate/distinct.rls",
    "aggregate/filtered.rls",
    "aggregate/groupByIdempotent.rls",
    "aggregate/stratification.rls",
    "aggregate/arithmetic.rls",
    "arithmetic/builtins.rls",
    "arithmetic/filter.rls",
    "arithmetic/negation.rls",
    "arithmetic/numeric_bounds.rls",
    "regression/wildcards/run.rls",
    "regression/datalog_constants/run.rls",
    "regression/variable_comparisons/run.rls",
    "regression/unbound_negation/run.rls",
    "regression/fact/arithmetic/run.rls",
    "regression/parsing/variable-names/run.rls",
    "regression/builtin/float-nan-inf/run.rls",
    "regression/symmetric_transitive_closure/run.rls",
    "regression/filter_derived/run.rls",
    "regression/analysis/equality-chain/run.rls",
    "regression/planning_engine/constants_negation/run.rls",
    "regression/planning_engine/arithmetic_chain/run.rls",
    "regression/planning_engine/join_by_eq_constraint/string.rls",
    "regression/planning_engine/join_by_eq_constraint/integer.rls",
    "regression/planning_engine/repeated_variables/run.rls",
    "regression/planning_engine/independent_head/run.rls",
    "regression/planning_engine/constants_filter/run.rls",
    "regression/stratification/binary_negated.rls",
    "regression/stratification/unary_negated.rls",
    "regression/prefixes/base_import/run.rls",
    "regression/load/sign/run.rls",
    "regression/load/issue-761-multi-arity/run.rls",
    "regression/load/multiple/run.rls",
    "regression/load/empty/run.rls",
    "regression/load/issue-765-fact-and-import/run.rls",
    "regression/restricted_chase/simple.rls",
    "regression/restricted_chase/block.rls",
    "regression/restricted_chase/block2.rls",
    "regression/restricted_chase/block3.rls",
    "regression/restricted_chase/doctors.rls",
    "regression/restricted_chase/multihead.rls",
    "regression/restricted_chase/multinulls.rls",
    "regression/restricted_chase/multipieces.rls",
    "regression/restricted_chase/only_nulls.rls",
    "regression/restricted_chase/datalog_head.rls",
    "regression/restricted_chase/head_constant.rls",
    "regression/restricted_chase/complex_head.rls",
    "regression/restricted_chase/optimization.rls",
    "regression/restricted_chase/recursive/run.rls",
    "data-formats/dsv/join-import.rls",
    "data-formats/dsv/join-export.rls",
    "data-formats/dsv/join-output.rls",
    "data-formats/dsv/headers.rls",
    "data-formats/dsv/missing-column.rls",
    "data-formats/dsv/quoting.rls",
    "data-formats/dsv/compressed.rls",
    "data-formats/dsv/format-constant-tuples.rls",
    "data-formats/dsv/bare-names-with-percent.rls",
    "data-formats/dsv/computed-names.rls",
    "regression/datatypes/normalization/run.rls",
    "regression/datatypes/mixed/numeric.rls",
    "regression/datatypes/mixed/projection.rls",
    "program_analysis/run.rls",
    "data-formats/json/authors.rls",
    "data-formats/rdf/ntriples-example2.rls",
    "data-formats/rdf/ntriples-example3.rls",
    "data-formats/rdf/nquads-example2.rls",
    "data-formats/rdf/turtle-example2.rls",
    "data-formats/rdf/trig-example2.rls",
    "data-formats/rdf/rdfxml-example7.rls",
    "regression/load/rdf-invalid-prefixes/run.rls",
    "regression/load/global-variable-in-import/run.rls",
]


def _golden_dir(rls_rel: str) -> str:
    return os.path.join(TESTCASES, rls_rel[:-4])


def _read_golden(path: str, sep: str = ",") -> list[tuple]:
    rows = []
    with open(path, newline="") as f:
        for rec in csv.reader(f, delimiter=sep):
            if rec:
                rows.append(tuple(rec))
    return rows


def _wildcard_rows(rows: list[tuple]) -> tuple[list[tuple], int]:
    nulls = set()
    out = []
    for r in rows:
        rr = []
        for c in r:
            if c is not None and NULL_RE.match(c):
                nulls.add(c)
                rr.append("__NULL__")
            else:
                rr.append(c)
        out.append(tuple(rr))
    return sorted(out), len(nulls)


_EXT_SEP = {".csv": ",", ".tsv": "\t"}


@pytest.mark.parametrize("rls_rel", CASES)
def test_blackbox(spark, rls_rel):
    from nemo_spark.parser import run_rls

    rls_path = os.path.join(TESTCASES, rls_rel)
    runner = run_rls(spark, rls_path)
    golden = _golden_dir(rls_rel)
    files = sorted(os.listdir(golden))
    assert files, f"no golden files in {golden}"
    exports = runner.export_frames()
    for fname in files:
        if fname not in exports:
            raise AssertionError(f"{rls_rel}: golden {fname} has no matching @export "
                                 f"(exports: {sorted(exports)})")
        df, exp = exports[fname]
        ext = os.path.splitext(fname)[1]
        sep = _EXT_SEP.get(ext)
        if sep is None:
            d = runner._option_value(exp, "delimiter")
            sep = d.lexical() if d is not None else ","
        got_rows = [tuple(r) for r in runner.serialized(exp.pred).collect()]
        want_rows = _read_golden(os.path.join(golden, fname), sep)
        got, got_nulls = _wildcard_rows(got_rows)
        want, want_nulls = _wildcard_rows(want_rows)
        assert got == want, (
            f"{rls_rel}:{fname}\n  missing: {sorted(set(want) - set(got))[:5]}"
            f"\n  extra:   {sorted(set(got) - set(want))[:5]}"
            f"\n  ({len(got)} got vs {len(want)} want)"
        )
        assert got_nulls == want_nulls, f"{rls_rel}:{fname} distinct nulls {got_nulls} vs {want_nulls}"


def test_nullary_predicates(spark):
    """0-arity predicates (zero.rs): propositional truth, usable in bodies,
    heads, and negation."""
    from nemo_spark.parser import RlsRunner

    src = """
    flag() :- data(1) .
    data(1). data(2).
    yes(?x) :- data(?x), flag() .
    no(?x) :- data(?x), ~off() .
    off() :- data(3) .
    """
    r = RlsRunner(spark, source=src, workdir="/tmp").run()
    assert sorted(t[0] for t in r.serialized("yes").collect()) == ["1", "2"]
    assert sorted(t[0] for t in r.serialized("no").collect()) == ["1", "2"]
    assert [tuple(t) for t in r.serialized("flag").collect()] == [("",)]
    assert r.serialized("off").count() == 0


@pytest.mark.parametrize(
    "rls_rel",
    [
        "regression/datatypes/normalization/run.rls",
        "regression/restricted_chase/only_nulls.rls",
        "arithmetic/builtins.rls",
        "basic/union.rls",
    ],
)
def test_write_exports_matches_serialized(spark, rls_rel, tmp_path):
    """write_exports (the file surface) must emit exactly serialized()'s
    rows under standard CSV quote-doubling (reference csv crate
    double_quote(true), dsv/writer.rs:42-44) — caught two real bugs:
    Spark's default backslash-escape diverging on quoted cells, and a crash
    on nullary predicates."""
    import csv as _csv
    import glob

    from nemo_spark.parser import run_rls
    from nemo_spark.parser.runner import _DELIM

    runner = run_rls(spark, os.path.join(TESTCASES, rls_rel))
    out = str(tmp_path / "exports")
    runner.write_exports(out)
    for name, (df, exp) in runner.export_frames().items():
        if exp.fmt not in ("csv", "tsv", "dsv"):
            continue
        sep = _DELIM.get(exp.fmt) or ","
        want = sorted(tuple(t) for t in runner.serialized(exp.pred).collect())
        got = []
        for part in glob.glob(os.path.join(out, name, "part-*")):
            with open(part, newline="") as f:
                got += [tuple(rec) for rec in _csv.reader(f, delimiter=sep)]
        assert sorted(got) == want, f"{rls_rel}:{name}"


def test_parser_edge_cases(spark, tmp_path):
    """Round-6 parser fixes, each reproduced as a live failure first."""
    import pytest as _pytest

    from nemo_spark.parser.rls import parse_rls, parse_term

    # 1. pname local part may contain but not END with '.' — the trailing
    # dot is the statement terminator
    ast = parse_rls("@prefix ex: <http://e.org/> . p(ex:a.b). @output ex:result.")
    assert len(ast.facts) == 1 and ast.facts[0].terms[0].local == "a.b"

    # 2. language subtags are one tag ('-US' used to leak into arithmetic)
    ast = parse_rls('p("color"@en-US).')
    assert ast.facts[0].terms[0].lang == "en-US"

    # 3. double negation folds once: -(-5) == 5, not the lexical '--5'
    from nemo_spark.parser.runner import RlsRunner

    r = RlsRunner(spark, source="p(-(-5)) . q(?x) :- p(?x) . @output q .").run()
    assert [tuple(x) for x in r.serialized("q").collect()] == [("5",)]

    # 4. f-string slots reject trailing tokens / unterminated braces loudly
    with _pytest.raises(SyntaxError, match="trailing input"):
        parse_term('f"{?x ?y}"')
    with _pytest.raises(SyntaxError, match="unterminated"):
        parse_term('f"{?x"')

    # 5. @base must not expand bare option keywords (format/compression are
    # enum tokens, not IRIs)
    (tmp_path / "data.csv").write_text("alice,31\nbob,44\n")
    r2 = RlsRunner(
        spark,
        source="""
        @base <http://example.org/> .
        @import p :- csv {resource="data.csv", format=(string, int)} .
        q(?x, ?y) :- p(?x, ?y) .
        @output q .
        """,
        workdir=str(tmp_path),
    ).run()
    rows = sorted(tuple(x) for x in r2.serialized("http://example.org/q").collect())
    assert rows == [('"alice"', "31"), ('"bob"', "44")]
