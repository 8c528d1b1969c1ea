"""Golden parity on the reference's LCS diff-computation program
(testcases/lcs-diff-computation/run-lcs-10.rls, Myers-1986 diff as recursive
Datalog with existential rules / multi-atom heads).

Null naming differs by construction (nemo numbers nulls in creation order,
``_:0..``; we use deterministic skolem hashes), so null-BEARING relations are
compared by cardinality + exact null-free row subset (structure is isomorphic
iff our chase derives the same shapes), while null-FREE relations are compared
exactly against the golden CSVs.
"""

from __future__ import annotations

import pytest

from nemo_spark import Atom, Program, Rule, SemiNaiveEngine, Var
from nemo_spark.model.rules import EVar
from tests.golden import assert_golden, df_lines, expected_lines, load_csv_facts, reference_available

pytestmark = pytest.mark.skipif(not reference_available, reason="reference testcases not present")

LCS = "lcs-diff-computation"


def _v(*names):
    return [Var(n) for n in names]


def lcs_program(prefix_only: bool = False) -> Program:
    X, Y, Z, P, C = _v("X", "Y", "Z", "P", "C")
    B, Bp, Bmax, U, Up, L = _v("B", "Bp", "Bmax", "U", "Up", "L")
    D, Dm, Dp, K, Kp, Km, Kpp = _v("D", "Dm", "Dp", "K", "Kp", "Km", "Kpp")
    A, Ap, A1, A1p, A2, B1, B2, B2p = _v("A", "Ap", "A1", "A1p", "A2", "B1", "B2", "B2p")
    AposM, BposM, Apos, Bpos = _v("AposM", "BposM", "Apos", "Bpos")
    contentA, contentB, content = _v("contentA", "contentB", "content")
    Aend, Bend, MinusD = _v("Aend", "Bend", "MinusD")
    Xp, Lm = EVar("Xp"), EVar("Lm")

    r = Rule
    rules = [
        r(Atom("docAend", X), [Atom("docA", X, "ENDOFA")]),
        r(Atom("docBend", X), [Atom("docB", X, "ENDOFB")]),
        r(Atom("infDocA", P, C), [Atom("docA", P, C)]),
        r(Atom("infDocB", P, C), [Atom("docB", P, C)]),
        r(Atom("ltLetter", X, Y), [Atom("sLetter", X, Y)]),
        # non-linear (doubling) closure: same fixpoint as the reference's
        # linear rule, O(log chain) fixpoint rounds instead of O(chain)
        r(Atom("ltLetter", X, Z), [Atom("ltLetter", X, Y), Atom("ltLetter", Y, Z)]),
        r(Atom("neq", X, Y), [Atom("ltLetter", X, Y)]),
        r(Atom("neq", X, Y), [Atom("neq", Y, X)]),
        r(Atom("lt", X, Y), [Atom("s", X, Y)]),
        r(Atom("lt", X, Z), [Atom("lt", X, Y), Atom("lt", Y, Z)]),
        r(Atom("eq", X, X), [Atom("s", X, Y)]),
        r(Atom("eq", X, X), [Atom("s", Y, X)]),
        r(Atom("ge", X, Y), [Atom("lt", Y, X)]),
        r(Atom("ge", X, X), [Atom("eq", X, Y)]),
        r(Atom("doPlus", X, "p0"), [Atom("docAend", X)]),
        r(
            Atom("s", X, Xp),
            [Atom("doPlus", X, B), Atom("s", B, Bp), Atom("lt", B, Bmax), Atom("docBend", Bmax)],
            extra_heads=[Atom("doPlus", Xp, Bp)],
        ),
        r(Atom("greatest", X), [Atom("doPlus", X, Bmax), Atom("docBend", Bmax)]),
        r(
            Atom("minus", Up, Lm),
            [Atom("minus", U, L), Atom("s", U, Up)],
            extra_heads=[Atom("s", Lm, L)],
        ),
        r(Atom("smallest", X), [Atom("minus", Y, X), Atom("greatest", Y)]),
        r(Atom("s2", X, Z), [Atom("s", X, Y), Atom("s", Y, Z)]),
        # diagonal extension
        r(
            Atom("path", D, K, Apos, Bpos),
            [
                Atom("path", D, K, AposM, BposM),
                Atom("s", AposM, Apos),
                Atom("s", BposM, Bpos),
                Atom("docA", Apos, content),
                Atom("docB", Bpos, content),
            ],
            extra_heads=[Atom("edge", AposM, BposM, Apos, Bpos, "eq")],
        ),
        # furthest paths
        r(
            Atom("furthestPath", D, K, AposM, BposM),
            [
                Atom("path", D, K, AposM, BposM),
                Atom("s", AposM, Apos),
                Atom("s", BposM, Bpos),
                Atom("docA", Apos, contentA),
                Atom("docB", Bpos, contentB),
                Atom("neq", contentA, contentB),
            ],
        ),
        r(
            Atom("furthestPath", D, K, AposM, BposM),
            [
                Atom("path", D, K, AposM, BposM),
                Atom("s", AposM, Apos),
                Atom("docA", Apos, contentA),
                Atom("ge", BposM, Bend),
                Atom("docBend", Bend),
            ],
        ),
        r(
            Atom("furthestPath", D, K, AposM, BposM),
            [
                Atom("path", D, K, AposM, BposM),
                Atom("s", BposM, Bpos),
                Atom("docB", Bpos, contentB),
                Atom("ge", AposM, Aend),
                Atom("docAend", Aend),
            ],
        ),
        r(
            Atom("furthestPath", D, K, AposM, BposM),
            [
                Atom("path", D, K, AposM, BposM),
                Atom("ge", AposM, Aend),
                Atom("docAend", Aend),
                Atom("ge", BposM, Bend),
                Atom("docBend", Bend),
            ],
        ),
        # new path computations
        r(
            Atom("startPathComp", D, Dp, MinusD),
            [Atom("nonfinal", D, D), Atom("s", D, Dp), Atom("minus", Dp, MinusD)],
        ),
        r(
            Atom("startPathComp", Dm, D, Kpp),
            [Atom("startPathComp", Dm, D, K), Atom("nonfinal", D, K), Atom("s2", K, Kpp)],
        ),
        r(
            Atom("nonfinal", D, K),
            [Atom("furthestPath", D, K, A, B), Atom("lt", A, Aend), Atom("docAend", Aend)],
        ),
        r(
            Atom("nonfinal", D, K),
            [Atom("furthestPath", D, K, A, B), Atom("lt", B, Bend), Atom("docBend", Bend)],
        ),
        # start new path from best prior (k=-D, k=D, middle down/right)
        r(
            Atom("path", D, K, A, Bp),
            [
                Atom("startPathComp", Dm, D, K),
                Atom("minus", D, K),
                Atom("s", K, Kp),
                Atom("furthestPath", Dm, Kp, A, B),
                Atom("s", B, Bp),
            ],
            extra_heads=[Atom("edge", A, B, A, Bp, "down")],
        ),
        r(
            Atom("path", D, D, Ap, B),
            [
                Atom("startPathComp", Dm, D, D),
                Atom("s", Km, D),
                Atom("furthestPath", Dm, Km, A, B),
                Atom("s", A, Ap),
            ],
            extra_heads=[Atom("edge", A, B, Ap, B, "right")],
        ),
        r(
            Atom("path", D, K, A2, B2p),
            [
                Atom("startPathComp", Dm, D, K),
                Atom("s", Km, K),
                Atom("s", K, Kp),
                Atom("furthestPath", Dm, Km, A1, B1),
                Atom("furthestPath", Dm, Kp, A2, B2),
                Atom("lt", A1, A2),
                Atom("s", B2, B2p),
            ],
            extra_heads=[Atom("edge", A2, B2, A2, B2p, "down")],
        ),
        r(
            Atom("path", D, K, A1p, B1),
            [
                Atom("startPathComp", Dm, D, K),
                Atom("s", Km, K),
                Atom("s", K, Kp),
                Atom("furthestPath", Dm, Km, A1, B1),
                Atom("furthestPath", Dm, Kp, A2, B2),
                Atom("ge", A1, A2),
                Atom("s", A1, A1p),
            ],
            extra_heads=[Atom("edge", A1, B1, A1p, B1, "right")],
        ),
        # extract LCS
        r(
            Atom("gather", A, B),
            [Atom("furthestPath", D, K, A, B), Atom("docAend", A), Atom("docBend", B)],
        ),
        r(
            Atom("lcs", A, B, content),
            [Atom("gather", A, B), Atom("edge", Ap, Bp, A, B, "eq"), Atom("docA", A, content)],
            extra_heads=[Atom("gather", Ap, Bp)],
        ),
        r(Atom("gather", Ap, Bp), [Atom("gather", A, B), Atom("edge", Ap, Bp, A, B, "down")]),
        r(Atom("gather", Ap, Bp), [Atom("gather", A, B), Atom("edge", Ap, Bp, A, B, "right")]),
    ]
    if prefix_only:
        # the sLetter/doc-derived slice (no existential chains, no diff
        # search): converges in a handful of rounds, golden-exact
        keep = {"docAend", "docBend", "infDocA", "infDocB", "ltLetter", "neq"}
        rules = [r for r in rules if r.head.pred in keep]
        return Program(rules=rules)
    return Program(
        rules=rules,
        facts={"minus": [("p0", "p0")], "path": [("p0", "p0", "p0", "p0")]},
    )


NULL_FREE = ["infDocA", "infDocB", "docAend", "docBend", "neq", "ltLetter", "lcs", "gather"]
NULL_BEARING = [
    "s", "lt", "eq", "ge", "doPlus", "minus", "smallest", "greatest", "s2",
    "path", "edge", "furthestPath", "nonfinal", "startPathComp",
]


def test_lcs_prefix_relations(spark):
    """LCS subprogram (letter order + doc relations — no existential chains):
    these relations are golden-exact regardless of the diff search, and the
    doubling closure converges in O(log alphabet) rounds. The full program is
    the opt-in slow test below (deep sequential recursion pays a fixpoint
    barrier per chain element — see COVERAGE.md known limitation)."""
    eng = SemiNaiveEngine(spark)
    eng.register("docA", load_csv_facts(spark, f"{LCS}/lcs10-doca.csv", 2))
    eng.register("docB", load_csv_facts(spark, f"{LCS}/lcs10-docb.csv", 2))
    eng.register("s", load_csv_facts(spark, f"{LCS}/lcs10-succ.csv", 2))
    eng.register("sLetter", load_csv_facts(spark, f"{LCS}/lcs10-letters.csv", 2))
    eng.run(lcs_program(prefix_only=True))
    for p in ["infDocA", "infDocB", "docAend", "docBend", "neq", "ltLetter"]:
        assert_golden(eng.table(p), f"{LCS}/run-lcs-10/{p}.csv")


@pytest.mark.slow
def test_lcs_10(spark):
    eng = SemiNaiveEngine(spark)
    eng.register("docA", load_csv_facts(spark, f"{LCS}/lcs10-doca.csv", 2))
    eng.register("docB", load_csv_facts(spark, f"{LCS}/lcs10-docb.csv", 2))
    eng.register("s", load_csv_facts(spark, f"{LCS}/lcs10-succ.csv", 2))
    eng.register("sLetter", load_csv_facts(spark, f"{LCS}/lcs10-letters.csv", 2))
    eng.run(lcs_program())

    for p in NULL_FREE:
        assert_golden(eng.table(p), f"{LCS}/run-lcs-10/{p}.csv")

    for p in NULL_BEARING:
        got = df_lines(eng.table(p))
        want = expected_lines(f"{LCS}/run-lcs-10/{p}.csv")
        assert len(got) == len(want), f"{p}: {len(got)} rows vs golden {len(want)}"
        got_nf = [ln for ln in got if "_:" not in ln]
        want_nf = [ln for ln in want if "_:" not in ln]
        assert got_nf == want_nf, f"{p}: null-free rows differ"


def test_lcs10_full_parity_local_fixpoint(spark):
    """FULL run-lcs-10.rls golden parity in the default CI budget (~25s):
    the size-adaptive local fixpoint collapses the deep sequential recursion
    (one barrier per chain element on the distributed path — the -m slow
    variant) into one in-memory pass; outputs identical to the reference's
    golden directory, nulls compared up to renaming."""
    import csv
    import os
    import re

    from nemo_spark.parser import RlsRunner
    from tests.golden import TESTCASES

    rls = os.path.join(TESTCASES, "lcs-diff-computation/run-lcs-10.rls")
    gold = os.path.join(TESTCASES, "lcs-diff-computation/run-lcs-10")
    r = RlsRunner(spark, rls_path=rls, local_stratum_threshold=200_000).run()
    exp = r.export_frames()
    NR = re.compile(r"^_:\S+$")

    def wildcard(rows):
        nulls, out = set(), []
        for row in rows:
            rr = []
            for c in row:
                if NR.match(c):
                    nulls.add(c)
                    rr.append("*")
                else:
                    rr.append(c)
            out.append(tuple(rr))
        return sorted(out), len(nulls)

    for f in sorted(os.listdir(gold)):
        assert f in exp, f
        got = [tuple(x) for x in r.serialized(exp[f][1].pred).collect()]
        with open(os.path.join(gold, f), newline="") as fh:
            want = [tuple(rec) for rec in csv.reader(fh) if rec]
        g, gn = wildcard(got)
        w, wn = wildcard(want)
        assert g == w, f"{f}: {len(g)} vs {len(w)}"
        assert gn == wn, f"{f}: distinct nulls {gn} vs {wn}"
