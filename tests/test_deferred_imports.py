"""Binding-pushdown deferred imports.

Reference: ``nemo/src/execution/planning/operations/join_imports_simple.rs``
/ ``join_imports_general.rs`` — an import atom in a rule body is not loaded
eagerly; it is restricted by the bindings of the other body atoms. Spark
mapping: the engine hands the loader the distinct binding keys; the default
loader restricts with a broadcast LEFT SEMI join (plan-asserted below), the
SPARQL loader pushes the keys server-side as VALUES pages."""

from __future__ import annotations

from nemo_spark.engine.seminaive import SemiNaiveEngine, semi_join_loader
from nemo_spark.model.rules import Atom, Program, Rule, Var

X, Y, Z = Var("x"), Var("y"), Var("z")


def _edges(spark):
    return spark.createDataFrame(
        [(i, i + 1) for i in range(20)] + [(100, 200), (200, 300)],
        "a long, b long",
    )


def test_deferred_equals_eager(spark):
    """Deferred import restricted per rule application produces exactly the
    eager import's results — including through recursion, where each round's
    delta restricts the next load."""
    prog = Program(
        rules=[
            Rule(head=Atom("reach", X, Y), body=[Atom("seed", X), Atom("imp", X, Y)]),
            Rule(head=Atom("reach", X, Z), body=[Atom("reach", X, Y), Atom("imp", Y, Z)]),
        ]
    )
    seeds = [(0,), (5,), (100,)]

    def run(deferred: bool):
        eng = SemiNaiveEngine(spark, local_stratum_threshold=0)
        eng.register("seed", spark.createDataFrame(seeds, "a long"))
        frame = _edges(spark).toDF("c0", "c1")
        if deferred:
            eng.register_deferred("imp", semi_join_loader(frame), 2)
        else:
            eng.register("imp", frame)
        eng.run(prog)
        return sorted((r.c0, r.c1) for r in eng.table("reach").collect())

    eager, deferred = run(False), run(True)
    assert eager == deferred
    assert len(eager) > 20  # closure from 0 and 5 along the chain + 100 hop


def test_deferred_loader_sees_bindings_and_plans_semi_join(spark):
    """The loader receives the distinct binding keys of the shared
    variables, and the default loader's restricted frame is a broadcast
    LEFT SEMI join — the import is filtered before the rule's main join."""
    captured = []
    frame = _edges(spark).toDF("c0", "c1")
    inner = semi_join_loader(frame)

    def loader(bindings):
        out = inner(bindings)
        captured.append((bindings, out))
        return out

    prog = Program(
        rules=[Rule(head=Atom("out", X, Y), body=[Atom("seed", X), Atom("imp", X, Y)])]
    )
    eng = SemiNaiveEngine(spark, local_stratum_threshold=0)
    eng.register("seed", spark.createDataFrame([(0,), (5,)], "a long"))
    eng.register_deferred("imp", loader, 2)
    eng.run(prog)
    assert sorted((r.c0, r.c1) for r in eng.table("out").collect()) == [(0, 1), (5, 6)]

    bindings, restricted = captured[0]
    assert bindings is not None
    shared, keys = bindings
    assert [name for _, name in shared] == ["x"]
    assert sorted(r.x for r in keys.collect()) == [0, 5]
    plan = restricted._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, plan
    assert "Broadcast" in plan, plan


def test_deferred_full_load_when_unbound(spark):
    """A deferred atom with no bindings available (first/only atom) loads
    the full frame once and the predicate is cached as a plain table."""
    calls = []
    frame = _edges(spark).toDF("c0", "c1")

    def loader(bindings):
        calls.append(bindings)
        return frame

    prog = Program(rules=[Rule(head=Atom("copy", X, Y), body=[Atom("imp", X, Y)])])
    eng = SemiNaiveEngine(spark, local_stratum_threshold=0)
    eng.register_deferred("imp", loader, 2)
    eng.run(prog)
    assert calls == [None]
    assert eng.table("copy").count() == frame.count()
    assert eng.has_table("imp")  # cached as a plain table


def test_deferred_negation_forces_full_load(spark):
    """A negated deferred import must subtract its COMPLETE table, so the
    engine full-loads it rather than restricting by bindings."""
    calls = []
    blocked = spark.createDataFrame([(1,), (3,)], "a long").toDF("c0")

    def loader(bindings):
        calls.append(bindings)
        return blocked

    prog = Program(
        rules=[
            Rule(head=Atom("ok", X), body=[Atom("seed", X)], negated=[Atom("blk", X)])
        ]
    )
    eng = SemiNaiveEngine(spark, local_stratum_threshold=0)
    eng.register("seed", spark.createDataFrame([(1,), (2,), (3,), (4,)], "a long"))
    eng.register_deferred("blk", loader, 1)
    eng.run(prog)
    assert calls == [None]
    assert sorted(r.c0 for r in eng.table("ok").collect()) == [2, 4]


def test_sparql_deferred_pushes_values(spark):
    """SPARQL deferred import: the rule's bindings reach the endpoint as a
    VALUES block, and the result equals the eagerly-imported evaluation."""
    import threading
    from http.server import HTTPServer

    from nemo_spark.sources.sparql import read_sparql_typed, sparql_deferred_loader
    from tests.test_sparql import _Endpoint

    _Endpoint.seen = []
    _Endpoint.max_values = None
    srv = HTTPServer(("127.0.0.1", 0), _Endpoint)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    endpoint = f"http://127.0.0.1:{srv.server_address[1]}/sparql"
    try:
        prog = Program(
            rules=[
                Rule(head=Atom("out", X, Y, Z), body=[Atom("seed", X), Atom("triple", X, Y, Z)])
            ]
        )
        from nemo_spark.model.values import Value

        seed = spark.createDataFrame(
            [(Value.iri("http://ex/a").as_row(),), (Value.iri("http://ex/c").as_row(),)],
            "c0 struct<t:int,i:long,d:double,s:string>",
        )

        def run(deferred: bool):
            eng = SemiNaiveEngine(spark, local_stratum_threshold=0)
            eng.register("seed", seed)
            if deferred:
                eng.register_deferred(
                    "triple", sparql_deferred_loader(spark, endpoint, ["s", "p", "o"]), 3
                )
            else:
                eng.register("triple", read_sparql_typed(spark, endpoint))
            eng.run(prog)
            return sorted(
                tuple(tuple(c) for c in r) for r in eng.table("out").collect()
            )

        eager = run(False)
        _Endpoint.seen = []
        deferred = run(True)
        assert eager == deferred and len(eager) == 3
        assert any("VALUES (?s)" in q for _, q in _Endpoint.seen)
    finally:
        srv.shutdown()


def test_rls_sparql_import_is_deferred_with_pushdown(spark):
    """A @import ... sparql predicate used in a multi-atom rule body is
    registered deferred by the runner: the endpoint receives a VALUES block
    restricting the query to the body's bindings instead of a full pull."""
    import threading
    from http.server import HTTPServer

    from nemo_spark.parser.runner import RlsRunner
    from tests.test_sparql import _Endpoint

    _Endpoint.seen = []
    _Endpoint.max_values = None
    srv = HTTPServer(("127.0.0.1", 0), _Endpoint)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    endpoint = f"http://127.0.0.1:{srv.server_address[1]}/sparql"
    try:
        src = f'''
seed(<http://ex/a>) .
seed(<http://ex/c>) .
@import triple :- sparql{{endpoint="{endpoint}"}} .
out(?x, ?p, ?y) :- seed(?x), triple(?x, ?p, ?y) .
@export out :- csv{{}} .
'''
        r = RlsRunner(spark, source=src, workdir="/tmp").run()
        got = sorted(tuple(t) for t in r.serialized("out").collect())
        assert len(got) == 3  # a: knows+name, c: label
        assert all(row[0] in ("http://ex/a", "http://ex/c") for row in got)
        assert any("VALUES (?s)" in q for _, q in _Endpoint.seen)
        # never a full unrestricted pull
        assert all("VALUES" in q for _, q in _Endpoint.seen)
    finally:
        srv.shutdown()


def test_deferred_pred_cannot_be_idb_head(spark):
    """A deferred import is an EDB source: deriving into it is rejected
    (loader frames and merged facts would interleave incoherently)."""
    import pytest

    eng = SemiNaiveEngine(spark, local_stratum_threshold=0)
    eng.register_deferred("imp", lambda b: None, 2)
    prog = Program(rules=[Rule(head=Atom("imp", X, Y), body=[Atom("imp", X, Y)])])
    with pytest.raises(ValueError, match="deferred import"):
        eng.run(prog)


def test_deferred_conflicts_rejected(spark):
    """ADVICE r3: a predicate that is both a deferred import AND a plain
    table / inline-fact source must be rejected loudly — previously the
    loader's rows silently vanished (rule eval checks _tables first)."""
    import pytest

    frame = _edges(spark).toDF("c0", "c1")

    # register() over an existing deferred import
    eng = SemiNaiveEngine(spark, local_stratum_threshold=0)
    eng.register_deferred("imp", semi_join_loader(frame), 2)
    with pytest.raises(ValueError, match="deferred"):
        eng.register("imp", frame)

    # register_deferred() over an existing table
    eng = SemiNaiveEngine(spark, local_stratum_threshold=0)
    eng.register("imp", frame)
    with pytest.raises(ValueError, match="registered table"):
        eng.register_deferred("imp", semi_join_loader(frame), 2)

    # inline facts for a deferred predicate, caught at run()
    eng = SemiNaiveEngine(spark, local_stratum_threshold=0)
    eng.register_deferred("imp", semi_join_loader(frame), 2)
    prog = Program(
        rules=[Rule(head=Atom("out", X, Y), body=[Atom("imp", X, Y)])],
        facts={"imp": [(1, 2)]},
    )
    with pytest.raises(ValueError, match="inline facts"):
        eng.run(prog)


def test_deferred_full_load_then_register_ok(spark):
    """After a full load the predicate IS a plain table: re-registering it
    (or re-running) must not trip the conflict guard."""
    eng = SemiNaiveEngine(spark, local_stratum_threshold=0)
    frame = _edges(spark).toDF("c0", "c1")
    eng.register_deferred("imp", semi_join_loader(frame), 2)
    full = eng.table("imp")  # forces the full load
    assert full.count() == 22
    eng.register("imp", frame)  # no raise: deferred status consumed
