"""Provenance / tracing: which rule derived a fact, at which round.

nemo analogue: fact tracing over step-tagged subtables
(``nemo/src/execution/tracing/trace.rs``, wasm ``traceTreeForTable``)."""

from __future__ import annotations

from nemo_spark import Atom, Program, Rule, SemiNaiveEngine, Var

X, Y, Z = Var("X"), Var("Y"), Var("Z")


def test_trace_fact_and_provenance_table(spark):
    eng = SemiNaiveEngine(spark, trace=True)
    eng.register("edge", spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["a", "b"]))
    eng.run(
        Program(
            rules=[
                Rule(Atom("tc", X, Y), [Atom("edge", X, Y)], name="base"),
                Rule(Atom("tc", X, Z), [Atom("tc", X, Y), Atom("edge", Y, Z)], name="step"),
            ]
        )
    )
    # direct edge: derived by the base rule at round 0
    t = eng.trace_fact("tc", (1, 2))
    assert len(t) == 1 and t[0]["rule"] == "base" and t[0]["round"] == 0

    # two-hop: derived by the recursive rule (round 0 already sees base facts
    # merged sequentially within the round)
    t = eng.trace_fact("tc", (1, 3))
    assert len(t) == 1 and "step" in t[0]["rule"]

    # three-hop later than two-hop
    t13 = eng.trace_fact("tc", (1, 3))[0]["round"]
    t14 = eng.trace_fact("tc", (1, 4))[0]["round"]
    assert t14 > t13

    # unknown fact: no provenance
    assert eng.trace_fact("tc", (4, 1)) == []

    prov = eng.provenance_table()
    assert prov is not None
    rows = prov.collect()
    assert {r.rule for r in rows} >= {"base"}
    assert len(rows) == 6  # tc closure of a 4-chain: 3+2+1 facts


def test_trace_tree_through_local_fixpoint(spark):
    """Rule-level provenance must survive the size-adaptive local fixpoint
    (VERDICT r2: the local path used to lump everything under a
    'local_fixpoint' label, silently degrading traces exactly when the fast
    path engaged). The same program traced through both paths must agree on
    the deriving rule at every tree node."""
    prog = Program(
        rules=[
            Rule(Atom("tc", X, Y), [Atom("edge", X, Y)], name="base"),
            Rule(Atom("tc", X, Z), [Atom("tc", X, Y), Atom("edge", Y, Z)], name="step"),
        ]
    )
    edges = [(1, 2), (2, 3), (3, 4)]

    def labels(tree):
        out = {(tuple(tree["fact"]), tree["rule"])}
        for p in tree["premises"]:
            out |= labels(p)
        return out

    trees = {}
    for threshold in (0, 1_000_000):  # distributed vs local
        eng = SemiNaiveEngine(spark, trace=True, local_stratum_threshold=threshold)
        eng.register("edge", spark.createDataFrame(edges, ["a", "b"]))
        eng.run(prog)
        tree = eng.trace_tree("tc", (1, 4))
        assert tree is not None
        assert tree["rule"] == "step"
        trees[threshold] = labels(tree)
    assert trees[0] == trees[1_000_000]
    # no lumped label anywhere
    assert all(lbl != "local_fixpoint" for _, lbl in trees[1_000_000])


def test_trace_graphml_and_json_serialization():
    """GraphML + JSON-list-of-inferences serializers against a hand-built
    tree (trace.rs to_graphml / ExecutionTraceListOfInferencesJSON parity:
    fact nodes type=axiom, rule nodes type=DLRule, edges premise -> rule ->
    conclusion; input facts annotated 'Asserted'; duplicates collapse)."""
    import json
    import xml.etree.ElementTree as ET

    from nemo_spark.engine.trace_export import trace_graphml, trace_inferences_json

    leaf_e12 = {"fact": ("edge", (1, 2)), "rule": None, "premises": []}
    leaf_e23 = {"fact": ("edge", (2, 3)), "rule": None, "premises": []}
    base = {"fact": ("tc", (1, 2)), "rule": "base", "premises": [leaf_e12]}
    tree = {"fact": ("tc", (1, 3)), "rule": "step", "premises": [base, leaf_e23]}

    xml = trace_graphml(tree)
    root = ET.fromstring(xml)  # well-formed
    ns = "{http://graphml.graphdrawing.org/xmlns}"
    nodes = root.findall(f"{ns}graph/{ns}node")
    edges = root.findall(f"{ns}graph/{ns}edge")
    types = {}
    elements = {}
    for n in nodes:
        for d in n.findall(f"{ns}data"):
            if d.attrib["key"] == "type":
                types[n.attrib["id"]] = d.text
            else:
                elements[n.attrib["id"]] = d.text
    # 5 fact nodes (tc(1,3), tc(1,2), edge(1,2), edge(2,3)) + 2 rule nodes
    assert sorted(types.values()).count("axiom") == 4
    assert sorted(types.values()).count("DLRule") == 2
    facts = {elements[i] for i, t in types.items() if t == "axiom"}
    assert facts == {"tc(1, 3)", "tc(1, 2)", "edge(1, 2)", "edge(2, 3)"}
    # every rule node has exactly one outgoing edge to its conclusion fact
    # and incoming edges from its premises
    rule_ids = {i for i, t in types.items() if t == "DLRule"}
    out_edges = {e.attrib["source"]: e.attrib["target"] for e in edges if e.attrib["source"] in rule_ids}
    assert len(out_edges) == 2
    for rid, tgt in out_edges.items():
        assert types[tgt] == "axiom"
    # edge count: premise->rule (3: base<-e12, step<-tc12, step<-e23) + rule->fact (2)
    assert len(edges) == 5

    js = json.loads(trace_inferences_json(tree))
    assert js["finalConclusion"] == ["tc(1, 3)"]
    by_concl = {i["conclusion"]: i for i in js["inferences"]}
    assert by_concl["tc(1, 3)"]["ruleName"] == "step"
    assert by_concl["tc(1, 3)"]["premises"] == ["tc(1, 2)", "edge(2, 3)"]
    assert by_concl["edge(1, 2)"]["rule"] == "Asserted"
    assert "ruleName" not in by_concl["edge(1, 2)"]
    assert len(js["inferences"]) == 4  # no duplicates

    # typed values render canonically
    from nemo_spark.model.values import Value

    t2 = {"fact": ("p", (Value.iri("http://ex/a"), Value.string("hi"))), "rule": None, "premises": []}
    js2 = json.loads(trace_inferences_json(t2))
    assert js2["finalConclusion"] == ['p(<http://ex/a>, "hi")']


def test_trace_graphml_sanitizes_control_chars():
    """Control characters in data values must not break GraphML
    well-formedness (XML 1.0 cannot represent them even escaped)."""
    import xml.etree.ElementTree as ET

    from nemo_spark.engine.trace_export import trace_graphml
    from nemo_spark.model.values import Value

    tree = {
        "fact": ("p", (Value.string("a\x02b"),)),
        "rule": None,
        "premises": [],
    }
    xml = trace_graphml(tree)
    ET.fromstring(xml)  # well-formed
    assert "\x02" not in xml


def test_trace_graphml_merges_multiple_trees():
    """A LIST of trace trees must render as ONE well-formed GraphML document
    (one root element); concatenated per-tree documents would be invalid
    XML for any consumer."""
    import xml.etree.ElementTree as ET

    from nemo_spark.engine.trace_export import trace_graphml

    t1 = {"fact": ("p", (1,)), "rule": "r1", "premises": [{"fact": ("e", (1,)), "rule": None, "premises": []}]}
    t2 = {"fact": ("q", (2,)), "rule": "r2", "premises": []}
    xml = trace_graphml([t1, t2])
    root = ET.fromstring(xml)  # parses => single well-formed document
    ns = "{http://graphml.graphdrawing.org/xmlns}"
    nodes = root.findall(f"{ns}graph/{ns}node")
    assert len(nodes) == 5  # p + r1 + e, q + r2


def test_trace_export_renders_rule_text_not_reprs(spark, tmp_path):
    # rules with filters/assignments compile to lambdas; trace exports must
    # show the rule's source rendering, never the dataclass repr with its
    # '<function <lambda> at 0x...>' memory addresses (nondeterministic
    # across runs, breaks golden comparisons)
    from nemo_spark.engine.trace_export import trace_graphml, trace_inferences_json
    from nemo_spark.parser.runner import RlsRunner

    rls = tmp_path / "p.rls"
    rls.write_text(
        """
        edge(1, 2) . edge(2, 3) .
        far(?x, ?z) :- edge(?x, ?y), edge(?y, ?z), ?x < ?z .
        @output far .
        """
    )
    runner = RlsRunner(spark, rls_path=str(rls), trace=True).run()
    tree = runner.trace("far(1, 3)")
    assert tree is not None
    rules_by_label = runner.engine._rules_by_label
    for body in (trace_graphml(tree, rules_by_label), trace_inferences_json(tree, rules_by_label)):
        assert "<function" not in body and " at 0x" not in body
        # the filter renders as source text (XML-escaped in GraphML)
        assert "?x < ?z" in body or "?x &lt; ?z" in body
    # API-built rules (no parsed source) fall back to a deterministic
    # structural rendering — still no object reprs
    from nemo_spark.model.rules import Atom, Rule, Var
    import pyspark.sql.functions as F

    r = Rule(
        head=Atom("p", Var("x")),
        body=[Atom("q", Var("x"))],
        filters=[lambda cols: cols["x"] > F.lit(0)],
    )
    s = str(r)
    assert "0x" not in s and "<filter>" in s and s.startswith("p(?x) :- q(?x)")
