"""Trace serialization: GraphML and JSON-list-of-inferences renderings of a
:meth:`SemiNaiveEngine.trace_tree` result.

Reference parity (``nemo/src/execution/tracing/trace.rs``):

- GraphML (trace.rs:31-48, :144-192, the Evonne integration format): the
  tree becomes a graph of fact nodes (``type=axiom``) and rule-application
  nodes (``type=DLRule``), each carrying an ``element`` string; edges run
  premise-fact -> rule-application -> conclusion-fact. As in the
  reference's ``to_petgraph`` (one ``add_node`` per tree occurrence), a
  fact appearing as a premise of several applications gets one node per
  occurrence — the tree rendering, not the shared-storage DAG form.
- JSON (trace.rs:231-339 ``ExecutionTraceListOfInferencesJSON``): an object
  ``{"finalConclusion": [...], "inferences": [{"rule", "ruleName"?,
  "conclusion", "premises"}]}`` with input facts carrying the ``Asserted``
  annotation (trace.rs:260) and duplicate inferences emitted once.

Both serializers are pure tree walks over the dict shape trace_tree returns
({"fact": (pred, values), "rule": label|None, "premises": [...]}); no Spark
jobs run here.
"""

from __future__ import annotations

import json
import re
from xml.sax.saxutils import escape, quoteattr

from nemo_spark.model.values import Value

ASSERTED = "Asserted"  # trace.rs:260 DEFAULT_DERIVATION_ANNOTATION

# characters outside XML 1.0's Char production cannot appear in a document
# even escaped; data values may carry them (CSV/SPARQL ingest) — replace
# with U+FFFD so the GraphML stays well-formed for its consumer (Evonne)
_XML_INVALID = re.compile(
    "[^\x09\x0a\x0d\x20-\ud7ff\ue000-\ufffd\U00010000-\U0010ffff]"
)


def _xml_text(s: str) -> str:
    return escape(_XML_INVALID.sub("�", s))


def _term_str(v) -> str:
    return v.canonical() if isinstance(v, Value) else str(v)


def fact_str(fact: tuple) -> str:
    """``pred(t1, t2, ...)`` with canonical terms (GroundAtom::to_string)."""
    pred, values = fact
    return f"{pred}({', '.join(_term_str(v) for v in values)})"


def _rule_str(tree: dict, rules_by_label: dict | None) -> str:
    label = tree.get("rule")
    if rules_by_label and label in rules_by_label:
        return str(rules_by_label[label])
    if rules_by_label and label and "+" in str(label):
        # trace_tree's fallback paths carry merged provenance labels
        # ("s0r0+s0r1": the round that derived the fact merged several
        # rules and no single witness was reconstructed) — render the
        # first resolvable rule, marked as one of the alternatives,
        # instead of emitting a label mashup that names no rule
        for part in str(label).split("+"):
            if part in rules_by_label:
                return f"{rules_by_label[part]} [one of merged: {label}]"
    return str(label)


def trace_graphml(tree: dict | list[dict], rules_by_label: dict | None = None) -> str:
    """GraphML rendering of trace trees (trace.rs to_petgraph/to_graphml):
    every node is either a fact (``type=axiom``) or a rule application
    (``type=DLRule``); edges point premise -> rule -> conclusion. A LIST of
    trees merges into ONE document (one <graphml> root — concatenating
    separate documents per tree would be non-well-formed XML).

    ``rules_by_label`` (e.g. ``engine._rules_by_label``) upgrades the rule
    nodes' ``element`` from the bare label to the rule's full rendering."""
    trees = tree if isinstance(tree, list) else [tree]
    nodes: list[tuple[str, str]] = []  # (type, element)
    edges: list[tuple[int, int]] = []

    def visit(node: dict, parent_rule: int | None) -> None:
        fact_idx = len(nodes)
        nodes.append(("axiom", fact_str(node["fact"])))
        if parent_rule is not None:
            edges.append((fact_idx, parent_rule))
        if node.get("rule") is None:
            return
        rule_idx = len(nodes)
        nodes.append(("DLRule", _rule_str(node, rules_by_label)))
        edges.append((rule_idx, fact_idx))
        for premise in node.get("premises", []):
            visit(premise, rule_idx)

    for t in trees:
        visit(t, None)

    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
        '  <key id="type" for="node" attr.name="type" attr.type="string"/>',
        '  <key id="element" for="node" attr.name="element" attr.type="string"/>',
        '  <graph edgedefault="directed">',
    ]
    for i, (typ, element) in enumerate(nodes):
        out.append(f"    <node id={quoteattr(f'n{i}')}>")
        out.append(f'      <data key="type">{_xml_text(typ)}</data>')
        out.append(f'      <data key="element">{_xml_text(element)}</data>')
        out.append("    </node>")
    for src, dst in edges:
        out.append(f'    <edge source="n{src}" target="n{dst}"/>')
    out.append("  </graph>")
    out.append("</graphml>")
    return "\n".join(out)


def trace_inferences_json(
    trees: list[dict] | dict, rules_by_label: dict | None = None
) -> str:
    """JSON list-of-inferences rendering (ExecutionTraceListOfInferencesJSON):
    ``finalConclusion`` holds the traced facts; each inference records the
    rule (``Asserted`` for input facts), the instantiated conclusion, and
    the premise facts. Duplicate inferences collapse to one entry."""
    if isinstance(trees, dict):
        trees = [trees]
    inferences: list[dict] = []
    seen: set[tuple] = set()

    def visit(node: dict) -> None:
        label = node.get("rule")
        conclusion = fact_str(node["fact"])
        premises = [fact_str(p["fact"]) for p in node.get("premises", [])]
        key = (label, conclusion, tuple(premises))
        if key not in seen:
            seen.add(key)
            inf = {
                "rule": _rule_str(node, rules_by_label) if label is not None else ASSERTED,
                "conclusion": conclusion,
                "premises": premises,
            }
            if label is not None:
                inf["ruleName"] = label
            inferences.append(inf)
        for premise in node.get("premises", []):
            visit(premise)

    for t in trees:
        visit(t)
    return json.dumps(
        {
            "finalConclusion": [fact_str(t["fact"]) for t in trees],
            "inferences": inferences,
        },
        indent=2,
    )
