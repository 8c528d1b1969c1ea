"""Per-rule reasoning report (``nmo --report`` parity).

The reference CLI prints a TimedCode tree with one ``Reasoning/Rules/Rule
{i}`` node per rule (nemo-cli/src/main.rs:136, execution_engine.rs:227) plus
derivation counts; ``RlsRunner.report()`` exposes the same information as a
structured dict."""

from __future__ import annotations

from nemo_spark.parser.runner import RlsRunner

_PROG = """
edge(1, 2) . edge(2, 3) . edge(3, 4) .
reach(?x, ?y) :- edge(?x, ?y) .
reach(?x, ?z) :- reach(?x, ?y), edge(?y, ?z) .
big(?x) :- reach(?x, ?y), ?y >= 3 .
@output reach, big .
"""


def test_report_tree_shape(spark):
    r = RlsRunner(spark, source=_PROG, workdir="/tmp").run()
    rep = r.report()
    assert set(rep) == {"total_wall_ms", "rounds", "derived_total", "rules"}
    # three rules, each applied at least once
    assert len(rep["rules"]) == 3
    for label, stats in rep["rules"].items():
        assert set(stats) == {"stratum", "wall_ms", "derived_rows", "applications"}
        assert stats["applications"] >= 1
        assert stats["wall_ms"] >= 0.0
    # the recursive rule ran more rounds than the base rule
    assert rep["rounds"] >= 2
    # derived counts are NEW facts: reach has 6 tuples, big has 3
    assert sum(s["derived_rows"] for s in rep["rules"].values()) == rep["derived_total"]
    assert rep["derived_total"] == 6 + 3
    assert rep["total_wall_ms"] > 0.0
