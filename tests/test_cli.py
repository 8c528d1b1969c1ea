"""``python -m nemo_spark`` CLI (nmo parity surface, nemo-cli/src/cli.rs).

The happy-path test drives a subprocess (the CLI owns and stops its own
SparkSession; running main() in-process would stop the shared test
session). Arg-validation paths run in-process — they exit before Spark."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

_PROG = """
edge(1, 2) . edge(2, 3) .
tc(?x, ?y) :- edge(?x, ?y) .
tc(?x, ?z) :- tc(?x, ?y), edge(?y, ?z) .
@parameter $cut = 99 .
big(?x) :- tc(?x, ?y), ?y >= $cut .
@export tc :- csv {} .
@output big .
"""


def test_cli_arg_validation(tmp_path):
    from nemo_spark.cli import main

    # multiple rule files: reference parity error, before Spark starts
    p1 = tmp_path / "a.rls"
    p1.write_text(_PROG)
    assert main([str(p1), str(p1)]) == 2
    assert main([str(tmp_path / "missing.rls")]) == 2
    with pytest.raises(SystemExit):
        main([str(p1), "--param", "notakeyvalue"])
    # cli.rs clap groups: trace inputs are mutually exclusive, and so are
    # -q / -v / --log; --trace-output requires a trace input
    with pytest.raises(SystemExit):
        main([str(p1), "--trace", "tc(1,2)", "--trace-all-idb-facts"])
    with pytest.raises(SystemExit):
        main([str(p1), "--trace-input-file", "f.txt", "--trace-all-idb-facts"])
    with pytest.raises(SystemExit):
        main([str(p1), "-q", "--log", "debug"])
    assert main([str(p1), "--trace-output", str(tmp_path / "t.json")]) == 2
    # a typo'd --trace-input-file fails BEFORE the reasoning run, not as a
    # FileNotFoundError traceback after the fixpoint
    assert main([str(p1), "--trace-input-file", str(tmp_path / "nope.txt")]) == 2


@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    prog = tmp_path / "prog.rls"
    prog.write_text(_PROG)
    out_dir = tmp_path / "results"
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")

    def run(*extra):
        return subprocess.run(
            [sys.executable, "-m", "nemo_spark", str(prog), "-D", str(out_dir), *extra],
            capture_output=True,
            text=True,
            timeout=300,
            cwd="/root/repo",
            env=env,
        )

    # first run: exports tc, prints the short report, traces a fact,
    # overrides $cut so big() derives
    r = run(
        "-o",
        "--param", "cut=3",
        "--trace", "tc(1, 3)",
        "--trace-output", str(tmp_path / "t.json"),
        "--print-facts", "idb",
        "--report", "short",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Reasoning completed in" in r.stdout
    assert "big(1) ." in r.stdout  # cut=3 override made big derivable
    assert (tmp_path / "t.json").exists()
    csvs = list((out_dir / "tc.csv").glob("*"))
    assert csvs, "tc export missing"
    # second run without -o: must refuse to clobber
    r2 = run("--param", "cut=3")
    assert r2.returncode == 1
    assert "overwrite" in r2.stderr
    # -g on the keep path: the @export csv {} has no compression of its own,
    # so the ExportManager default kicks in (cli.rs:136-139) — target gets a
    # .gz suffix and the parts are gzipped
    r3 = run("-o", "-g", "--param", "cut=3", "--report", "none")
    assert r3.returncode == 0, r3.stderr[-2000:]
    gz_parts = list((out_dir / "tc.csv.gz").glob("part-*.csv.gz"))
    assert gz_parts, "gzipped tc export missing"
    import gzip as _gzip

    rows = set()
    for p in gz_parts:
        rows |= set(_gzip.decompress(p.read_bytes()).decode().splitlines())
    assert "1,3" in rows and len(rows) == 3  # tc = {(1,2),(2,3),(1,3)}
    # -g on the CLASS-export path (-e idb): same ExportManager naming rule
    # as the keep path — gzipped parts under a .csv.gz target
    r3b = run("-o", "-g", "-e", "idb", "--param", "cut=3", "--report", "none")
    assert r3b.returncode == 0, r3b.stderr[-2000:]
    assert list((out_dir / "tc.csv.gz").glob("part-*.csv.gz")), "idb -g export missing"
    assert list((out_dir / "big.csv.gz").glob("part-*.csv.gz")), "idb -g export missing"
    # --trace-input-file (same ";"-separated format as --trace,
    # tracing.rs:20-24) + --log (cli.rs:88 verbosity group)
    facts_file = tmp_path / "facts.txt"
    facts_file.write_text("tc(1, 3);\ntc(1, 2)")
    r4 = run(
        "-o", "--param", "cut=3", "--export", "none", "--report", "none",
        "--trace-input-file", str(facts_file), "--log", "error",
    )
    assert r4.returncode == 0, r4.stderr[-2000:]
    assert r4.stdout.count("tc(") >= 3  # two trees, tc(1,3) has a tc(1,2) premise
    # --trace-all-idb-facts (tracing.rs:45-69) with a structured output file
    r5 = run(
        "-o", "--param", "cut=3", "--export", "none", "--report", "none",
        "--trace-all-idb-facts", "--trace-output", str(tmp_path / "all.json"),
    )
    assert r5.returncode == 0, r5.stderr[-2000:]
    import json as _json

    all_traces = _json.loads((tmp_path / "all.json").read_text())
    # every derived fact traced: tc has 3 facts, big = {1, 2} makes 5
    assert len(all_traces["finalConclusion"]) == 5
    assert any(c.startswith("big(") for c in all_traces["finalConclusion"])
