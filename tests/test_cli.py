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
