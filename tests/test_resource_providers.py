"""HTTP and stdin resource providers for .rls imports.

Reference: ``nemo/src/io/resource_providers/{http,stdin}.rs`` — an import's
``resource`` may be an http(s) IRI (fetched, then parsed like a file) or the
empty string (= the stdin pipe, ``nemo-physical/src/resource.rs:400``)."""

from __future__ import annotations

import io
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer


class _CsvServer(BaseHTTPRequestHandler):
    body = b"a,1\nb,2\nc,3\n"

    def do_GET(self):
        self.send_response(200)
        self.send_header("Content-Type", "text/csv")
        self.send_header("Content-Length", str(len(self.body)))
        self.end_headers()
        self.wfile.write(self.body)

    def log_message(self, *a):
        pass


def test_http_resource_import(spark):
    from nemo_spark.parser.runner import RlsRunner

    srv = HTTPServer(("127.0.0.1", 0), _CsvServer)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}/data.csv"
    try:
        src = f'''
@import p :- csv{{resource="{url}", format=(string, int)}} .
q(?x, ?y) :- p(?x, ?y) .
'''
        r = RlsRunner(spark, source=src, workdir="/tmp").run()
        got = sorted(tuple(t) for t in r.serialized("q").collect())
        assert got == [('"a"', "1"), ('"b"', "2"), ('"c"', "3")]
    finally:
        srv.shutdown()


def test_stdin_resource_import(spark, monkeypatch):
    from nemo_spark.parser.runner import RlsRunner

    monkeypatch.setattr("sys.stdin", io.StringIO("x,10\ny,20\n"))
    src = """
@import p :- csv{resource="", format=(string, int)} .
doubled(?x, ?y * 2) :- p(?x, ?y) .
"""
    r = RlsRunner(spark, source=src, workdir="/tmp").run()
    got = sorted(tuple(t) for t in r.serialized("doubled").collect())
    assert got == [('"x"', "20"), ('"y"', "40")]


def test_import_export_limit_option(spark, tmp_path):
    """limit= on imports and exports (StandardParameter::Limit): the reader
    stops after N records, the writer after N rows."""
    import glob

    from nemo_spark.parser.runner import RlsRunner

    data = tmp_path / "data.csv"
    data.write_text("".join(f"r{i},{i}\n" for i in range(10)))
    src = '''
@import p :- csv{resource="data.csv", format=(string, int), limit=4} .
q(?x, ?y) :- p(?x, ?y) .
@export q :- csv{limit=2} .
'''
    r = RlsRunner(spark, source=src, workdir=str(tmp_path)).run()
    assert r.table("q").count() == 4
    out = str(tmp_path / "exports")
    r.write_exports(out)
    (d,) = glob.glob(f"{out}/q.csv")
    lines = []
    for part in glob.glob(f"{d}/part-*"):
        lines += [ln for ln in open(part).read().splitlines() if ln]
    assert len(lines) == 2


def test_compression_option_gzip(spark, tmp_path):
    """compression="gzip" (compression_format.rs): imports decompress even
    without a .gz filename; exports write gzip part files."""
    import glob
    import gzip

    from nemo_spark.parser.runner import RlsRunner

    raw = tmp_path / "data.dat"  # no .gz extension on purpose
    with gzip.open(raw, "wt") as f:
        f.write("a,1\nb,2\n")
    src = '''
@import p :- csv{resource="data.dat", format=(string, int), compression="gzip"} .
q(?x, ?y) :- p(?x, ?y) .
@export q :- csv{compression="gzip"} .
'''
    r = RlsRunner(spark, source=src, workdir=str(tmp_path)).run()
    assert r.table("q").count() == 2
    out = str(tmp_path / "exports")
    r.write_exports(out)
    parts = glob.glob(f"{out}/q.csv/part-*.gz")
    assert parts, "export parts not gzip-compressed"
    lines = []
    for part in parts:
        with gzip.open(part, "rt") as f:
            lines += [ln for ln in f.read().splitlines() if ln]
    assert len(lines) == 2
