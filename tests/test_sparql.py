"""SPARQL endpoint import against a local mock HTTP endpoint.

Covers the reference protocol surface (nemo/src/io/formats/sparql.rs):
GET under 2000 chars / form-POST above, Accept: text/tab-separated-values,
TSV decode through the DSV 'anything' cell parser, VALUES binding-pushdown
paging, and HTTP 413 page-halving — plus an end-to-end ``@import ... sparql``
program through the RlsRunner."""

from __future__ import annotations

import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from nemo_spark.model.values import Value

# fixed store, SPARQL-TSV term syntax; header + rows
_HEADER = "?s\t?p\t?o"
_ROWS = [
    "<http://ex/a>\t<http://ex/knows>\t<http://ex/b>",
    "<http://ex/b>\t<http://ex/knows>\t<http://ex/c>",
    '<http://ex/a>\t<http://ex/name>\t"alice"',
    '<http://ex/b>\t<http://ex/age>\t"42"^^<http://www.w3.org/2001/XMLSchema#integer>',
    '<http://ex/c>\t<http://ex/label>\t"ciao"@it',
]


class _Endpoint(BaseHTTPRequestHandler):
    """Minimal SPARQL protocol server: returns the store as TSV, filtered by
    an injected VALUES (?s ...) block when present; optionally 413s queries
    whose VALUES carry more than ``max_values`` rows."""

    store = _ROWS
    seen: list[tuple[str, str]] = []  # (method, query)
    max_values: int | None = None

    def _answer(self, method: str, query: str) -> None:
        type(self).seen.append((method, query))
        rows = self.store
        if "VALUES (?s)" in query:
            import re

            block = re.search(r"VALUES \(\?s\) \{(.*?)\}", query, re.DOTALL).group(1)
            wanted = re.findall(r"\(<([^>]*)>\)", block)
            if self.max_values is not None and len(wanted) > self.max_values:
                self.send_response(413)
                self.end_headers()
                return
            rows = [r for r in self.store if r.split("\t")[0] in {f"<{w}>" for w in wanted}]
        body = "\n".join([_HEADER] + rows).encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/tab-separated-values")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        q = urllib.parse.parse_qs(urllib.parse.urlsplit(self.path).query)
        self._answer("GET", q.get("query", [""])[0])

    def do_POST(self):
        length = int(self.headers.get("Content-Length", 0))
        form = urllib.parse.parse_qs(self.rfile.read(length).decode())
        self._answer("POST", form.get("query", [""])[0])

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def endpoint():
    _Endpoint.seen = []
    _Endpoint.max_values = None
    srv = HTTPServer(("127.0.0.1", 0), _Endpoint)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/sparql"
    srv.shutdown()


def _vals(df):
    return sorted(
        tuple(Value(c["t"], c["i"], c["d"], c["s"]).canonical() for c in row)
        for row in df.collect()
    )


def test_sparql_import_get_default_query(spark, endpoint):
    from nemo_spark.sources.sparql import read_sparql_typed

    df = read_sparql_typed(spark, endpoint)
    assert len(df.columns) == 3
    got = _vals(df)
    assert len(got) == 5
    # typed decode: IRI, plain string, xsd:integer -> i64, lang string
    flat = {c for row in got for c in row}
    assert "<http://ex/a>" in flat
    assert '"alice"' in flat
    assert "42" in flat
    assert '"ciao"@it' in flat
    assert _Endpoint.seen[0][0] == "GET"
    assert "SELECT ?s ?p ?o WHERE { ?s ?p ?o }" in _Endpoint.seen[0][1]


def test_sparql_import_post_when_long(spark, endpoint):
    from nemo_spark.sources.sparql import read_sparql_typed

    pad = " ".join(["# padding"] * 400)  # > 2000 chars -> POST (sparql.rs:39)
    q = f"SELECT ?s ?p ?o WHERE {{ ?s ?p ?o }} {pad}"
    df = read_sparql_typed(spark, endpoint, query=q)
    assert df.count() == 5
    assert _Endpoint.seen[0][0] == "POST"


def test_sparql_bindings_pushdown_values(spark, endpoint):
    from nemo_spark.sources.sparql import read_sparql_typed

    df = read_sparql_typed(
        spark,
        endpoint,
        bindings=(["s"], [(Value.iri("http://ex/a"),), (Value.iri("http://ex/c"),)]),
    )
    got = _vals(df)
    assert len(got) == 3  # only subjects a and c
    assert all(row[0] in ("<http://ex/a>", "<http://ex/c>") for row in got)
    assert "VALUES (?s)" in _Endpoint.seen[0][1]


def test_sparql_binding_pages(spark, endpoint, monkeypatch):
    import nemo_spark.sources.sparql as sp

    monkeypatch.setattr(sp, "MAX_BINDINGS_PER_PAGE", 2)
    bindings = (["s"], [(Value.iri(f"http://ex/{x}"),) for x in "abc"])
    df = sp.read_sparql_typed(spark, endpoint, bindings=bindings)
    assert df.count() == 5  # a:2 facts + b:2 + c:1
    assert len(_Endpoint.seen) == 2  # ceil(3/2) pages


def test_sparql_413_halves_page(spark, endpoint):
    from nemo_spark.sources.sparql import read_sparql_typed

    _Endpoint.max_values = 1  # any page with >1 VALUES rows gets 413
    bindings = (["s"], [(Value.iri(f"http://ex/{x}"),) for x in "abc"])
    df = read_sparql_typed(spark, endpoint, bindings=bindings)
    assert df.count() == 5
    # at least one 413'd attempt plus the single-row retries
    assert len(_Endpoint.seen) > 3


def test_sparql_413_split_preserves_paren_bindings(spark, endpoint):
    """ADVICE r3: the 413 retry must re-split the page's STRUCTURED binding
    rows, not regex-reparse the query text — IRIs containing '(' / ')'
    previously mis-split into garbled sub-queries."""
    from nemo_spark.sources.sparql import read_sparql_typed

    _Endpoint.store = _ROWS + [
        "<http://ex/f(1)>\t<http://ex/knows>\t<http://ex/g(2,3)>",
        "<http://ex/g(2,3)>\t<http://ex/knows>\t<http://ex/a>",
    ]
    try:
        _Endpoint.max_values = 1  # any page with >1 VALUES rows gets 413
        bindings = (
            ["s"],
            [
                (Value.iri("http://ex/f(1)"),),
                (Value.iri("http://ex/g(2,3)"),),
                (Value.iri("http://ex/a"),),
            ],
        )
        df = read_sparql_typed(spark, endpoint, bindings=bindings)
        got = _vals(df)
        assert len(got) == 4  # f(1):1 + g(2,3):1 + a:2
        assert ("<http://ex/f(1)>", "<http://ex/knows>", "<http://ex/g(2,3)>") in got
    finally:
        _Endpoint.store = _ROWS


def test_sparql_large_result_streams_to_staging_files(spark, endpoint):
    """A multi-chunk response is staged to disk while streaming (driver
    memory O(chunk)) and parsed distributed via spark.read.text."""
    import glob
    import os

    import nemo_spark.sources.sparql as sp

    n = 60_000  # ~3.5 MB body, > _CHUNK so the streaming loop iterates
    _Endpoint.store = [
        f"<http://ex/s{i}>\t<http://ex/p>\t{i}" for i in range(n)
    ]
    try:
        before = len(sp._staging_dirs)
        df = sp.read_sparql_typed(spark, endpoint)
        assert df.count() == n
        staged = [
            f for d in sp._staging_dirs[before:] for f in glob.glob(os.path.join(d, "*.tsv"))
        ]
        assert staged, "result was not staged to files"
        assert sum(os.path.getsize(f) for f in staged) > sp._CHUNK
    finally:
        _Endpoint.store = _ROWS


def test_sparql_rls_program(spark, endpoint, tmp_path):
    """@import ... sparql end-to-end: import, join in a rule, serialize."""
    from nemo_spark.parser.runner import RlsRunner

    src = f'''
@import triple :- sparql{{endpoint="{endpoint}"}} .
knows(?x, ?y) :- triple(?x, <http://ex/knows>, ?y) .
reach(?x, ?y) :- knows(?x, ?y) .
reach(?x, ?z) :- reach(?x, ?y), knows(?y, ?z) .
@export reach :- csv{{}} .
'''
    r = RlsRunner(spark, source=src, workdir=str(tmp_path)).run()
    got = sorted(tuple(t) for t in r.serialized("reach").collect())
    assert got == [
        ("http://ex/a", "http://ex/b"),
        ("http://ex/a", "http://ex/c"),
        ("http://ex/b", "http://ex/c"),
    ]


def test_rdf_export_roundtrip_and_drop_semantics(spark, tmp_path):
    """@export ... ntriples: typed table -> N-Triples lines with the
    reference writer's drop semantics (non-IRI/bnode subject or non-IRI
    predicate drops the row, rdf/writer.rs:241-305); re-importing the
    export yields the surviving triples unchanged."""
    import glob

    from nemo_spark.parser.runner import RlsRunner
    from nemo_spark.sources.rdf_typed import read_rdf_typed

    src = '''
t(<http://ex/a>, <http://ex/p>, "lit") .
t(<http://ex/a>, <http://ex/p>, 42) .
t("not-an-iri", <http://ex/p>, <http://ex/b>) .
t(<http://ex/a>, "not-an-iri", <http://ex/b>) .
@export t :- ntriples{} .
'''
    r = RlsRunner(spark, source=src, workdir="/tmp").run()
    out = str(tmp_path / "exports")
    r.write_exports(out)
    (path,) = glob.glob(f"{out}/*.nt")
    back = read_rdf_typed(spark, path, "ntriples")
    rows = sorted(
        tuple(tuple(c) for c in row) for row in back.collect()
    )
    assert len(rows) == 2  # the two literal-subject / literal-predicate rows dropped
    assert "lit" in {row[2][3] for row in rows}
    assert 42 in {row[2][1] for row in rows}


def test_merge_sparql_imports_query_text():
    """Textual merge: projection vars renamed to rule vars (shared names
    join server-side), non-projected vars made import-local."""
    from nemo_spark.sources.sparql import merge_sparql_imports

    q1 = "SELECT ?a ?b WHERE { ?a <http://ex/knows> ?b . }"
    q2 = "SELECT ?s ?o WHERE { ?s <http://ex/name> ?o }"
    merged, names = merge_sparql_imports([(q1, ["a", "b"], ["x", "y"]), (q2, ["s", "o"], ["y", "n"])])
    assert names == ["x", "y", "n"]
    assert merged == (
        "SELECT ?x ?y ?n WHERE { ?x <http://ex/knows> ?y . ?y <http://ex/name> ?n . }"
    )
    # non-projected variable gets an import-scoped fresh name
    q3 = "SELECT ?s ?o WHERE { ?s ?hidden ?o }"
    merged2, _ = merge_sparql_imports([(q1, ["a", "b"], ["x", "y"]), (q3, ["s", "o"], ["y", "z"])])
    assert "?__m1_hidden" in merged2
    # unmergeable shapes: duplicate projection / non-SELECT
    assert merge_sparql_imports([(q1, ["a", "a"], ["x", "y"])]) is None
    assert merge_sparql_imports([("ASK { ?s ?p ?o }", ["s"], ["x"])]) is None


class _EvalEndpoint(BaseHTTPRequestHandler):
    """Mock endpoint that EVALUATES simple conjunctive SELECT queries
    (triple patterns joined over the store, optional trailing VALUES
    restriction) — the surface merged queries need."""

    store: list[tuple[str, str, str]] = []
    seen: list[str] = []

    def _eval(self, query: str) -> tuple[list[str], list[tuple]]:
        import re

        sel = re.search(r"SELECT\s+((?:\?\w+\s*)+)\s*WHERE\s*\{(.*)\}\s*$", query, re.DOTALL)
        out_vars = re.findall(r"\?(\w+)", sel.group(1))
        body = sel.group(2)
        values_rows = None
        mv = re.search(r"VALUES \(([?\w ]+)\) \{ (.*) \}\s*$", body, re.DOTALL)
        if mv:
            body = body[: mv.start()]
            vvars = re.findall(r"\?(\w+)", mv.group(1))
            rows = re.findall(r"\(((?:[^()\"<]|<[^>]*>|\"(?:[^\"\\]|\\.)*\")*)\)", mv.group(2))
            term_re = r'<[^>]*>|"(?:[^"\\]|\\.)*"(?:\^\^<[^>]*>|@[\w-]+)?|\S+'
            values_rows = (vvars, [tuple(re.findall(term_re, r)) for r in rows])
        toks = re.findall(
            r'\?\w+|<[^>]*>|"(?:[^"\\]|\\.)*"(?:\^\^<[^>]*>|@[\w-]+)?|\.', body
        )
        terms = [t for t in toks if t != "."]
        patterns = [tuple(terms[i : i + 3]) for i in range(0, len(terms), 3)]

        def unify(pattern, triple, binding):
            b = dict(binding)
            for pt, tt in zip(pattern, triple):
                if pt.startswith("?"):
                    v = pt[1:]
                    if v in b and b[v] != tt:
                        return None
                    b[v] = tt
                elif pt != tt:
                    return None
            return b

        bindings = [{}]
        for pat in patterns:
            bindings = [
                b2 for b in bindings for t in self.store if (b2 := unify(pat, t, b)) is not None
            ]
        if values_rows:
            vvars, rows = values_rows
            allowed = set(rows)
            bindings = [
                b for b in bindings if tuple(b.get(v, "UNDEF") for v in vvars) in allowed
            ]
        out, seen_rows = [], set()
        for b in bindings:
            row = tuple(b.get(v, "") for v in out_vars)
            if row not in seen_rows:
                seen_rows.add(row)
                out.append(row)
        return out_vars, out

    def _answer(self, query: str) -> None:
        type(self).seen.append(query)
        out_vars, rows = self._eval(query)
        body = "\n".join(
            ["\t".join("?" + v for v in out_vars)] + ["\t".join(r) for r in rows]
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/tab-separated-values")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        q = urllib.parse.parse_qs(urllib.parse.urlsplit(self.path).query)
        self._answer(q.get("query", [""])[0])

    def do_POST(self):
        length = int(self.headers.get("Content-Length", 0))
        form = urllib.parse.parse_qs(self.rfile.read(length).decode())
        self._answer(form.get("query", [""])[0])

    def log_message(self, *a):
        pass


@pytest.fixture()
def eval_endpoint():
    _EvalEndpoint.seen = []
    _EvalEndpoint.store = [
        ("<http://ex/a>", "<http://ex/knows>", "<http://ex/b>"),
        ("<http://ex/b>", "<http://ex/knows>", "<http://ex/c>"),
        ("<http://ex/b>", "<http://ex/name>", '"bob"'),
        ("<http://ex/c>", "<http://ex/name>", '"carol"'),
    ]
    srv = HTTPServer(("127.0.0.1", 0), _EvalEndpoint)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/sparql"
    srv.shutdown()


def test_merge_sparql_single_remote_request(spark, eval_endpoint, tmp_path):
    """Two SPARQL imports against one endpoint joined in one rule coalesce
    into ONE remote query (merge_sparql.rs parity) with the join evaluated
    server-side."""
    from nemo_spark.parser.runner import RlsRunner

    src = f'''
@import knows :- sparql{{endpoint="{eval_endpoint}", query="SELECT ?a ?b WHERE {{ ?a <http://ex/knows> ?b . }}"}} .
@import label :- sparql{{endpoint="{eval_endpoint}", query="SELECT ?s ?o WHERE {{ ?s <http://ex/name> ?o . }}"}} .
out(?x, ?n) :- knows(?x, ?y), label(?y, ?n) .
@export out :- csv{{}} .
'''
    r = RlsRunner(spark, source=src, workdir=str(tmp_path)).run()
    got = sorted(tuple(t) for t in r.serialized("out").collect())
    assert got == [("http://ex/a", '"bob"'), ("http://ex/b", '"carol"')]
    assert len(_EvalEndpoint.seen) == 1, _EvalEndpoint.seen
    q = _EvalEndpoint.seen[0]
    assert "<http://ex/knows>" in q and "<http://ex/name>" in q  # one joined query


def test_merge_sparql_binding_pushdown(spark, eval_endpoint, tmp_path):
    """A merged group below other body atoms still pushes the current
    bindings server-side as a VALUES block over the shared variables."""
    from nemo_spark.parser.runner import RlsRunner

    src = f'''
seed(<http://ex/b>) .
@import knows :- sparql{{endpoint="{eval_endpoint}", query="SELECT ?a ?b WHERE {{ ?a <http://ex/knows> ?b . }}"}} .
@import label :- sparql{{endpoint="{eval_endpoint}", query="SELECT ?s ?o WHERE {{ ?s <http://ex/name> ?o . }}"}} .
out(?x, ?n) :- seed(?x), knows(?x, ?y), label(?y, ?n) .
@export out :- csv{{}} .
'''
    r = RlsRunner(spark, source=src, workdir=str(tmp_path)).run()
    got = sorted(tuple(t) for t in r.serialized("out").collect())
    assert got == [("http://ex/b", '"carol"')]
    assert len(_EvalEndpoint.seen) == 1, _EvalEndpoint.seen
    assert "VALUES (?x)" in _EvalEndpoint.seen[0]


def test_sparql_staging_released_after_full_load(spark, endpoint):
    """A deferred SPARQL import's staged pages are deleted once the full
    load is eagerly materialized (long-lived sessions must not accumulate
    staging files for data that is already checkpointed)."""
    import os

    import nemo_spark.sources.sparql as sp
    from nemo_spark.engine.seminaive import SemiNaiveEngine

    eng = SemiNaiveEngine(spark, local_stratum_threshold=0)
    eng.register_deferred(
        "triple",
        sp.sparql_deferred_loader(
            spark, endpoint, ["s", "p", "o"], "SELECT ?s ?p ?o WHERE { ?s ?p ?o }"
        ),
        3,
    )
    before = sp.staging_mark()
    full = eng.table("triple")  # forces the eager full load
    assert full.count() == 5
    assert sp.staging_mark() == before  # dirs created by the load are gone
    assert full.count() == 5  # checkpointed frame still answers


def test_merge_skips_prologued_queries(spark, eval_endpoint, tmp_path):
    """A PREFIX/BASE prologue cannot survive the textual merge (the copied
    body would keep prefixed names with the declarations dropped): such
    imports load separately — correct results, one request each."""
    from nemo_spark.parser.runner import RlsRunner

    src = f'''
@import knows :- sparql{{endpoint="{eval_endpoint}", query="PREFIX ex: <http://ex/> SELECT ?a ?b WHERE {{ ?a <http://ex/knows> ?b . }}"}} .
@import label :- sparql{{endpoint="{eval_endpoint}", query="SELECT ?s ?o WHERE {{ ?s <http://ex/name> ?o . }}"}} .
out(?x, ?n) :- knows(?x, ?y), label(?y, ?n) .
@export out :- csv{{}} .
'''
    r = RlsRunner(spark, source=src, workdir=str(tmp_path)).run()
    got = sorted(tuple(t) for t in r.serialized("out").collect())
    assert got == [("http://ex/a", '"bob"'), ("http://ex/b", '"carol"')]
    assert len(_EvalEndpoint.seen) == 2, _EvalEndpoint.seen  # NOT merged


def test_merge_rename_spares_iris_and_literals():
    """?name sequences inside <IRIs> and quoted literals must not be
    rewritten by the merge's variable renaming."""
    from nemo_spark.sources.sparql import merge_sparql_imports

    q1 = 'SELECT ?s ?o WHERE { ?s <http://ex/search?q=1&v=2> ?o . ?s <http://ex/p> "what?s up ?s" }'
    q2 = "SELECT ?a ?b WHERE { ?a <http://ex/knows> ?b }"
    merged, names = merge_sparql_imports(
        [(q1, ["s", "o"], ["x", "y"]), (q2, ["a", "b"], ["y", "z"])]
    )
    assert "<http://ex/search?q=1&v=2>" in merged  # IRI untouched
    assert '"what?s up ?s"' in merged  # literal untouched
    assert "?x <http://ex/search" in merged  # the real variable renamed
    assert names == ["x", "y", "z"]


def test_deferred_empty_bindings_skip_fetch(spark, endpoint):
    """Zero binding keys means an empty restricted result: the loader must
    NOT fall through to an unrestricted whole-endpoint dump."""
    from nemo_spark.sources.sparql import sparql_deferred_loader

    loader = sparql_deferred_loader(
        spark, endpoint, ["s", "p", "o"], "SELECT ?s ?p ?o WHERE { ?s ?p ?o }"
    )
    empty_keys = spark.createDataFrame([], "s struct<t:int,i:bigint,d:double,s:string>")
    before = len(_Endpoint.seen)
    out = loader(([(0, "s")], empty_keys))
    assert out.count() == 0
    assert len(_Endpoint.seen) == before  # no HTTP request issued


def test_merge_rename_spares_single_quotes_and_comments():
    from nemo_spark.sources.sparql import _rename_query_vars

    body = "?s <http://ex/p> 'don?t' . # trailing ?comment\n?s ?p ?o"
    out = _rename_query_vars(body, {"s": "x"}, 0)
    assert "'don?t'" in out
    assert "# trailing ?comment" in out
    assert out.startswith("?x ")
    assert "?__m0_p ?__m0_o" in out


def test_sparql_staging_released_per_round(spark, endpoint):
    """Restricted (per-application) SPARQL loads during a recursive fixpoint
    must not accumulate staging dirs: each round's merges materialize every
    consumer, and the round releases its pages."""
    import nemo_spark.sources.sparql as sp
    from nemo_spark.engine.seminaive import SemiNaiveEngine
    from nemo_spark.model.rules import Atom, Program, Rule, Var

    X, Y, Z = Var("x"), Var("y"), Var("z")
    prog = Program(
        rules=[
            Rule(head=Atom("reach", X, Y), body=[Atom("seed", X), Atom("knows", X, Y)]),
            Rule(head=Atom("reach", X, Z), body=[Atom("reach", X, Y), Atom("knows", Y, Z)]),
        ]
    )
    eng = SemiNaiveEngine(spark, local_stratum_threshold=0)
    eng.register(
        "seed",
        spark.createDataFrame(
            [((13, 0, 0.0, "http://ex/a"),)],
            "c0 struct<t:int,i:bigint,d:double,s:string>",
        ),
    )
    eng.register_deferred(
        "knows",
        sp.sparql_deferred_loader(
            spark, endpoint, ["s", "o"],
            "SELECT ?s ?o WHERE { ?s <http://ex/knows> ?o }",
        ),
        2,
    )
    before = sp.staging_mark()
    eng.run(prog)
    assert eng.table("reach").count() == 2  # (a,b) and (a,c) via b
    assert sp.staging_mark() == before  # every round released its pages
    # restriction actually happened (VALUES pushdown, not full dumps)
    assert any("VALUES (?s)" in q for _, q in _Endpoint.seen)
