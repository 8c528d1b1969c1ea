"""SPARQL endpoint import — the last reference source format.

Reference semantics (``nemo/src/io/formats/sparql.rs``,
``sparql/reader.rs``, ``sparql/queries.rs``):

- ``@import pred :- sparql{endpoint=..., query=...}``; the query defaults to
  ``SELECT ?s ?p ?o WHERE { ?s ?p ?o }`` (sparql.rs:48).
- The query is sent with ``Accept: text/tab-separated-values``; as an HTTP
  GET ``?query=`` parameter when it fits in 2 000 chars, form-encoded POST
  otherwise (sparql.rs:39, :188-192; resource_providers/http.rs:108-115).
- The response body is parsed as DSV with tab delimiter, ``quoting=false``,
  ``ignore_headers=true`` and the import's value formats (default
  ``anything`` per column) — reader.rs:137-171. SPARQL-TSV terms
  (``<iri>``, ``"lit"^^<dt>``, ``_:b``) are exactly what the DSV
  ``anything`` format decodes, so the cells reuse
  :func:`nemo_spark.model.values.parse_dsv_any` unchanged.
- Binding pushdown: restricting bindings are injected as ``VALUES`` blocks
  and paged at 32 000 bindings / 740 000 chars per query, halving the page
  on HTTP 413 (sparql.rs:42-45, reader.rs:99-135).

Spark mapping: the HTTP exchange is inherently a single-server boundary
(the endpoint, not Spark, is the bottleneck), so pages are fetched on the
driver and the *parsing* is distributed — response lines are parallelized
and decoded by the same Arrow-batched cell parser as the DSV reader. At
cluster scale multiple VALUES pages fetch concurrently (thread pool), which
is also how a 1000-executor job should treat a remote endpoint: bounded
client-side parallelism, never one request per task hammering the server.
"""

from __future__ import annotations

import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Iterator, Sequence
from concurrent.futures import ThreadPoolExecutor

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from nemo_spark.model.values import VALUE_SCHEMA, Value, ValueError_
from nemo_spark.sources.dsv_typed import _PARSERS

HTTP_GET_CHAR_LIMIT = 2_000  # sparql.rs:39
MAX_BINDINGS_PER_PAGE = 32_000  # sparql.rs:42
QUERY_PAGE_CHAR_LIMIT = 740_000  # sparql.rs:45
QUERY_DEFAULT = "SELECT ?s ?p ?o WHERE { ?s ?p ?o }"  # sparql.rs:48
_ACCEPT = "text/tab-separated-values"


def fetch_sparql_tsv(endpoint: str, query: str, timeout: float = 120.0) -> str:
    """One SPARQL protocol exchange; returns the raw TSV body."""
    if len(query) > HTTP_GET_CHAR_LIMIT:
        data = urllib.parse.urlencode({"query": query}).encode()
        req = urllib.request.Request(
            endpoint,
            data=data,
            headers={
                "Accept": _ACCEPT,
                "Content-Type": "application/x-www-form-urlencoded",
            },
        )
    else:
        sep = "&" if "?" in endpoint else "?"
        req = urllib.request.Request(
            endpoint + sep + urllib.parse.urlencode({"query": query}),
            headers={"Accept": _ACCEPT},
        )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.read().decode("utf-8")


def _term_sparql(v: Value | None) -> str:
    """Value -> SPARQL VALUES term (queries.rs ground_term_from_datavalue);
    labeled nulls have no ground form -> UNDEF."""
    from nemo_spark.model.values import T_IRI, T_LANG, T_NULL, T_STRING, quote_string

    if v is None or v.t == T_NULL:
        return "UNDEF"
    if v.t == T_IRI:
        return f"<{v.s}>"
    if v.t == T_STRING:
        return quote_string(v.s)
    if v.t == T_LANG:
        content, lang = v.lang_pair()
        return quote_string(content) + "@" + lang
    return quote_string(v.lexical()) + f"^^<{v.datatype_iri()}>"


def query_with_values(query: str, variables: Sequence[str], rows: Sequence[tuple]) -> str:
    """Inject a VALUES block restricting ``variables`` into the query's
    outermost group pattern (textual analogue of queries.rs
    pattern_with_bindings: a Join of the pattern with VALUES)."""
    if not rows:
        return query
    var_list = " ".join(f"?{v}" for v in variables)
    bindings = " ".join("(" + " ".join(_term_sparql(c) for c in row) + ")" for row in rows)
    block = f" VALUES ({var_list}) {{ {bindings} }} "
    close = query.rfind("}")
    if close < 0:
        raise ValueError(f"query has no group pattern to restrict: {query!r}")
    return query[:close] + block + query[close:]


def _paged_queries(
    query: str, variables: Sequence[str], rows: Sequence[tuple]
) -> list[str]:
    """Page bindings into VALUES-restricted queries (reader.rs:99-135):
    at most MAX_BINDINGS_PER_PAGE bindings and QUERY_PAGE_CHAR_LIMIT chars
    per query; oversized pages split in half recursively."""
    if not rows:
        return [query]

    def build(chunk: Sequence[tuple]) -> list[str]:
        q = query_with_values(query, variables, chunk)
        if len(q) < QUERY_PAGE_CHAR_LIMIT or len(chunk) == 1:
            return [q]
        mid = (len(chunk) + 1) // 2
        return build(chunk[:mid]) + build(chunk[mid:])

    out: list[str] = []
    for start in range(0, len(rows), MAX_BINDINGS_PER_PAGE):
        out.extend(build(rows[start : start + MAX_BINDINGS_PER_PAGE]))
    return out


def read_sparql_typed(
    spark: SparkSession,
    endpoint: str,
    query: str = QUERY_DEFAULT,
    formats: list[str] | None = None,
    bindings: tuple[Sequence[str], Sequence[tuple]] | None = None,
    timeout: float = 120.0,
    max_concurrent_requests: int = 4,
) -> DataFrame:
    """Run a SPARQL SELECT against ``endpoint`` and return typed value-struct
    columns c0..c{n-1} (n = result variables, from the TSV header).

    ``bindings=(variables, rows)`` restricts the query server-side via paged
    VALUES injection — the reader-side half of nemo's binding-pushdown
    imports (join_imports_simple.rs); rows are tuples of :class:`Value`.
    Pages are fetched with bounded concurrency; an HTTP 413 halves the
    failing page and retries (reader.rs:112-131).
    """
    queries = (
        _paged_queries(query, bindings[0], list(bindings[1])) if bindings else [query]
    )

    header: list[str] = []

    def fetch_page(q: str) -> list[str]:
        """Rows of one page, header stripped (ignore_headers=true per page,
        reader.rs:166); recurses on HTTP 413 with a halved VALUES block."""
        try:
            body = fetch_sparql_tsv(endpoint, q, timeout)
        except urllib.error.HTTPError as e:
            if e.code != 413 or not bindings:
                raise
            sub = _split_values_query(query, bindings[0], q)
            if sub is None:
                raise
            return [line for part in sub for line in fetch_page(part)]
        page = body.splitlines()
        if page and not header:
            header.extend(page[0].split("\t"))
        return page[1:]

    if len(queries) == 1:
        pages = [fetch_page(queries[0])]
    else:
        with ThreadPoolExecutor(max_workers=max_concurrent_requests) as ex:
            pages = list(ex.map(fetch_page, queries))

    lines: list[str] = []
    for page in pages:
        lines.extend(page)
    arity = max(len(header), 1)
    fmts = formats or ["anything"] * arity
    return _tsv_lines_to_typed(spark, lines, fmts)


def sparql_deferred_loader(
    spark: SparkSession,
    endpoint: str,
    variables: Sequence[str],
    query: str = QUERY_DEFAULT,
    formats: list[str] | None = None,
    max_pushdown_keys: int = 100_000,
):
    """Deferred-import loader for :meth:`SemiNaiveEngine.register_deferred`
    that pushes the rule body's bindings to the endpoint as paged VALUES
    blocks (nemo's join_imports over a SPARQL source). ``variables`` maps
    the import's column positions to the query's variable names.

    Binding keys are collected to the driver (they are the distinct values
    of a join column — dimension-sized by construction); above
    ``max_pushdown_keys`` the loader falls back to a full endpoint read
    restricted by a broadcast semi-join, which keeps the plan correct when
    a binding column is unexpectedly large."""
    from nemo_spark.engine.seminaive import semi_join_loader

    def loader(bindings):
        if bindings is None:
            return read_sparql_typed(spark, endpoint, query, formats=formats)
        shared, keys = bindings
        rows = keys.limit(max_pushdown_keys + 1).collect()
        if len(rows) > max_pushdown_keys:
            full = read_sparql_typed(spark, endpoint, query, formats=formats)
            return semi_join_loader(full)(bindings)
        vars_ = [variables[pos] for pos, _ in shared]
        vals = [
            tuple(Value(c["t"], c["i"], c["d"], c["s"]) for c in row) for row in rows
        ]
        return read_sparql_typed(
            spark, endpoint, query, formats=formats, bindings=(vars_, vals)
        )

    return loader


def _split_values_query(
    base_query: str, variables: Sequence[str], failing: str
) -> list[str] | None:
    """Rebuild the failing page's VALUES rows and split them in half."""
    import re

    m = re.search(r"VALUES \([^)]*\) \{ (.*) \} ", failing, re.DOTALL)
    if not m:
        return None
    rows = re.findall(r"\(([^()]*)\)", m.group(1))
    if len(rows) <= 1:
        return None
    mid = (len(rows) + 1) // 2

    def rebuild(chunk: list[str]) -> str:
        var_list = " ".join(f"?{v}" for v in variables)
        block = f" VALUES ({var_list}) {{ {' '.join('(' + r + ')' for r in chunk)} }} "
        close = base_query.rfind("}")
        return base_query[:close] + block + base_query[close:]

    return [rebuild(rows[:mid]), rebuild(rows[mid:])]


def _tsv_lines_to_typed(
    spark: SparkSession, lines: list[str], formats: list[str]
) -> DataFrame:
    """Distribute raw SPARQL-TSV result lines and decode them with the DSV
    cell parsers (quoting=false, tab delimiter — reader.rs:160-168)."""
    keep = [i for i, f in enumerate(formats) if f != "skip"]
    parsers = [(_PARSERS[formats[i]], i) for i in keep]
    total = len(formats)
    out_schema = ", ".join(f"c{j} {VALUE_SCHEMA}" for j in range(max(len(keep), 1)))
    src = spark.createDataFrame([(ln,) for ln in lines], "value string")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            cols: list[list] = [[] for _ in keep]
            for val in pdf["value"]:
                if val is None or val == "":
                    continue
                rec = val.split("\t")
                if len(rec) != total:
                    continue  # flexible records, as in the DSV reader
                try:
                    vals = [p(rec[i]) for p, i in parsers]
                except ValueError_:
                    continue
                for c, v in zip(cols, vals):
                    c.append({"t": v.t, "i": v.i, "d": v.d, "s": v.s})
            yield pd.DataFrame({f"c{j}": cols[j] for j in range(len(keep))})

    return src.mapInPandas(parse, schema=out_schema)
