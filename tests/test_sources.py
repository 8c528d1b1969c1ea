"""Source/sink tests: DSV value formats, N-Triples round-trip, JSON."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from nemo_spark.sources.dsv import read_dsv, write_dsv
from nemo_spark.sources.json_source import from_json_column, read_json_facts
from nemo_spark.sources.rdf import read_ntriples, write_ntriples


def test_dsv_anything_and_typed(spark, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("1,foo,2.5\nx,bar,zzz\n3,baz,4.0\n")
    # anything: keeps lexical form
    df = read_dsv(spark, str(p), 3)
    assert {tuple(r) for r in df.collect()} == {("1", "foo", "2.5"), ("x", "bar", "zzz"), ("3", "baz", "4.0")}
    # int format: unparseable row dropped (nemo error-is-no-result)
    df2 = read_dsv(spark, str(p), 3, formats=["int", "string", "double"])
    assert {tuple(r) for r in df2.collect()} == {(1, "foo", 2.5), (3, "baz", 4.0)}
    # skip column
    df3 = read_dsv(spark, str(p), 3, formats=["anything", "skip", "anything"])
    assert df3.columns == ["c0", "c1"]


def test_dsv_gzip_and_roundtrip(spark, tmp_path):
    gz = tmp_path / "data.csv.gz"
    with gzip.open(gz, "wt") as f:
        f.write("a,1\nb,2\n")
    df = read_dsv(spark, str(gz), 2)
    assert df.count() == 2
    out = tmp_path / "out"
    write_dsv(df, str(out))
    back = read_dsv(spark, str(out), 2)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}


NT = """
# a comment
<http://ex.org/a> <http://ex.org/knows> <http://ex.org/b> .
<http://ex.org/b> <http://ex.org/name> "Bob" .
<http://ex.org/c> <http://ex.org/age> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
_:blank1 <http://ex.org/p> "hi"@en .
malformed line without triple
"""


def test_ntriples_parse(spark, tmp_path):
    p = tmp_path / "t.nt"
    p.write_text(NT)
    df = read_ntriples(spark, str(p))
    rows = {tuple(r) for r in df.collect()}
    assert ("http://ex.org/a", "http://ex.org/knows", "http://ex.org/b") in rows
    assert ("http://ex.org/b", "http://ex.org/name", '"Bob"') in rows
    assert ("http://ex.org/c", "http://ex.org/age", '"42"^^<http://www.w3.org/2001/XMLSchema#integer>') in rows
    assert ("_:blank1", "http://ex.org/p", '"hi"@en') in rows
    assert len(rows) == 4  # malformed + comment skipped


def test_ntriples_roundtrip(spark, tmp_path):
    p = tmp_path / "t.nt"
    p.write_text(NT)
    df = read_ntriples(spark, str(p))
    out = tmp_path / "out_nt"
    write_ntriples(df, str(out))
    back = read_ntriples(spark, str(out))
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}


def test_json_facts(spark, tmp_path):
    p = tmp_path / "f.jsonl"
    p.write_text('{"a": 1, "b": {"c": "x"}}\n{"a": 2, "b": {"c": "y"}}\n')
    df = read_json_facts(spark, str(p), ["a", "b.c"])
    assert {tuple(r) for r in df.collect()} == {(1, "x"), (2, "y")}


def test_from_json_column(spark, sf_dir="/root/testdata/sf0.001"):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    parsed = from_json_column(ev, "props", "k int")
    row = parsed.select(F.col("props_parsed.k").alias("k")).filter(F.col("k").isNotNull()).first()
    assert row is not None


def test_turtle_blank_nodes_scoped(spark, tmp_path):
    """An explicit _:b1 must NOT merge with the first anonymous [...] node
    (disjoint label namespaces), and blank nodes in distinct documents of
    one read stay distinct (RDF document-local semantics)."""
    from nemo_spark.model.values import T_NULL, Value
    from nemo_spark.sources.rdf_typed import read_rdf_typed

    doc = '_:b1 <http://ex/p> "x" .\n_:b1 <http://ex/r> [ <http://ex/q> "y" ] .'
    f = tmp_path / "a.ttl"
    f.write_text(doc)
    rows = [
        tuple(Value(*c) for c in r) for r in read_rdf_typed(spark, str(f), "turtle").collect()
    ]
    nulls = {v.s for r in rows for v in r if v.t == T_NULL}
    assert len(nulls) == 2  # explicit b1 and the anonymous [..] node are distinct

    # two documents each using _:b1: no cross-document unification
    (tmp_path / "docs").mkdir()
    (tmp_path / "docs" / "one.ttl").write_text('_:b1 <http://ex/p> "1" .')
    (tmp_path / "docs" / "two.ttl").write_text('_:b1 <http://ex/p> "2" .')
    rows2 = [
        tuple(Value(*c) for c in r)
        for r in read_rdf_typed(spark, str(tmp_path / "docs"), "turtle").collect()
    ]
    assert len({r[0].s for r in rows2}) == 2


def test_dsv_multiline_quoted_record(spark, tmp_path):
    """A quoted field with an embedded newline is ONE record (csv-crate
    semantics) — the line-based scan previously shredded it into two
    skipped fragments and silently lost the fact."""
    from nemo_spark.sources.dsv_typed import read_dsv_typed

    p = tmp_path / "m.csv"
    p.write_text('a,"x\ny",b\nc,d,e\n')
    rows = read_dsv_typed(spark, str(p), ["any", "any", "any"]).collect()
    got = {tuple(c.s for c in r) for r in rows}
    assert got == {("a", "x\ny", "b"), ("c", "d", "e")}
    # multiline=False keeps the splittable line path (fragments skipped)
    fast = read_dsv_typed(spark, str(p), ["any", "any", "any"], multiline=False).collect()
    assert {tuple(c.s for c in r) for r in fast} == {("c", "d", "e")}


def test_dsv_peek_skips_blank_lines(spark, tmp_path):
    from nemo_spark.sources.dsv_typed import peek_field_count

    p = tmp_path / "b.csv"
    p.write_text("\n\nx,y,z\n")
    assert peek_field_count(spark, str(p)) == 3


def test_pattern_arity_mismatch_is_loud():
    from nemo_spark.sources.patterns import FilterTransformPattern, pattern_output_arity

    filt = FilterTransformPattern(filters=(), transforms=None)
    trans = FilterTransformPattern(filters=(), transforms=(lambda r: r[0], lambda r: r[1]))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="arity"):
        pattern_output_arity([filt, trans], input_arity=3)
    assert pattern_output_arity([trans, trans], input_arity=3) == 2
    assert pattern_output_arity([filt], input_arity=3) == 3


def test_checkpoint_store_hardening(spark, tmp_path):
    """(a) snapshot idempotency extends to lineage (streaming redelivery
    re-snapshots the same step); (b) distinct names that sanitize
    identically do not share a directory; (c) an explicitly requested
    incomplete step errors instead of resuming from partial data."""
    import os

    import pytest as _pytest

    from nemo_spark.engine.checkpoint import CheckpointStore, _safe_name

    store = CheckpointStore(str(tmp_path / "s"), spark)
    df = spark.createDataFrame([(1,), (2,)], "v long")
    store.snapshot("p", df, 0)
    store.snapshot("p", df, 0)  # redelivered batch
    assert store.lineage().groupBy().sum("rows").collect()[0][0] == 2
    # sanitization collisions get distinct hashed directories
    a, b = _safe_name("http://x/p"), _safe_name("http://x:p")
    assert a != b
    store.snapshot("http://x/p", df, 0)
    store.snapshot("http://x:p", spark.createDataFrame([(9,)], "v long"), 0)
    assert store.load("http://x/p").count() == 2
    assert store.load("http://x:p").count() == 1
    # explicit incomplete step: create the dir without _SUCCESS
    os.makedirs(str(tmp_path / "s" / "p" / "step=7"))
    with _pytest.raises(ValueError, match="incomplete"):
        store.load("p", 7)


def test_nt_bnodes_scoped_per_file(spark, tmp_path):
    # the reference mints fresh nulls per reader (reader.rs:40-46): _:b1
    # from two files must NOT unify
    from nemo_spark.sources.rdf_typed import read_rdf_typed

    (tmp_path / "f1.nt").write_text("_:b1 <p> <o1> .\n")
    (tmp_path / "f2.nt").write_text("_:b1 <p> <o2> .\n")
    a = read_rdf_typed(spark, str(tmp_path / "f1.nt"), fmt="ntriples").collect()
    b = read_rdf_typed(spark, str(tmp_path / "f2.nt"), fmt="ntriples").collect()
    assert len(a) == 1 and len(b) == 1
    assert a[0]["c0"] != b[0]["c0"]  # document-scoped blank nodes


def test_nt_rejects_malformed_lines(spark, tmp_path):
    from nemo_spark.sources.rdf_typed import read_rdf_typed

    (tmp_path / "m.nt").write_text(
        '"literal subject" <p> <o> .\n'      # literal subject: malformed
        "<s> <p> <o> <g> .\n"                 # quad in ntriples: malformed
        "<s> <p> <o> .\n"                     # valid
    )
    rows = read_rdf_typed(spark, str(tmp_path / "m.nt"), fmt="ntriples").collect()
    assert len(rows) == 1


def test_turtle_base_resolves_relative_iris(spark, tmp_path):
    from nemo_spark.model.values import Value
    from nemo_spark.sources.rdf_typed import read_rdf_typed

    (tmp_path / "b.ttl").write_text("@base <http://ex/> .\n<foo> <bar> <> .\n")
    rows = read_rdf_typed(spark, str(tmp_path / "b.ttl"), fmt="turtle").collect()
    vals = [Value(r[c]["t"], r[c]["i"], r[c]["d"], r[c]["s"]) for r in rows for c in ("c0", "c1", "c2")]
    assert [v.lexical() for v in vals] == ["http://ex/foo", "http://ex/bar", "http://ex/"]


def test_rdf_gz_extension_sniffing(spark, tmp_path):
    import gzip

    from nemo_spark.sources.rdf_typed import read_rdf_typed

    p = tmp_path / "d.nt.gz"
    p.write_bytes(gzip.compress(b"<s> <p> <o> .\n"))
    rows = read_rdf_typed(spark, str(p), fmt="rdf").collect()
    assert len(rows) == 1


def test_json_multi_file_node_ids_disjoint(spark, tmp_path):
    from nemo_spark.model.values import Value
    from nemo_spark.sources.json_typed import read_json_typed

    (tmp_path / "a.json").write_text('{"k": "va"}')
    (tmp_path / "b.json").write_text('{"k": "vb"}')
    rows = read_json_typed(spark, str(tmp_path)).collect()
    # node 0 of file A must not merge with node 0 of file B: the two roots
    # have distinct ids, and each (id, <type>, "object") appears once
    roots = {
        r["c0"]["i"]
        for r in rows
        if Value(r["c2"]["t"], r["c2"]["i"], r["c2"]["d"], r["c2"]["s"]).lexical() == "object"
    }
    assert len(roots) == 2
    # single-file read keeps reference-exact ids (root = 0)
    one = read_json_typed(spark, str(tmp_path / "a.json")).collect()
    assert min(r["c0"]["i"] for r in one) == 0


def test_json_huge_int_falls_back_to_double(spark, tmp_path):
    # reader.rs:108-118: i64 -> u64 -> lossy f64, never an import error
    from nemo_spark.model.values import T_DOUBLE
    from nemo_spark.sources.json_typed import read_json_typed

    (tmp_path / "n.json").write_text("18446744073709551616")  # 2^64
    rows = read_json_typed(spark, str(tmp_path / "n.json")).collect()
    vals = [r["c2"] for r in rows]
    assert any(v["t"] == T_DOUBLE and v["d"] == float(2**64) for v in vals)


def test_dsv_blank_line_before_header(spark, tmp_path):
    # the csv crate skips blank lines BEFORE taking the header record: a
    # leading blank line must not burn the header skip (importing the real
    # header as a fact)
    from nemo_spark.model.values import Value
    from nemo_spark.sources.dsv_typed import read_dsv_typed

    (tmp_path / "h.csv").write_text("\nname,age\nalice,31\nbob,44\n")
    rows = read_dsv_typed(
        spark, str(tmp_path / "h.csv"), ["string", "int"], ignore_headers=True
    ).collect()
    got = {
        (
            Value(r["c0"]["t"], r["c0"]["i"], r["c0"]["d"], r["c0"]["s"]).lexical(),
            Value(r["c1"]["t"], r["c1"]["i"], r["c1"]["d"], r["c1"]["s"]).lexical(),
        )
        for r in rows
    }
    assert got == {("alice", "31"), ("bob", "44")}


def test_sparql_values_injection_skips_long_literals():
    from nemo_spark.sources.sparql import query_with_values
    from nemo_spark.model.values import Value

    q = 'SELECT ?s WHERE { ?s ?p """said " } done""" }'
    out = query_with_values(q, ["s"], [(Value.iri("x"),)])
    # the VALUES block lands before the real group close, not inside the
    # long literal's embedded '}'
    assert out.index("VALUES") > out.index('done"""')
    assert out.rstrip().endswith("}")
