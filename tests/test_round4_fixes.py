"""Round-4 fixes: ADVICE r3 findings (update-sequence splitter '<',
GRAPH ?var inside MINUS/EXISTS under dataset views, NOW() per-query,
DISTINCT vs synthesized sort keys) and VERDICT r3 asks (aggregate
DISTINCT, DESCRIBE *, envelope row cap). Reference analog: RDF4J
SPARQL 1.1 conformance (public behavior of jgrzebyta/triple-loader);
/root/reference is empty."""

from __future__ import annotations

import pytest

from tripleforge import sparql
from tripleforge.sparql import _split_update_sequence

SCHEMA = (
    "subj string, pred string, obj string, obj_kind string, "
    "obj_dt string, obj_lang string, graph string"
)


# ---------------------------------------------------------------------------
# ADVICE r3 medium: '<' in FILTER must not open an IRIREF scan
# ---------------------------------------------------------------------------


def test_update_sequence_splits_after_filter_less_than():
    text = (
        "DELETE { ?s <urn:p> ?o } WHERE { ?s <urn:p> ?o FILTER(?o < 5) } ; "
        "INSERT DATA { <urn:a> <urn:p> <urn:b> }"
    )
    parts = _split_update_sequence(text)
    assert len(parts) == 2
    assert parts[0].strip().startswith("DELETE")
    assert parts[1].strip().startswith("INSERT DATA")


def test_update_sequence_less_than_before_brace_close():
    # '<' as the LAST comparison before '}' — the old scanner swallowed
    # to EOF and returned one segment with unbalanced braces
    text = "DELETE WHERE { ?s ?p ?o FILTER(?o < ?p) };INSERT DATA { <u:a> <u:p> 1 }"
    assert len(_split_update_sequence(text)) == 2


def test_update_sequence_still_respects_iriref_semicolon():
    # a ';' inside an IRIREF must NOT split
    text = "INSERT DATA { <urn:a;x> <urn:p> 1 } ; INSERT DATA { <urn:b> <urn:p> 2 }"
    parts = _split_update_sequence(text)
    assert len(parts) == 2
    assert "<urn:a;x>" in parts[0]


# ---------------------------------------------------------------------------
# ADVICE r3 medium: GRAPH ?var inside MINUS/EXISTS under FROM/FROM NAMED
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ds(spark):
    rows = [
        # urn:g0 becomes the (marker-relabelled) default graph under
        # FROM <urn:g0>; a leaky marker row for urn:a would wrongly
        # satisfy EXISTS / trigger MINUS inside GRAPH ?g blocks
        ("urn:a", "urn:p", "1", "literal", None, None, "urn:g1"),
        ("urn:b", "urn:p", "2", "literal", None, None, "urn:g1"),
        ("urn:a", "urn:q", "x", "literal", None, None, "urn:g0"),
        ("urn:b", "urn:q", "y", "literal", None, None, "urn:g1"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


# NOTE: explicit `GRAPH ?v { … }` INSIDE MINUS/EXISTS is rejected at
# parse time; the reachable path (ADVICE r3) is graph-term INHERITANCE:
# MINUS/EXISTS written inside a GRAPH ?g block evaluates its patterns
# with g = ?g, and under FROM/FROM NAMED those sub-BGPs scan the
# dataset view — marker-relabelled default rows must never bind ?g.


def test_inherited_graph_var_in_minus_ignores_default_rows(ds):
    # default graph (urn:g0) holds (urn:a urn:q x); within named graphs
    # only urn:b has an urn:q statement → MINUS removes urn:b only.
    out = sparql.select(
        ds,
        "SELECT ?s FROM <urn:g0> FROM NAMED <urn:g1> WHERE "
        "{ GRAPH ?g { ?s <urn:p> ?o MINUS { ?s <urn:q> ?x } } }",
    )
    assert sorted(r.s for r in out.collect()) == ["urn:a"]


def test_inherited_graph_var_in_exists_ignores_default_rows(ds):
    out = sparql.select(
        ds,
        "SELECT ?s FROM <urn:g0> FROM NAMED <urn:g1> WHERE "
        "{ GRAPH ?g { ?s <urn:p> ?o FILTER EXISTS { ?s <urn:q> ?x } } }",
    )
    assert sorted(r.s for r in out.collect()) == ["urn:b"]


def test_explicit_graph_var_in_minus_under_dataset(ds):
    """r4b: explicit GRAPH ?g inside MINUS now parses (was a grammar
    rejection) — under FROM-only the named-graph set is empty, so the
    MINUS block matches NOTHING: in particular the marker-relabelled
    default rows must not bind ?g and remove solutions (the exact
    ADVICE r3 scenario, now directly expressible)."""
    out = sparql.select(
        ds,
        "SELECT ?s FROM <urn:g0> FROM <urn:g1> WHERE { ?s <urn:p> ?o "
        "MINUS { GRAPH ?g { ?s <urn:q> ?x } } }",
    )
    assert sorted(r.s for r in out.collect()) == ["urn:a", "urn:b"]


def test_explicit_graph_var_in_minus_sees_from_named(ds):
    out = sparql.select(
        ds,
        "SELECT ?s FROM <urn:g0> FROM <urn:g1> FROM NAMED <urn:g1> WHERE "
        "{ ?s <urn:p> ?o MINUS { GRAPH ?g { ?s <urn:q> ?x } } }",
    )
    # g1 holds (urn:b urn:q y) -> MINUS removes urn:b only; urn:a's
    # urn:q row lives in the (marker) default graph and must not count
    assert sorted(r.s for r in out.collect()) == ["urn:a"]


def test_explicit_graph_in_minus_exists_optional(spark):
    rows = [
        ("urn:a", "urn:p", "1", "literal", None, None, None),
        ("urn:b", "urn:p", "2", "literal", None, None, None),
        ("urn:a", "urn:q", "x", "literal", None, None, "urn:g1"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    r1 = sparql.select(
        df, "SELECT ?s WHERE { ?s <urn:p> ?o MINUS { GRAPH <urn:g1> { ?s <urn:q> ?x } } }"
    )
    assert sorted(r.s for r in r1.collect()) == ["urn:b"]
    r2 = sparql.select(
        df, "SELECT ?s WHERE { ?s <urn:p> ?o FILTER EXISTS { GRAPH ?g { ?s <urn:q> ?x } } }"
    )
    assert sorted(r.s for r in r2.collect()) == ["urn:a"]
    r3 = sparql.select(
        df, "SELECT ?s ?x WHERE { ?s <urn:p> ?o OPTIONAL { GRAPH <urn:g1> { ?s <urn:q> ?x } } }"
    )
    assert sorted((r.s, r.x) for r in r3.collect()) == [
        ("urn:a", "x"), ("urn:b", None),
    ]


# ---------------------------------------------------------------------------
# ADVICE r3 low: NOW() fixed per query
# ---------------------------------------------------------------------------


def test_now_single_value_per_query(spark):
    df = spark.createDataFrame(
        [("urn:s", "urn:p", "1", "literal", None, None, None)], SCHEMA
    )
    out = sparql.select(
        df,
        "SELECT ?a ?b WHERE { ?s ?p ?o BIND(NOW() AS ?a) BIND(NOW() AS ?b) }",
    ).collect()
    assert len(out) == 1 and out[0].a == out[0].b


# ---------------------------------------------------------------------------
# ADVICE r3 low: DISTINCT must not key on synthesized sort aggregates
# ---------------------------------------------------------------------------


def test_distinct_collapses_despite_order_by_aggregate(spark):
    rows = [
        ("urn:s1", "urn:p", "1", "literal", None, None, None),
        ("urn:s1", "urn:p", "2", "literal", None, None, None),
        ("urn:s2", "urn:p", "3", "literal", None, None, None),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    # project only the constant-ish ?p: conforming DISTINCT collapses
    # both groups to ONE row even though ORDER BY COUNT(*) synthesizes
    # a per-group aggregate column
    out = sparql.select(
        df,
        "SELECT DISTINCT ?p WHERE { ?s ?p ?o } "
        "GROUP BY ?s ?p ORDER BY DESC(COUNT(*))",
    ).collect()
    assert len(out) == 1 and out[0].p == "urn:p"


# ---------------------------------------------------------------------------
# VERDICT r3 #5: SUM/AVG/GROUP_CONCAT(DISTINCT …)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def nums(spark):
    rows = [
        ("urn:s1", "urn:v", "10", "literal", None, None, None),
        ("urn:s1", "urn:v", "10", "literal", None, None, None),
        ("urn:s1", "urn:v", "20", "literal", None, None, None),
        ("urn:s2", "urn:v", "5", "literal", None, None, None),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_sum_distinct(nums):
    out = sparql.select(
        nums,
        "SELECT ?s (SUM(DISTINCT ?v) AS ?t) WHERE { ?s <urn:v> ?v } "
        "GROUP BY ?s ORDER BY ?s",
    ).collect()
    assert [(r.s, r.t) for r in out] == [("urn:s1", 30.0), ("urn:s2", 5.0)]


def test_avg_distinct(nums):
    out = sparql.select(
        nums,
        "SELECT ?s (AVG(DISTINCT ?v) AS ?a) WHERE { ?s <urn:v> ?v } "
        "GROUP BY ?s ORDER BY ?s",
    ).collect()
    assert [(r.s, r.a) for r in out] == [("urn:s1", 15.0), ("urn:s2", 5.0)]


def test_group_concat_and_count_distinct(nums):
    out = sparql.select(
        nums,
        "SELECT ?s (GROUP_CONCAT(DISTINCT ?v; SEPARATOR=\",\") AS ?c) "
        "(COUNT(DISTINCT ?v) AS ?n) WHERE { ?s <urn:v> ?v } "
        "GROUP BY ?s ORDER BY ?s",
    ).collect()
    assert [(r.s, r.c, r.n) for r in out] == [
        ("urn:s1", "10,20", 2), ("urn:s2", "5", 1),
    ]


def test_min_max_distinct_are_identity(nums):
    out = sparql.select(
        nums,
        "SELECT (MIN(DISTINCT ?v) AS ?lo) (MAX(DISTINCT ?v) AS ?hi) "
        "WHERE { ?s <urn:v> ?v }",
    ).collect()
    assert (out[0].lo, out[0].hi) == (5.0, 20.0)


# ---------------------------------------------------------------------------
# VERDICT r3 #8: DESCRIBE *
# ---------------------------------------------------------------------------


def test_describe_star(spark):
    rows = [
        ("urn:a", "urn:p", "urn:b", "iri", None, None, None),
        ("urn:b", "urn:q", "1", "literal", None, None, None),
        ("urn:c", "urn:q", "2", "literal", None, None, None),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = sparql.describe(df, "DESCRIBE * WHERE { ?s <urn:p> ?o }")
    # in-scope vars {s, o} bind {urn:a, urn:b}: their subject rows plus
    # statements with them as IRI objects; urn:c is NOT described
    got = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert got == {
        ("urn:a", "urn:p", "urn:b"),
        ("urn:b", "urn:q", "1"),
    }


def test_describe_star_needs_where(spark):
    df = spark.createDataFrame(
        [("urn:a", "urn:p", "urn:b", "iri", None, None, None)], SCHEMA
    )
    with pytest.raises(sparql.SparqlError, match="DESCRIBE \\* needs"):
        sparql.describe(df, "DESCRIBE *")


# ---------------------------------------------------------------------------
# VERDICT r3 #7: driver-side envelope row cap
# ---------------------------------------------------------------------------


def test_envelope_cap_default_and_opt_out(spark, monkeypatch):
    from tripleforge import results

    df = spark.range(50).selectExpr("cast(id as string) as v")
    monkeypatch.setattr(results, "ENVELOPE_ROW_CAP", 10)
    # default argument binds at def time — call with the patched cap
    doc = results.sparql_results_json(df, limit=results.ENVELOPE_ROW_CAP)
    assert len(doc["results"]["bindings"]) == 10
    # the DEFAULT (unpatched) cap is a real number, not None
    import inspect

    sig = inspect.signature(results.sparql_results_json)
    assert sig.parameters["limit"].default == 100_000
    assert (
        inspect.signature(results.sparql_results_xml).parameters["limit"].default
        == 100_000
    )
    # explicit opt-out collects everything
    doc = results.sparql_results_json(df, limit=None)
    assert len(doc["results"]["bindings"]) == 50


# ---------------------------------------------------------------------------
# §19.8 QuadData: the final triple's '.' is optional (found driving the
# CLI after the r4 module split; pre-existing since r2)
# ---------------------------------------------------------------------------


def test_insert_data_optional_final_dot():
    from tripleforge.sparql import parse_update

    for text, n in [
        ("INSERT DATA { <urn:a> <urn:p> 1 }", 1),
        ('INSERT DATA { <urn:a> <urn:p> "x" }', 1),
        ("INSERT DATA { GRAPH <urn:g> { <urn:a> <urn:p> 1 } }", 1),
        ("INSERT DATA { <urn:a> <urn:p> 1 . <urn:b> <urn:p> 2 }", 2),
        ("INSERT DATA { <urn:a> <urn:p> 1 . }", 1),
    ]:
        op, _, rows = parse_update(text)
        assert op == "insert" and len(rows) == n, text


# ---------------------------------------------------------------------------
# §18.2.5: ORDER BY precedes projection — sort keys may use variables
# the projection drops
# ---------------------------------------------------------------------------


def test_order_by_unprojected_variable(spark):
    rows = [
        ("urn:s1", "urn:p", "3", "literal", None, None, None),
        ("urn:s2", "urn:p", "1", "literal", None, None, None),
        ("urn:s3", "urn:p", "2", "literal", None, None, None),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = sparql.select(
        df, "SELECT ?s WHERE { ?s <urn:p> ?o } ORDER BY ?o"
    )
    assert out.columns == ["s"]
    assert [r.s for r in out.collect()] == ["urn:s2", "urn:s3", "urn:s1"]


def test_order_by_expression_on_unprojected_variable(spark):
    rows = [
        ("urn:s1", "urn:p", "3", "literal", None, None, None),
        ("urn:s2", "urn:p", "1", "literal", None, None, None),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = sparql.select(
        df, "SELECT ?s WHERE { ?s <urn:p> ?o } ORDER BY DESC(?o * 2)"
    )
    assert out.columns == ["s"]
    assert [r.s for r in out.collect()] == ["urn:s1", "urn:s2"]


def test_order_by_unbound_variable_still_rejected(spark):
    df = spark.createDataFrame(
        [("urn:s", "urn:p", "1", "literal", None, None, None)], SCHEMA
    )
    with pytest.raises(sparql.SparqlError, match="ORDER BY variables not bound"):
        sparql.select(df, "SELECT ?s WHERE { ?s <urn:p> ?o } ORDER BY ?zzz")


# ---------------------------------------------------------------------------
# §4.1.1 BASE: relative IRIREF resolution (was rejected pre-r4)
# ---------------------------------------------------------------------------


def test_base_resolves_relative_iris(spark):
    df = spark.createDataFrame(
        [("http://ex.org/a", "http://ex.org/p", "http://ex.org/b", "iri", None, None, None)],
        SCHEMA,
    )
    out = sparql.select(df, "BASE <http://ex.org/> SELECT ?s WHERE { ?s <p> <b> }")
    assert [r.s for r in out.collect()] == ["http://ex.org/a"]


def test_base_chains_and_scopes_prefix(spark):
    df = spark.createDataFrame(
        [("http://ex.org/root/a", "http://ex.org/root/p", "1", "literal", None, None, None)],
        SCHEMA,
    )
    # second BASE resolves against the first; '..' steps out of sub/;
    # the PREFIX expansion itself resolves against the active BASE
    out = sparql.select(
        df,
        "BASE <http://ex.org/root/> BASE <sub/> PREFIX e: <../> "
        "SELECT ?s WHERE { ?s <../p> ?o . e:a <../p> ?o }",
    )
    assert [r.s for r in out.collect()] == ["http://ex.org/root/a"]


def test_base_in_insert_data(spark, tmp_path):
    from tripleforge.catalog import ParquetSnapshotCatalog

    cat = ParquetSnapshotCatalog(spark, str(tmp_path / "cat"))
    sparql.execute_update(
        spark, cat,
        "BASE <http://ex.org/> INSERT DATA { <s> <p> <o> }",
        run_id="base1",
    )
    rows = cat.read_statements().collect()
    assert {(r.subj, r.pred, r.obj) for r in rows} == {
        ("http://ex.org/s", "http://ex.org/p", "http://ex.org/o")
    }


# ---------------------------------------------------------------------------
# STRLANG/STRDT metadata flow (r4): constructed-literal tags are
# visible to downstream LANG()/DATATYPE()/isLiteral()
# ---------------------------------------------------------------------------


def test_strlang_metadata_flows(spark):
    df = spark.createDataFrame(
        [("urn:s", "urn:p", "1", "literal", None, None, None)], SCHEMA
    )
    out = sparql.select(
        df,
        'SELECT ?l ?d ?isl WHERE { ?s ?p ?o BIND(STRLANG("chat", "FR") AS ?x) '
        "BIND(LANG(?x) AS ?l) BIND(DATATYPE(?x) AS ?d) BIND(isLiteral(?x) AS ?isl) }",
    ).collect()
    assert out[0].l == "fr"
    assert out[0].d == "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
    assert out[0].isl is True


def test_strdt_metadata_flows(spark):
    df = spark.createDataFrame(
        [("urn:s", "urn:p", "1", "literal", None, None, None)], SCHEMA
    )
    out = sparql.select(
        df,
        "SELECT ?d ?l WHERE { ?s ?p ?o "
        'BIND(STRDT("42", <http://www.w3.org/2001/XMLSchema#integer>) AS ?x) '
        "BIND(DATATYPE(?x) AS ?d) BIND(LANG(?x) AS ?l) }",
    ).collect()
    assert out[0].d == "http://www.w3.org/2001/XMLSchema#integer"
    assert out[0].l == ""  # typed literal has no language tag


def test_strlang_companions_hidden_from_select_star(spark):
    df = spark.createDataFrame(
        [("urn:s", "urn:p", "1", "literal", None, None, None)], SCHEMA
    )
    out = sparql.select(
        df, 'SELECT * WHERE { ?s ?p ?o BIND(STRLANG("a", "en") AS ?x) }'
    )
    assert set(out.columns) == {"s", "p", "o", "x"}


# ---------------------------------------------------------------------------
# LOAD <file.jsonld> — format detection + the new parser through the
# reference loader's core operation
# ---------------------------------------------------------------------------


def test_load_jsonld_file(spark, tmp_path):
    from tripleforge.catalog import ParquetSnapshotCatalog

    doc = tmp_path / "data.jsonld"
    doc.write_text(
        '{"@context": {"ex": "http://ex.org/"}, "@id": "ex:s", '
        '"@type": "ex:T", "ex:p": {"@value": "7", '
        '"@type": "http://www.w3.org/2001/XMLSchema#integer"}}'
    )
    cat = ParquetSnapshotCatalog(spark, str(tmp_path / "cat"))
    sparql.execute_update(
        spark, cat, f"LOAD <file://{doc}> INTO GRAPH <urn:g>", run_id="ld1"
    )
    rows = {(r.subj, r.pred, r.obj, r.graph) for r in cat.read_statements().collect()}
    assert rows == {
        ("http://ex.org/s", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "http://ex.org/T", "urn:g"),
        ("http://ex.org/s", "http://ex.org/p", "7", "urn:g"),
    }


# ---------------------------------------------------------------------------
# JSON-LD writer<->parser seeded property round-trip
# ---------------------------------------------------------------------------


def test_jsonld_roundtrip_property(spark, tmp_path):
    import random

    from tripleforge.jsonld_out import write_jsonld
    from tripleforge.parse.jsonld import parse_one

    rng = random.Random(99)
    XSD = "http://www.w3.org/2001/XMLSchema#"
    LANGSTR = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
    rows = []
    for i in range(150):
        s = f"http://ex.org/s{rng.randrange(20)}"
        p = f"http://ex.org/p{rng.randrange(8)}"
        g = rng.choice([None, "http://ex.org/g1", "http://ex.org/g2"])
        kind = rng.randrange(4)
        if kind == 0:
            rows.append((s, p, f"http://ex.org/o{rng.randrange(30)}", "iri", None, None, g))
        elif kind == 1:
            lex = "".join(rng.choice('ab"\\\n\t{}[]:,é✓ ') for _ in range(rng.randrange(1, 10)))
            rows.append((s, p, lex, "literal", XSD + "string", None, g))
        elif kind == 2:
            rows.append((s, p, str(rng.randrange(10**6)), "literal", XSD + "integer", None, g))
        else:
            rows.append((s, p, "tag", "literal", LANGSTR, rng.choice(["en", "fr"]), g))
    df = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_kind string, "
        "obj_dt string, obj_lang string, graph string",
    ).dropDuplicates()
    want = {tuple(r) for r in df.collect()}
    out = str(tmp_path / "prop.jsonld")
    write_jsonld(df, out, quads=True)
    got = set(parse_one("r", "p", open(out).read()))
    assert got == want


# ---------------------------------------------------------------------------
# §18.2.2.3 LeftJoin condition: OPTIONAL FILTER over outer variables
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def lj(spark):
    rows = [
        ("urn:a", "urn:p", "5", "literal", None, None, None),
        ("urn:b", "urn:p", "50", "literal", None, None, None),
        ("urn:a", "urn:q", "10", "literal", None, None, None),
        ("urn:a", "urn:q", "3", "literal", None, None, None),
        ("urn:b", "urn:q", "10", "literal", None, None, None),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_optional_filter_mixed_vars_keeps_failing_left_row(lj):
    out = sparql.select(
        lj,
        "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> "
        "SELECT ?s ?o ?x WHERE { ?s <urn:p> ?o "
        "OPTIONAL { ?s <urn:q> ?x FILTER(xsd:integer(?x) > xsd:integer(?o)) } }",
    ).collect()
    got = {(r.s, r.o, r.x) for r in out}
    # urn:a: only candidate 10 > 5 survives (3 dropped); urn:b: no
    # candidate beats 50 -> row kept with ?x unbound
    assert got == {("urn:a", "5", "10"), ("urn:b", "50", None)}


def test_optional_filter_mixed_with_block_local_filter(lj):
    # one block-local filter (pre-join) AND one mixed filter
    # (join-condition) in the same OPTIONAL
    out = sparql.select(
        lj,
        "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> "
        "SELECT ?s ?x WHERE { ?s <urn:p> ?o "
        "OPTIONAL { ?s <urn:q> ?x FILTER(xsd:integer(?x) > 4) "
        "FILTER(xsd:integer(?x) > xsd:integer(?o)) } }",
    ).collect()
    got = {(r.s, r.x) for r in out}
    assert got == {("urn:a", "10"), ("urn:b", None)}


def test_optional_bind_outer_var_unbound_scope(lj):
    """r5 lifts the r4 loud rejection: BIND on an outer variable inside
    OPTIONAL evaluates with strict bottom-up Extend scope (§18.2.2.6) —
    the outer ?o is unbound inside the block, so ?y stays null while
    the block itself still joins."""
    out = sparql.select(
        lj,
        "SELECT ?s ?y WHERE { ?s <urn:p> ?o "
        "OPTIONAL { ?s <urn:q> ?x BIND(?o AS ?y) } }",
    ).collect()
    assert all(r.y is None for r in out)
    assert {r.s for r in out} == {"urn:a", "urn:b"}


def test_inherited_graph_var_optional_under_dataset(spark):
    """r4 (was a loud rejection): OPTIONAL inside GRAPH ?g under
    FROM/FROM NAMED — the marker exclusion applies PRE-join to the
    optional sub-BGP, so default-graph rows never bind while unmatched
    left rows survive null-extended."""
    rows = [
        ("urn:a", "urn:p", "1", "literal", None, None, "urn:g1"),
        ("urn:b", "urn:p", "2", "literal", None, None, "urn:g1"),
        ("urn:a", "urn:q", "x", "literal", None, None, "urn:g0"),
        ("urn:a", "urn:q", "y", "literal", None, None, "urn:g1"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = sparql.select(
        df,
        "SELECT ?s ?x ?g FROM <urn:g0> FROM NAMED <urn:g1> WHERE "
        "{ GRAPH ?g { ?s <urn:p> ?o OPTIONAL { ?s <urn:q> ?x } } }",
    ).collect()
    assert {(r.s, r.x, r.g) for r in out} == {
        ("urn:a", "y", "urn:g1"),
        ("urn:b", None, "urn:g1"),
    }


def test_describe_with_dataset_clauses(spark):
    """r4: DESCRIBE ... FROM <g> — WHERE evaluates on the dataset view,
    the description scans only the dataset's graphs (original graph
    labels preserved)."""
    rows = [
        ("urn:a", "urn:p", "urn:b", "iri", None, None, "urn:g1"),
        ("urn:b", "urn:q", "1", "literal", None, None, "urn:g1"),
        ("urn:b", "urn:q", "2", "literal", None, None, "urn:g2"),  # outside
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = sparql.describe(
        df, "DESCRIBE ?o FROM <urn:g1> WHERE { ?s <urn:p> ?o }"
    )
    got = {(r.subj, r.pred, r.obj, r.graph) for r in out.collect()}
    assert got == {
        ("urn:a", "urn:p", "urn:b", "urn:g1"),  # b as IRI object
        ("urn:b", "urn:q", "1", "urn:g1"),      # b's g1 row only
    }
