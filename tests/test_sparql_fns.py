"""SPARQL 1.1 §17.4/§17.5 library completion (round 3): date/time
accessors, XSD constructor casts, term constructors (IRI/STRLANG/
STRDT/BNODE), sameTerm, isNumeric, and the non-deterministic functions
(NOW/UUID/STRUUID/RAND — shape-tested; no oracle possible). All
compile to Catalyst columns over the store's canonical lexicals.
Reference analog: RDF4J SPARQL function library (public behavior of
jgrzebyta/triple-loader's query path); /root/reference is empty."""

from __future__ import annotations

import re

import pytest

from tripleforge import sparql

XSD = "http://www.w3.org/2001/XMLSchema#"
SCHEMA = (
    "subj string, pred string, obj string, obj_kind string, "
    "obj_dt string, obj_lang string, graph string"
)


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        # canonical dateTime lexicals (canon._canon_datetime output)
        ("urn:d:1", "urn:p:ts", "2024-03-05T12:34:56Z", "literal",
         XSD + "dateTime", None, "g"),
        ("urn:d:2", "urn:p:ts", "2021-11-30T23:02:03.5Z", "literal",
         XSD + "dateTime", None, "g"),
        # timezone-less stays as written (XSD local value)
        ("urn:d:3", "urn:p:ts", "2020-01-02T08:00:00", "literal",
         XSD + "dateTime", None, "g"),
        # non-UTC offset as a raw lexical (a store built without
        # canonicalization keeps offsets)
        ("urn:d:4", "urn:p:ts", "2011-01-10T14:45:13.815-05:00", "literal",
         XSD + "dateTime", None, "g"),
        ("urn:d:1", "urn:p:n", "42", "literal", XSD + "integer", None, "g"),
        ("urn:d:2", "urn:p:n", "-7.5", "literal", XSD + "decimal", None, "g"),
        ("urn:d:1", "urn:p:label", "Alpha", "literal", XSD + "string", None, "g"),
        ("urn:d:1", "urn:p:rel", "urn:d:2", "iri", None, None, "g"),
        ("urn:d:2", "urn:p:rel", "urn:d:2", "iri", None, None, "g"),
        # same lexical, one as IRI and one as plain literal — sameTerm
        # must distinguish, plain = must not
        ("urn:d:5", "urn:p:rel", "urn:d:2", "iri", None, None, "g"),
        ("urn:d:5", "urn:p:tag", "urn:d:2", "literal", XSD + "string",
         None, "g"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _one(df_, col):
    rows = df_.collect()
    assert len(rows) == 1
    return rows[0][col]


def _by(df_, key, col):
    return {r[key]: r[col] for r in df_.collect()}


# -- date/time accessors ----------------------------------------------------

def test_date_accessors(df):
    out = sparql.select(
        df,
        "SELECT ?d (YEAR(?t) AS ?y) (MONTH(?t) AS ?m) (DAY(?t) AS ?dd) "
        "(HOURS(?t) AS ?h) (MINUTES(?t) AS ?mi) (SECONDS(?t) AS ?s) "
        "WHERE { ?d <urn:p:ts> ?t }",
    )
    rows = {r["d"]: r for r in out.collect()}
    r1 = rows["urn:d:1"]
    assert (r1["y"], r1["m"], r1["dd"], r1["h"], r1["mi"], r1["s"]) == (
        2024, 3, 5, 12, 34, 56.0)
    assert rows["urn:d:2"]["s"] == 3.5
    assert rows["urn:d:3"]["y"] == 2020


def test_tz_and_timezone(df):
    out = sparql.select(
        df,
        "SELECT ?d (TZ(?t) AS ?tz) (TIMEZONE(?t) AS ?dur) "
        "WHERE { ?d <urn:p:ts> ?t }",
    )
    tz = _by(out, "d", "tz")
    dur = _by(out, "d", "dur")
    assert tz["urn:d:1"] == "Z" and dur["urn:d:1"] == "PT0S"
    # absent timezone: TZ → "", TIMEZONE → type error (null here)
    assert tz["urn:d:3"] == "" and dur["urn:d:3"] is None
    # offset → dayTimeDuration (SPARQL spec example: -PT5H)
    assert tz["urn:d:4"] == "-05:00" and dur["urn:d:4"] == "-PT5H"


def test_year_in_filter(df):
    out = sparql.select(
        df,
        "SELECT ?d WHERE { ?d <urn:p:ts> ?t . FILTER(YEAR(?t) >= 2021) }",
    )
    assert sorted(r["d"] for r in out.collect()) == ["urn:d:1", "urn:d:2"]


# -- XSD constructor casts ---------------------------------------------------

def test_casts(df):
    out = sparql.select(
        df,
        f"PREFIX xsd: <{XSD}> "
        "SELECT ?d (xsd:integer(?n) AS ?i) (xsd:double(?n) AS ?f) "
        "(xsd:string(?n) AS ?sv) WHERE { ?d <urn:p:n> ?n }",
    )
    rows = {r["d"]: r for r in out.collect()}
    assert rows["urn:d:1"]["i"] == 42.0
    # integer cast truncates toward zero
    assert rows["urn:d:2"]["i"] == -7.0
    assert rows["urn:d:2"]["f"] == -7.5
    assert rows["urn:d:1"]["sv"] == "42"


def test_cast_boolean(df):
    out = sparql.select(
        df,
        f"PREFIX xsd: <{XSD}> "
        'SELECT ?d WHERE { ?d <urn:p:n> ?n . FILTER(xsd:boolean("true")) }',
    )
    assert out.count() == 2


def test_cast_in_filter(df):
    out = sparql.select(
        df,
        f"PREFIX xsd: <{XSD}> SELECT ?d WHERE {{ ?d <urn:p:n> ?n . "
        "FILTER(xsd:integer(?n) = 42) }",
    )
    assert _one(out, "d") == "urn:d:1"


def test_plain_iri_constant_still_works(df):
    """The '(' lookahead must not break bare XSD IRIs in expressions."""
    out = sparql.select(
        df,
        f"SELECT ?d WHERE {{ ?d <urn:p:n> ?n . "
        f"FILTER(DATATYPE(?n) = <{XSD}integer>) }}",
    )
    assert _one(out, "d") == "urn:d:1"


# -- term constructors / term tests -------------------------------------------

def test_iri_constructor(df):
    out = sparql.select(
        df,
        'SELECT ?d (IRI(CONCAT("urn:doc/", STR(?n))) AS ?u) '
        "WHERE { ?d <urn:p:n> ?n . FILTER(?n = 42) }",
    )
    assert _one(out, "u") == "urn:doc/42"


def test_strlang_strdt(df):
    out = sparql.select(
        df,
        'SELECT (STRLANG("chat", "fr") AS ?sl) '
        f'(STRDT("123", <{XSD}integer>) AS ?sd) '
        "WHERE { ?d <urn:p:label> ?l }",
    )
    r = out.collect()[0]
    assert r["sl"] == "chat" and r["sd"] == "123"


def test_sameterm_iri_vs_literal(df):
    """sameTerm distinguishes an IRI from a literal with an equal
    lexical form: urn:d:5 holds <urn:d:2> as an IRI (rel) AND as a
    plain-literal string (tag) — '=' matches, sameTerm must not."""
    eq = sparql.select(
        df,
        "SELECT ?d WHERE { ?d <urn:p:rel> ?x . ?d <urn:p:tag> ?y . "
        "FILTER(?x = ?y) }",
    )
    assert _one(eq, "d") == "urn:d:5"
    st = sparql.select(
        df,
        "SELECT ?d WHERE { ?d <urn:p:rel> ?x . ?d <urn:p:tag> ?y . "
        "FILTER(SAMETERM(?x, ?y)) }",
    )
    assert st.count() == 0


def test_sameterm_same_var(df):
    out = sparql.select(
        df,
        "SELECT ?d WHERE { ?d <urn:p:n> ?n . FILTER(SAMETERM(?n, ?n)) }",
    )
    assert out.count() == 2


def test_isnumeric(df):
    out = sparql.select(
        df,
        "SELECT ?d ?o WHERE { ?d ?p ?o . FILTER(ISNUMERIC(?o)) }",
    )
    assert sorted(r["o"] for r in out.collect()) == ["-7.5", "42"]


# -- non-deterministic functions (shape only) ---------------------------------

def test_now_uuid_rand_shapes(df):
    out = sparql.select(
        df,
        "SELECT (NOW() AS ?now) (UUID() AS ?u) (STRUUID() AS ?su) "
        "(RAND() AS ?r) WHERE { ?d <urn:p:label> ?l }",
    )
    r = out.collect()[0]
    assert re.fullmatch(r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z", r["now"])
    assert r["u"].startswith("urn:uuid:")
    assert re.fullmatch(r"[0-9a-f-]{36}", r["su"])
    assert 0.0 <= r["r"] < 1.0


def test_bnode_fresh_per_row(df):
    out = sparql.select(
        df, "SELECT (BNODE() AS ?b) WHERE { ?d <urn:p:n> ?n }"
    )
    vals = [r["b"] for r in out.collect()]
    assert len(vals) == 2 and len(set(vals)) == 2
    assert all(v.startswith("urn:skolem:bnode:") for v in vals)


def test_new_fns_no_python_in_plan(df):
    out = sparql.select(
        df,
        "SELECT ?d (YEAR(?t) AS ?y) (TIMEZONE(?t) AS ?dur) "
        "WHERE { ?d <urn:p:ts> ?t . FILTER(ISNUMERIC(?t) || YEAR(?t) > 0) }",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


# -- GROUP BY expressions (§19.8 GroupCondition) ------------------------------

def test_group_by_expression_aliased(df):
    out = sparql.select(
        df,
        "SELECT ?y (COUNT(*) AS ?n) WHERE { ?d <urn:p:ts> ?t } "
        "GROUP BY (YEAR(?t) AS ?y)",
    )
    got = {(r["y"], r["n"]) for r in out.collect()}
    assert got == {(2024, 1), (2021, 1), (2020, 1), (2011, 1)}


def test_group_by_builtin_unaliased(df):
    out = sparql.select(
        df,
        "SELECT (COUNT(*) AS ?n) WHERE { ?d <urn:p:ts> ?t } GROUP BY TZ(?t)",
    )
    # Z (3 rows counting d1,d2), "" (d3), -05:00 (d4)
    assert sorted(r["n"] for r in out.collect()) == [1, 1, 2]


def test_group_by_var_and_expression(df):
    out = sparql.select(
        df,
        "SELECT ?d ?y (COUNT(*) AS ?c) WHERE { ?d <urn:p:ts> ?t } "
        "GROUP BY ?d (YEAR(?t) AS ?y)",
    )
    assert out.count() == 4


# -- aggregate expressions + HAVING aggregates (r3b, §18.4) -------------------

def test_aggregate_expression_arg(df):
    out = sparql.select(
        df,
        "SELECT (SUM(?n * 2) AS ?t) (MAX(YEAR(?ts)) AS ?y) WHERE { "
        "?d <urn:p:n> ?n . ?d <urn:p:ts> ?ts }",
    )
    r = out.collect()[0]
    # d1 (42) and d2 (-7.5) have both n and ts
    assert r["t"] == 69.0 and r["y"] == 2024.0


def test_having_direct_aggregate(df):
    out = sparql.select(
        df,
        "SELECT ?d (COUNT(*) AS ?c) WHERE { ?d ?p ?o } GROUP BY ?d "
        "HAVING (COUNT(*) >= 3)",
    )
    got = {(r.d, r.c) for r in out.collect()}
    # d:1 has ts+n+label+rel = 4, d:2 has ts+n+rel = 3
    assert got == {("urn:d:1", 4), ("urn:d:2", 3)}
    assert out.columns == ["d", "c"]  # synthesized agg column dropped


def test_having_only_aggregate_no_projection(df):
    out = sparql.select(
        df,
        "SELECT ?d WHERE { ?d ?p ?o } GROUP BY ?d HAVING (COUNT(*) = 1)",
    )
    assert sorted(r.d for r in out.collect()) == ["urn:d:3", "urn:d:4"]


def test_aggregate_in_filter_rejected(df):
    with pytest.raises(sparql.SparqlError, match="only allowed in SELECT"):
        sparql.select(
            df, "SELECT ?d WHERE { ?d <urn:p:n> ?n . FILTER(SUM(?n) > 1) }"
        ).collect()


# -- corner-case vectors (W3C-style) ------------------------------------------

def test_timezone_half_hour_offset(spark):
    df = spark.createDataFrame(
        [("urn:e", "urn:p:at", "2024-06-01T10:00:00+05:30", "literal",
          XSD + "dateTime", None, "g"),
         ("urn:f", "urn:p:at", "2024-06-01T10:00:00-00:30", "literal",
          XSD + "dateTime", None, "g")],
        SCHEMA,
    )
    out = sparql.select(
        df, "SELECT ?d (TIMEZONE(?t) AS ?z) WHERE { ?d <urn:p:at> ?t }"
    )
    z = {r.d: r.z for r in out.collect()}
    assert z["urn:e"] == "PT5H30M" and z["urn:f"] == "-PT30M"


def test_strbefore_strafter_empty_and_missing(df):
    out = sparql.select(
        df,
        'SELECT (STRBEFORE("abc", "b") AS ?b) (STRAFTER("abc", "b") AS ?a) '
        '(STRBEFORE("abc", "z") AS ?miss) (STRAFTER("abc", "") AS ?empty) '
        "WHERE { ?d <urn:p:label> ?l }",
    )
    r = out.collect()[0]
    # absent separator → ""; empty separator: STRAFTER("abc","") = "abc"
    assert (r.b, r.a, r.miss) == ("a", "c", "")
    assert r.empty == "abc"


def test_nested_cast_in_concat(df):
    out = sparql.select(
        df,
        f"PREFIX xsd: <{XSD}> "
        'SELECT (CONCAT("n=", xsd:string(xsd:integer("007"))) AS ?s) '
        "WHERE { ?d <urn:p:label> ?l }",
    )
    assert out.collect()[0].s == "n=7.0" or out.collect()[0].s == "n=7"


def test_substr_one_based_and_tail(df):
    out = sparql.select(
        df,
        'SELECT (SUBSTR("hello", 2) AS ?t) (SUBSTR("hello", 2, 3) AS ?m) '
        "WHERE { ?d <urn:p:label> ?l }",
    )
    r = out.collect()[0]
    assert (r.t, r.m) == ("ello", "ell")


def test_in_list_with_expressions(df):
    out = sparql.select(
        df,
        "SELECT ?d WHERE { ?d <urn:p:n> ?n . FILTER(?n IN (41 + 1, 99)) }",
    )
    assert _one(out, "d") == "urn:d:1"


def test_order_by_direct_aggregate(df):
    out = sparql.select(
        df,
        "SELECT ?d WHERE { ?d ?p ?o } GROUP BY ?d ORDER BY DESC(COUNT(*)) "
        "LIMIT 2",
    )
    # d:1 (4 stmts) then d:2 (3 stmts); synthesized column dropped
    assert [r.d for r in out.collect()] == ["urn:d:1", "urn:d:2"]
    assert out.columns == ["d"]


def test_order_by_and_having_aggregates_combined(df):
    out = sparql.select(
        df,
        "SELECT ?d (COUNT(*) AS ?c) WHERE { ?d ?p ?o } GROUP BY ?d "
        "HAVING (COUNT(*) >= 2) ORDER BY ASC(MIN(STR(?o))) ",
    )
    assert out.columns == ["d", "c"]
    assert len(out.collect()) == 3  # d:1 (4), d:2 (3), d:5 (2)
