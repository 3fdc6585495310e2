"""MINUS / FILTER [NOT] EXISTS / HAVING (SPARQL 1.1 §8.3, §8.1.3,
§11.5) — compiled to anti/semi joins and a post-aggregation filter.
Reference analog: RDF4J SPARQL engine behavior (public; /root/reference
is empty)."""

from __future__ import annotations

import pytest

from tripleforge import sparql

SCHEMA = (
    "subj string, pred string, obj string, obj_kind string, "
    "obj_dt string, obj_lang string, graph string"
)


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        ("urn:d1", "urn:p:a", "x", "literal", None, None, "g"),
        ("urn:d2", "urn:p:a", "y", "literal", None, None, "g"),
        ("urn:d3", "urn:p:a", "z", "literal", None, None, "g"),
        ("urn:d1", "urn:p:flag", "1", "literal", None, None, "g"),
        ("urn:d3", "urn:p:flag", "1", "literal", None, None, "g"),
        ("urn:d1", "urn:p:tag", "t1", "literal", None, None, "g"),
        ("urn:d1", "urn:p:tag", "t2", "literal", None, None, "g"),
        ("urn:d2", "urn:p:tag", "t3", "literal", None, None, "g"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _ds(out):
    return sorted(r["d"] for r in out.collect())


def test_minus(df):
    out = sparql.select(
        df,
        "SELECT ?d WHERE { ?d <urn:p:a> ?v . MINUS { ?d <urn:p:flag> ?f } }",
    )
    assert _ds(out) == ["urn:d2"]


def test_minus_disjoint_domain_is_noop(df):
    """SPARQL §8.3: MINUS whose block shares no variable removes
    nothing."""
    out = sparql.select(
        df,
        "SELECT ?d WHERE { ?d <urn:p:a> ?v . MINUS { ?x <urn:p:flag> ?f } }",
    )
    assert _ds(out) == ["urn:d1", "urn:d2", "urn:d3"]


def test_not_exists(df):
    out = sparql.select(
        df,
        "SELECT ?d WHERE { ?d <urn:p:a> ?v . "
        "FILTER NOT EXISTS { ?d <urn:p:flag> ?f } }",
    )
    assert _ds(out) == ["urn:d2"]


def test_exists(df):
    out = sparql.select(
        df,
        "SELECT ?d WHERE { ?d <urn:p:a> ?v . "
        "FILTER EXISTS { ?d <urn:p:flag> ?f } }",
    )
    assert _ds(out) == ["urn:d1", "urn:d3"]


def test_having(df):
    out = sparql.select(
        df,
        "SELECT ?d (COUNT(*) AS ?n) WHERE { ?d <urn:p:tag> ?t } "
        "GROUP BY ?d HAVING(?n > 1)",
    )
    rows = [(r["d"], r["n"]) for r in out.collect()]
    assert rows == [("urn:d1", 2)]


def test_having_without_group_raises(df):
    with pytest.raises(sparql.SparqlError, match="HAVING requires"):
        sparql.select(
            df, "SELECT ?d WHERE { ?d <urn:p:a> ?v } HAVING(?d > 1)"
        )


def test_exists_compiles_to_semi_join(df):
    out = sparql.select(
        df,
        "SELECT ?d WHERE { ?d <urn:p:a> ?v . "
        "FILTER EXISTS { ?d <urn:p:flag> ?f } }",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    out2 = sparql.select(
        df,
        "SELECT ?d WHERE { ?d <urn:p:a> ?v . MINUS { ?d <urn:p:flag> ?f } }",
    )
    plan2 = out2._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan2


def test_minus_combined_with_expressions(df):
    out = sparql.select(
        df,
        'SELECT ?d WHERE { ?d <urn:p:a> ?v . '
        'FILTER(STRSTARTS(?v, "x") || STRSTARTS(?v, "y")) '
        "MINUS { ?d <urn:p:flag> ?f } }",
    )
    assert _ds(out) == ["urn:d2"]


def test_describe_iri(spark, df):
    out = sparql.describe(df, "DESCRIBE <urn:d1>")
    assert {(r["subj"], r["pred"]) for r in out.collect()} == {
        ("urn:d1", "urn:p:a"), ("urn:d1", "urn:p:flag"), ("urn:d1", "urn:p:tag"),
    }


def test_describe_var_with_where(spark, df):
    out = sparql.describe(
        df, "DESCRIBE ?d WHERE { ?d <urn:p:flag> ?f }"
    )
    subjects = {r["subj"] for r in out.collect()}
    assert subjects == {"urn:d1", "urn:d3"}


def test_describe_includes_object_position(spark):
    rows = [
        ("urn:a", "urn:p:rel", "urn:target", "iri", None, None, "g"),
        ("urn:target", "urn:p:x", "1", "literal", None, None, "g"),
        ("urn:other", "urn:p:y", "2", "literal", None, None, "g"),
    ]
    df2 = spark.createDataFrame(rows, SCHEMA)
    out = sparql.describe(df2, "DESCRIBE <urn:target>")
    got = {(r["subj"], r["obj"]) for r in out.collect()}
    assert got == {("urn:a", "urn:target"), ("urn:target", "1")}


def test_describe_via_query_dispatch(spark, df):
    out = sparql.query(df, "DESCRIBE <urn:d2>")
    assert "subj" in out.columns and out.count() == 2


def test_subquery_joined_with_outer_pattern(spark, df):
    """SPARQL 1.1 §12: { SELECT … } evaluates independently and joins
    the outer group on its projected variables."""
    out = sparql.select(
        df,
        """
        SELECT ?d ?v ?n WHERE {
          ?d <urn:p:a> ?v .
          { SELECT ?d (COUNT(*) AS ?n) WHERE { ?d <urn:p:tag> ?t } GROUP BY ?d }
        }
        """,
    )
    rows = {(r["d"], r["v"], r["n"]) for r in out.collect()}
    assert rows == {("urn:d1", "x", 2), ("urn:d2", "y", 1)}


def test_subquery_alone_in_where(spark, df):
    out = sparql.select(
        df,
        "SELECT ?d ?n WHERE { { SELECT ?d (COUNT(*) AS ?n) "
        "WHERE { ?d <urn:p:tag> ?t } GROUP BY ?d } } ORDER BY ?d",
    )
    assert [(r["d"], r["n"]) for r in out.collect()] == [
        ("urn:d1", 2), ("urn:d2", 1),
    ]


def test_subquery_with_limit_inside(spark, df):
    """Modifiers inside the subquery apply BEFORE the outer join."""
    out = sparql.select(
        df,
        """
        SELECT ?d ?v WHERE {
          ?d <urn:p:a> ?v .
          { SELECT ?d WHERE { ?d <urn:p:tag> ?t } ORDER BY ?d LIMIT 1 }
        }
        """,
    )
    assert {(r["d"], r["v"]) for r in out.collect()} == {("urn:d1", "x")}


def test_subquery_disjoint_raises(spark, df):
    with pytest.raises(sparql.SparqlError, match="cross product"):
        sparql.select(
            df,
            "SELECT ?d WHERE { ?d <urn:p:a> ?v . "
            "{ SELECT ?x WHERE { ?x <urn:p:tag> ?t } } }",
        )
