"""r5i lift: SELECT expressions over grouped queries (§18.2.4.2) —
expression projections alongside aggregates / GROUP BY, expressions
CONTAINING aggregate calls, expressions over GROUP BY keys, references
to earlier SELECT aliases, and GROUP BY with no aggregate at all (one
row per group). Previously a loud rejection ("expression projections
are not supported together with aggregates/GROUP BY")."""

from __future__ import annotations

import pytest

from tripleforge import sparql
from tripleforge.sparql_lex import SparqlError

SCHEMA = (
    "subj string, pred string, obj string, obj_kind string, "
    "obj_dt string, obj_lang string, graph string"
)

XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        ("urn:d1", "urn:p:n", "10", "literal", XSD_INT, None, "urn:g"),
        ("urn:d1", "urn:p:n", "20", "literal", XSD_INT, None, "urn:g"),
        ("urn:d2", "urn:p:n", "5", "literal", XSD_INT, None, "urn:g"),
        ("urn:d2", "urn:p:n", "7", "literal", XSD_INT, None, "urn:g"),
        ("urn:d2", "urn:p:n", "9", "literal", XSD_INT, None, "urn:g"),
        ("urn:d3", "urn:p:other", "x", "literal", None, None, "urn:g"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _rows(out):
    return sorted(tuple(r) for r in out.collect())


def test_expression_containing_aggregate(df):
    out = sparql.select(
        df,
        "SELECT ?s (COUNT(?v) + 1 AS ?n1) WHERE { ?s <urn:p:n> ?v } "
        "GROUP BY ?s",
    )
    assert out.columns == ["s", "n1"]
    assert _rows(out) == [("urn:d1", 3), ("urn:d2", 4)]


def test_expression_over_two_aggregates(df):
    out = sparql.select(
        df,
        "SELECT ?s (SUM(?v) / COUNT(?v) AS ?mean) WHERE "
        "{ ?s <urn:p:n> ?v } GROUP BY ?s",
    )
    assert _rows(out) == [("urn:d1", 15.0), ("urn:d2", 7.0)]


def test_expression_over_group_key_and_plain_aggregate(df):
    out = sparql.select(
        df,
        'SELECT (CONCAT(STR(?s), "!") AS ?tag) (SUM(?v) AS ?t) WHERE '
        "{ ?s <urn:p:n> ?v } GROUP BY ?s",
    )
    assert out.columns == ["tag", "t"]
    assert _rows(out) == [("urn:d1!", 30), ("urn:d2!", 21)]


def test_expression_referencing_earlier_alias(df):
    out = sparql.select(
        df,
        "SELECT ?s (SUM(?v) AS ?t) (?t * 2 AS ?t2) WHERE "
        "{ ?s <urn:p:n> ?v } GROUP BY ?s",
    )
    assert out.columns == ["s", "t", "t2"]
    assert _rows(out) == [("urn:d1", 30, 60), ("urn:d2", 21, 42)]


def test_implicit_group_expression_over_aggregate(df):
    # no GROUP BY: the whole solution set is one group
    out = sparql.select(
        df,
        "SELECT (COUNT(*) * 10 AS ?c10) WHERE { ?s <urn:p:n> ?v }",
    )
    assert _rows(out) == [(50,)]


def test_group_by_without_aggregate_one_row_per_group(df):
    out = sparql.select(
        df,
        "SELECT (STRLEN(STR(?s)) AS ?l) WHERE { ?s <urn:p:n> ?v } "
        "GROUP BY ?s",
    )
    assert _rows(out) == [(6,), (6,)]


def test_expression_with_having_and_order(df):
    out = sparql.select(
        df,
        "SELECT ?s (COUNT(?v) - 1 AS ?extra) WHERE { ?s <urn:p:n> ?v } "
        "GROUP BY ?s HAVING (COUNT(?v) > 1) ORDER BY DESC(?extra)",
    )
    assert [tuple(r) for r in out.collect()] == [("urn:d2", 2), ("urn:d1", 1)]


def test_non_group_variable_in_expression_rejected(df):
    with pytest.raises(SparqlError, match="GROUP BY keys"):
        sparql.select(
            df,
            "SELECT (?v + 1 AS ?bad) (COUNT(*) AS ?n) WHERE "
            "{ ?s <urn:p:n> ?v } GROUP BY ?s",
        ).collect()


def test_alias_collision_rejected(df):
    with pytest.raises(SparqlError, match="already bound"):
        sparql.select(
            df,
            "SELECT (COUNT(*) + 0 AS ?s) WHERE { ?s <urn:p:n> ?v } "
            "GROUP BY ?s",
        ).collect()


def test_plain_aggregate_projection_still_works(df):
    # regression guard for the grammar fallback: the plain form must
    # still parse as an aggregate projection (incl. DISTINCT + *)
    out = sparql.select(
        df,
        "SELECT (COUNT(DISTINCT ?s) AS ?n) WHERE { ?s <urn:p:n> ?v }",
    )
    assert _rows(out) == [(2,)]
