"""Round-5 SPARQL lifts (VERDICT r4 next-round #1/#2): subqueries +
FILTER/BIND/VALUES inside MINUS / EXISTS / OPTIONAL blocks, property
paths under ``GRAPH ?g`` (variable graph terms), and BIND on outer
variables inside OPTIONAL with strict bottom-up scope (§18.2.2.6
Extend: outer refs are unbound inside the block). Reference analog:
SPARQL 1.1 REC semantics (public; /root/reference is empty)."""

from __future__ import annotations

import pytest

from tripleforge import sparql
from tripleforge.sparql_lex import SparqlError

SCHEMA = (
    "subj string, pred string, obj string, obj_kind string, "
    "obj_dt string, obj_lang string, graph string"
)


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        ("urn:d1", "urn:p:a", "10", "literal", None, None, "urn:g1"),
        ("urn:d2", "urn:p:a", "20", "literal", None, None, "urn:g1"),
        ("urn:d3", "urn:p:a", "30", "literal", None, None, "urn:g1"),
        ("urn:d1", "urn:p:score", "5", "literal", None, None, "urn:g1"),
        ("urn:d2", "urn:p:score", "9", "literal", None, None, "urn:g1"),
        ("urn:d3", "urn:p:score", "9", "literal", None, None, "urn:g1"),
        ("urn:d1", "urn:p:tag", "t1", "literal", None, None, "urn:g1"),
        ("urn:d2", "urn:p:tag", "t2", "literal", None, None, "urn:g1"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture(scope="module")
def chains(spark):
    """Two named graphs with DIFFERENT link chains over the same
    nodes — exposes any cross-graph leakage in per-graph paths."""
    rows = [
        ("urn:n1", "urn:p:next", "urn:n2", "iri", None, None, "urn:ga"),
        ("urn:n2", "urn:p:next", "urn:n3", "iri", None, None, "urn:ga"),
        ("urn:n3", "urn:p:next", "urn:n4", "iri", None, None, "urn:ga"),
        # gb link chain goes the other way and skips n3
        ("urn:n4", "urn:p:next", "urn:n2", "iri", None, None, "urn:gb"),
        ("urn:n2", "urn:p:next", "urn:n1", "iri", None, None, "urn:gb"),
        ("urn:n1", "urn:p:kind", "leaf", "literal", None, None, "urn:ga"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _ds(out, col="d"):
    return sorted(r[col] for r in out.collect())


# ---------------------------------------------------------------------------
# subqueries inside MINUS / EXISTS / OPTIONAL
# ---------------------------------------------------------------------------
def test_subquery_inside_minus(df):
    """Remove subjects whose score equals the global max (computed by a
    subquery joined inside the MINUS block)."""
    out = sparql.select(df, """
      SELECT ?d WHERE {
        ?d <urn:p:a> ?v .
        MINUS {
          ?d <urn:p:score> ?s .
          { SELECT (MAX(?x) AS ?s) WHERE { ?y <urn:p:score> ?x } }
        }
      }""")
    assert _ds(out) == ["urn:d1"]


def test_subquery_only_minus_block(df):
    """A MINUS block that is nothing but a subquery: shares ?d."""
    out = sparql.select(df, """
      SELECT ?d WHERE {
        ?d <urn:p:a> ?v .
        MINUS { { SELECT ?d WHERE { ?d <urn:p:tag> "t1" } } }
      }""")
    assert _ds(out) == ["urn:d2", "urn:d3"]


def test_subquery_inside_exists(df):
    out = sparql.select(df, """
      SELECT ?d WHERE {
        ?d <urn:p:a> ?v .
        FILTER EXISTS {
          ?d <urn:p:score> ?s .
          { SELECT (MAX(?x) AS ?s) WHERE { ?y <urn:p:score> ?x } }
        }
      }""")
    assert _ds(out) == ["urn:d2", "urn:d3"]


def test_subquery_inside_not_exists(df):
    out = sparql.select(df, """
      SELECT ?d WHERE {
        ?d <urn:p:a> ?v .
        FILTER NOT EXISTS {
          ?d <urn:p:score> ?s .
          { SELECT (MAX(?x) AS ?s) WHERE { ?y <urn:p:score> ?x } }
        }
      }""")
    assert _ds(out) == ["urn:d1"]


def test_subquery_inside_optional(df):
    """OPTIONAL { pattern + subquery }: the unit binds only where the
    score matches the subquery's max; other rows stay null-extended."""
    out = sparql.select(df, """
      SELECT ?d ?s WHERE {
        ?d <urn:p:a> ?v .
        OPTIONAL {
          ?d <urn:p:score> ?s .
          { SELECT (MAX(?x) AS ?s) WHERE { ?y <urn:p:score> ?x } }
        }
      }""")
    got = {(r["d"], r["s"]) for r in out.collect()}
    assert got == {("urn:d1", None), ("urn:d2", "9"), ("urn:d3", "9")}


def test_filter_and_values_inside_minus(df):
    """FILTER and VALUES scope to the MINUS block (r5 — VALUES used to
    leak to the outer group)."""
    out = sparql.select(df, """
      SELECT ?d WHERE {
        ?d <urn:p:a> ?v .
        MINUS { ?d <urn:p:score> ?s FILTER(?s > 5) }
      }""")
    assert _ds(out) == ["urn:d1"]
    out = sparql.select(df, """
      SELECT ?d WHERE {
        ?d <urn:p:a> ?v .
        MINUS { ?d <urn:p:tag> ?t . VALUES ?t { "t1" } }
      }""")
    assert _ds(out) == ["urn:d2", "urn:d3"]


def test_bind_inside_exists(df):
    out = sparql.select(df, """
      SELECT ?d WHERE {
        ?d <urn:p:a> ?v .
        FILTER EXISTS {
          ?d <urn:p:score> ?s . BIND(?s + 1 AS ?s1) FILTER(?s1 = 10)
        }
      }""")
    assert _ds(out) == ["urn:d2", "urn:d3"]


def test_nested_minus_now_evaluates(df):
    """r5b lifts the rejection: the inner MINUS re-admits tagged
    subjects into the outer result ({A MINUS {B MINUS C}})."""
    out = sparql.select(df, """
      SELECT ?d WHERE {
        ?d <urn:p:a> ?v .
        MINUS { ?d <urn:p:score> ?s MINUS { ?d <urn:p:tag> ?t } }
      }""")
    # B MINUS C = scored-but-untagged = d3 → outer removes d3
    assert _ds(out) == ["urn:d1", "urn:d2"]


# ---------------------------------------------------------------------------
# property paths under GRAPH ?g
# ---------------------------------------------------------------------------
def test_path_plus_under_graph_var(chains):
    """?s next+ ?o inside GRAPH ?g: closures stay graph-local — the ga
    chain n1→n2→n3→n4 never mixes with gb's n4→n2→n1."""
    out = sparql.select(chains, """
      SELECT ?g ?s ?o WHERE { GRAPH ?g { ?s <urn:p:next>+ ?o } }""")
    got = {(r["g"], r["s"], r["o"]) for r in out.collect()}
    ga = {("urn:ga", a, b) for a, b in [
        ("urn:n1", "urn:n2"), ("urn:n1", "urn:n3"), ("urn:n1", "urn:n4"),
        ("urn:n2", "urn:n3"), ("urn:n2", "urn:n4"), ("urn:n3", "urn:n4"),
    ]}
    gb = {("urn:gb", a, b) for a, b in [
        ("urn:n4", "urn:n2"), ("urn:n4", "urn:n1"), ("urn:n2", "urn:n1"),
    ]}
    assert got == ga | gb


def test_path_seq_under_graph_var(chains):
    out = sparql.select(chains, """
      SELECT ?g ?s ?o WHERE {
        GRAPH ?g { ?s <urn:p:next>/<urn:p:next> ?o }
      }""")
    got = {(r["g"], r["s"], r["o"]) for r in out.collect()}
    assert got == {
        ("urn:ga", "urn:n1", "urn:n3"), ("urn:ga", "urn:n2", "urn:n4"),
        ("urn:gb", "urn:n4", "urn:n1"),
    }


def test_path_inv_alt_under_graph_var(chains):
    out = sparql.select(chains, """
      SELECT ?g ?o WHERE {
        GRAPH ?g { ?s (^<urn:p:next>|<urn:p:kind>) ?o .
                   FILTER(?s = "leaf" || ?s = <urn:n2>) }
      }""")
    # ^next from n2: ga gives n1, gb gives n4 (note ?s="leaf" matches
    # nothing in subject position — literals are never subjects here)
    got = {(r["g"], r["o"]) for r in out.collect()}
    assert got == {("urn:ga", "urn:n1"), ("urn:gb", "urn:n4")}


def test_path_star_under_graph_var_joins_graph_var(chains):
    """The bound ?g joins with a non-path pattern in the same graph."""
    out = sparql.select(chains, """
      SELECT ?o WHERE {
        GRAPH ?g { ?s <urn:p:next>* ?o . ?s <urn:p:kind> "leaf" }
      }""")
    # kind only in ga: n1 next* {n1,n2,n3,n4} within ga
    assert _ds(out, "o") == ["urn:n1", "urn:n2", "urn:n3", "urn:n4"]


def test_path_nps_under_graph_var(chains):
    out = sparql.select(chains, """
      SELECT ?g ?s ?o WHERE { GRAPH ?g { ?s !<urn:p:kind> ?o .
        FILTER(?s = <urn:n2>) } }""")
    got = {(r["g"], r["o"]) for r in out.collect()}
    assert got == {("urn:ga", "urn:n3"), ("urn:gb", "urn:n1")}


# ---------------------------------------------------------------------------
# BIND on outer variables inside OPTIONAL (strict bottom-up scope)
# ---------------------------------------------------------------------------
def test_optional_bind_outer_var_is_unbound(df):
    """§18.2.2.6: inside OPTIONAL, BIND sees only block bindings — an
    outer-only variable is unbound, so ?w is null on matched rows (not
    a loud rejection, not the outer value)."""
    out = sparql.select(df, """
      SELECT ?d ?w WHERE {
        ?d <urn:p:a> ?v .
        OPTIONAL { ?d <urn:p:score> ?s . BIND(?v + 1 AS ?w) }
      }""")
    got = {(r["d"], r["w"]) for r in out.collect()}
    assert got == {("urn:d1", None), ("urn:d2", None), ("urn:d3", None)}


def test_optional_bind_coalesce_outer(df):
    """COALESCE skips the unbound outer ref and lands on the block
    variable."""
    out = sparql.select(df, """
      SELECT ?d ?w WHERE {
        ?d <urn:p:a> ?v .
        OPTIONAL { ?d <urn:p:tag> ?t . BIND(COALESCE(?v, ?t) AS ?w) }
      }""")
    got = {(r["d"], r["w"]) for r in out.collect()}
    assert got == {("urn:d1", "t1"), ("urn:d2", "t2"), ("urn:d3", None)}


def test_optional_bind_bound_outer_is_false(df):
    out = sparql.select(df, """
      SELECT ?d ?w WHERE {
        ?d <urn:p:tag> ?t .
        OPTIONAL { ?d <urn:p:score> ?s .
                   BIND(IF(BOUND(?t), "seen", "hidden") AS ?w) }
      }""")
    got = {(r["d"], r["w"]) for r in out.collect()}
    assert got == {("urn:d1", "hidden"), ("urn:d2", "hidden")}


def test_optional_bind_shared_var_still_binds(df):
    """A variable the block itself binds (join var ?d, block var ?s)
    stays fully visible to BIND — only outer-ONLY refs are unbound."""
    out = sparql.select(df, """
      SELECT ?d ?w WHERE {
        ?d <urn:p:a> ?v .
        OPTIONAL { ?d <urn:p:score> ?s . BIND(?s + 1 AS ?w) }
      }""")
    got = {(r["d"], r["w"]) for r in out.collect()}
    assert got == {("urn:d1", 6.0), ("urn:d2", 10.0), ("urn:d3", 10.0)}
