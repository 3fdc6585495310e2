"""Property paths (VERDICT r2 #2; SPARQL 1.1 §9): sequence, inverse,
alternative, and bounded-fixpoint +/*/? — compiled to joins/unions/
iterated joins (query.path_pairs), never a driver-side loop over rows.
Reference analog: RDF4J property-path evaluation (public behavior);
no reference code available (/root/reference is empty)."""

from __future__ import annotations

import pytest

from tripleforge import sparql
from tripleforge.query import Pattern, bgp, path_pairs

SCHEMA = (
    "subj string, pred string, obj string, obj_kind string, "
    "obj_dt string, obj_lang string, graph string"
)


def _iri(s, p, o, g="g"):
    return (s, p, o, "iri", None, None, g)


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        # two 3-node knows-chains: a→b→c, x→y
        _iri("urn:a", "urn:knows", "urn:b"),
        _iri("urn:b", "urn:knows", "urn:c"),
        _iri("urn:x", "urn:knows", "urn:y"),
        # a cycle: c→a (closure must terminate)
        _iri("urn:c", "urn:knows", "urn:a"),
        # docs: doc→src, doc→nchars(literal)
        _iri("urn:d1", "urn:p:source", "urn:s1"),
        _iri("urn:d2", "urn:p:source", "urn:s1"),
        _iri("urn:d3", "urn:p:source", "urn:s2"),
        ("urn:d1", "urn:p:nchars", "100", "literal",
         "http://www.w3.org/2001/XMLSchema#integer", None, "g"),
        ("urn:d2", "urn:p:nchars", "200", "literal",
         "http://www.w3.org/2001/XMLSchema#integer", None, "g"),
        ("urn:d3", "urn:p:nchars", "300", "literal",
         "http://www.w3.org/2001/XMLSchema#integer", None, "g"),
        _iri("urn:d1", "urn:p:alt", "urn:z"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _pairs(df_, cols=("s", "o")):
    return {tuple(r[c] for c in cols) for r in df_.collect()}


def test_sequence_path(df):
    out = sparql.select(
        df, "SELECT ?s ?o WHERE { ?s <urn:knows>/<urn:knows> ?o }"
    )
    assert _pairs(out) == {
        ("urn:a", "urn:c"), ("urn:b", "urn:a"), ("urn:c", "urn:b"),
    }


def test_inverse_path(df):
    out = sparql.select(
        df, "SELECT ?src ?d WHERE { ?src ^<urn:p:source> ?d }"
    )
    assert _pairs(out, ("src", "d")) == {
        ("urn:s1", "urn:d1"), ("urn:s1", "urn:d2"), ("urn:s2", "urn:d3"),
    }


def test_inverse_then_forward(df):
    """src ← doc → nchars: the 2-hop join the VERDICT asked for."""
    out = sparql.select(
        df,
        "SELECT ?src ?n WHERE { ?src ^<urn:p:source>/<urn:p:nchars> ?n }",
    )
    assert _pairs(out, ("src", "n")) == {
        ("urn:s1", "100"), ("urn:s1", "200"), ("urn:s2", "300"),
    }


def test_alternative_path(df):
    out = sparql.select(
        df,
        "SELECT ?o WHERE { <urn:d1> (<urn:p:source>|<urn:p:alt>) ?o }",
    )
    assert {r["o"] for r in out.collect()} == {"urn:s1", "urn:z"}


def test_plus_closure_with_cycle(df):
    """a→b→c→a: + must produce all 9 ordered pairs of the cycle and
    terminate despite the loop."""
    out = sparql.select(
        df, "SELECT ?s ?o WHERE { ?s <urn:knows>+ ?o }"
    )
    got = _pairs(out)
    cyc = {"urn:a", "urn:b", "urn:c"}
    expected = {(s, o) for s in cyc for o in cyc} | {("urn:x", "urn:y")}
    assert got == expected


def test_star_includes_zero_length(df):
    out = sparql.select(
        df, "SELECT ?o WHERE { <urn:x> <urn:knows>* ?o }"
    )
    assert {r["o"] for r in out.collect()} == {"urn:x", "urn:y"}


def test_opt_path(df):
    out = sparql.select(
        df, "SELECT ?o WHERE { <urn:a> <urn:knows>? ?o }"
    )
    assert {r["o"] for r in out.collect()} == {"urn:a", "urn:b"}


def test_path_joins_with_plain_patterns(df):
    out = sparql.select(
        df,
        "SELECT ?src (COUNT(*) AS ?n_docs) WHERE { "
        "?src ^<urn:p:source> ?d . ?d <urn:p:nchars> ?n . "
        "FILTER(?n < 250) } GROUP BY ?src ORDER BY ?src",
    )
    rows = [(r["src"], r["n_docs"]) for r in out.collect()]
    assert rows == [("urn:s1", 2)]


def test_path_bound_both_ends(df):
    out = sparql.ask(df, "ASK { <urn:a> <urn:knows>/<urn:knows> <urn:c> }")
    assert out.first()["ask"] is True


def test_same_var_both_ends(df):
    """?x knows+ ?x — cycle membership."""
    out = sparql.select(df, "SELECT ?x WHERE { ?x <urn:knows>+ ?x }")
    assert {r["x"] for r in out.collect()} == {"urn:a", "urn:b", "urn:c"}


def test_var_inside_path_raises(df):
    with pytest.raises(sparql.SparqlError, match="not allowed inside"):
        sparql.select(df, "SELECT ?s WHERE { ?s <urn:knows>/?p ?o }")


def test_path_closure_nonconvergence_raises(spark):
    rows = [_iri(f"urn:n{i}", "urn:next", f"urn:n{i+1}") for i in range(30)]
    df = spark.createDataFrame(rows, SCHEMA)
    with pytest.raises(Exception, match="did not converge"):
        path_pairs(df, ("plus", ("leaf", "urn:next")), max_iter=3).count()


def test_programmatic_path_pattern(df):
    """query.bgp accepts a path AST directly in Pattern.p."""
    out = bgp(
        df,
        [Pattern(s="?s", p=("seq", [("leaf", "urn:knows"), ("leaf", "urn:knows")]), o="urn:c")],
    )
    assert {r["s"] for r in out.collect()} == {"urn:a"}


def test_path_no_python_in_plan(df):
    out = sparql.select(
        df, "SELECT ?s ?o WHERE { ?s <urn:knows>/<urn:knows> ?o }"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


# ---------------------------------------------------------------------------
# Negated property sets (SPARQL 1.1 §9.1 PathNegatedPropertySet)
# ---------------------------------------------------------------------------
def test_nps_forward(df):
    """!(knows|nchars) keeps only source/alt edges."""
    out = sparql.select(
        df,
        "SELECT ?s ?o WHERE { ?s !(<urn:knows>|<urn:p:nchars>) ?o }",
    )
    assert _pairs(out) == {
        ("urn:d1", "urn:s1"), ("urn:d2", "urn:s1"), ("urn:d3", "urn:s2"),
        ("urn:d1", "urn:z"),
    }


def test_nps_single_member_no_parens(df):
    """!iri without parentheses."""
    out = sparql.select(df, "SELECT ?s ?o WHERE { ?s !<urn:knows> ?o }")
    got = _pairs(out)
    assert ("urn:a", "urn:b") not in got
    assert ("urn:d1", "urn:s1") in got and ("urn:d1", "urn:100") not in got
    assert ("urn:d1", "100") in got  # literal objects survive


def test_nps_inverse_only(df):
    """!(^p) matches every reversed edge whose predicate is not p."""
    out = sparql.select(
        df, "SELECT ?s ?o WHERE { ?s !(^<urn:knows>) ?o }"
    )
    got = _pairs(out)
    assert ("urn:b", "urn:a") not in got      # reversed knows excluded
    assert ("urn:s1", "urn:d1") in got        # reversed source kept
    assert ("urn:d1", "urn:s1") not in got    # forward arm absent


def test_nps_mixed(df):
    """Mixed set: forward arm excludes fwd members, inverse arm excludes
    inverse members (SPARQL 1.1 translation: NPS ∪ ^NPS)."""
    out = sparql.select(
        df,
        "SELECT ?s ?o WHERE { ?s !(<urn:p:nchars>|<urn:p:alt>"
        "|<urn:p:source>|^<urn:knows>) ?o }",
    )
    got = _pairs(out)
    assert ("urn:a", "urn:b") in got          # forward knows kept
    assert ("urn:d1", "urn:s1") not in got    # forward source excluded
    assert ("urn:s1", "urn:d1") in got        # reversed source kept
    assert ("urn:c", "urn:a") in got          # forward knows c→a kept
    assert ("urn:b", "urn:a") not in got      # reversed knows excluded


def test_nps_in_sequence(df):
    """NPS composes with / like any path primary."""
    out = sparql.select(
        df,
        "SELECT ?s ?o WHERE { ?s <urn:knows>/!(<urn:p:x>) ?o }",
    )
    assert ("urn:a", "urn:c") in _pairs(out)


def test_nps_variable_member_rejected(df):
    with pytest.raises(Exception, match="not allowed inside property paths"):
        sparql.select(df, "SELECT ?s ?o WHERE { ?s !(?p) ?o }")


def test_nps_pushdown_plan(df):
    """The NPS exclusion is a plain NOT IN predicate scan — no join,
    no Python in the plan."""
    out = sparql.select(
        df, "SELECT ?s ?o WHERE { ?s !(<urn:knows>) ?o }"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Join" not in plan


def test_closure_deep_chain_path_doubling(spark):
    """r4: a 200-edge chain converges (the pure linear BFS capped at 25
    rounds; path doubling covers diameter ~2^23 within the same
    bound) — found by the sf0.1 oracle sweep."""
    from tripleforge import sparql

    rows = [
        (f"urn:n{i}", "urn:next", f"urn:n{i+1}", "iri", None, None, None)
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_kind string, "
        "obj_dt string, obj_lang string, graph string",
    )
    out = sparql.select(
        df,
        "SELECT (COUNT(*) AS ?n) WHERE { <urn:n0> <urn:next>+ ?x }",
    ).collect()
    assert out[0].n == 200  # n0 reaches n1..n200
