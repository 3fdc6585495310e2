"""TriG parser golden tests (SURVEY.md §2.A3/A6 extension; VERDICT r1
top-next item) — W3C RDF 1.1 TriG (REC 2014) GRAPH-block grammar over
the full Turtle surface, plus error-channel and context-precedence
semantics."""

from __future__ import annotations

from tripleforge.detect import with_format
from tripleforge.ops import assign_graph
from tripleforge.parse import parse_corpus, split_errors
from tripleforge.schema import CORPUS


def _parse(spark, content, lang="TriG", path="x.trig", override=None):
    corpus = spark.createDataFrame([("r", path, "c", lang, content)], CORPUS)
    stmts, errors = split_errors(parse_corpus(with_format(corpus)))
    return assign_graph(stmts, override).collect(), errors.collect()


def test_graph_keyword_block(spark):
    content = """@prefix ex: <http://ex.org/> .
GRAPH ex:g1 {
  ex:s ex:p "a" .
  ex:s ex:q "b"
}
"""
    rows, errors = _parse(spark, content)
    assert not errors
    assert {(r.obj, r.graph) for r in rows} == {
        ("a", "http://ex.org/g1"),
        ("b", "http://ex.org/g1"),  # final '.' optional before '}'
    }


def test_label_only_and_unlabeled_blocks(spark):
    content = """@prefix ex: <http://ex.org/> .
ex:g2 { ex:s ex:p 1 . }
<http://ex.org/g3> { ex:s ex:p 2 . }
{ ex:s ex:p 3 . }
ex:s ex:p 4 .
"""
    rows, errors = _parse(spark, content)
    assert not errors
    got = {(r.obj, r.graph) for r in rows}
    assert ("1", "http://ex.org/g2") in got
    assert ("2", "http://ex.org/g3") in got
    # unlabeled block and top-level triples → default graph → injected
    assert ("3", "urn:repo:r") in got
    assert ("4", "urn:repo:r") in got


def test_bnode_graph_labels_skolemized(spark):
    content = """@prefix ex: <http://ex.org/> .
_:g { ex:s ex:p "named-bnode" . }
[] { ex:s ex:p "anon" . }
"""
    rows, errors = _parse(spark, content)
    assert not errors
    graphs = {r.obj: r.graph for r in rows}
    assert graphs["named-bnode"].startswith("urn:skolem:")
    assert graphs["anon"].startswith("urn:skolem:")
    assert graphs["named-bnode"] != graphs["anon"]


def test_quad_context_wins_over_override(spark):
    """Same precedence as N-Quads: block graph > CLI override > repo."""
    content = """@prefix ex: <http://ex.org/> .
GRAPH ex:g { ex:s ex:p "in-block" . }
ex:s ex:p "top-level" .
"""
    rows, errors = _parse(spark, content, override="urn:cli")
    assert not errors
    got = {r.obj: r.graph for r in rows}
    assert got["in-block"] == "http://ex.org/g"
    assert got["top-level"] == "urn:cli"


def test_full_turtle_surface_inside_blocks(spark):
    content = """@prefix ex: <http://ex.org/> .
GRAPH ex:g {
  ex:s a ex:T ;
       ex:list (1 2) ;
       ex:props [ ex:q "inner" ] .
}
"""
    rows, errors = _parse(spark, content)
    assert not errors
    assert all(r.graph == "http://ex.org/g" for r in rows)
    preds = {r.pred for r in rows}
    assert "http://www.w3.org/1999/02/22-rdf-syntax-ns#type" in preds
    assert "http://www.w3.org/1999/02/22-rdf-syntax-ns#first" in preds
    assert {r.obj for r in rows if r.pred == "http://ex.org/q"} == {"inner"}


def test_trig_errors_go_to_error_channel(spark):
    for bad in (
        "GRAPH <http://g> { <http://s> <http://p> <http://o> .",  # unterminated
        "GRAPH <http://g> { GRAPH <http://h> { <http://s> <http://p> <http://o> . } }",  # nested
        "GRAPH { <http://s> <http://p> <http://o> . }",  # missing label
    ):
        rows, errors = _parse(spark, bad)
        assert not rows and len(errors) == 1
        assert errors[0].parser == "trig"


def test_trig_detected_by_extension_without_lang(spark):
    content = "GRAPH <http://g> { <http://s> <http://p> <http://o> . }\n"
    rows, errors = _parse(spark, content, lang=None, path="data/f.trig")
    assert not errors
    assert rows[0].graph == "http://g"  # raw parse (canon is a later stage)


def test_turtle_files_still_reject_graph_blocks(spark):
    """A Turtle-labelled file using TriG blocks must hit the error
    channel (Turtle has no GRAPH production), not silently parse."""
    content = "GRAPH <http://g> { <http://s> <http://p> <http://o> . }\n"
    rows, errors = _parse(spark, content, lang="Turtle", path="x.ttl")
    assert not rows and len(errors) == 1
    assert errors[0].parser == "ttl"
