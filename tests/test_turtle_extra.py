"""Turtle grammar depth: long strings, SPARQL-style directives,
prefixed-name datatypes, nested blank-node property lists, escapes in
prefixed local names, numeric edge forms (SURVEY §7.4 hard-part #1)."""

from __future__ import annotations

from tripleforge.detect import with_format
from tripleforge.ops import assign_graph
from tripleforge.parse import parse_corpus, split_errors
from tripleforge.schema import CORPUS, RDF_LANGSTRING, XSD_DECIMAL, XSD_DOUBLE, XSD_INTEGER


def _parse(spark, content):
    corpus = spark.createDataFrame(
        [("r", "x.ttl", "c", "Turtle", content)], CORPUS
    )
    stmts, errors = split_errors(parse_corpus(with_format(corpus)))
    return assign_graph(stmts).collect(), errors.collect()


def test_long_strings_and_quotes(spark):
    content = '''@prefix ex: <http://ex.org/> .
ex:s ex:p """multi
line "quoted" text""" .
ex:s ex:q \'\'\'other
long\'\'\'@en-US .
ex:s ex:r 'single' .
'''
    rows, errors = _parse(spark, content)
    assert not errors
    objs = {(r.obj, r.obj_dt, r.obj_lang) for r in rows}
    assert ('multi\nline "quoted" text', "http://www.w3.org/2001/XMLSchema#string", None) in objs
    assert ("other\nlong", RDF_LANGSTRING, "en-us") in objs
    assert ("single", "http://www.w3.org/2001/XMLSchema#string", None) in objs


def test_sparql_style_directives(spark):
    content = """PREFIX ex: <http://ex.org/>
BASE <http://base.org/>
ex:s ex:p <rel> .
"""
    rows, errors = _parse(spark, content)
    assert not errors
    assert rows[0].obj == "http://base.org/rel"


def test_pname_datatype_and_escapes(spark):
    content = """@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@prefix ex: <http://ex.org/> .
ex:s ex:p "5"^^xsd:integer .
ex:with\\~tilde ex:p ex:o .
"""
    rows, errors = _parse(spark, content)
    assert not errors
    typed = [r for r in rows if r.obj == "5"][0]
    assert typed.obj_dt == XSD_INTEGER
    assert any(r.subj == "http://ex.org/with~tilde" for r in rows)


def test_nested_bnode_property_lists(spark):
    content = """@prefix ex: <http://ex.org/> .
ex:s ex:p [ ex:q [ ex:r "deep" ] ; ex:t "mid" ] .
"""
    rows, errors = _parse(spark, content)
    assert not errors
    assert len(rows) == 4
    skolems = {r.subj for r in rows if r.subj.startswith("urn:skolem:")}
    assert len(skolems) == 2  # two distinct anon nodes


def test_numeric_edge_forms(spark):
    content = """@prefix ex: <http://ex.org/> .
ex:s ex:a -42 ; ex:b +3.14 ; ex:c 1.2e-3 ; ex:d true .
"""
    rows, errors = _parse(spark, content)
    assert not errors
    dts = {r.obj: r.obj_dt for r in rows}
    assert dts["-42"] == XSD_INTEGER
    assert dts["+3.14"] == XSD_DECIMAL
    assert dts["1.2e-3"] == XSD_DOUBLE
    assert dts["true"].endswith("boolean")


def test_empty_collection_and_anon(spark):
    content = """@prefix ex: <http://ex.org/> .
ex:s ex:vals () .
ex:s ex:knows [] .
"""
    rows, errors = _parse(spark, content)
    assert not errors
    assert any(
        r.obj == "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil" for r in rows
    )
    assert any(r.obj.startswith("urn:skolem:") for r in rows)


def test_generated_bnode_labels_cannot_collide_with_explicit(spark):
    """ADVICE r1: an explicit _:genid1 label and an anonymous [] node in
    the same file must skolemize to DIFFERENT IRIs (generated labels are
    namespaced with a char no BLANK_NODE_LABEL can contain)."""
    content = """@prefix ex: <http://ex.org/> .
_:genid1 ex:p "explicit" .
[ ex:p "anon" ] .
"""
    rows, errors = _parse(spark, content)
    assert not errors
    subj_by_obj = {r.obj: r.subj for r in rows}
    assert subj_by_obj["explicit"] != subj_by_obj["anon"]
    assert all(s.startswith("urn:skolem:") for s in subj_by_obj.values())
