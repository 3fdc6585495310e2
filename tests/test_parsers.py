"""Golden-file parser tests (SURVEY.md §5.2.1) — the direct analog of
the reference's sample-file load tests (load small RDF resources into an
in-memory store, assert triple counts + membership + context)."""

from __future__ import annotations

import os

import pytest

from tests.oracle_rdf import _skolem
from tripleforge.datagen import CorpusSpec, corpus_df
from tripleforge.detect import with_format
from tripleforge.ops import assign_graph
from tripleforge.parse import parse_corpus, split_errors
from tripleforge.schema import (
    CORPUS,
    RDF_FIRST,
    RDF_LANGSTRING,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD_DECIMAL,
    XSD_INTEGER,
    XSD_STRING,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "rdf")


def _corpus_from_file(spark, fname, lang, repo="org/r1"):
    with open(os.path.join(FIX, fname)) as fh:
        content = fh.read()
    return spark.createDataFrame(
        [(repo, f"data/{fname}", "c0", lang, content)], CORPUS
    )


def _parse(spark, fname, lang):
    corpus = with_format(_corpus_from_file(spark, fname, lang))
    stmts, errors = split_errors(parse_corpus(corpus))
    return assign_graph(stmts), errors


def _tuples(stmts):
    return {
        (r.graph, r.subj, r.pred, r.obj, r.obj_kind, r.obj_dt, r.obj_lang)
        for r in stmts.collect()
    }


def test_ntriples_golden(spark):
    stmts, errors = _parse(spark, "basic.nt", "N-Triples")
    got = _tuples(stmts)
    assert errors.count() == 0
    g = "urn:repo:org/r1"
    b0 = _skolem("org/r1", "data/basic.nt", "b0")
    b1 = _skolem("org/r1", "data/basic.nt", "b1")
    expected = {
        (g, "http://ex.org/s1", "http://ex.org/p", "http://ex.org/o1", "iri", None, None),
        (g, "http://ex.org/s1", "http://ex.org/p", "plain", "literal", XSD_STRING, None),
        (g, "http://ex.org/s2", "http://ex.org/p", "42", "literal", XSD_INTEGER, None),
        (g, "http://ex.org/s2", "http://ex.org/p", "hej", "literal", RDF_LANGSTRING, "sv"),
        (g, b0, "http://ex.org/p", b1, "iri", None, None),
    }
    assert got == expected


def test_nquads_context_wins(spark):
    stmts, errors = _parse(spark, "basic.nq", "N-Quads")
    assert errors.count() == 0
    graphs = {r.graph for r in stmts.collect()}
    # quad-carried graph wins over per-repo injection; default-graph lines
    # fall back to urn:repo:<repo> (A19)
    assert graphs == {"http://ex.org/g1", "urn:repo:org/r1"}
    by_graph = {
        g: sum(1 for r in stmts.collect() if r.graph == g) for g in graphs
    }
    assert by_graph["http://ex.org/g1"] == 2
    assert by_graph["urn:repo:org/r1"] == 2


def test_turtle_golden(spark):
    stmts, errors = _parse(spark, "basic.ttl", "Turtle")
    assert errors.count() == 0
    got = _tuples(stmts)
    # prefixed names, 'a' → rdf:type, ';'/',' lists
    assert ("urn:repo:org/r1", "http://ex.org/s1", RDF_TYPE, "http://ex.org/T", "iri", None, None) in got
    assert ("urn:repo:org/r1", "http://ex.org/s1", "http://ex.org/p", "http://ex.org/o1", "iri", None, None) in got
    assert ("urn:repo:org/r1", "http://ex.org/s1", "http://ex.org/p", "x", "literal", XSD_STRING, None) in got
    # relative IRI resolved against @base; anon bnode object w/ decimal
    rel_rows = [r for r in stmts.collect() if r.subj == "http://ex.org/base/rel"]
    assert len(rel_rows) == 1
    bnode = rel_rows[0].obj
    assert bnode.startswith("urn:skolem:")
    dec = [r for r in stmts.collect() if r.subj == bnode]
    assert len(dec) == 1 and dec[0].obj == "2.50" and dec[0].obj_dt == XSD_DECIMAL
    # collection expansion: 4 triples (2× first, 2× rest) ending in rdf:nil
    firsts = [r for r in stmts.collect() if r.pred == RDF_FIRST]
    rests = [r for r in stmts.collect() if r.pred == RDF_REST]
    assert len(firsts) == 2 and len(rests) == 2
    assert {r.obj for r in firsts} == {"1", "2"}
    assert RDF_NIL in {r.obj for r in rests}
    # 3 (s1) + 2 (rel + bnode) + 1 (ex:vals) + 4 (collection) = 10
    assert stmts.count() == 10


def test_rdfxml_golden(spark):
    stmts, errors = _parse(spark, "basic.rdf", "RDF/XML")
    assert errors.count() == 0
    got = _tuples(stmts)
    g = "urn:repo:org/r1"
    n1 = _skolem("org/r1", "data/basic.rdf", "n1")
    assert (g, "http://ex.org/s1", "http://ex.org/p", "http://ex.org/o1", "iri", None, None) in got
    assert (g, "http://ex.org/s1", "http://ex.org/name", "Alice", "literal", RDF_LANGSTRING, "en") in got
    # raw lexical preserved at parse; canonicalization is stage A11
    assert (g, "http://ex.org/s1", "http://ex.org/age", "007", "literal", XSD_INTEGER, None) in got
    assert (g, "http://ex.org/s1", "http://ex.org/knows", n1, "iri", None, None) in got
    assert stmts.count() == 4


def test_malformed_error_channel(spark):
    stmts, errors = _parse(spark, "malformed.nt", "N-Triples")
    assert stmts.count() == 2  # the two good lines survive
    errs = errors.collect()
    assert len(errs) == 2  # truncated line + bad term line
    assert all(e.parser == "nt" for e in errs)
    assert {e.src_path for e in errs} == {"data/malformed.nt"}


def test_skip_unknown_format(spark):
    corpus = with_format(
        spark.createDataFrame(
            [("r", "src/main.py", "c0", "Python", "print('hi')")], CORPUS
        )
    )
    stmts, errors = split_errors(parse_corpus(corpus))
    assert stmts.count() == 0 and errors.count() == 0


def test_multiformat_generated_corpus(spark):
    spec = CorpusSpec(
        n_repos=3, files_per_repo=4, stmts_per_file=10,
        formats=("nt", "nq", "ttl", "rdfxml"),
    )
    corpus = with_format(corpus_df(spark, spec))
    stmts, errors = split_errors(parse_corpus(corpus))
    assert errors.count() == 0
    assert {r.parser for r in stmts.select("parser").distinct().collect()} == {
        "nt", "nq", "ttl", "rdfxml",
    }
    # every good file yields exactly stmts_per_file statements
    per_file = stmts.groupBy("src_path", "src_repo").count().collect()
    assert all(r["count"] == 10 for r in per_file)


def test_jsonld_golden(spark):
    """JSON-LD golden file (A-family r4): contexts (array merge, terms,
    @vocab, @base-less compact IRIs, default @language), typed/lang
    value objects, @type coercion to @id, @container @list, native
    numbers/booleans (canonical lexical forms), blank nodes, and a
    named @graph node."""
    stmts, errors = _parse(spark, "basic.jsonld", "JSON-LD")
    assert errors.count() == 0
    got = _tuples(stmts)
    g = "urn:repo:org/r1"
    b1 = _skolem("org/r1", "data/basic.jsonld", "b1")
    XSD = "http://www.w3.org/2001/XMLSchema#"
    assert (g, "http://ex.org/s1", RDF_TYPE, "http://ex.org/Person", "iri", None, None) in got
    assert (g, "http://ex.org/s1", "http://ex.org/name", "Alice", "literal", RDF_LANGSTRING, "en") in got
    # raw lexical preserved at parse (canonicalization is stage A11)
    assert (g, "http://ex.org/s1", "http://ex.org/age", "007", "literal", XSD_INTEGER, None) in got
    assert (g, "http://ex.org/s1", "http://ex.org/knows", "http://ex.org/s2", "iri", None, None) in got
    assert (g, "http://ex.org/s1", "http://ex.org/knows", b1, "iri", None, None) in got
    # explicit value object ignores the default language; lang lowercased
    assert (g, "http://ex.org/s1", "http://vocab.org/note", "bonjour", "literal", RDF_LANGSTRING, "fr") in got
    # canonical xsd:double / xsd:integer / xsd:boolean forms
    assert (g, "http://ex.org/s1", "http://vocab.org/score", "4.25E0", "literal", XSD + "double", None) in got
    assert (g, "http://ex.org/s1", "http://vocab.org/rank", "3", "literal", XSD_INTEGER, None) in got
    assert (g, "http://ex.org/s1", "http://vocab.org/active", "true", "literal", XSD + "boolean", None) in got
    # @vocab + default language on a plain string
    assert (g, "http://ex.org/s1", "http://vocab.org/vocabProp", "plain", "literal", RDF_LANGSTRING, "en") in got
    assert (g, b1, "http://ex.org/name", "Bob", "literal", RDF_LANGSTRING, "en") in got
    # @list -> rdf:first/rest/nil chain of two integers
    firsts = [t for t in got if t[2] == RDF_FIRST]
    rests = [t for t in got if t[2] == RDF_REST]
    assert {t[3] for t in firsts} == {"1", "2"}
    assert len(rests) == 2 and RDF_NIL in {t[3] for t in rests}
    # named graph from a node with @id + @graph
    assert (
        "http://ex.org/g1", "http://ex.org/s3", "http://ex.org/p",
        "in-graph", "literal", XSD_STRING, None,
    ) in got
    assert stmts.count() == 17


def test_jsonld_error_channel(spark):
    """Invalid JSON and unsupported keywords land on the error channel
    with the whole-document granularity JSON implies."""
    from tripleforge.schema import CORPUS as _CORPUS

    rows = [
        ("r", "a.jsonld", "c0", "JSON-LD", '{"@id": "ex:s", broken'),
        ("r", "b.jsonld", "c0", "JSON-LD",
         '{"@context": "https://schema.org", "@id": "http://x/s"}'),
        ("r", "c.jsonld", "c0", "JSON-LD",
         '{"@id": "http://x/s", "@nest": {"http://x/p": {"@id": "http://x/o"}}}'),
        ("r", "d.jsonld", "c0", "JSON-LD",
         '{"@id": "http://x/s", "http://x/p": "ok"}'),
    ]
    corpus = with_format(spark.createDataFrame(rows, CORPUS))
    stmts, errors = split_errors(parse_corpus(corpus))
    assert stmts.count() == 1  # only d.jsonld parses
    errs = {e.src_path: e.error for e in errors.collect()}
    assert set(errs) == {"a.jsonld", "b.jsonld", "c.jsonld"}
    assert "remote @context" in errs["b.jsonld"]
    assert "@nest" in errs["c.jsonld"]


def test_multiformat_with_jsonld(spark):
    spec = CorpusSpec(
        n_repos=3, files_per_repo=5, stmts_per_file=10,
        formats=("nt", "nq", "ttl", "rdfxml", "jsonld"),
    )
    corpus = with_format(corpus_df(spark, spec))
    stmts, errors = split_errors(parse_corpus(corpus))
    assert errors.count() == 0
    assert {r.parser for r in stmts.select("parser").distinct().collect()} == {
        "nt", "nq", "ttl", "rdfxml", "jsonld",
    }
    per_file = stmts.groupBy("src_path", "src_repo").count().collect()
    assert all(r["count"] == 10 for r in per_file)


def test_jsonld_adversarial_inputs(spark):
    """Hostile/odd JSON-LD shapes: loud error channel or correct
    triples, never a crash or silent wrong output."""
    from tripleforge.parse.jsonld import JsonLdError, parse_one
    import pytest as _pytest

    # cyclic @context term definitions -> loud error
    with _pytest.raises(JsonLdError, match="cyclic"):
        parse_one("r", "p",
                  '{"@context": {"a": "b:x", "b": "a:y"}, "@id": "http://x/s", "a:k": "v"}')
    # non-string @id -> loud error
    with _pytest.raises(JsonLdError, match="@id must be a string"):
        parse_one("r", "p", '{"@id": 42, "http://x/p": "v"}')
    # JSON Infinity / NaN literals -> canonical xsd:double specials
    t = parse_one("r", "p", '{"@id": "http://x/s", "http://x/p": [Infinity, NaN]}')
    assert {(x[2], x[4]) for x in t} == {
        ("INF", "http://www.w3.org/2001/XMLSchema#double"),
        ("NaN", "http://www.w3.org/2001/XMLSchema#double"),
    }
    # big integer beyond int64 keeps its exact decimal lexical
    t = parse_one("r", "p", '{"@id": "http://x/s", "http://x/p": 123456789012345678901234567890}')
    assert t[0][2] == "123456789012345678901234567890"
    # deep nesting parses without recursion blowup at sane depths
    doc = '{"@id": "http://x/s0", "http://x/p": ' * 60 + '"leaf"' + "}" * 60
    t = parse_one("r", "p", doc)
    assert len(t) == 60
    # @type+@language together in a value object -> loud error
    with _pytest.raises(JsonLdError, match="mutually exclusive"):
        parse_one("r", "p",
                  '{"@id": "http://x/s", "http://x/p": {"@value": "v", "@type": "http://x/t", "@language": "en"}}')


def test_jsonld_vocab_term_definition_without_id():
    """ADVICE r4 #1: a term definition that omits @id and relies on
    @vocab (schema.org-style {"knows": {"@type": "@id"}}) must expand
    via @vocab, not KeyError onto the error channel."""
    from tripleforge.parse.jsonld import JsonLdError, parse_one
    import pytest as _pytest

    t = parse_one("r", "p", """
    {"@context": {"@vocab": "http://schema.org/",
                  "knows": {"@type": "@id"}},
     "@id": "http://x/alice", "knows": "http://x/bob"}""")
    assert t == [("http://x/alice", "http://schema.org/knows",
                  "http://x/bob", "iri", None, None, None)]
    # compact-IRI-shaped @id-less term expands as a compact IRI
    t = parse_one("r", "p", """
    {"@context": {"ex": "http://x/v#", "ex:p": {"@type": "@id"}},
     "@id": "http://x/s", "ex:p": "http://x/o"}""")
    assert t[0][1] == "http://x/v#p"
    # no @vocab and no colon -> loud error, not KeyError('@id')
    with _pytest.raises(JsonLdError, match="no @vocab"):
        parse_one("r", "p", """
        {"@context": {"knows": {"@type": "@id"}},
         "@id": "http://x/s", "knows": "http://x/o"}""")


def test_jsonld_reverse():
    """r5: @reverse as node-object keyword and in term definitions."""
    from tripleforge.parse.jsonld import JsonLdError, parse_one
    import pytest as _pytest

    # keyword form: (o, p, s)
    t = parse_one("r", "p", """
    {"@id": "http://x/s",
     "@reverse": {"http://x/parentOf": [{"@id": "http://x/c1"},
                                        {"@id": "http://x/c2"}]}}""")
    assert set(t) == {
        ("http://x/c1", "http://x/parentOf", "http://x/s", "iri", None, None, None),
        ("http://x/c2", "http://x/parentOf", "http://x/s", "iri", None, None, None),
    }
    # reverse term definition with @type:@id string coercion
    t = parse_one("r", "p", """
    {"@context": {"children": {"@reverse": "http://x/parentOf",
                               "@type": "@id"}},
     "@id": "http://x/s", "children": ["http://x/c1", "http://x/c2"]}""")
    assert set(x[:3] for x in t) == {
        ("http://x/c1", "http://x/parentOf", "http://x/s"),
        ("http://x/c2", "http://x/parentOf", "http://x/s"),
    }
    # nested node objects under a reverse property emit their own triples
    t = parse_one("r", "p", """
    {"@context": {"children": {"@reverse": "http://x/parentOf"}},
     "@id": "http://x/s",
     "children": {"@id": "http://x/c", "http://x/name": "kid"}}""")
    assert ("http://x/c", "http://x/parentOf", "http://x/s", "iri", None,
            None, None) in t
    assert any(x[0] == "http://x/c" and x[1] == "http://x/name" and
               x[2] == "kid" for x in t)
    # a reverse term used inside @reverse double-flips to forward
    t = parse_one("r", "p", """
    {"@context": {"children": {"@reverse": "http://x/parentOf"}},
     "@id": "http://x/s",
     "@reverse": {"children": {"@id": "http://x/q"}}}""")
    assert t == [("http://x/s", "http://x/parentOf", "http://x/q",
                  "iri", None, None, None)]
    # literals under a reverse property are invalid
    with _pytest.raises(JsonLdError, match="reverse property"):
        parse_one("r", "p", """
        {"@id": "http://x/s", "@reverse": {"http://x/p": "literal"}}""")


def test_jsonld_container_maps():
    """r5: @container @language and @index maps."""
    from tripleforge.parse.jsonld import parse_one
    from tripleforge.schema import RDF_LANGSTRING, XSD_STRING

    t = parse_one("r", "p", """
    {"@context": {"label": {"@id": "http://x/label",
                            "@container": "@language"}},
     "@id": "http://x/s",
     "label": {"en": "cat", "de": ["Katze", "Mieze"], "@none": "plain"}}""")
    got = {(x[2], x[4], x[5]) for x in t}
    assert got == {
        ("cat", RDF_LANGSTRING, "en"),
        ("Katze", RDF_LANGSTRING, "de"),
        ("Mieze", RDF_LANGSTRING, "de"),
        ("plain", XSD_STRING, None),
    }
    # index map: keys dropped, values emitted with term coercion intact
    t = parse_one("r", "p", """
    {"@context": {"post": {"@id": "http://x/post", "@type": "@id",
                           "@container": "@index"}},
     "@id": "http://x/s",
     "post": {"2024": "http://x/p1", "2025": ["http://x/p2"]}}""")
    assert {(x[2], x[3]) for x in t} == {
        ("http://x/p1", "iri"), ("http://x/p2", "iri"),
    }


def test_jsonld_implementation_bugs_propagate(spark):
    """ADVICE r4 #3: parse_jsonld only converts JSONDecodeError/
    JsonLdError into error-channel rows; anything else is a parser bug
    and must raise."""
    import pandas as pd
    from unittest import mock

    from tripleforge.parse import jsonld as mod

    pdf = pd.DataFrame(
        {"repo": ["r"], "path": ["p"], "commit": ["c"],
         "content": ['{"@id": "http://x/s", "http://x/p": "v"}']}
    )
    with mock.patch.object(mod, "parse_one", side_effect=KeyError("@id")):
        try:
            mod.parse_jsonld(pdf)
            raised = False
        except KeyError:
            raised = True
    assert raised


def test_trix_golden(spark):
    """TriX golden file (r5): named + anonymous graphs, uri/id terms,
    plain (lang-tagged, lowercased) and typed literals; the anonymous
    graph falls back to the injected urn:repo: context (A19)."""
    stmts, errors = _parse(spark, "basic.trix", "TriX")
    assert errors.count() == 0
    got = _tuples(stmts)
    b1 = _skolem("org/r1", "data/basic.trix", "b1")
    g1 = "http://ex.org/g1"
    g_repo = "urn:repo:org/r1"
    expected = {
        (g1, "http://ex.org/s1", "http://ex.org/p", "http://ex.org/o1", "iri", None, None),
        (g1, "http://ex.org/s1", "http://ex.org/name", "Alice", "literal", RDF_LANGSTRING, "en"),
        # raw lexical preserved at parse; canonicalization is stage A11
        (g1, "http://ex.org/s2", "http://ex.org/age", "007", "literal", XSD_INTEGER, None),
        (g_repo, b1, "http://ex.org/p", "plain", "literal", XSD_STRING, None),
        (g_repo, "http://ex.org/s3", "http://ex.org/knows", b1, "iri", None, None),
    }
    assert got == expected


def test_trix_error_channel(spark):
    """Invalid XML / invalid RDF shapes land on the error channel with
    document granularity; good files in the same batch survive."""
    from tripleforge.schema import CORPUS as _CORPUS

    ok = ('<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/"><graph>'
          "<triple><uri>http://x/s</uri><uri>http://x/p</uri>"
          "<plainLiteral>v</plainLiteral></triple></graph></TriX>")
    rows = [
        ("r", "a.trix", "c0", "TriX", "<TriX><graph><broken"),
        ("r", "b.trix", "c0", "TriX",
         '<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/"><graph>'
         "<triple><plainLiteral>lit-subject</plainLiteral>"
         "<uri>http://x/p</uri><uri>http://x/o</uri></triple></graph></TriX>"),
        ("r", "c.trix", "c0", "TriX",
         '<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/"><graph>'
         "<triple><uri>http://x/s</uri><uri>http://x/p</uri></triple>"
         "</graph></TriX>"),
        ("r", "d.trix", "c0", "TriX", ok),
    ]
    corpus = with_format(spark.createDataFrame(rows, CORPUS))
    stmts, errors = split_errors(parse_corpus(corpus))
    assert stmts.count() == 1
    errs = {e.src_path: e.error for e in errors.collect()}
    assert set(errs) == {"a.trix", "b.trix", "c.trix"}
    assert "literal subjects" in errs["b.trix"]
    assert "expected 3" in errs["c.trix"]


def test_multiformat_with_trix(spark):
    spec = CorpusSpec(
        n_repos=3, files_per_repo=6, stmts_per_file=10,
        formats=("nt", "nq", "ttl", "rdfxml", "jsonld", "trix"),
    )
    corpus = with_format(corpus_df(spark, spec))
    stmts, errors = split_errors(parse_corpus(corpus))
    assert errors.count() == 0
    assert {r.parser for r in stmts.select("parser").distinct().collect()} == {
        "nt", "nq", "ttl", "rdfxml", "jsonld", "trix",
    }
    per_file = stmts.groupBy("src_path", "src_repo").count().collect()
    assert all(r["count"] == 10 for r in per_file)
