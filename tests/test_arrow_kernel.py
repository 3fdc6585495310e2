"""Arrow-native NT/NQ kernel parity: parse_corpus(engine="arrow") must
produce byte-identical statements AND error rows to the pandas
reference kernel on every input shape (mixed formats, escapes, bnodes,
empty literals, malformed lines, canonicalization on/off)."""

from __future__ import annotations

import pytest

from tripleforge.datagen import CorpusSpec, corpus_df
from tripleforge.detect import with_format
from tripleforge.ops import assign_graph
from tripleforge.parse import parse_corpus, split_errors
from tripleforge.schema import CORPUS


def _key(r):
    return (r.graph, r.subj, r.pred, r.obj, r.obj_kind, r.obj_dt, r.obj_lang,
            r.src_repo, r.src_path, r.src_commit, r.parser)


def _compare(spark, corpus, canonicalize):
    corpus = with_format(corpus)
    a_s, a_e = split_errors(parse_corpus(corpus, canonicalize=canonicalize, engine="arrow"))
    p_s, p_e = split_errors(parse_corpus(corpus, canonicalize=canonicalize, engine="pandas"))
    sa = sorted(map(_key, assign_graph(a_s).collect()))
    sp = sorted(map(_key, assign_graph(p_s).collect()))
    assert sa == sp
    ea = sorted((r.src_path, r.parser, r.error) for r in a_e.collect())
    ep = sorted((r.src_path, r.parser, r.error) for r in p_e.collect())
    assert ea == ep
    return len(sa), len(ea)


@pytest.mark.parametrize("canonicalize", [False, True])
def test_mixed_corpus_parity(spark, canonicalize):
    spec = CorpusSpec(
        n_repos=4, files_per_repo=4, stmts_per_file=12,
        formats=("nt", "nq", "ttl", "rdfxml"), error_rate=0.25, dup_rate=0.15,
    )
    n_stmts, n_errs = _compare(spark, corpus_df(spark, spec), canonicalize)
    assert n_stmts > 0 and n_errs > 0  # both channels exercised


def test_edge_cases_parity(spark):
    content = (
        '<http://ex/s> <http://ex/p> "a\\"b\\u00e9\\n\\t" .\n'
        "_:b0 <http://ex/p> _:b1 .\n"
        '<http://ex/s> <http://ex/p> "" .\n'
        '<http://ex/s> <http://ex/p> "x"@EN-GB .\n'
        '<http://ex/s> <http://ex/p> "007"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
        "# full line comment\n"
        "\n"
        '<http://ex/s> <http://ex/p> <http://ex/o> . # trailing comment\n'
        "<http://bad truncated\n"
        '<HTTP://EX.ORG:80/a/../b> <http://ex/p> <http://ex/o%2f> .\n'
    )
    nq_content = (
        '<http://ex/s> <http://ex/p> <http://ex/o> <http://ex/g> .\n'
        '<http://ex/s> <http://ex/p> "v" .\n'
        "_:g1 <http://ex/p> <http://ex/o> _:gb .\n"
    )
    corpus = spark.createDataFrame(
        [
            ("r1", "edge.nt", "c", "N-Triples", content),
            ("r1", "edge.nq", "c", "N-Quads", nq_content),
        ],
        CORPUS,
    )
    for canon in (False, True):
        _compare(spark, corpus, canon)


def test_arrow_is_default_engine(spark):
    corpus = with_format(
        corpus_df(spark, CorpusSpec(n_repos=1, files_per_repo=2))
    )
    plan = parse_corpus(corpus)._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan
