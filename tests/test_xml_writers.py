"""TriX + RDF/XML serializers (r5): round-trip verified against the
engine's own TriX (A31) and RDF/XML (A7) parsers — same contract as
the Turtle/TriG/JSON-LD writer round-trips. Reference analog: RDF4J
Rio TriXWriter / RDFXMLWriter (public behavior); /root/reference is
empty."""

from __future__ import annotations

import glob

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tripleforge.parse.rdfxml import parse_rdfxml
from tripleforge.parse.trix import parse_trix
from tripleforge.rdfxml_out import rdfxml_blocks, write_rdfxml
from tripleforge.trix_out import trix_blocks, write_trix

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"
SCHEMA = (
    "subj string, pred string, obj string, obj_kind string, "
    "obj_dt string, obj_lang string, graph string"
)

ROWS = [
    ("urn:doc:1", RDF + "type", "http://ex.org/v/Doc", "iri", None, None,
     "urn:g1"),
    # literal that exercises every XML escape + newline
    ("urn:doc:1", "http://ex.org/v/name", 'a <b> & "c"\nd', "literal",
     XSD + "string", None, "urn:g1"),
    ("urn:doc:1", "http://ex.org/v/n", "42", "literal", XSD + "integer",
     None, "urn:g1"),
    ("urn:doc:2", "http://ex.org/v/label", "chat", "literal",
     RDF + "langString", "fr", "urn:g2"),
    # default-graph statement (null graph)
    ("urn:doc:3", "http://ex.org/v/tag", "plain", "literal",
     XSD + "string", None, None),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def _pdf(path_name: str, text: str) -> pd.DataFrame:
    return pd.DataFrame(
        {"repo": ["r"], "path": [path_name], "commit": ["c"],
         "content": [text]}
    )


def _norm(frame: pd.DataFrame, with_graph: bool) -> set:
    cols = ["subj", "pred", "obj", "obj_kind", "obj_dt", "obj_lang"]
    if with_graph:
        cols.append("graph")
    return {
        tuple(r)
        for r in frame[cols].where(pd.notnull(frame), None)
        .itertuples(index=False)
    }


def _expected(with_graph: bool) -> set:
    return {
        (s, p, o, k, dt, lg) + ((g,) if with_graph else ())
        for (s, p, o, k, dt, lg, g) in ROWS
    }


# ---------------------------------------------------------------------------
# TriX
# ---------------------------------------------------------------------------
def test_trix_roundtrip_single_file(df, tmp_path):
    path = str(tmp_path / "out.trix")
    write_trix(df, path)
    text = open(path).read()
    assert text.startswith('<?xml version="1.0"')
    assert "<TriX xmlns=" in text and text.rstrip().endswith("</TriX>")
    assert "&lt;b&gt; &amp;" in text  # escapes applied
    out = parse_trix(_pdf("f.trix", text))
    assert list(out["error"].dropna()) == []
    assert _norm(out, with_graph=True) == _expected(with_graph=True)


def test_trix_distributed_rows_are_standalone_docs(df, tmp_path):
    path = str(tmp_path / "dist")
    write_trix(df, path, single_file=False)
    rows, errors = [], []
    for part in sorted(glob.glob(path + "/part-*")):
        content = open(part).read()
        # each row is one document; rows are separated by the
        # text-writer newline AFTER the closing </TriX>
        for doc in content.split("</TriX>\n"):
            if not doc.strip():
                continue
            out = parse_trix(_pdf("f.trix", doc + "</TriX>\n"))
            errors += list(out["error"].dropna())
            rows.append(out)
    assert errors == []
    merged = pd.concat(rows, ignore_index=True)
    assert _norm(merged, with_graph=True) == _expected(with_graph=True)


def test_trix_blocks_deterministic(df):
    a = sorted(r["block"] for r in trix_blocks(df).collect())
    b = sorted(r["block"] for r in trix_blocks(df.orderBy("obj")).collect())
    assert a == b


def test_trix_no_python_in_plan(df):
    plan = trix_blocks(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


# ---------------------------------------------------------------------------
# RDF/XML
# ---------------------------------------------------------------------------
def test_rdfxml_roundtrip_single_file(df, tmp_path):
    path = str(tmp_path / "out.rdf")
    write_rdfxml(df, path)
    text = open(path).read()
    assert "<rdf:RDF" in text and text.rstrip().endswith("</rdf:RDF>")
    out = parse_rdfxml(_pdf("f.rdf", text))
    assert list(out["error"].dropna()) == []
    # RDF/XML has no named graphs: triples round-trip, context dropped
    assert _norm(out, with_graph=False) == _expected(with_graph=False)


def test_rdfxml_distributed_rows_are_standalone_docs(df, tmp_path):
    path = str(tmp_path / "dist")
    write_rdfxml(df, path, single_file=False)
    rows, errors = [], []
    for part in sorted(glob.glob(path + "/part-*")):
        for doc in open(part).read().split("</rdf:RDF>\n"):
            if not doc.strip():
                continue
            out = parse_rdfxml(_pdf("f.rdf", doc + "</rdf:RDF>\n"))
            errors += list(out["error"].dropna())
            rows.append(out)
    assert errors == []
    merged = pd.concat(rows, ignore_index=True)
    assert _norm(merged, with_graph=False) == _expected(with_graph=False)


def test_rdfxml_unserializable_predicate_raises(spark, tmp_path):
    """A predicate with no NCName-shaped suffix (trailing '/') cannot
    be a QName — loud rejection like Rio's RDFXMLWriter."""
    df = spark.createDataFrame(
        [("urn:s", "http://ex.org/bad/", "o", "literal", XSD + "string",
          None, None)],
        SCHEMA,
    )
    with pytest.raises(ValueError, match="QName"):
        write_rdfxml(df, str(tmp_path / "x.rdf"))


def test_rdfxml_numeric_boundary_split(spark, tmp_path):
    """Local part may not start with a digit: <urn:x:9abc> splits as
    ns='urn:x:9' local='abc' and still round-trips."""
    df = spark.createDataFrame(
        [("urn:s", "urn:x:9abc", "v", "literal", XSD + "string", None,
          None)],
        SCHEMA,
    )
    path = str(tmp_path / "n.rdf")
    write_rdfxml(df, path)
    text = open(path).read()
    assert 'xmlns:n="urn:x:9"' in text and "<n:abc" in text
    out = parse_rdfxml(_pdf("f.rdf", text))
    assert list(out["error"].dropna()) == []
    assert set(out["pred"]) == {"urn:x:9abc"}


def test_rdfxml_no_python_in_plan(df):
    plan = rdfxml_blocks(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


# ---------------------------------------------------------------------------
# seeded property round-trips (same contract as the NT/JSON-LD ones);
# generator avoids XML-1.0-illegal control characters and \r (parsers
# normalize CRLF), both of which no RDF literal needs to round-trip
# through an XML serialization
# ---------------------------------------------------------------------------
def _random_rows(seed: int, n: int):
    import random

    rng = random.Random(seed)
    LANGSTR = RDF + "langString"
    rows = []
    for _ in range(n):
        s = f"http://ex.org/s{rng.randrange(20)}"
        p = f"http://ex.org/ns#p{rng.randrange(8)}"
        g = rng.choice([None, "http://ex.org/g1", "http://ex.org/g2"])
        kind = rng.randrange(4)
        if kind == 0:
            rows.append((s, p, f"http://ex.org/o{rng.randrange(30)}",
                         "iri", None, None, g))
        elif kind == 1:
            lex = "".join(
                rng.choice('ab<>&"\'\n\téü✓ ')
                for _ in range(rng.randrange(1, 10))
            )
            rows.append((s, p, lex, "literal", XSD + "string", None, g))
        elif kind == 2:
            rows.append((s, p, str(rng.randrange(10**6)), "literal",
                         XSD + "integer", None, g))
        else:
            rows.append((s, p, "tag", "literal", LANGSTR,
                         rng.choice(["en", "fr"]), g))
    return rows


def test_trix_roundtrip_property(spark, tmp_path):
    df = spark.createDataFrame(_random_rows(31, 150), SCHEMA).dropDuplicates()
    want = {tuple(r) for r in df.collect()}
    path = str(tmp_path / "prop.trix")
    write_trix(df, path)
    out = parse_trix(_pdf("f.trix", open(path).read()))
    assert list(out["error"].dropna()) == []
    assert _norm(out, with_graph=True) == want


def test_rdfxml_roundtrip_property(spark, tmp_path):
    df = (
        spark.createDataFrame(_random_rows(32, 150), SCHEMA)
        .drop("graph")  # RDF/XML has no named graphs
        .dropDuplicates()
    )
    want = {tuple(r) for r in df.collect()}
    path = str(tmp_path / "prop.rdf")
    write_rdfxml(df.withColumn("graph", F.lit(None).cast("string")), path)
    out = parse_rdfxml(_pdf("f.rdf", open(path).read()))
    assert list(out["error"].dropna()) == []
    assert _norm(out, with_graph=False) == want
