"""Format detection (SURVEY.md §2.A3).

Classify each corpus file into {nt, nq, ttl, trig, rdfxml, jsonld, skip} from the
``lang`` column first, then the path extension — the columnar analog of
RDF4J ``Rio.getParserFormatForFileName`` (reference behavior: "RDF
serialization detected from the file name/extension"). Pure built-in
Catalyst expressions; no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FORMAT_NT = "nt"
FORMAT_NQ = "nq"
FORMAT_TTL = "ttl"
FORMAT_TRIG = "trig"
FORMAT_RDFXML = "rdfxml"
FORMAT_JSONLD = "jsonld"
FORMAT_TRIX = "trix"
FORMAT_SKIP = "skip"

_LANG_MAP = {
    "n-triples": FORMAT_NT,
    "ntriples": FORMAT_NT,
    "n-quads": FORMAT_NQ,
    "nquads": FORMAT_NQ,
    "turtle": FORMAT_TTL,
    "ttl": FORMAT_TTL,
    "trig": FORMAT_TRIG,
    "rdf/xml": FORMAT_RDFXML,
    "rdfxml": FORMAT_RDFXML,
    "rdf-xml": FORMAT_RDFXML,
    "xml": FORMAT_RDFXML,
    "json-ld": FORMAT_JSONLD,
    "jsonld": FORMAT_JSONLD,
    "application/ld+json": FORMAT_JSONLD,
    "trix": FORMAT_TRIX,
    "application/trix": FORMAT_TRIX,
}

_EXT_MAP = {
    "nt": FORMAT_NT,
    "nq": FORMAT_NQ,
    "nquads": FORMAT_NQ,
    "ttl": FORMAT_TTL,
    "turtle": FORMAT_TTL,
    "trig": FORMAT_TRIG,
    "rdf": FORMAT_RDFXML,
    "rdfs": FORMAT_RDFXML,
    "owl": FORMAT_RDFXML,
    "xml": FORMAT_RDFXML,
    "jsonld": FORMAT_JSONLD,
    "trix": FORMAT_TRIX,
}


def format_col(lang: Column, path: Column) -> Column:
    """`F.when` chain: lang (case-insensitive) wins, else extension."""
    lo = F.lower(F.coalesce(lang, F.lit("")))
    ext = F.lower(F.regexp_extract(path, r"\.([A-Za-z0-9]+)$", 1))
    expr: Column | None = None
    for k, v in _LANG_MAP.items():
        cond = lo == F.lit(k)
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    for k, v in _EXT_MAP.items():
        expr = expr.when(ext == F.lit(k), F.lit(v))
    return expr.otherwise(F.lit(FORMAT_SKIP))


def with_format(df: DataFrame) -> DataFrame:
    """Add a ``format`` column classifying each file (A3)."""
    return df.withColumn("format", format_col(F.col("lang"), F.col("path")))
