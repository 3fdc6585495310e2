"""Parse dispatcher: one ``mapInPandas`` pass over the corpus that routes
each Arrow batch's files to the right per-format kernel and emits the
unioned statement+error stream (SURVEY.md §2.A8).

The reference's Rio throws ``RDFParseException`` and the loader rolls
back the whole transaction; a 10^12-file pipeline must instead keep
going and report — so malformed input becomes rows on an error channel,
split out with two cheap filters.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from tripleforge.detect import (
    FORMAT_NQ,
    FORMAT_NT,
    FORMAT_RDFXML,
    FORMAT_SKIP,
    FORMAT_TTL,
)
from tripleforge.parse.common import empty_raw_frame
from tripleforge.parse.ntnq import parse_nq, parse_nt
from tripleforge.parse.rdfxml import parse_rdfxml
from tripleforge.parse.ttl import parse_ttl
from tripleforge.schema import PARSE_ERROR, STATEMENT_RAW

_KERNELS = {
    FORMAT_NT: parse_nt,
    FORMAT_NQ: parse_nq,
    FORMAT_TTL: parse_ttl,
    FORMAT_RDFXML: parse_rdfxml,
}


def _parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if len(pdf) == 0:
            continue
        parts = []
        for fmt, group in pdf.groupby("format", sort=False):
            if fmt == FORMAT_SKIP:
                continue
            kernel = _KERNELS.get(fmt)
            if kernel is None:
                continue
            parts.append(kernel(group))
        out = pd.concat(parts, ignore_index=True) if parts else empty_raw_frame()
        yield out


def parse_corpus(corpus_with_format: DataFrame) -> DataFrame:
    """Corpus (with ``format`` column) → raw statement/error stream.

    Column pruning matters at scale: only the five columns the kernels
    need cross the Arrow boundary — `content` never survives past this
    operator (SURVEY §4 "never drag content past stage 4").
    """
    slim = corpus_with_format.select("repo", "path", "commit", "format", "content")
    return slim.mapInPandas(_parse_batches, STATEMENT_RAW)


def split_errors(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(statements, errors) from the unioned stream — two filters."""
    stmts = raw.where(raw.error.isNull()).drop("error")
    errors = raw.where(raw.error.isNotNull()).select(
        [f.name for f in PARSE_ERROR.fields]
    )
    return stmts, errors
