"""Column-level pipeline operators: fingerprint, graph injection, dedup,
skew balancing (SURVEY.md §2.A2, A18, A19, A23).

All built-in Catalyst expressions — whole-stage-codegen-eligible, no
Python. Reference analogs noted per function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tripleforge.schema import REPO_GRAPH_PREFIX, STATEMENT_QUAD_KEY


def with_sha256(df: DataFrame, col: str = "content") -> DataFrame:
    """A2 — per-row content fingerprint, the invariant checked vs the
    reference (BASELINE.json input_hint: "per-row invariant vs the
    reference: content sha256 equality"). Built-in ``F.sha2``; no UDF."""
    return df.withColumn("content_sha256", F.sha2(F.col(col), 256))


def assign_graph(df: DataFrame, override: str | None = None) -> DataFrame:
    """A19 — named-graph/context injection.

    Quad-carried graph (N-Quads) wins; else the CLI-style ``override``
    context; else the per-repo graph ``urn:repo:<repo>``. Mirrors the
    reference's ``RepositoryConnection.add(file, ..., context)`` which
    stamps a context Resource on every loaded triple.
    """
    return df.withColumn(
        "graph",
        F.coalesce(
            F.col("graph"),
            F.lit(override) if override is not None else F.lit(None).cast("string"),
            F.concat(F.lit(REPO_GRAPH_PREFIX), F.col("src_repo")),
        ),
    )


def dedup(df: DataFrame, key: list[str] | None = None) -> DataFrame:
    """A18 — set semantics over the canonical quad key.

    RDF stores are set-semantic (re-adding a triple is a no-op in the
    reference); here it is a ``dropDuplicates`` which Catalyst executes
    as partial+final hash aggregate around one shuffle (map-side combine
    shrinks the shuffle on duplicate-heavy corpora).
    """
    return df.dropDuplicates(key or STATEMENT_QUAD_KEY)


def balance(df: DataFrame, n_partitions: int, cols: list[str] | None = None) -> DataFrame:
    """A23 — explicit salt-and-split repartition before the Python parse
    boundary so no task gets a whale repo: hash-distribute on
    (repo, path) which is ~uniform regardless of per-repo file counts.
    AQE skew handling remains the backstop (SURVEY §4)."""
    cols = cols or ["repo", "path"]
    return df.repartition(n_partitions, F.xxhash64(*[F.col(c) for c in cols]))
