"""Sources and sinks (SURVEY.md §2.A1, A20, B1-B5).

The corpus is "an Iceberg table of source-code repositories"
(BASELINE.json input_hint). No Iceberg runtime jar exists in the
sandbox, so reads/writes go through the thin ``Catalog`` interface
(tripleforge.catalog): the Parquet-snapshot implementation is used
here; the Iceberg implementation is a config switch on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tripleforge.schema import CORPUS

N_GRAPH_BUCKETS = 64  # A20: bucket graphs to avoid 10^9 tiny partitions


def read_corpus(spark: SparkSession, uri: str) -> DataFrame:
    """A1 — read the repo-file corpus table.

    ``uri`` may be a parquet path (sandbox) or ``iceberg:<table>`` on a
    cluster with the Iceberg catalog configured.
    """
    if uri.startswith("iceberg:"):
        return spark.read.format("iceberg").load(uri[len("iceberg:") :])
    return spark.read.schema(CORPUS).parquet(uri)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """B1 — driver-provided relational fixture table (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def read_files_as_corpus(spark: SparkSession, glob: str, repo: str = "local") -> DataFrame:
    """B3 — raw RDF files on disk → corpus-shaped rows (wholetext scan).

    The reference's CLI loads files straight from the filesystem; this
    is the equivalent entry that wraps them in the corpus schema.
    """
    df = (
        spark.read.format("text")
        .option("wholetext", "true")
        .load(glob)
        .withColumn("path", F.input_file_name())
    )
    return df.select(
        F.lit(repo).alias("repo"),
        F.regexp_replace("path", r"^file:/*", "/").alias("path"),
        F.sha2(F.col("value"), 256).substr(1, 40).alias("commit"),
        F.lit(None).cast("string").alias("lang"),
        F.col("value").alias("content"),
    )


def read_aux(
    spark: SparkSession, path: str, schema: str, fmt: str = "csv", **options
) -> DataFrame:
    """B4 — auxiliary config/fixture scan (CSV/JSON) with an EXPLICIT
    schema — inference at scale is slow and nondeterministic (SURVEY
    §1.3), so none is permitted here."""
    reader = spark.read.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.format(fmt).load(path)


def with_graph_bucket(df: DataFrame, n_buckets: int = N_GRAPH_BUCKETS) -> DataFrame:
    """A20 — stable hash bucket of the graph IRI for partitioned writes.

    Partitioning the physical layout by raw ``graph`` would create one
    directory per named graph (10^9 at target scale); bucketing keeps
    partition-pruned reads for a bound graph while capping layout width.
    """
    return df.withColumn(
        "graph_bucket", F.pmod(F.xxhash64("graph"), F.lit(n_buckets)).cast("int")
    )


def write_statements_parquet(
    df: DataFrame, path: str, mode: str = "append", n_buckets: int = N_GRAPH_BUCKETS
) -> None:
    """A20 — materialize deduplicated named-graph partitions (sandbox
    Parquet path; catalog.ParquetSnapshotCatalog adds the snapshot
    commit on top — see tripleforge/catalog/parquet_snapshot.py)."""
    (
        with_graph_bucket(df, n_buckets)
        .repartition(n_buckets, F.col("graph_bucket"))
        .write.partitionBy("graph_bucket")
        .mode(mode)
        .parquet(path)
    )
