"""Specialized joins (B12/B13 both variants), aux IO (B3/B4), graph
override (A19), and the D7 stateful streaming counter."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tripleforge.joins import asof_join_grouped, asof_join_window, range_join_binned


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="tfjio_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _events(spark):
    return spark.createDataFrame(
        [(1, 100, 10.0), (1, 200, 20.0), (1, 300, 30.0), (2, 150, 99.0)],
        "k long, ts long, v double",
    )


def _probes(spark):
    return spark.createDataFrame(
        [(1, 50, "a"), (1, 200, "b"), (1, 250, "c"), (2, 500, "d"), (3, 10, "e")],
        "k long, ts long, tag string",
    )


EXPECTED = {"a": None, "b": 20.0, "c": 20.0, "d": 99.0, "e": None}


def test_asof_window(spark):
    out = asof_join_window(_events(spark), _probes(spark), "k", "ts", "v")
    got = {r.tag: r.asof_value for r in out.collect()}
    assert got == EXPECTED


def test_asof_grouped_matches_window(spark):
    out = asof_join_grouped(_events(spark), _probes(spark), "k", "ts", "v")
    got = {r.tag: r.asof_value for r in out.collect()}
    assert got == EXPECTED


def test_range_join_binned_equals_theta(spark):
    import random

    rng = random.Random(11)
    rows = [(rng.randrange(3), rng.randrange(10_000), i) for i in range(300)]
    df = spark.createDataFrame(rows, "k long, ts long, id long")
    a = df.select("k", F.col("ts").alias("ts_a"), F.col("id").alias("id_a"))
    b = df.select("k", F.col("ts").alias("ts_b"), F.col("id").alias("id_b"))
    binned = range_join_binned(a, b, "k", "ts_a", "ts_b", 500)
    theta = a.join(b, "k").where(F.abs(F.col("ts_a") - F.col("ts_b")) <= 500)
    key = lambda r: (r.k, r.id_a, r.id_b)  # noqa: E731
    assert sorted(map(key, binned.collect())) == sorted(map(key, theta.collect()))


def test_read_files_as_corpus(spark, tmpdir):
    from tripleforge.detect import with_format
    from tripleforge.io import read_files_as_corpus
    from tripleforge.parse import parse_corpus, split_errors

    with open(os.path.join(tmpdir, "a.nt"), "w") as fh:
        fh.write("<http://ex/s> <http://ex/p> <http://ex/o> .\n")
    with open(os.path.join(tmpdir, "b.nt"), "w") as fh:
        fh.write('<http://ex/s2> <http://ex/p> "v" .\n')
    corpus = read_files_as_corpus(spark, tmpdir + "/*.nt", repo="disk")
    assert corpus.count() == 2
    stmts, errs = split_errors(parse_corpus(with_format(corpus)))
    assert stmts.count() == 2 and errs.count() == 0


def test_read_aux_csv(spark, tmpdir):
    from tripleforge.io import read_aux

    p = os.path.join(tmpdir, "keys.csv")
    with open(p, "w") as fh:
        fh.write("pred,weight\nhttp://ex/isbn,1.0\nhttp://ex/doi,0.9\n")
    df = read_aux(spark, p, "pred string, weight double", fmt="csv")
    assert df.count() == 2
    assert df.schema["weight"].dataType.simpleString() == "double"


def test_graph_override(spark):
    """A19 CLI-style context override beats per-repo injection but not
    quad-carried context (reference: RepositoryConnection.add context)."""
    from tripleforge.ops import assign_graph

    df = spark.createDataFrame(
        [("http://s", "http://p", "o", "iri", None, None, None, "r1"),
         ("http://s", "http://p", "o", "iri", None, None, "http://quad-g", "r1")],
        "subj string, pred string, obj string, obj_kind string, "
        "obj_dt string, obj_lang string, graph string, src_repo string",
    )
    out = {r.graph for r in assign_graph(df, override="urn:ctx:cli").collect()}
    assert out == {"urn:ctx:cli", "http://quad-g"}


def test_stateful_repo_counters(spark, tmpdir):
    from tripleforge.datagen import CorpusSpec, corpus_df
    from tripleforge.streaming.ingest import stateful_repo_counters, stream_corpus

    src = os.path.join(tmpdir, "src")
    chk = os.path.join(tmpdir, "chk")
    df = corpus_df(spark, CorpusSpec(n_repos=2, files_per_repo=3)).withColumn(
        "ingest_ts", F.lit("2024-01-01 00:00:00").cast("timestamp")
    )
    df.write.mode("append").parquet(src)
    seen: dict[str, int] = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            seen[r.repo] = r.total_files

    def run_wave():
        q = (
            stateful_repo_counters(stream_corpus(spark, src))
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_wave()
    assert seen == {"org0/repo0": 3, "org0/repo1": 3}
    # second wave → state accumulates across restarts via the checkpoint
    df2 = corpus_df(spark, CorpusSpec(n_repos=2, files_per_repo=2, seed=9)).withColumn(
        "ingest_ts", F.lit("2024-01-01 01:00:00").cast("timestamp")
    ).withColumn("path", F.concat(F.lit("wave2/"), F.col("path")))
    df2.write.mode("append").parquet(src)
    run_wave()
    assert seen == {"org0/repo0": 5, "org0/repo1": 5}


def test_bound_graph_pattern_partition_prunes(spark, tmp_path):
    """SURVEY §2.B1: a bound graph with the catalog's n_buckets becomes
    a graph_bucket partition filter — same rows, pruned scan."""
    import re

    from tripleforge.catalog import ParquetSnapshotCatalog
    from tripleforge.query import match
    from tripleforge.update import insert_data

    root = str(tmp_path / "cat")
    cat = ParquetSnapshotCatalog(spark, root, n_buckets=8)
    rows = spark.createDataFrame(
        [(f"urn:s{i}", "urn:p", "urn:o", "iri", f"urn:g{i % 5}") for i in range(50)],
        "subj string, pred string, obj string, obj_kind string, graph string",
    )
    insert_data(cat, rows, run_id="i1")
    stmts = cat.read_statements()
    plain = {
        r.s for r in match(stmts, s="?s", p="urn:p", g="urn:g3").collect()
    }
    pruned_df = match(stmts, s="?s", p="urn:p", g="urn:g3", n_buckets=cat.n_buckets)
    assert {r.s for r in pruned_df.collect()} == plain and plain
    plan = pruned_df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "graph_bucket" in m.group(1), plan[:2000]


def test_reopened_catalog_recovers_bucket_count(spark, tmp_path):
    """A catalog written with n_buckets=8 reopened with the default
    ctor must use 8 — the manifest records the physical layout."""
    from tripleforge.catalog import ParquetSnapshotCatalog
    from tripleforge.update import insert_data

    root = str(tmp_path / "cat")
    cat = ParquetSnapshotCatalog(spark, root, n_buckets=8)
    rows = spark.createDataFrame(
        [("urn:s", "urn:p", "urn:o", "iri", "urn:g")],
        "subj string, pred string, obj string, obj_kind string, graph string",
    )
    insert_data(cat, rows, run_id="i1")
    reopened = ParquetSnapshotCatalog(spark, root)  # default 64
    assert reopened.n_buckets == 8
