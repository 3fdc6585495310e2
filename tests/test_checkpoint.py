"""Snapshot / resume / lineage / update tests (SURVEY.md §5.2.6)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tripleforge import update
from tripleforge.catalog import ParquetSnapshotCatalog
from tripleforge.checkpoint import filter_pending
from tripleforge.datagen import CorpusSpec, corpus_df
from tripleforge.lineage import dataset_checksum
from tripleforge.pipeline import BuildConfig, build


@pytest.fixture()
def cat_root():
    root = tempfile.mkdtemp(prefix="tfcat_")
    yield root
    shutil.rmtree(root, ignore_errors=True)


def _corpus(spark, n_repos=3):
    return corpus_df(
        spark,
        CorpusSpec(n_repos=n_repos, files_per_repo=2, stmts_per_file=8, dup_rate=0.1),
    )


def test_build_commit_and_lineage(spark, cat_root):
    cat = ParquetSnapshotCatalog(spark, cat_root, n_buckets=8)
    corpus = _corpus(spark)
    res = build(spark, corpus, cat, BuildConfig(run_id="r1", link_entities=False))
    assert res.snapshot_id == 1
    assert res.n_statements > 0
    lin = cat.read_lineage()
    assert lin.where(F.col("run_id") == "r1").count() > 0
    # lineage triple counts sum to committed statements
    total = lin.agg(F.sum("n_triples")).first()[0]
    assert total == res.n_statements


def test_resume_skips_committed_units(spark, cat_root):
    cat = ParquetSnapshotCatalog(spark, cat_root, n_buckets=8)
    corpus = _corpus(spark)
    build(spark, corpus, cat, BuildConfig(run_id="r1", link_entities=False))
    n1 = cat.read_statements().count()
    # partial failure simulation: re-run over the SAME corpus resumes to 0 work
    res2 = build(spark, corpus, cat, BuildConfig(run_id="r2", link_entities=False))
    assert res2.n_statements == 0
    assert cat.read_statements().count() == n1


def test_resume_processes_only_remainder(spark, cat_root):
    cat = ParquetSnapshotCatalog(spark, cat_root, n_buckets=8)
    big = _corpus(spark, n_repos=4)
    first_half = big.where(F.col("repo") < "org0/repo2")
    build(spark, first_half, cat, BuildConfig(run_id="r1", link_entities=False))
    pending = filter_pending(big, cat)
    assert set(r.repo for r in pending.select("repo").distinct().collect()) == {
        "org0/repo2", "org0/repo3",
    }
    build(spark, big, cat, BuildConfig(run_id="r2", link_entities=False))
    # final store equals a single-run store (order-independent checksum)
    solo_root = tempfile.mkdtemp(prefix="tfsolo_")
    try:
        solo = ParquetSnapshotCatalog(spark, solo_root, n_buckets=8)
        build(spark, big, solo, BuildConfig(run_id="r1", link_entities=False))
        assert dataset_checksum(cat.read_statements()) == dataset_checksum(
            solo.read_statements()
        )
    finally:
        shutil.rmtree(solo_root, ignore_errors=True)


def test_idempotent_recommit(spark, cat_root):
    cat = ParquetSnapshotCatalog(spark, cat_root, n_buckets=4)
    corpus = _corpus(spark)
    r1 = build(spark, corpus, cat, BuildConfig(run_id="same", resume=False, link_entities=False))
    # same run_id retried (driver restart) → same snapshot, no double-append
    stmts, lin = cat.read_statements(), cat.read_lineage()
    n, nl = stmts.count(), lin.count()
    from tripleforge import lineage as lmod
    from tripleforge.pipeline import transform

    s2, e2 = transform(corpus, BuildConfig(link_entities=False))
    sid = cat.commit_snapshot(s2, lmod.collect(s2, e2).withColumn("run_id", F.lit("same")), run_id="same")
    assert sid == r1.snapshot_id
    assert cat.read_statements().count() == n


def test_time_travel(spark, cat_root):
    cat = ParquetSnapshotCatalog(spark, cat_root, n_buckets=4)
    build(spark, _corpus(spark, 2), cat, BuildConfig(run_id="r1", link_entities=False))
    n1 = cat.read_statements().count()
    ins = spark.createDataFrame(
        [("http://s", "http://p", "http://o", "iri")],
        "subj string, pred string, obj string, obj_kind string",
    )
    update.insert_data(cat, ins, graph="urn:g", run_id="ins")
    assert cat.read_statements().count() == n1 + 1
    assert cat.read_statements(snapshot_id=1).count() == n1  # time travel


def test_insert_is_set_semantic(spark, cat_root):
    """Re-adding an existing triple is a no-op — reference triplestore
    set semantics."""
    cat = ParquetSnapshotCatalog(spark, cat_root, n_buckets=4)
    ins = spark.createDataFrame(
        [("http://s", "http://p", "http://o", "iri")],
        "subj string, pred string, obj string, obj_kind string",
    )
    update.insert_data(cat, ins, graph="urn:g", run_id="i1")
    update.insert_data(cat, ins, graph="urn:g", run_id="i2")
    assert cat.read_statements().count() == 1


def test_delete_data(spark, cat_root):
    cat = ParquetSnapshotCatalog(spark, cat_root, n_buckets=4)
    rows = spark.createDataFrame(
        [
            ("http://s1", "http://p", "http://o", "iri"),
            ("http://s2", "http://p", "http://o", "iri"),
        ],
        "subj string, pred string, obj string, obj_kind string",
    )
    update.insert_data(cat, rows, graph="urn:g", run_id="i1")
    kill = spark.createDataFrame(
        [("http://s1", "http://p", "http://o", "iri")],
        "subj string, pred string, obj string, obj_kind string",
    )
    update.delete_data(cat, kill, graph="urn:g", run_id="d1")
    left = cat.read_statements().collect()
    assert len(left) == 1 and left[0].subj == "http://s2"
