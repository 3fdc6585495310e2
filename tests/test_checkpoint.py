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


def test_shadowed_unit_still_marked_committed(spark, cat_root):
    """ADVICE r1-high: two commits of one repo share graph urn:repo:<r>;
    a unit whose quads are fully shadowed by another unit's identical
    statements must STILL get lineage (be marked committed) so resume
    never re-appends it — and the store must hold each quad once."""
    cat = ParquetSnapshotCatalog(spark, cat_root, n_buckets=8)
    nt = "<urn:s> <urn:p> <urn:o> ."
    corpus = spark.createDataFrame(
        [
            ("org/r1", "a.nt", "c1", "N-Triples", nt),
            ("org/r1", "b.nt", "c2", "N-Triples", nt),  # same repo → same graph
        ],
        "repo string, path string, commit string, lang string, content string",
    )
    build(spark, corpus, cat, BuildConfig(run_id="r1", link_entities=False))
    committed = {
        (r.repo, r.commit) for r in cat.committed_units().collect()
    }
    assert ("org/r1", "c1") in committed and ("org/r1", "c2") in committed
    assert cat.read_statements().count() == 1  # set semantics
    # resume over the same corpus: nothing pending, nothing re-appended
    res2 = build(spark, corpus, cat, BuildConfig(run_id="r2", link_entities=False))
    assert res2.n_statements == 0
    assert cat.read_statements().count() == 1


def test_append_is_set_semantic_across_snapshots(spark, cat_root):
    """A second build of the same repo at a NEW commit re-asserting the
    same triples must not duplicate quads in the store."""
    cat = ParquetSnapshotCatalog(spark, cat_root, n_buckets=8)
    nt = "<urn:s> <urn:p> <urn:o> .\n<urn:s2> <urn:p> <urn:o2> ."
    mk = lambda commit, extra: spark.createDataFrame(
        [("org/r1", "a.nt", commit, "N-Triples", nt + extra)],
        "repo string, path string, commit string, lang string, content string",
    )
    build(spark, mk("c1", ""), cat, BuildConfig(run_id="r1", link_entities=False))
    build(
        spark,
        mk("c2", "\n<urn:s3> <urn:p> <urn:o3> ."),
        cat,
        BuildConfig(run_id="r2", link_entities=False),
    )
    stmts = cat.read_statements()
    assert stmts.count() == 3
    assert stmts.select("subj", "pred", "obj", "graph").distinct().count() == 3


def test_sid_reservation_skips_reserved_ids(spark, cat_root):
    """Concurrent-committer safety (ADVICE r1): a reservation marker for
    the next sid (a committer mid-flight, or a crashed one) forces the
    next commit onto a fresh id — no manifest is ever clobbered."""
    import os

    cat = ParquetSnapshotCatalog(spark, cat_root, n_buckets=4)
    ins = spark.createDataFrame(
        [("http://s", "http://p", "http://o", "iri")],
        "subj string, pred string, obj string, obj_kind string",
    )
    update.insert_data(cat, ins, graph="urn:g", run_id="i1")  # sid 1
    # simulate another committer that reserved sid 2 and is still writing
    open(os.path.join(cat_root, "_snapshots", ".reserve.v2"), "x").close()
    ins2 = spark.createDataFrame(
        [("http://s2", "http://p", "http://o", "iri")],
        "subj string, pred string, obj string, obj_kind string",
    )
    sid = update.insert_data(cat, ins2, graph="urn:g", run_id="i2")
    assert sid == 3
    assert cat.read_statements().count() == 2


def test_delete_rewrites_only_touched_buckets(spark, cat_root):
    """VERDICT r1: DELETE must be a partition-scoped overwrite — data
    files of untouched graph buckets are carried into the new snapshot
    verbatim (same paths, byte-identical), never re-read/rewritten."""
    import glob as _glob
    import os

    cat = ParquetSnapshotCatalog(spark, cat_root, n_buckets=8)
    # two graphs that land in different buckets
    from pyspark.sql import functions as SF

    from tripleforge.io import with_graph_bucket

    rows = spark.createDataFrame(
        [
            ("http://s1", "http://p", "http://o", "iri", "urn:g1"),
            ("http://s2", "http://p", "http://o", "iri", "urn:g2"),
        ],
        "subj string, pred string, obj string, obj_kind string, graph string",
    )
    buckets = {
        r.graph: r.graph_bucket
        for r in with_graph_bucket(rows, 8).select("graph", "graph_bucket").collect()
    }
    assert buckets["urn:g1"] != buckets["urn:g2"], "pick graphs in distinct buckets"
    update.insert_data(cat, rows, run_id="i1")
    untouched_rel = [
        p for p in cat.live_paths() if p.endswith(f"graph_bucket={buckets['urn:g2']}")
    ]
    assert untouched_rel
    before = {}
    for rel in untouched_rel:
        for f in _glob.glob(os.path.join(cat_root, rel, "*.parquet")):
            with open(f, "rb") as fh:
                before[f] = fh.read()
    kill = spark.createDataFrame(
        [("http://s1", "http://p", "http://o", "iri", "urn:g1")],
        "subj string, pred string, obj string, obj_kind string, graph string",
    )
    update.delete_data(cat, kill, run_id="d1")
    # untouched bucket paths survive into the new snapshot unchanged
    for rel in untouched_rel:
        assert rel in cat.live_paths()
    for f, blob in before.items():
        with open(f, "rb") as fh:
            assert fh.read() == blob
    left = cat.read_statements().select("subj").collect()
    assert {r.subj for r in left} == {"http://s2"}


def test_build_dedup_stages_share_one_exchange(spark):
    """The unit-scoped dedup (lineage attribution) and the global dedup
    share ONE exchange: hash-partitioning on the quad key clusters both
    aggregates, so fixing the shadowed-unit bug must not cost a second
    full shuffle of the statement set."""
    from pyspark.sql import functions as SF

    from tripleforge.ops import dedup
    from tripleforge.schema import STATEMENT_QUAD_KEY

    df = spark.createDataFrame(
        [("s", "p", "o", "iri", None, None, "g", "r1", "f", "c1")],
        "subj string, pred string, obj string, obj_kind string, obj_dt string, "
        "obj_lang string, graph string, src_repo string, src_path string, src_commit string",
    )
    shaped = dedup(
        df.repartition(*[SF.col(c) for c in STATEMENT_QUAD_KEY]),
        STATEMENT_QUAD_KEY + ["src_repo", "src_commit"],
    )
    final = dedup(shaped)
    plan = final._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"expected 1 exchange, plan has {n_exchanges}:\n{plan}"


# ---------------------------------------------------------------------------
# ADVICE r2 regressions: commit race + legacy-manifest keep_paths
# ---------------------------------------------------------------------------
def _one_row(spark, subj):
    return spark.createDataFrame(
        [(subj, "http://p", "http://o", "iri")],
        "subj string, pred string, obj string, obj_kind string",
    )


def test_concurrent_append_rebases_onto_fresh_parent(spark, cat_root):
    """ADVICE r2: a concurrent commit publishing between this commit's
    parent read and its manifest link must NOT be dropped — the append
    re-reads the latest parent after reserving/publishing and rebases
    its live_paths, so both commits' data survive in the final store."""
    import json
    import os

    cat = ParquetSnapshotCatalog(spark, cat_root, n_buckets=4)
    update.insert_data(cat, _one_row(spark, "http://a"), graph="urn:g", run_id="i1")

    # inject a concurrent committer that lands AFTER our sid reservation
    # (exactly the window the old code lost): patch _reserve_sid to
    # publish a foreign manifest right after reserving ours
    orig = cat._reserve_sid
    fired = {"done": False}

    def racy_reserve(parent):
        sid = orig(parent)
        if not fired["done"]:
            fired["done"] = True
            other = ParquetSnapshotCatalog(spark, cat_root, n_buckets=4)
            update.insert_data(
                other, _one_row(spark, "http://concurrent"),
                graph="urn:g", run_id="race",
            )
        return sid

    cat._reserve_sid = racy_reserve
    update.insert_data(cat, _one_row(spark, "http://b"), graph="urn:g", run_id="i2")
    cat._reserve_sid = orig

    final = ParquetSnapshotCatalog(spark, cat_root, n_buckets=4)
    subjects = {r.subj for r in final.read_statements().select("subj").collect()}
    assert subjects == {"http://a", "http://b", "http://concurrent"}
    # the final manifest's parent chain includes the concurrent commit
    latest = final._manifest_for(None)
    assert latest["parent"] is not None


def test_concurrent_overwrite_raises(spark, cat_root):
    """An overwrite racing a concurrent commit must abort loudly (its
    anti-joins saw a stale live set), never publish a manifest that
    silently drops the concurrent commit's data."""
    from tripleforge.catalog.parquet_snapshot import ConcurrentOverwriteError

    cat = ParquetSnapshotCatalog(spark, cat_root, n_buckets=4)
    update.insert_data(cat, _one_row(spark, "http://a"), graph="urn:g", run_id="i1")
    update.insert_data(cat, _one_row(spark, "http://b"), graph="urn:g", run_id="i2")

    orig = cat._reserve_sid
    fired = {"done": False}

    def racy_reserve(parent):
        sid = orig(parent)
        if not fired["done"]:
            fired["done"] = True
            other = ParquetSnapshotCatalog(spark, cat_root, n_buckets=4)
            update.insert_data(
                other, _one_row(spark, "http://concurrent"),
                graph="urn:g", run_id="race",
            )
        return sid

    cat._reserve_sid = racy_reserve
    with pytest.raises(ConcurrentOverwriteError):
        update.delete_data(
            cat, _one_row(spark, "http://a"), graph="urn:g", run_id="d1"
        )
    cat._reserve_sid = orig
    # the concurrent commit's data is intact; the aborted overwrite
    # published nothing
    final = ParquetSnapshotCatalog(spark, cat_root, n_buckets=4)
    subjects = {r.subj for r in final.read_statements().select("subj").collect()}
    assert subjects == {"http://a", "http://b", "http://concurrent"}


def test_mutation_on_legacy_whole_snapshot_manifest(spark, cat_root):
    """ADVICE r2: manifests recording live paths at whole-snapshot
    granularity (no graph_bucket= segment) must not crash a mutation —
    the engine falls back to a full rewrite for such entries."""
    import json
    import os

    cat = ParquetSnapshotCatalog(spark, cat_root, n_buckets=4)
    rows = spark.createDataFrame(
        [
            ("http://s1", "http://p", "http://o", "iri"),
            ("http://s2", "http://p", "http://o", "iri"),
        ],
        "subj string, pred string, obj string, obj_kind string",
    )
    update.insert_data(cat, rows, graph="urn:g", run_id="i1")
    # doctor the manifest to the legacy whole-snapshot granularity
    mpath = os.path.join(cat_root, "_snapshots", "v1.json")
    with open(mpath) as fh:
        m = json.load(fh)
    m["live_paths"] = ["data/snap=1"]
    os.unlink(mpath)
    with open(mpath, "w") as fh:
        json.dump(m, fh)

    cat2 = ParquetSnapshotCatalog(spark, cat_root, n_buckets=4)
    update.delete_data(
        cat2, _one_row(spark, "http://s1"), graph="urn:g", run_id="d1"
    )
    left = cat2.read_statements().select("subj").collect()
    assert {r.subj for r in left} == {"http://s2"}


def test_bucket_of_parses_defensively():
    from tripleforge.update import _bucket_of

    assert _bucket_of("data/snap=3/graph_bucket=17") == 17
    assert _bucket_of("data/snap=3/graph_bucket=17/part-0.parquet") == 17
    assert _bucket_of("data/snap=3") is None
    assert _bucket_of("data/snap=3/graph_bucket=oops") is None


def test_mutations_are_single_pass(spark, cat_root, monkeypatch):
    """VERDICT r2 #5: a mutation must scan its touched buckets ONCE —
    the row count rides the snapshot write via df.observe(), so no
    DataFrame.count() may run anywhere on the mutation path."""
    from pyspark.sql import DataFrame

    cat = ParquetSnapshotCatalog(spark, cat_root, n_buckets=4)
    rows = spark.createDataFrame(
        [
            ("http://s1", "http://p", "http://o", "iri"),
            ("http://s2", "http://p", "http://o", "iri"),
        ],
        "subj string, pred string, obj string, obj_kind string",
    )
    update.insert_data(cat, rows, graph="urn:g", run_id="seed")

    def banned_count(self):
        raise AssertionError("DataFrame.count() called on the mutation path")

    monkeypatch.setattr(DataFrame, "count", banned_count)
    update.insert_data(
        cat, _one_row(spark, "http://s3"), graph="urn:g", run_id="i2"
    )
    update.delete_data(
        cat, _one_row(spark, "http://s1"), graph="urn:g", run_id="d1"
    )
    update.clear(cat, graph="urn:g", which="graph", run_id="c1")
    monkeypatch.undo()
    assert cat.read_statements().count() == 0
    # lineage n_triples recorded via observe() matches reality
    lin = {(r["parser"], r["n_triples"]) for r in cat.read_lineage().collect()}
    assert ("insert_data", 2) in lin   # seed batch
    assert ("insert_data", 1) in lin   # one new statement appended
    assert ("delete_data", 2) in lin   # s2 + s3 remained after the delete
    assert ("clear", 0) in lin         # clear left nothing
