"""Catalog maintenance (r3b): partition-scoped small-file compaction
(Iceberg rewrite_data_files analog) and snapshot expiry with
filesystem GC (expire_snapshots analog). Reference analog: catalog
housekeeping around jgrzebyta/triple-loader's store (public RDF4J/
Iceberg behavior); /root/reference is empty."""

from __future__ import annotations

import glob
import os

import pytest

from tripleforge import sparql
from tripleforge.catalog import ParquetSnapshotCatalog
from tripleforge.update import compact_store


@pytest.fixture()
def cat_root(tmp_path):
    return str(tmp_path / "cat")


def _seed_appends(spark, cat, n=3):
    for i in range(n):
        sparql.execute_update(
            spark, cat,
            f"INSERT DATA {{ GRAPH <urn:g1> {{ <urn:s{i}> <urn:p> {i} . }} }}",
            run_id=f"i{i}",
        )


def _rows(cat):
    return sorted(
        (r.subj, r.pred, r.obj, r.graph)
        for r in cat.read_statements().collect()
    )


def test_compact_store_consolidates_buckets(spark, cat_root):
    cat = ParquetSnapshotCatalog(spark, cat_root, n_buckets=4)
    _seed_appends(spark, cat, 3)
    before = _rows(cat)
    assert len(cat.live_paths()) == 3  # one dir per append
    sid = compact_store(cat, min_dirs=2, run_id="c1")
    assert sid == 4
    assert len(cat.live_paths()) == 1
    assert _rows(cat) == before
    # idempotent: nothing left to compact → no new snapshot
    assert compact_store(cat, min_dirs=2, run_id="c2") is None
    assert cat.latest_snapshot_id() == 4


def test_compact_store_leaves_cold_buckets_verbatim(spark, cat_root):
    """Only buckets spanning >= min_dirs directories are rewritten; a
    bucket written once keeps its original file byte-identical."""
    cat = ParquetSnapshotCatalog(spark, cat_root, n_buckets=4)
    # g1 twice (hot), g2 once (cold) — different buckets
    for i, g in enumerate(("urn:g1", "urn:g1", "urn:gg2")):
        sparql.execute_update(
            spark, cat,
            f"INSERT DATA {{ GRAPH <{g}> {{ <urn:s{i}> <urn:p> {i} . }} }}",
            run_id=f"i{i}",
        )
    cold = [p for p in cat.live_paths() if "snap=3" in p]
    assert len(cold) == 1
    cold_files = {
        p: open(p, "rb").read()
        for p in glob.glob(
            os.path.join(cat.root, cold[0], "*.parquet")
        )
    }
    before = _rows(cat)
    sid = compact_store(cat, min_dirs=2, run_id="c")
    assert sid is not None and _rows(cat) == before
    assert cold[0] in cat.live_paths()  # carried verbatim
    for p, blob in cold_files.items():
        assert open(p, "rb").read() == blob


def test_expire_snapshots_gc(spark, cat_root):
    cat = ParquetSnapshotCatalog(spark, cat_root, n_buckets=4)
    _seed_appends(spark, cat, 3)
    compact_store(cat, min_dirs=2, run_id="c")
    before = _rows(cat)
    res = cat.expire_snapshots(keep_last=1)
    assert res["expired"] == 3 and res["dirs_removed"] >= 3
    # only the compacted snapshot's data survives on disk
    assert glob.glob(os.path.join(cat.root, "data", "snap=*")) == [
        os.path.join(cat.root, "data", "snap=4")
    ]
    assert _rows(cat) == before
    # expired ids read as the empty store
    assert cat.read_statements(snapshot_id=1).count() == 0
    # commits after expiry keep working
    sparql.execute_update(
        spark, cat,
        "INSERT DATA { GRAPH <urn:g1> { <urn:x> <urn:p> 9 . } }",
        run_id="post",
    )
    assert cat.latest_snapshot_id() == 5
    assert cat.read_statements().count() == len(before) + 1


def test_expire_noop_below_threshold(spark, cat_root):
    cat = ParquetSnapshotCatalog(spark, cat_root, n_buckets=4)
    _seed_appends(spark, cat, 2)
    assert cat.expire_snapshots(keep_last=5) == {
        "expired": 0, "dirs_removed": 0}
    with pytest.raises(ValueError):
        cat.expire_snapshots(keep_last=0)


def test_expire_keeps_files_of_surviving_appends(spark, cat_root):
    """keep_last=1 after plain appends GCs NOTHING: the newest append
    manifest still references every earlier data directory."""
    cat = ParquetSnapshotCatalog(spark, cat_root, n_buckets=4)
    _seed_appends(spark, cat, 3)
    before = _rows(cat)
    res = cat.expire_snapshots(keep_last=1)
    assert res["expired"] == 2 and res["dirs_removed"] == 0
    assert _rows(cat) == before
