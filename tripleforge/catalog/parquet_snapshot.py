"""Iceberg-like snapshot catalog over plain Parquet (SURVEY.md §7.4).

Layout under ``root``::

    data/snap=<id>/graph_bucket=<b>/*.parquet   statement data files
    lineage/snap=<id>/*.parquet                 lineage rows of snapshot
    _snapshots/v<id>.json                       snapshot manifest

Commit protocol (exactly-once without Iceberg):
1. data + lineage are written to snapshot-scoped directories — never
   touched again (immutable, like Iceberg data files);
2. the manifest (listing the COMPLETE live data-path set after this
   snapshot, Iceberg-style) is written to a temp name and
   ``os.rename``-ed into place — atomic on POSIX;
3. readers resolve the latest ``v*.json`` and read exactly its
   ``live_paths`` — a torn/failed run's orphan directories are
   invisible because no manifest references them;
4. idempotence: a manifest with the same ``run_id`` short-circuits
   re-commit, so a retried driver can't double-append (A22).

Snapshot isolation, time travel (``snapshot_id=``), append and
overwrite ops — the subset of Iceberg semantics the pipeline needs.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tripleforge.catalog.base import Catalog
from tripleforge.io import N_GRAPH_BUCKETS, with_graph_bucket
from tripleforge.schema import STATEMENT


class ConcurrentOverwriteError(RuntimeError):
    """An overwrite commit raced a concurrent commit: its replace_paths
    and anti-joins were computed against a live set that is no longer
    the latest. The mutation must be retried from scratch against the
    new snapshot — rebasing the manifest alone would silently drop the
    concurrent commit's data (ADVICE r2)."""

    def __init__(self, sid: int, other: int):
        super().__init__(
            f"overwrite snapshot {sid} conflicts with concurrently "
            f"published snapshot {other}; retry the mutation against "
            "the latest snapshot"
        )
        self.sid = sid
        self.conflicting = other


class ParquetSnapshotCatalog(Catalog):
    def __init__(self, spark: SparkSession, root: str, n_buckets: int = N_GRAPH_BUCKETS):
        self.spark = spark
        self.root = root
        self.n_buckets = n_buckets
        os.makedirs(os.path.join(root, "_snapshots"), exist_ok=True)
        # the PHYSICAL layout's bucket count always wins over the ctor
        # arg — graph_bucket pruning computed with the wrong modulus
        # would silently drop rows (manifest records it at commit time)
        m = self._manifest_for(None)
        if m is not None and "n_buckets" in m:
            self.n_buckets = m["n_buckets"]

    # --- manifest helpers ---------------------------------------------------
    def _snap_dir(self) -> str:
        return os.path.join(self.root, "_snapshots")

    def _manifests(self) -> list[dict]:
        out = []
        for f in sorted(os.listdir(self._snap_dir())):
            if f.startswith("v") and f.endswith(".json"):
                with open(os.path.join(self._snap_dir(), f)) as fh:
                    out.append(json.load(fh))
        return sorted(out, key=lambda m: m["snapshot_id"])

    def latest_snapshot_id(self) -> int | None:
        ms = self._manifests()
        return ms[-1]["snapshot_id"] if ms else None

    def _manifest_for(self, snapshot_id: int | None) -> dict | None:
        ms = self._manifests()
        if not ms:
            return None
        if snapshot_id is None:
            return ms[-1]
        eligible = [m for m in ms if m["snapshot_id"] <= snapshot_id]
        return eligible[-1] if eligible else None

    # --- commit --------------------------------------------------------------
    def _reserve_sid(self, parent: dict | None) -> int:
        """Exclusive-create a reservation marker so two concurrent
        committers (e.g. build and compact_links) can never share a
        snapshot id — ADVICE r1: a plain ``os.rename`` of the manifest
        silently clobbered the loser's commit. A crash after reserving
        just burns an id (the orphan marker is skipped forever)."""
        sid = (parent["snapshot_id"] + 1) if parent else 1
        while True:
            try:
                fd = os.open(
                    os.path.join(self._snap_dir(), f".reserve.v{sid}"),
                    os.O_CREAT | os.O_EXCL | os.O_WRONLY,
                )
                os.close(fd)
                return sid
            except FileExistsError:
                sid += 1

    def commit_snapshot(
        self,
        statements: DataFrame,
        lineage: DataFrame,
        run_id: str,
        operation: str = "append",
        replace_paths: list[str] | None = None,
    ) -> int:
        for m in self._manifests():
            if m["run_id"] == run_id:
                return m["snapshot_id"]  # idempotent re-commit
        sid = self._reserve_sid(self._manifest_for(None))

        data_rel = f"data/snap={sid}"
        data_path = os.path.join(self.root, data_rel)
        (
            with_graph_bucket(statements.select(*[f.name for f in STATEMENT.fields]), self.n_buckets)
            .repartition(self.n_buckets, F.col("graph_bucket"))
            # sort by subject within each bucket file: parquet row-group
            # min/max stats become tight subject ranges, so bound-subject
            # scans (DESCRIBE, <s> ?p ?o patterns) skip whole row groups
            # — free at read time, one in-partition sort at write time
            .sortWithinPartitions("graph_bucket", "subj")
            .write.partitionBy("graph_bucket")
            .mode("errorifexists")
            .parquet(data_path)
        )
        # deferred lineage (base.Catalog contract): resolved only now,
        # after the statement write, so df.observe() counters attached
        # to the statement plan are available — one scan, not two
        if callable(lineage):
            lineage = lineage()
        # live paths are recorded at graph_bucket granularity so an
        # overwrite can replace only the buckets a mutation touched
        # (partition-scoped DELETE/compaction — the Iceberg twin's
        # partition-level overwrite)
        new_paths = sorted(
            f"{data_rel}/{d}"
            for d in os.listdir(data_path)
            if d.startswith("graph_bucket=")
        )
        lineage_rel = f"lineage/snap={sid}"
        stamp_sid = "snapshot_id" not in lineage.columns
        (lineage.withColumn("snapshot_id", F.lit(sid).cast("long")) if stamp_sid
         else lineage).write.mode("errorifexists").parquet(
            os.path.join(self.root, lineage_rel)
        )

        # publish-then-validate (ADVICE r2): the parent is re-read AFTER
        # the data write, the manifest is hard-linked into place, and
        # the published-ids set is re-checked — if a concurrent commit
        # landed between our parent and our sid, an append REBASES its
        # live_paths onto the fresh parent and republishes (appends only
        # ever add paths, so the merge is trivially correct), while an
        # overwrite must abort: its replace_paths/anti-joins were
        # computed against a live set that no longer exists.
        dst = os.path.join(self._snap_dir(), f"v{sid}.json")
        while True:
            parent = self._manifest_for(None)
            parent_sid = parent["snapshot_id"] if parent else 0
            if parent_sid >= sid:  # someone published past our reservation
                if operation == "overwrite":
                    raise ConcurrentOverwriteError(sid, parent_sid)
                sid = self._reserve_sid(parent)
                # data files stay at their original snap=<id> directory;
                # only the manifest id moves forward (live_paths are
                # plain path strings, so the reference stays valid) —
                # but the lineage stamp must track the final sid
                dst = os.path.join(self._snap_dir(), f"v{sid}.json")
                if stamp_sid:
                    lineage_rel = f"lineage/snap={sid}"
                    lineage.withColumn(
                        "snapshot_id", F.lit(sid).cast("long")
                    ).write.mode("errorifexists").parquet(
                        os.path.join(self.root, lineage_rel)
                    )
            if operation == "overwrite":
                live = (replace_paths or []) + new_paths
            else:
                live = (parent["live_paths"] if parent else []) + new_paths
            manifest = {
                "snapshot_id": sid,
                "run_id": run_id,
                "parent": parent["snapshot_id"] if parent else None,
                "operation": operation,
                "n_buckets": self.n_buckets,
                "live_paths": live,
                "lineage_paths": (parent["lineage_paths"] if parent else [])
                + [lineage_rel],
                "committed_at": time.time(),
            }
            tmp = os.path.join(self._snap_dir(), f".v{sid}.{uuid.uuid4().hex}.tmp")
            with open(tmp, "w") as fh:
                json.dump(manifest, fh)
            try:
                os.link(tmp, dst)  # fails on existing target — never clobbers
            except FileExistsError as exc:  # pragma: no cover - reservation bug
                raise RuntimeError(
                    f"snapshot id {sid} was published concurrently despite "
                    "the reservation protocol — manual repair required"
                ) from exc
            finally:
                os.unlink(tmp)
            # validate: did anything publish between our parent and us?
            gap = [
                m["snapshot_id"]
                for m in self._manifests()
                if parent_sid < m["snapshot_id"] < sid
            ]
            if not gap:
                return sid
            os.unlink(dst)  # retract and retry the merge on a fresh parent
            if operation == "overwrite":
                raise ConcurrentOverwriteError(sid, max(gap))

    # --- read ----------------------------------------------------------------
    def read_statements(self, snapshot_id: int | None = None) -> DataFrame:
        m = self._manifest_for(snapshot_id)
        if m is None or not m["live_paths"]:
            return self.spark.createDataFrame([], with_graph_bucket_schema())
        paths = [os.path.join(self.root, p) for p in m["live_paths"]]
        return self.spark.read.option(
            "basePath", os.path.join(self.root)
        ).parquet(*paths)

    def read_lineage(self) -> DataFrame:
        m = self._manifest_for(None)
        if m is None or not m["lineage_paths"]:
            from tripleforge.schema import LINEAGE

            cols = [f.name for f in LINEAGE.fields if f.name in ("repo", "commit", "parser", "n_files", "n_triples", "n_errors", "checksum")]
            return self.spark.createDataFrame([], "repo string, commit string, parser string, n_files long, n_triples long, n_errors long, checksum string")
        paths = [os.path.join(self.root, p) for p in m["lineage_paths"]]
        return self.spark.read.parquet(*paths)

    def live_paths(self) -> list[str]:
        m = self._manifest_for(None)
        return list(m["live_paths"]) if m else []

    # --- maintenance ---------------------------------------------------------
    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Drop manifests older than the newest ``keep_last`` and
        garbage-collect every data/lineage directory no surviving
        snapshot references (the Iceberg expire_snapshots analog —
        without it an append-per-mutation store retains every
        historical file forever). Time travel to an expired id reads
        as the empty store afterwards; surviving snapshots keep all
        their files, so concurrent readers of live data are unaffected
        — a reader pinned to an EXPIRED snapshot loses its files, the
        standard Iceberg caveat."""
        import shutil

        ms = self._manifests()
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        if len(ms) <= keep_last:
            return {"expired": 0, "dirs_removed": 0}
        keep, drop = ms[-keep_last:], ms[:-keep_last]
        referenced: set[str] = set()
        for m in keep:
            referenced |= set(m["live_paths"]) | set(m["lineage_paths"])
        # concurrency guard: an in-flight commit always reserves an id
        # ABOVE the newest published manifest, so any id ≤ the newest
        # DROPPED manifest was published long ago — only those are GC
        # candidates; higher unreferenced ids may be mid-write
        max_dropped = drop[-1]["snapshot_id"]
        removed = 0
        for kind in ("data", "lineage"):
            base = os.path.join(self.root, kind)
            if not os.path.isdir(base):
                continue
            for snap in sorted(os.listdir(base)):
                rel_snap = f"{kind}/{snap}"
                full_snap = os.path.join(base, snap)
                if rel_snap in referenced:
                    continue
                try:
                    snap_id = int(snap.split("=", 1)[1])
                except (IndexError, ValueError):
                    continue
                if snap_id > max_dropped:
                    continue
                kept_children = {
                    child
                    for child in os.listdir(full_snap)
                    if f"{rel_snap}/{child}" in referenced
                }
                if not kept_children:
                    shutil.rmtree(full_snap)
                    removed += 1
                    continue
                for child in sorted(os.listdir(full_snap)):
                    if (
                        child.startswith("graph_bucket=")
                        and child not in kept_children
                    ):
                        shutil.rmtree(os.path.join(full_snap, child))
                        removed += 1
        for m in drop:
            os.unlink(
                os.path.join(self._snap_dir(), f"v{m['snapshot_id']}.json")
            )
        return {"expired": len(drop), "dirs_removed": removed}


def with_graph_bucket_schema():
    from pyspark.sql.types import IntegerType, StructField, StructType

    return StructType(STATEMENT.fields + [StructField("graph_bucket", IntegerType(), True)])
