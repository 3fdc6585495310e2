"""spark-submit entry for the KG build (BASELINE.json north_star:
"Execution is via spark-submit --py-files on multi-executor clusters").

    spark-submit --py-files tripleforge.zip jobs/build.py \
        --corpus /path/to/corpus_parquet --catalog /path/to/catalog

Sandbox/bench usage (plain python, master from --master):

    python jobs/build.py --corpus /tmp/corpus --catalog /tmp/cat \
        --master 'local[8]' --run-id bench-1 [--no-link] [--json]

Prints one JSON line: wall seconds of the build stage, committed
statement count, triples/sec.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", help="corpus parquet dir or iceberg:<table> (not needed with --compact)")
    ap.add_argument("--catalog", required=True, help="snapshot-catalog root dir")
    ap.add_argument("--master", default=None)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--graph", default=None, help="context-override graph IRI")
    ap.add_argument("--no-link", action="store_true")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--shuffle-partitions", default=None)
    ap.add_argument("--repeat", type=int, default=1,
                    help="timed repetitions (fresh catalog subdir each); "
                    "one JSON line per run")
    ap.add_argument("--compact", action="store_true",
                    help="run cross-snapshot linking compaction instead "
                    "of a build (pipeline.compact_links)")
    ap.add_argument("--compact-data", action="store_true",
                    help="partition-scoped small-file compaction "
                    "(update.compact_store) instead of a build")
    ap.add_argument("--expire", type=int, default=None, metavar="N",
                    help="expire all but the newest N snapshots and GC "
                    "unreferenced data/lineage dirs, instead of a build")
    ap.add_argument("--compute-only", action="store_true",
                    help="run the dataflow (parse+canon+link+dedup) and "
                    "count, skipping persist/snapshot-write — isolates "
                    "the compute path from single-disk I/O for scaling "
                    "measurements")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    from tripleforge.catalog import ParquetSnapshotCatalog
    from tripleforge.io import read_corpus
    from tripleforge.pipeline import BuildConfig, build
    from tripleforge.session import get_spark

    extra = {}
    if args.shuffle_partitions:
        extra["spark.sql.shuffle.partitions"] = args.shuffle_partitions
    spark = get_spark("tripleforge-build", master=args.master, extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    if args.compact:
        from tripleforge.pipeline import compact_links

        catalog = ParquetSnapshotCatalog(spark, args.catalog)
        res = compact_links(spark, catalog, run_id=args.run_id)
        print(
            json.dumps(
                {
                    "mode": "compact",
                    "snapshot_id": res.snapshot_id,
                    "run_id": res.run_id,
                    "n_statements": res.n_statements,
                }
            )
        )
        spark.stop()
        return 0
    if args.compact_data:
        from tripleforge.update import compact_store

        catalog = ParquetSnapshotCatalog(spark, args.catalog)
        sid = compact_store(catalog, run_id=args.run_id)
        print(json.dumps({"mode": "compact_data", "snapshot_id": sid}))
        spark.stop()
        return 0
    if args.expire is not None:
        catalog = ParquetSnapshotCatalog(spark, args.catalog)
        res = catalog.expire_snapshots(keep_last=args.expire)
        print(json.dumps({"mode": "expire", **res}))
        spark.stop()
        return 0
    if not args.corpus:
        ap.error("--corpus is required unless --compact")
    corpus = read_corpus(spark, args.corpus)
    if args.compute_only:
        from tripleforge.pipeline import transform

        cfg = BuildConfig(
            graph_override=args.graph, link_entities=not args.no_link
        )
        # warmup (JIT, python workers) before the timed runs
        transform(corpus.limit(200), cfg)[0].count()
        for i in range(args.repeat):
            t0 = time.perf_counter()
            stmts, _ = transform(corpus, cfg)
            n = stmts.count()
            wall = time.perf_counter() - t0
            print(
                json.dumps(
                    {
                        "rep": i,
                        "mode": "compute",
                        "n_statements": n,
                        "wall_s": round(wall, 3),
                        "triples_per_sec": round(n / wall, 1),
                        "master": spark.sparkContext.master,
                    }
                ),
                flush=True,
            )
        spark.stop()
        return 0
    if args.repeat > 1:
        # warmup build (JIT, codegen, python workers) into a throwaway dir
        build(
            spark,
            corpus.limit(200),
            ParquetSnapshotCatalog(spark, f"{args.catalog}/warmup"),
            BuildConfig(link_entities=False, resume=False, run_id="warmup"),
        )
    for i in range(args.repeat):
        catalog = ParquetSnapshotCatalog(
            spark, args.catalog if args.repeat == 1 else f"{args.catalog}/rep{i}"
        )
        cfg = BuildConfig(
            graph_override=args.graph,
            link_entities=not args.no_link,
            run_id=f"{args.run_id}-{i}" if args.run_id else None,
            resume=not args.no_resume,
        )
        t0 = time.perf_counter()
        res = build(spark, corpus, catalog, cfg)
        wall = time.perf_counter() - t0
        out = {
            "rep": i,
            "snapshot_id": res.snapshot_id,
            "run_id": res.run_id,
            "n_statements": res.n_statements,
            "n_errors": res.n_errors,
            "wall_s": round(wall, 3),
            "triples_per_sec": round(res.n_statements / wall, 1) if wall > 0 else None,
            "master": spark.sparkContext.master,
        }
        print(json.dumps(out), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
