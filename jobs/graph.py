"""Graph-analytics CLI over the stored KG — completes the tool family
(build / query / curate / graph): project an edge list out of the
snapshot catalog with a triple pattern, run a §2.G operator on it,
print a one-line JSON summary and (optionally) write the result.

    python jobs/graph.py --catalog <dir> --pred urn:p:next \
        --op pagerank --iterations 5 --out /tmp/pr
    python jobs/graph.py --catalog <dir> --pred urn:p:sameAs \
        --graph urn:repo:r0 --op wcc
    python jobs/graph.py --catalog <dir> --pred '?p' --op degrees --top 20

Edges = (subject, object) of every statement matching the pattern
whose object is an IRI (graph nodes are resources, never literals);
``--pred '?p'`` uses every predicate. ``--snapshot`` pins a snapshot
(time travel) like the query CLI. Node ids are IRI strings, so wcc
runs with ``numeric_ids=False`` (component = lexicographic min IRI).
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
    ap.add_argument("--catalog", required=True)
    ap.add_argument("--pred", required=True,
                    help="edge predicate IRI, or '?p' for all predicates")
    ap.add_argument("--graph", default=None,
                    help="restrict edges to one named graph")
    ap.add_argument("--snapshot", type=int, default=None)
    ap.add_argument(
        "--op", required=True,
        choices=["degrees", "triangles", "lcc", "wcc", "pagerank"],
    )
    ap.add_argument("--iterations", type=int, default=3,
                    help="pagerank power-iteration rounds")
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--top", type=int, default=10,
                    help="rows to show (by the op's natural key)")
    ap.add_argument("--out", default=None,
                    help="write the full result as parquet")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tripleforge import graph
    from tripleforge.catalog import ParquetSnapshotCatalog
    from tripleforge.query import match
    from tripleforge.session import get_spark

    spark = get_spark("tripleforge-graph", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    catalog = ParquetSnapshotCatalog(spark, args.catalog)
    stmts = catalog.read_statements(snapshot_id=args.snapshot)

    pred = None if args.pred.startswith("?") else args.pred
    # match gives predicate pushdown + graph-bucket partition pruning;
    # carry_meta projects the object kind so literal objects (never
    # graph nodes) drop before any graph op runs
    matched = match(
        stmts, s="?s", p=pred, o="?o", g=args.graph,
        carry_meta=True, n_buckets=catalog.n_buckets,
    )
    edges = matched.where(F.col("o__kind") == "iri").select(
        F.col("s").alias("src"), F.col("o").alias("dst")
    )

    t0 = time.perf_counter()
    if args.op == "degrees":
        out = graph.degrees(edges)
        order = [F.col("deg").desc(), "node"]
    elif args.op == "triangles":
        out = graph.triangles(edges)
        order = [F.col("n_tri").desc(), "node"]
    elif args.op == "lcc":
        out = graph.clustering_coefficient(edges)
        order = [F.col("lcc").desc(), "node"]
    elif args.op == "wcc":
        out = graph.wcc(edges, numeric_ids=False)
        order = [F.col("component_size").desc(), "node"]
    else:
        out = graph.pagerank(
            edges, iterations=args.iterations, damping=args.damping
        )
        order = [F.col("pr").desc(), "node"]

    if args.out:
        out.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
    else:
        n = out.count()
    wall = round(time.perf_counter() - t0, 3)
    out.orderBy(*order).show(args.top, truncate=False)
    print(json.dumps({
        "op": args.op, "rows": n, "wall_s": wall,
        "out": args.out, "snapshot": args.snapshot,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
