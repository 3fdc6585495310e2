"""Per-query isolation harness for the optimization rounds (guide §1.4).

NOT the driver contract — ``bench.py`` is frozen for measurement; this
file exists so optimization work can (a) time single queries through the
noop sink without suite interference, (b) capture ``explain("formatted")``
plans into ``plans/<tag>/<query>_<suffix>.txt`` for the plan-diff
evidence the round deliverables require, and (c) write its JSON to a
file as well as stdout (VERDICT r5 #1: the stdout-only line got
tail-clipped).

Usage:
    python bench_extra.py [query ...]                # time queries
    python bench_extra.py --plans r06 --suffix before [query ...]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py ...

Protocol matches bench.py: local[$SPARK_GRAFT_CPUS], shuffle.partitions
= CPUS, warmup at sf0.001, $SPARK_GRAFT_REPS reps (default 3), best-of
reported, noop sink.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
REPS = max(1, int(os.environ.get("SPARK_GRAFT_REPS", "3")))

DEFAULT_SET = [
    "kg_build",
    "kg_flagship",
    "kg_linking_cc",
    "kg_bgp",
    "agg_pricing",
    "join_revenue",
    "window_rank",
    "range_join",
    "asof_join",
    "dedup_exact",
    "jaccard_pairs",
    "minhash_pairs",
    "ann_bruteforce",
    "ann_lsh",
    "quality_score",
    "graph_triangles",
]


def main() -> int:
    args = [a for a in sys.argv[1:]]
    plans_tag = None
    suffix = "before"
    plans_only = False
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--plans":
            plans_tag = args[i + 1]
            i += 2
        elif args[i] == "--suffix":
            suffix = args[i + 1]
            i += 2
        elif args[i] == "--plans-only":
            plans_only = True
            i += 1
        else:
            names.append(args[i])
            i += 1
    if not names:
        names = list(DEFAULT_SET)

    import __spark_entry__ as entrymod
    from tripleforge.datagen import spark_corpus
    from tripleforge.pipeline import BuildConfig, transform
    from tripleforge.session import get_spark

    sf = float(re.search(r"sf([0-9.]+)", SF_DIR).group(1)) if re.search(r"sf([0-9.]+)", SF_DIR) else 0.0
    spark = get_spark(
        "tripleforge-bench-extra",
        master=f"local[{CPUS}]",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.shuffle.partitions": CPUS,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    plans_dir = None
    if plans_tag:
        plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", plans_tag)
        os.makedirs(plans_dir, exist_ok=True)

    # warmup: JIT/codegen/python-worker pool
    if not plans_only:
        warm = spark_corpus(spark, n_files=200, stmts_per_file=20)
        transform(warm, BuildConfig(link_entities=False))[0].count()
        for name in names:
            if name == "kg_build":
                continue
            qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()

    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        if name == "kg_build":
            if plans_only:
                continue
            n_files = max(400, int(200_000 * sf))
            corpus = spark_corpus(spark, n_files=n_files, stmts_per_file=50).persist()
            corpus.count()
            runs[name] = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                stmts, _ = transform(corpus, BuildConfig(link_entities=False))
                stmts.count()
                runs[name].append(round(time.perf_counter() - t0, 3))
            corpus.unpersist()
            timings[name] = min(runs[name])
            continue
        df = qs[name](spark, SF_DIR)
        if plans_dir:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        if plans_only:
            continue
        runs[name] = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs[name].append(round(time.perf_counter() - t0, 3))
        timings[name] = min(runs[name])
        spark.sparkContext.setJobDescription(None)

    out = {
        "metric": "bench_extra_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "per_query_runs": runs,
        "sf": sf,
        "cpus": int(CPUS),
        "reps": REPS,
        "load_avg_start": None,
        "load_avg_end": round(os.getloadavg()[0], 2),
    }
    print(json.dumps(out))
    os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH"), exist_ok=True)
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "extra_last.json"), "w"
    ) as fh:
        json.dump(out, fh, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
