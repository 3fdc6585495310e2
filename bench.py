"""Benchmark harness (driver contract): runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set = the KG-construction build (the engine's reason to exist:
parse → canon → link → dedup, timed end-to-end and reported as
triples/sec too) + representative operators from every §2 family.

Protocol (VERDICT r2 #6 — the idle-window discipline of
BENCH/scaling.json applied to the headline suite): after a warmup pass,
every timed unit runs ``$SPARK_GRAFT_REPS`` times (default 3) and the
BEST time is reported — on a shared host the minimum is the
least-noise estimator of the code's true cost. The JSON line carries
``load_avg_start/end`` (1-min load average) so a reader can tell a
noisy window from a quiet one, and ``per_query_runs`` with every raw
rep for transparency.
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

HEADLINE = [
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
]


def _sf_of(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else 0.0


def main() -> int:
    import __spark_entry__ as entrymod
    from tripleforge.datagen import spark_corpus
    from tripleforge.pipeline import BuildConfig, transform
    from tripleforge.session import get_spark

    sf = _sf_of(SF_DIR)
    spark = get_spark(
        "tripleforge-bench",
        master=f"local[{CPUS}]",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.shuffle.partitions": CPUS,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    load_start = os.getloadavg()[0]
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    qs = entrymod.queries()

    # --- warmup (BASELINE.md protocol: run twice per level, discard the
    # first — JIT, codegen cache, Python worker pool): every headline
    # query once at smoke scale, plus a small transform
    warm = spark_corpus(spark, n_files=200, stmts_per_file=20)
    transform(warm, BuildConfig(link_entities=False))[0].count()
    for name in HEADLINE:
        qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    # --- KG build throughput: corpus scaled by sf (sf0.1 → 20k files ×
    # 50 stmts = 1M raw statements) so fixed overheads amortize;
    # best-of-REPS like every other timed unit
    n_files = max(400, int(200_000 * sf))
    corpus = spark_corpus(spark, n_files=n_files, stmts_per_file=50).persist()
    corpus.count()  # materialize generation outside the timed window
    n_triples = 0
    runs["kg_build"] = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        stmts, _ = transform(corpus, BuildConfig(link_entities=False))
        n_triples = stmts.count()
        runs["kg_build"].append(round(time.perf_counter() - t0, 3))
    kg_wall = min(runs["kg_build"])
    timings["kg_build"] = kg_wall
    corpus.unpersist()

    # --- headline operator queries: best of REPS repetitions each
    for name in HEADLINE:
        fn = qs[name]
        runs[name] = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs[name].append(round(time.perf_counter() - t0, 3))
        timings[name] = min(runs[name])

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "kg_build_triples": n_triples,
        "kg_build_triples_per_sec": round(n_triples / kg_wall, 1),
        "cpus": int(CPUS),
        "reps": REPS,
        "estimator": "best_of_reps",
        "per_query_runs": runs,
        "load_avg_start": round(load_start, 2),
        "load_avg_end": round(os.getloadavg()[0], 2),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
