"""Benchmark harness (driver contract): runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set = the KG-construction build (the engine's reason to exist:
parse → canon → link → dedup, timed end-to-end and reported as
triples/sec too) + representative operators from every §2 family.
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

    timings: dict[str, float] = {}
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
    # 50 stmts = 1M raw statements) so fixed overheads amortize
    n_files = max(400, int(200_000 * sf))
    corpus = spark_corpus(spark, n_files=n_files, stmts_per_file=50).persist()
    corpus.count()  # materialize generation outside the timed window
    t0 = time.perf_counter()
    stmts, _ = transform(corpus, BuildConfig(link_entities=False))
    n_triples = stmts.count()
    kg_wall = time.perf_counter() - t0
    timings["kg_build"] = round(kg_wall, 3)
    corpus.unpersist()

    # --- headline operator queries
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

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
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
