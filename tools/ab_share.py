"""A/B the text._share sharing mechanism for minhash_lsh_pairs
(VERDICT r3 #1: lazy localCheckpoint made minhash_pairs ~2x slower than
the r2 persist() while jaccard_pairs stayed flat).

Variants:
  lazy    — df.localCheckpoint(eager=False)   (r3 current)
  eager   — df.localCheckpoint(eager=True)
  persist — df.persist() (r2 behavior; unpersisted between runs here)
  none    — identity (recompute posting per branch)

Runs each variant N times interleaved (round-robin so host drift hits
all variants equally), reports per-variant best + median. Usage:

    python tools/ab_share.py [sf_dir] [reps]
"""
import json
import statistics
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, ".")
from tripleforge import text  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(f"{SF}/documents.parquet")

VARIANTS = {
    "lazy": lambda df, eager=False: df.localCheckpoint(eager=False),
    "eager": lambda df, eager=False: df.localCheckpoint(eager=True),
    "persist": lambda df, eager=False: df.persist(),
    "none": lambda df, eager=False: df,
}

results: dict[str, list[float]] = {k: [] for k in VARIANTS}
persisted = []


def run(variant):
    text._share = VARIANTS[variant]
    t0 = time.monotonic()
    out = text.minhash_lsh_pairs(docs, n_hashes=32, n_bands=16, verify_threshold=0.01)
    n = out.count()
    dt = time.monotonic() - t0
    # release whatever this run pinned so variants don't contaminate
    spark.catalog.clearCache()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for jrdd in list(jmap.values()):
        jrdd.unpersist()
    return n, dt


# warmup once (JVM/codegen warm) with current default
n0, _ = run("lazy")
print(f"warmup rows={n0}", file=sys.stderr)

for rep in range(REPS):
    for v in VARIANTS:
        n, dt = run(v)
        assert n == n0, (v, n, n0)
        results[v].append(round(dt, 3))
        print(f"rep{rep} {v}: {dt:.3f}s", file=sys.stderr)

summary = {
    v: {"best": min(ts), "median": statistics.median(ts), "all": ts}
    for v, ts in results.items()
}
import os
la = os.getloadavg()
print(json.dumps({"sf": SF, "reps": REPS, "load_avg": la, "variants": summary}, indent=2))
