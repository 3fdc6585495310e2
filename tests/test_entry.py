"""Driver-contract smoke: entry() returns rows with a stable schema on
sf0.001; every oracle_sql key has a queries() twin (§3.3)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"graph", "n_triples"}
    # each document contributes exactly 3 triples to its source graph
    assert all(r.n_triples > 0 and r.n_triples % 3 == 0 for r in rows)
    assert all(r.graph.startswith("urn:repo:") for r in rows)


def test_queries_oracle_keys_align(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # deliberate rows-only ops (engine-specific hash/RNG/sketch/kmeans)
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "approx_distinct",
        "sampling",
        "minhash_pairs",
        "simhash_pairs",
        "ann_ivf",
    }


def test_all_queries_run_sf0001(spark):
    """Every registered query executes and returns a well-typed frame at
    smoke scale (full value comparison lives in tools/check_oracles.py
    and the driver harness)."""
    for name, fn in entrymod.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        df.limit(5).collect()
