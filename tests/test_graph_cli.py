"""jobs/graph.py — graph analytics over a snapshot catalog: edge
projection (IRI objects only, predicate pushdown), one op end-to-end
in a fresh JVM, literal objects excluded, wcc over string node ids."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def catalog_dir(spark, tmp_path_factory):
    from tripleforge.catalog import ParquetSnapshotCatalog
    from tripleforge.update import insert_data

    root = str(tmp_path_factory.mktemp("graphcli_cat"))
    cat = ParquetSnapshotCatalog(spark, root, n_buckets=8)
    ring = [
        (f"urn:n{i}", "urn:p:next", f"urn:n{(i + 1) % 6}", "iri", "urn:g")
        for i in range(6)
    ]
    extra = [
        ("urn:n0", "urn:p:next", "urn:n2", "iri", "urn:g"),  # chord
        ("urn:n0", "urn:p:label", "zero", "literal", "urn:g"),  # not an edge
        ("urn:m1", "urn:p:other", "urn:m2", "iri", "urn:g"),  # other pred
    ]
    rows = spark.createDataFrame(
        ring + extra,
        "subj string, pred string, obj string, obj_kind string, graph string",
    )
    insert_data(cat, rows, run_id="graphcli")
    return root


def test_wcc_string_ids_in_process(spark, catalog_dir):
    from pyspark.sql import functions as F

    from tripleforge import graph
    from tripleforge.catalog import ParquetSnapshotCatalog

    stmts = ParquetSnapshotCatalog(spark, catalog_dir).read_statements()
    edges = stmts.where(
        (F.col("pred") == "urn:p:next") & (F.col("obj_kind") == "iri")
    ).select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
    rows = {r["node"]: r for r in graph.wcc(edges, numeric_ids=False).collect()}
    assert len(rows) == 6
    assert all(r["component"] == "urn:n0" for r in rows.values())
    assert rows["urn:n3"]["component_size"] == 6


def test_cli_degrees_excludes_literals_and_other_predicates(catalog_dir):
    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "graph.py"),
            "--catalog", catalog_dir, "--pred", "urn:p:next",
            "--op", "degrees", "--master", "local[2]",
        ],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    # 6 ring nodes; urn:m1/m2 (other predicate) and the literal are out
    assert d["rows"] == 6 and d["op"] == "degrees"
    assert "urn:m1" not in out.stdout
    # n0 has the chord: out-degree 2
    assert any("urn:n0" in l and "| 2 " in l.replace("|2 ", "| 2 ")
               for l in out.stdout.splitlines() if "urn:n0" in l)


def test_cli_pagerank_all_predicates(catalog_dir):
    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "graph.py"),
            "--catalog", catalog_dir, "--pred", "?p",
            "--op", "pagerank", "--iterations", "2",
            "--master", "local[2]",
        ],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    assert d["rows"] == 8  # 6 ring nodes + m1 + m2
