"""Graph analytics (tripleforge/graph.py): degrees, degree-ordered
compact-forward triangles, dangling-aware PageRank.

Oracles here are hand-computable fixtures plus an independent pure-
Python PageRank implementing the identical recurrence; the DuckDB
value-exact check runs via the harness (`graph_*` oracle entries)."""

from __future__ import annotations

import pytest

from tripleforge import graph


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_degrees_basic(spark):
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (4, 1)])
    rows = {r["node"]: r for r in graph.degrees(e).collect()}
    assert rows[1]["out_deg"] == 2 and rows[1]["in_deg"] == 1 and rows[1]["deg"] == 3
    assert rows[3]["out_deg"] == 0 and rows[3]["in_deg"] == 2
    assert rows[4]["out_deg"] == 1 and rows[4]["in_deg"] == 0


def test_degrees_counts_parallel_edges(spark):
    e = _edges(spark, [(1, 2), (1, 2)])
    rows = {r["node"]: r for r in graph.degrees(e).collect()}
    assert rows[1]["out_deg"] == 2 and rows[2]["in_deg"] == 2


def test_triangles_k4(spark):
    # K4 has 4 triangles; every node participates in C(3,2) = 3
    nodes = [1, 2, 3, 4]
    e = _edges(spark, [(a, b) for a in nodes for b in nodes if a < b])
    rows = {r["node"]: r["n_tri"] for r in graph.triangles(e).collect()}
    assert rows == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangles_direction_duplicates_selfloops_invariant(spark):
    # one triangle, written with reversed/duplicate edges + self loop:
    # must still count exactly once per node
    e = _edges(spark, [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (1, 1)])
    rows = {r["node"]: r["n_tri"] for r in graph.triangles(e).collect()}
    assert rows == {1: 1, 2: 1, 3: 1}


def test_triangles_none(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])  # path graph
    assert graph.triangles(e).count() == 0


def test_triangles_hub_star_plus_triangle(spark):
    # a hub star (no triangles) must not pollute the one real triangle
    star = [(0, i) for i in range(1, 30)]
    e = _edges(spark, star + [(100, 101), (101, 102), (102, 100)])
    rows = {r["node"]: r["n_tri"] for r in graph.triangles(e).collect()}
    assert rows == {100: 1, 101: 1, 102: 1}


def test_wcc_two_components(spark):
    e = _edges(spark, [(1, 2), (2, 3), (7, 8)])
    rows = {r["node"]: r for r in graph.wcc(e).collect()}
    assert rows[1]["component"] == 1 and rows[3]["component"] == 1
    assert rows[1]["component_size"] == 3
    assert rows[7]["component"] == 7 and rows[8]["component_size"] == 2


def test_wcc_direction_invariant_and_selfloop_singleton(spark):
    # direction must not matter; a self-loop-only node is a singleton
    e = _edges(spark, [(3, 1), (2, 3), (9, 9)])
    rows = {r["node"]: r for r in graph.wcc(e).collect()}
    assert rows[2]["component"] == 1 and rows[2]["component_size"] == 3
    assert rows[9]["component"] == 9 and rows[9]["component_size"] == 1


def test_wcc_matches_union_find(spark):
    pairs = [(i, (i * 3 + 1) % 40) for i in range(0, 40, 2)]
    rows = {r["node"]: r["component"] for r in graph.wcc(_edges(spark, pairs)).collect()}
    # independent union-find
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        if a != b:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    want = {v: find(v) for v in {x for p in pairs for x in p}}
    assert rows == want


def test_khop_path_graph(spark):
    # 1->2->3->4: within 2 hops, 1 reaches {2,3}, 3 reaches {4}
    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    rows = {r["node"]: r["n_reach"] for r in graph.khop_counts(e, hops=2).collect()}
    assert rows == {1: 2, 2: 2, 3: 1}


def test_khop_cycle_counts_self(spark):
    # 2-cycle: each node reaches the other and itself within 2 hops
    e = _edges(spark, [(1, 2), (2, 1)])
    rows = {r["node"]: r["n_reach"] for r in graph.khop_counts(e, hops=2).collect()}
    assert rows == {1: 2, 2: 2}


def test_khop_three_hops_and_duplicate_edges(spark):
    e = _edges(spark, [(1, 2), (1, 2), (2, 3), (3, 4), (4, 5)])
    rows = {r["node"]: r["n_reach"] for r in graph.khop_counts(e, hops=3).collect()}
    assert rows[1] == 3  # {2,3,4}
    assert rows[2] == 3  # {3,4,5}


def test_khop_one_hop_is_out_neighbors(spark):
    e = _edges(spark, [(1, 2), (1, 3), (1, 2)])
    rows = {r["node"]: r["n_reach"] for r in graph.khop_counts(e, hops=1).collect()}
    assert rows == {1: 2}


def test_clustering_coefficient_k4(spark):
    nodes = [1, 2, 3, 4]
    e = _edges(spark, [(a, b) for a in nodes for b in nodes if a < b])
    rows = {r["node"]: r for r in graph.clustering_coefficient(e).collect()}
    for v in nodes:
        assert rows[v]["udeg"] == 3
        assert rows[v]["n_tri"] == 3
        assert rows[v]["lcc"] == 1.0


def test_clustering_coefficient_path_and_leaf(spark):
    # path 1-2-3: middle node has deg 2, no triangle -> lcc 0;
    # leaves have deg 1 -> defined as 0
    e = _edges(spark, [(1, 2), (2, 3)])
    rows = {r["node"]: r for r in graph.clustering_coefficient(e).collect()}
    assert rows[2]["udeg"] == 2 and rows[2]["lcc"] == 0.0
    assert rows[1]["udeg"] == 1 and rows[1]["lcc"] == 0.0


def test_clustering_coefficient_open_wedge(spark):
    # triangle 1-2-3 plus pendant edge 3-4: node 3 has deg 3, 1 tri
    # -> lcc = 2*1/(3*2) = 1/3
    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    rows = {r["node"]: r for r in graph.clustering_coefficient(e).collect()}
    assert rows[3]["lcc"] == pytest.approx(1 / 3, abs=1e-9)
    assert rows[1]["lcc"] == 1.0 and rows[4]["lcc"] == 0.0


def _pagerank_py(edges, iterations=3, damping=0.85):
    """Independent reference: identical recurrence incl. the 9-decimal
    per-round stabilization."""
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    out = {v: 0 for v in nodes}
    for s, _ in edges:
        out[s] += 1
    pr = {v: round(1.0 / n, 9) for v in nodes}
    for _ in range(iterations):
        dangling = sum(pr[v] for v in nodes if out[v] == 0)
        in_sum = {v: 0.0 for v in nodes}
        for s, d in edges:
            if out[s]:
                in_sum[d] += pr[s] / out[s]
        pr = {
            v: round(
                (1 - damping) / n + damping * (in_sum[v] + dangling / n), 9
            )
            for v in nodes
        }
    return pr


@pytest.mark.parametrize(
    "pairs",
    [
        [(1, 2), (2, 3), (3, 1), (3, 4)],  # cycle + tail
        [(1, 2), (1, 3), (2, 3)],  # node 3 dangling
        [(1, 2), (1, 2), (2, 1), (5, 5)],  # duplicates + self loop
    ],
)
def test_pagerank_matches_reference(spark, pairs):
    got = {r["node"]: r["pr"] for r in graph.pagerank(_edges(spark, pairs)).collect()}
    want = _pagerank_py(pairs)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=2e-9)


def test_pagerank_sums_to_one(spark):
    pairs = [(i, (i * 2 + 1) % 10) for i in range(10)]
    df = graph.pagerank(_edges(spark, pairs), iterations=5)
    total = sum(r["pr"] for r in df.collect())
    assert total == pytest.approx(1.0, abs=1e-6)


def test_pagerank_deep_iterations_checkpointing(spark):
    # exercises the localCheckpoint lineage-truncation branch
    pairs = [(1, 2), (2, 3), (3, 1)]
    df = graph.pagerank(_edges(spark, pairs), iterations=9, checkpoint_every=3)
    got = {r["node"]: r["pr"] for r in df.collect()}
    want = _pagerank_py(pairs, iterations=9)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=2e-9)
