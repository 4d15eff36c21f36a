"""Blocked SCC == flat SCC == networkx, exactly (min-id component labels)."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from linkgraph.scc import strongly_connected_components
from linkgraph.scc_csr import (
    build_scc_stores,
    strongly_connected_components_blocked,
)


def _flat_map(spark, edges, vertices):
    return {
        r["id"]: r["component"]
        for r in strongly_connected_components(
            spark, edges, vertices
        ).collect()
    }


def _blocked_map(spark, edges, vertices, n_blocks=6):
    g_fwd, g_rev = build_scc_stores(
        spark, edges, vertices, n_blocks=n_blocks
    )
    try:
        return {
            r["id"]: r["component"]
            for r in strongly_connected_components_blocked(
                spark, g_fwd, g_rev
            ).collect()
        }
    finally:
        g_fwd.delete()
        g_rev.delete()


def test_scc_blocked_matches_flat_small(spark, small):
    flat = _flat_map(spark, small.edges, small.vertices)
    got = _blocked_map(spark, small.edges, small.vertices, n_blocks=8)
    assert got == flat


def test_scc_blocked_matches_networkx_random_digraph(spark):
    g = nx.gnp_random_graph(150, 0.03, seed=5, directed=True)
    edges = spark.createDataFrame(
        [(int(u) * 37 + 5, int(v) * 37 + 5) for u, v in g.edges()],
        "src long, dst long",
    )
    vertices = spark.createDataFrame(
        [(int(n) * 37 + 5,) for n in g.nodes()], "id long"
    )
    want = {}
    for comp in nx.strongly_connected_components(g):
        ids = [int(n) * 37 + 5 for n in comp]
        lbl = min(ids)
        for i in ids:
            want[i] = lbl
    got = _blocked_map(spark, edges, vertices, n_blocks=5)
    assert got == want


def test_scc_blocked_chain_of_cycles(spark):
    """Chain of 3-cycles connected by one-way bridges — the topology that
    bounds per-color settling (round-2 flat finding); every cycle is its
    own SCC."""
    rows, want = [], {}
    for c in range(6):
        base = c * 10
        rows += [(base, base + 1), (base + 1, base + 2), (base + 2, base)]
        for v in (base, base + 1, base + 2):
            want[v] = base
        if c:
            rows.append((base - 10, base))  # one-way bridge
    edges = spark.createDataFrame(rows, "src long, dst long")
    vertices = spark.createDataFrame(
        [(v,) for v in want], "id long"
    )
    got = _blocked_map(spark, edges, vertices, n_blocks=4)
    assert got == want


def test_scc_blocked_dag_all_singletons(spark):
    """Pure DAG: trim peels everything; every vertex is its own SCC."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(20)] + [(i, i + 2) for i in range(19)],
        "src long, dst long",
    )
    vertices = spark.createDataFrame([(i,) for i in range(21)], "id long")
    stats = {}
    g_fwd, g_rev = build_scc_stores(spark, edges, vertices, n_blocks=4)
    try:
        got = {
            r["id"]: r["component"]
            for r in strongly_connected_components_blocked(
                spark, g_fwd, g_rev, stats=stats
            ).collect()
        }
    finally:
        g_fwd.delete()
        g_rev.delete()
    assert got == {i: i for i in range(21)}
    assert stats["outer_rounds"] >= 1
