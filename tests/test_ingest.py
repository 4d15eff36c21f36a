"""Raw graph_data ingestion == the reference's alternate constructor
(XBytecodeGraph(graph_data=...), graphs.py:206,229-240): every supported
shape lands on the same canonical (edges, vertices) pair and feeds the
operators unchanged."""

import numpy as np
import networkx as nx

from linkgraph.complexity import component_complexity
from linkgraph.components import connected_components
from linkgraph.ingest import graph_from_data

TRIANGLE = [(0, 1), (1, 2), (2, 0), (3, 4)]


def _pairs(edges):
    return {(r["src"], r["dst"]) for r in edges.collect()}


def test_edge_list(spark):
    edges, verts = graph_from_data(spark, TRIANGLE)
    assert _pairs(edges) == set(TRIANGLE)
    assert {r["id"] for r in verts.collect()} == {0, 1, 2, 3, 4}


def test_adjacency_dict(spark):
    edges, _ = graph_from_data(spark, {0: [1, 2], 1: [2], 3: []})
    assert _pairs(edges) == {(0, 1), (0, 2), (1, 2)}


def test_numpy_adjacency(spark):
    a = np.zeros((4, 4))
    a[0, 1] = a[1, 2] = a[2, 0] = 1
    edges, verts = graph_from_data(spark, a)
    assert _pairs(edges) == {(0, 1), (1, 2), (2, 0)}
    assert verts.count() == 3


def test_networkx_digraph_with_isolates(spark):
    g = nx.DiGraph(TRIANGLE)
    g.add_node(99)
    edges, verts = graph_from_data(spark, g)
    assert _pairs(edges) == set(TRIANGLE)
    assert {r["id"] for r in verts.collect()} == {0, 1, 2, 3, 4, 99}


def test_networkx_undirected_symmetrizes(spark):
    g = nx.Graph([(0, 1)])
    edges, _ = graph_from_data(spark, g)
    assert _pairs(edges) == {(0, 1), (1, 0)}


def test_string_labels_hash_to_engine_ids(spark):
    from pyspark.sql import functions as F

    edges, verts = graph_from_data(spark, [("a", "b"), ("b", "c")])
    want = {
        r["h"]
        for r in spark.createDataFrame([("a",), ("b",), ("c",)], "u string")
        .select(F.xxhash64("u").alias("h"))
        .collect()
    }
    assert {r["id"] for r in verts.collect()} == want
    assert edges.count() == 2


def test_feeds_operators(spark):
    """The ingested pair drives the engine exactly like extracted graphs —
    the reference's raison d'être for the alternate constructor (compute
    CCM scores of a hand-given graph, README.rst:34)."""
    edges, verts = graph_from_data(spark, TRIANGLE)
    comps = connected_components(spark, edges, verts)
    assert comps.select("component").distinct().count() == 2
    scores = {
        r["component"]: r["mccabe"]
        for r in component_complexity(spark, edges, comps).collect()
    }
    # triangle component: E=3, N=3 -> mccabe 2; pair: E=1, N=2 -> 1
    assert scores == {0: 2, 3: 1}
