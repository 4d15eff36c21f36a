"""Synchronous label propagation: exact vs the pure-Python replica."""

import pytest

from linkgraph.labelprop import label_propagation, label_propagation_oracle

from conftest import collect_map


def adjacency(bundle):
    g = bundle.nx_digraph_ids().to_undirected()
    g.remove_edges_from(nx_selfloops(g))
    return {v: set(g.neighbors(v)) - {v} for v in g.nodes}


def nx_selfloops(g):
    return [(u, v) for u, v in g.edges if u == v]


@pytest.mark.parametrize("iterations", [1, 3, 5])
def test_labelprop_exact(spark, tiny, iterations):
    got = collect_map(
        label_propagation(spark, tiny.edges, tiny.vertices, iterations=iterations),
        "id",
        "label",
    )
    assert got == label_propagation_oracle(adjacency(tiny), iterations)


def test_labelprop_exact_small(spark, small):
    got = collect_map(
        label_propagation(spark, small.edges, small.vertices, iterations=3),
        "id",
        "label",
    )
    assert got == label_propagation_oracle(adjacency(small), 3)
