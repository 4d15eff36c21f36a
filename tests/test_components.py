"""Connected components: exact per-vertex match vs networkx, min-id labels;
small-star/large-star and min-propagation agree (BASELINE.json:14)."""

import networkx as nx
import pytest

from linkgraph.components import connected_components

from conftest import collect_map


def nx_min_labels(bundle):
    g = bundle.nx_digraph_ids().to_undirected()
    labels = {}
    for comp in nx.connected_components(g):
        m = min(comp)
        for v in comp:
            labels[v] = m
    return labels


@pytest.mark.parametrize("algorithm", ["star", "minprop"])
def test_components_exact(spark, tiny, algorithm):
    got = collect_map(
        connected_components(spark, tiny.edges, tiny.vertices, algorithm=algorithm),
        "id",
        "component",
    )
    assert got == nx_min_labels(tiny)


def test_components_exact_small(spark, small):
    got = collect_map(
        connected_components(spark, small.edges, small.vertices), "id", "component"
    )
    assert got == nx_min_labels(small)


def test_tiny_component_structure(spark, tiny):
    """The fixture's hand-built disjoint structures come out as distinct
    components: {0}, {1,2,3}, {4,5}, {6,7,8,9} (FIXTURES.md §5)."""
    from linkgraph.corpus import url_for

    got = collect_map(
        connected_components(spark, tiny.edges, tiny.vertices), "id", "component"
    )
    by_url = {tiny.url_of_id[i]: c for i, c in got.items()}
    groups = [[0], [1, 2, 3], [4, 5], [6, 7, 8, 9]]
    seen_labels = set()
    for grp in groups:
        labels = {by_url[url_for(i)] for i in grp}
        assert len(labels) == 1, grp
        seen_labels |= labels
    assert len(seen_labels) == len(groups)  # pairwise distinct components
