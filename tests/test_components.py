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


# ----------------------------------------------------- incremental merge


def test_cc_incremental_equals_full_recompute(spark):
    """Random graph, random holdout of added edges (some introducing
    brand-new vertices): merging the delta into the stale labels must be
    bit-identical to recomputing components on the full edge set."""
    import random

    from linkgraph.components import cc_incremental, connected_components

    rng = random.Random(7)
    n = 40
    full = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(70)
                   if True})
    full = [(u, v) for u, v in full if u != v]
    # delta: every 3rd edge, plus edges to vertices the base never saw
    delta = [e for i, e in enumerate(full) if i % 3 == 0]
    delta += [(0, n + 1), (n + 2, n + 3)]
    base = [e for i, e in enumerate(full) if i % 3 != 0]
    all_edges = base + delta

    base_v = sorted({x for e in base for x in e})
    all_v = sorted({x for e in all_edges for x in e})

    edf = lambda pairs: spark.createDataFrame(pairs, "src long, dst long")
    vdf = lambda ids: spark.createDataFrame([(i,) for i in ids], "id long")

    stale = connected_components(spark, edf(base), vdf(base_v))
    got = {
        r["id"]: r["component"]
        for r in cc_incremental(spark, stale, edf(delta)).collect()
    }
    want = {
        r["id"]: r["component"]
        for r in connected_components(spark, edf(all_edges), vdf(all_v)).collect()
    }
    assert got == want


def test_cc_incremental_noop_delta_keeps_labels(spark):
    """A delta whose edges are all within existing components leaves
    every label untouched."""
    from linkgraph.components import cc_incremental, connected_components

    base = [(1, 2), (2, 3), (10, 11)]
    edf = spark.createDataFrame(base, "src long, dst long")
    vdf = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11]], "id long")
    labels = connected_components(spark, edf, vdf)
    delta = spark.createDataFrame([(1, 3), (11, 10)], "src long, dst long")
    got = {r["id"]: r["component"]
           for r in cc_incremental(spark, labels, delta).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
