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


# ------------------------------------------------------------ seeded LP


def test_seeded_lp_matches_replica(spark):
    import random

    from linkgraph.labelprop import (
        label_propagation_seeded,
        label_propagation_seeded_oracle,
    )

    rng = random.Random(13)
    n = 40
    pairs = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(60)})
    pairs = [(u, v) for u, v in pairs if u != v]
    adj = {v: set() for v in range(n)}
    for u, v in pairs:
        adj[u].add(v)
        adj[v].add(u)
    seeds = {0: 100, 7: 200, 23: 300}

    edges = spark.createDataFrame(pairs, "src long, dst long")
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    sdf = spark.createDataFrame(list(seeds.items()), "id long, label long")
    for iters in (1, 3):
        got = {
            r["id"]: r["label"]
            for r in label_propagation_seeded(
                spark, edges, sdf, verts, iterations=iters
            ).collect()
        }
        want = label_propagation_seeded_oracle(adj, seeds, iterations=iters)
        assert got == want, iters


def test_seeded_lp_clamps_seeds_and_bounds_frontier(spark):
    """Path 0-1-2-3-4 seeded at 0: after k supersteps exactly the k-hop
    prefix is labeled; the seed never changes even when outvoted."""
    from linkgraph.labelprop import label_propagation_seeded

    pairs = [(i, i + 1) for i in range(4)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    verts = spark.createDataFrame([(i,) for i in range(5)], "id long")
    seeds = spark.createDataFrame([(0, 9)], "id long, label long")
    got = {
        r["id"]: r["label"]
        for r in label_propagation_seeded(
            spark, edges, seeds, verts, iterations=2
        ).collect()
    }
    assert got == {0: 9, 1: 9, 2: 9, 3: -1, 4: -1}
