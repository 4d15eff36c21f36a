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


# ------------------------------------------------------- hub-salted join


def test_salted_equals_unsalted_on_powerlaw(spark):
    """Hub salting is a physical-plan change only: labels identical to the
    effectively-unsalted path (threshold above every degree), and the
    salted join key caps every reducer group well below the hub degree."""
    import numpy as np
    from pyspark.sql import functions as F

    from linkgraph.graph import undirected_edges
    from linkgraph.labelprop import _salted_sym
    from linkgraph.lineage import truncate_plan

    rng = np.random.default_rng(7)
    n, m = 300, 3000
    # vertices 0..4 are hubs: ~45% of all dsts
    dst = np.where(rng.random(m) < 0.45, rng.integers(0, 5, m),
                   rng.integers(0, n, m))
    src = rng.integers(0, n, m)
    edges = spark.createDataFrame(
        [(int(s), int(d)) for s, d in zip(src, dst)], "src long, dst long"
    )
    verts = spark.range(n).select(F.col("id"))
    salted = collect_map(
        label_propagation(spark, edges, verts, 3, hub_threshold=32,
                          salt_buckets=8),
        "id", "label",
    )
    unsalted = collect_map(
        label_propagation(spark, edges, verts, 3, hub_threshold=10**9),
        "id", "label",
    )
    assert salted == unsalted
    assert salted == label_propagation_oracle(
        {v: set() for v in range(n)} | {
            v: nbrs for v, nbrs in _np_adj(src, dst, n).items()
        }, 3,
    )

    # reducer-group bound: with degree-D hubs and B salt buckets, no
    # (dst, salt) join key may exceed max(non-hub degree, ~D/B + slack)
    sym = truncate_plan(undirected_edges(edges))
    salted_sym, _ = _salted_sym(sym, hub_threshold=32, salt_buckets=8)
    groups = {
        (r["dst"], r["salt"]): r["c"]
        for r in salted_sym.groupBy("dst", "salt")
        .agg(F.count("*").alias("c")).collect()
    }
    degs = {}
    for (d, _s), c in groups.items():
        degs[d] = degs.get(d, 0) + c
    max_deg = max(degs.values())
    assert max_deg >= 32  # the fixture really has hubs
    for (d, s), c in groups.items():
        if degs[d] >= 32:
            assert c <= degs[d] // 8 + 8, (d, s, c, degs[d])


def _np_adj(src, dst, n):
    adj = {v: set() for v in range(n)}
    for s, d in zip(src.tolist(), dst.tolist()):
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    return adj


def test_lp_edges_outside_vertex_set(spark):
    """Edges referencing non-vertex ids: no phantom output rows, and a
    vertex whose only neighbors are non-vertices keeps its label (the
    pre-active-set contract — code-review regression test)."""
    from pyspark.sql import functions as F

    from linkgraph.labelprop import label_propagation

    verts = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    # 99 is not a vertex; vertex 3's only neighbor is 99
    edges = spark.createDataFrame(
        [(1, 2), (99, 3)], "src long, dst long"
    )
    got = {
        r["id"]: r["label"]
        for r in label_propagation(spark, edges, verts, 2).collect()
    }
    assert set(got) == {1, 2, 3}      # exactly the vertex set
    assert got[3] == 3                # no votes -> keeps own label
