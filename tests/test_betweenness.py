"""Depth-bounded seeded Brandes vs a literal python replica, plus the
unbounded-equivalence check: with depth >= diameter and all vertices as
seeds it equals networkx directed betweenness (unnormalized)."""

import random

import networkx as nx
import pytest

from linkgraph.betweenness import seeded_betweenness


def brandes_bounded_py(n, edges, sources, depth):
    adj = {v: [] for v in range(n)}
    for u, v in edges:
        if u != v:
            adj[u].append(v)
    bc = {v: 0.0 for v in range(n)}
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1.0}
        levels = [[s]]
        for lvl in range(1, depth + 1):
            nxt = {}
            for u in levels[-1]:
                for w in adj[u]:
                    if w in dist and dist[w] < lvl:
                        continue
                    nxt[w] = nxt.get(w, 0.0) + sigma[u]
            fresh = [w for w in nxt if w not in dist]
            for w in fresh:
                dist[w] = lvl
                sigma[w] = nxt[w]
            levels.append(fresh)
        delta = {v: 0.0 for v in dist}
        for lvl in range(depth - 1, -1, -1):
            for v in levels[lvl]:
                for w in adj[v]:
                    if dist.get(w) == lvl + 1:
                        delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            for v in levels[lvl]:
                if v != s:
                    bc[v] += delta[v]
    return {v: x for v, x in bc.items() if round(x, 6) > 0}


@pytest.mark.parametrize("seed,n,m,depth", [(1, 30, 90, 3), (2, 40, 160, 4)])
def test_matches_python_replica(spark, seed, n, m, depth):
    rng = random.Random(seed)
    pairs = set()
    while len(pairs) < m:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            pairs.add((u, v))
    edges = spark.createDataFrame(sorted(pairs), "src long, dst long")
    src_ids = sorted(rng.sample(range(n), 5))
    seeds = spark.createDataFrame([(i,) for i in src_ids], "id long")
    got = {
        r["v"]: r["bc6"]
        for r in seeded_betweenness(spark, edges, seeds, depth=depth).collect()
    }
    want = brandes_bounded_py(n, pairs, src_ids, depth)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-5, v


def test_all_sources_deep_equals_networkx(spark):
    """depth >= diameter + every vertex a source == nx directed
    betweenness_centrality(normalized=False, endpoints=False)."""
    rng = random.Random(9)
    n = 18
    pairs = set()
    while len(pairs) < 60:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            pairs.add((u, v))
    g = nx.DiGraph(sorted(pairs))
    g.add_nodes_from(range(n))
    edges = spark.createDataFrame(sorted(pairs), "src long, dst long")
    seeds = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {
        r["v"]: r["bc6"]
        for r in seeded_betweenness(spark, edges, seeds, depth=n).collect()
    }
    want = nx.betweenness_centrality(g, normalized=False)
    for v in range(n):
        assert abs(got.get(v, 0.0) - want[v]) < 1e-5, v
