"""Synchronous Louvain local moves: replica parity + modularity gain."""

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from linkgraph.community import louvain_communities, louvain_move_round

from conftest import collect_map


def _ref_round(pairs, labels):
    adj = defaultdict(list)
    for u, v in pairs:
        adj[u].append(v)
        adj[v].append(u)
    m = len(pairs)
    nodes = set(labels)
    k = {i: float(len(adj[i])) for i in nodes}
    tot = defaultdict(float)
    for i in nodes:
        tot[labels[i]] += k.get(i, 0.0)
    new = {}
    for i in nodes:
        kic = defaultdict(float)
        for j in adj[i]:
            kic[labels[j]] += 1.0
        best = None
        for c in sorted(set(kic) | {labels[i]}):
            own = k.get(i, 0.0) if c == labels[i] else 0.0
            score = kic.get(c, 0.0) - k.get(i, 0.0) * (tot[c] - own) / (
                2.0 * m
            )
            if best is None or score > best[0]:
                best = (score, c)
        new[i] = best[1]
    return new


def _pairs(small):
    g = small.nx_digraph_ids()
    return sorted(
        {(min(u, v), max(u, v)) for u, v in g.edges if u != v}
    )


def test_louvain_rounds_match_replica(spark, small):
    pairs = _pairs(small)
    labels = {i: i for i in small.id_of_url.values()}
    for rounds in (1, 2):
        got = collect_map(
            louvain_communities(
                spark, small.edges, small.vertices, rounds=rounds
            ),
            "id", "label",
        )
        want = dict(labels)
        for _ in range(rounds):
            want = _ref_round(pairs, want)
        assert got == want


def test_louvain_two_cliques(spark):
    # two K4s joined by one bridge edge -> each clique one community
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges += [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges.append((3, 10))
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame(
        [(i,) for i in list(range(4)) + list(range(10, 14))], "id long"
    )
    got = collect_map(
        louvain_communities(spark, e, v, rounds=3), "id", "label"
    )
    assert len({got[i] for i in range(4)}) == 1
    assert len({got[i] for i in range(10, 14)}) == 1
    assert got[0] != got[10]


def test_louvain_improves_modularity(spark):
    from linkgraph.graph import modularity

    edges = [(a, b) for a in range(5) for b in range(5) if a < b]
    edges += [(a, b) for a in range(20, 25) for b in range(20, 25) if a < b]
    edges += [(4, 20), (0, 24)]
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame(
        [(i,) for i in list(range(5)) + list(range(20, 25))], "id long"
    )

    def q_of(labels_df):
        return sum(
            r["q_term9"]
            for r in modularity(e, labels_df).collect()
        )

    singleton = v.select("id", F.col("id").alias("label"))
    after = louvain_communities(spark, e, v, rounds=3)
    assert q_of(after) > q_of(singleton)


def test_louvain_isolated_vertex_keeps_label(spark):
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    v = spark.createDataFrame([(1,), (2,), (99,)], "id long")
    got = collect_map(louvain_communities(spark, e, v, rounds=2), "id", "label")
    assert got[99] == 99


def test_louvain_round_is_deterministic(spark, small):
    a = collect_map(
        louvain_communities(spark, small.edges, small.vertices, rounds=2),
        "id", "label",
    )
    b = collect_map(
        louvain_communities(spark, small.edges, small.vertices, rounds=2),
        "id", "label",
    )
    assert a == b


def _q_of(edges_df, labels_df):
    from linkgraph.graph import modularity

    return sum(r["q_term9"] for r in modularity(edges_df, labels_df).collect())


def test_louvain_hierarchy_modularity_non_decreasing(spark, small):
    """Phase 2 (weighted coarse-graph rounds) must not lose fine-graph
    modularity vs phase 1 on the fixtures — the coarse graph's weighted
    modularity equals the fine graph's under composition."""
    from linkgraph.community import louvain_communities, louvain_hierarchy

    l1 = louvain_communities(spark, small.edges, small.vertices, rounds=2)
    hier = louvain_hierarchy(spark, small.edges, small.vertices, rounds=2)
    assert _q_of(small.edges, hier) >= _q_of(small.edges, l1) - 1e-12


def test_louvain_hierarchy_two_clique_pairs(spark):
    """Four K4s in two bridged pairs: phase 1 finds the cliques; phase 2
    must keep them separate (merging adjacent cliques loses modularity),
    and the composition covers every vertex exactly once."""
    from linkgraph.community import louvain_hierarchy

    def k4(base):
        return [(base + a, base + b) for a in range(4) for b in range(4)
                if a < b]

    edges = k4(0) + k4(10) + k4(20) + k4(30)
    edges += [(3, 10), (23, 30)]  # bridges inside each pair
    e = spark.createDataFrame(edges, "src long, dst long")
    ids = [i for base in (0, 10, 20, 30) for i in range(base, base + 4)]
    v = spark.createDataFrame([(i,) for i in ids], "id long")
    got = collect_map(louvain_hierarchy(spark, e, v, rounds=3), "id", "label")
    assert set(got) == set(ids)
    for base in (0, 10, 20, 30):
        assert len({got[base + i] for i in range(4)}) == 1
    assert got[0] != got[20]  # unbridged pairs never merge


def test_louvain_hierarchy_isolated_vertex_keeps_label(spark):
    from linkgraph.community import louvain_hierarchy

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    v = spark.createDataFrame([(1,), (2,), (99,)], "id long")
    got = collect_map(louvain_hierarchy(spark, e, v, rounds=2), "id", "label")
    assert got[99] == 99


def test_weighted_round_reduces_to_unweighted_on_unit_weights(spark, small):
    """w=1, no self-loops => the weighted round must reproduce the
    unweighted round exactly (it is the generalization)."""
    from linkgraph.community import (
        _undirected,
        louvain_move_round,
        louvain_move_round_weighted,
    )

    wq = _undirected(small.edges).withColumn("w", F.lit(1.0))
    labels = small.vertices.select("id", F.col("id").alias("label"))
    a = collect_map(
        louvain_move_round(spark, small.edges, labels), "id", "label"
    )
    b = collect_map(
        louvain_move_round_weighted(spark, wq, labels), "id", "label"
    )
    assert a == b
