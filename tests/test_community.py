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
