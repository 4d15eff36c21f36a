"""Luby MIS: independence + maximality + exact parity with a sequential
replica of the same deterministic priority order."""

import hashlib
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from linkgraph.mis import maximal_independent_set

from conftest import collect_map


def _luby_ref(nodes, sym_adj, rounds=None, max_iter=64):
    pri = {
        v: hashlib.md5(str(v).encode()).hexdigest() + "-" + str(v)
        for v in nodes
    }
    und, inn = set(nodes), set()
    n_rounds = rounds if rounds is not None else max_iter
    for _ in range(n_rounds):
        if rounds is None and not und:
            break
        win = {
            v
            for v in und
            if all(pri[v] < pri[u] for u in sym_adj[v] if u in und)
        }
        inn |= win
        elim = {u for v in win for u in sym_adj[v] if u in und}
        und -= win
        und -= elim
    return {
        v: ("in" if v in inn else ("und" if v in und else "out"))
        for v in nodes
    }


def _sym_adj(small):
    adj = defaultdict(set)
    g = small.nx_digraph_ids()
    for u, v in g.edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    return adj


def test_mis_fixpoint_independent_and_maximal(spark, small):
    state = collect_map(
        maximal_independent_set(spark, small.edges, small.vertices),
        "id", "state",
    )
    assert set(state.values()) <= {"in", "out"}  # fixpoint: nothing und
    adj = _sym_adj(small)
    inn = {v for v, s in state.items() if s == "in"}
    # independence: no two adjacent members
    for v in inn:
        assert not (adj[v] & inn), v
    # maximality: every non-member has a member neighbor
    for v, s in state.items():
        if s == "out":
            assert adj[v] & inn, v


def test_mis_fixpoint_matches_sequential_replica(spark, small):
    state = collect_map(
        maximal_independent_set(spark, small.edges, small.vertices),
        "id", "state",
    )
    want = _luby_ref(set(state), _sym_adj(small))
    assert state == want


def test_mis_bounded_rounds_match_replica(spark, small):
    adj = _sym_adj(small)
    for rounds in (1, 2):
        state = collect_map(
            maximal_independent_set(
                spark, small.edges, small.vertices, rounds=rounds
            ),
            "id", "state",
        )
        want = _luby_ref(set(state), adj, rounds=rounds)
        assert state == want


def test_mis_empty_graph_all_in(spark):
    verts = spark.createDataFrame([(i,) for i in range(5)], "id long")
    edges = spark.createDataFrame([], "src long, dst long")
    state = collect_map(
        maximal_independent_set(spark, edges, verts), "id", "state"
    )
    assert state == {i: "in" for i in range(5)}


def test_mis_triangle_plus_isolate(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 4)], "src long, dst long"
    )
    verts = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], "id long")
    state = collect_map(
        maximal_independent_set(spark, edges, verts), "id", "state"
    )
    inn = {v for v, s in state.items() if s == "in"}
    assert 4 in inn  # self-loop dropped -> isolated -> always in
    assert len(inn & {1, 2, 3}) == 1  # exactly one of the triangle


def test_greedy_coloring_proper_and_deterministic(spark, small):
    from linkgraph.mis import greedy_coloring

    col = collect_map(
        greedy_coloring(spark, small.edges, small.vertices), "id", "color"
    )
    assert set(col) == set(small.id_of_url.values())  # total
    adj = _sym_adj(small)
    for v, c in col.items():
        for u in adj[v]:
            assert col[u] != c, (v, u)  # proper
    col2 = collect_map(
        greedy_coloring(spark, small.edges, small.vertices), "id", "color"
    )
    assert col == col2  # deterministic
    # color classes are maximal independent sets in their residual graph:
    # color 0 in particular is the full-graph Luby MIS
    from linkgraph.mis import maximal_independent_set

    mis0 = {
        r["id"]
        for r in maximal_independent_set(spark, small.edges, small.vertices)
        .where("state = 'in'").collect()
    }
    assert {v for v, c in col.items() if c == 0} == mis0


def test_greedy_coloring_triangle_needs_three(spark):
    from linkgraph.mis import greedy_coloring

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    verts = spark.createDataFrame([(i,) for i in (1, 2, 3)], "id long")
    col = collect_map(greedy_coloring(spark, edges, verts), "id", "color")
    assert sorted(col.values()) == [0, 1, 2]
