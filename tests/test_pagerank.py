"""PageRank: per-vertex allclose 1e-6 vs networkx at convergence
(BASELINE.json:14); salted == unsalted rank equivalence (skew path)."""

import math

import pytest

from linkgraph.pagerank import pagerank, top_k

from conftest import collect_map
from oracles import pagerank_oracle


def nx_style_oracle(bundle):
    g = bundle.nx_digraph()
    return pagerank_oracle(g.nodes, g.edges, alpha=0.85, tol=1e-12)


@pytest.fixture(scope="module")
def small_result(spark, small):
    return pagerank(spark, small.edges, small.vertices, tol=1e-8, max_iter=200)


def test_converges(small_result):
    assert small_result.converged
    deltas = [s.l1_delta for s in small_result.supersteps]
    assert deltas[-1] < 1e-8
    assert deltas[0] > deltas[-1]


def test_allclose_networkx(spark, small, small_result):
    oracle = nx_style_oracle(small)
    got_by_id = collect_map(small_result.ranks, "id", "rank")
    got = {small.url_of_id[i]: r for i, r in got_by_id.items()}
    assert set(got) == set(oracle)
    for u in oracle:
        assert math.isclose(got[u], oracle[u], rel_tol=1e-6, abs_tol=1e-6), u


def test_rank_mass_conserved(small_result):
    total = sum(r for r in collect_map(small_result.ranks, "id", "rank").values())
    assert math.isclose(total, 1.0, rel_tol=1e-9)


def test_salted_equals_unsalted(spark, tiny):
    """Hub splitting changes only float addition order (1e-12)."""
    base = pagerank(spark, tiny.edges, tiny.vertices, max_iter=15, tol=0.0,
                    hub_threshold=10**9)
    salted = pagerank(spark, tiny.edges, tiny.vertices, max_iter=15, tol=0.0,
                      hub_threshold=2, salt_buckets=4)
    a = collect_map(base.ranks, "id", "rank")
    b = collect_map(salted.ranks, "id", "rank")
    assert set(a) == set(b)
    for k in a:
        assert math.isclose(a[k], b[k], rel_tol=1e-12, abs_tol=1e-12)


def test_tiny_allclose_networkx(spark, tiny):
    res = pagerank(spark, tiny.edges, tiny.vertices, tol=1e-8, max_iter=200,
                   hub_threshold=4, salt_buckets=4)
    oracle = nx_style_oracle(tiny)
    got = {tiny.url_of_id[i]: r for i, r in collect_map(res.ranks, "id", "rank").items()}
    for u in oracle:
        assert math.isclose(got[u], oracle[u], rel_tol=1e-6, abs_tol=1e-6), u


def test_top_k(spark, small, small_result):
    rows = top_k(small_result.ranks, small.vertices, k=5).collect()
    assert len(rows) == 5
    assert rows[0]["rank"] >= rows[-1]["rank"]
