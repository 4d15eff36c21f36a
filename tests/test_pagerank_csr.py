"""Blocked-CSR PageRank == flat DataFrame PageRank == networkx."""

import math

import pytest

from linkgraph.pagerank import pagerank
from linkgraph.pagerank_csr import build_blocked, pagerank_blocked

from conftest import collect_map
from oracles import pagerank_oracle


@pytest.fixture(scope="module")
def blocked(spark, small, tmp_path_factory):
    store = str(tmp_path_factory.mktemp("blocks"))
    return build_blocked(
        spark, small.edges, small.vertices.select("id"), n_blocks=8,
        store_path=store,
    )


def test_blocked_equals_flat_fixed_iters(spark, small, blocked):
    flat = pagerank(spark, small.edges, small.vertices, tol=0.0, max_iter=20)
    blk = pagerank_blocked(spark, blocked, tol=0.0, max_iter=20)
    a = collect_map(flat.ranks, "id", "rank")
    b = collect_map(blk.ranks, "id", "rank")
    assert set(a) == set(b)
    for k in a:
        assert math.isclose(a[k], b[k], rel_tol=1e-12, abs_tol=1e-15), k


def test_blocked_allclose_networkx(spark, small, blocked):
    res = pagerank_blocked(spark, blocked, tol=1e-8, max_iter=200)
    assert res.converged
    g = small.nx_digraph()
    oracle = pagerank_oracle(g.nodes, g.edges, alpha=0.85, tol=1e-12)
    got = {
        small.url_of_id[i]: r
        for i, r in collect_map(res.ranks, "id", "rank").items()
    }
    for u in oracle:
        assert math.isclose(got[u], oracle[u], rel_tol=1e-6, abs_tol=1e-6), u


def test_blocked_mass_conserved(spark, blocked):
    from pyspark.sql import functions as F

    res = pagerank_blocked(spark, blocked, tol=0.0, max_iter=10)
    total = res.ranks.agg(F.sum("rank")).collect()[0][0]
    assert math.isclose(total, 1.0, rel_tol=1e-9)


def test_barrier_transport_equals_jobs(spark, small, blocked):
    jobs = pagerank_blocked(spark, blocked, tol=0.0, max_iter=15)
    barr = pagerank_blocked(
        spark, blocked, tol=0.0, max_iter=15, transport="barrier",
        barrier_slots=2,
    )
    a = collect_map(jobs.ranks, "id", "rank")
    b = collect_map(barr.ranks, "id", "rank")
    assert set(a) == set(b)
    for k in a:
        assert math.isclose(a[k], b[k], rel_tol=1e-12, abs_tol=1e-15), k
    assert len(barr.supersteps) == 15


def test_barrier_converges_like_jobs(spark, small, blocked):
    barr = pagerank_blocked(
        spark, blocked, tol=1e-8, max_iter=200, transport="barrier",
        barrier_slots=2,
    )
    assert barr.converged
    jobs = pagerank_blocked(spark, blocked, tol=1e-8, max_iter=200)
    assert len(barr.supersteps) == len(jobs.supersteps)


def test_range_blocking_equals_hash(spark, small, tmp_path_factory):
    store = str(tmp_path_factory.mktemp("blocks_range"))
    rng = build_blocked(
        spark, small.edges, small.vertices.select("id"), n_blocks=4,
        store_path=store, blocking="range",
    )
    flat = pagerank(spark, small.edges, small.vertices, tol=0.0, max_iter=12)
    blk = pagerank_blocked(spark, rng, tol=0.0, max_iter=12)
    a = collect_map(flat.ranks, "id", "rank")
    b = collect_map(blk.ranks, "id", "rank")
    assert set(a) == set(b)
    for k in a:
        assert math.isclose(a[k], b[k], rel_tol=1e-12, abs_tol=1e-15), k
    rng.unpersist()
