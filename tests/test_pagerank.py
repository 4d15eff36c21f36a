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


def test_personalized_allclose_oracle(spark, small):
    """PPR vs the pure-Python personalization replica (networkx
    personalization=..., dangling=None semantics — nx itself needs scipy,
    absent here): seed teleport, seed dangling redistribution, mass
    conserved, non-seeds reachable only via links still ranked."""
    from oracles import ppr_oracle

    g = small.nx_digraph_ids()
    seed_ids = sorted(i for i in g.nodes if i % 5 == 0)[:8]
    assert seed_ids
    want = ppr_oracle(g.nodes, g.edges, seed_ids, tol=1e-12)

    seeds = spark.createDataFrame([(i,) for i in seed_ids], "id long")
    res = pagerank(
        spark, small.edges, small.vertices, tol=1e-10, max_iter=300, seeds=seeds
    )
    assert res.converged
    got = collect_map(res.ranks, "id", "rank")
    assert set(got) == set(want)
    for v in want:
        assert math.isclose(got[v], want[v], rel_tol=1e-6, abs_tol=1e-6), v
    assert math.isclose(sum(got.values()), 1.0, rel_tol=1e-9)


def test_personalized_matches_python_oracle(spark, tiny):
    from oracles import ppr_oracle

    g = tiny.nx_digraph_ids()
    seed_ids = sorted(g.nodes)[:3]
    want = ppr_oracle(g.nodes, g.edges, seed_ids, tol=1e-13)
    seeds = spark.createDataFrame([(i,) for i in seed_ids], "id long")
    res = pagerank(
        spark, tiny.edges, tiny.vertices, tol=1e-11, max_iter=300, seeds=seeds
    )
    got = collect_map(res.ranks, "id", "rank")
    for v in want:
        assert math.isclose(got[v], want[v], rel_tol=1e-8, abs_tol=1e-9), v


def test_personalized_empty_seed_intersection_raises(spark, tiny):
    seeds = spark.createDataFrame([(999999999,)], "id long")
    with pytest.raises(ValueError):
        pagerank(spark, tiny.edges, tiny.vertices, max_iter=2, seeds=seeds)


def test_weighted_pagerank_reduces_to_unweighted_at_w1(spark, small):
    from pyspark.sql import functions as F

    from linkgraph.pagerank import pagerank, pagerank_weighted

    we = small.edges.withColumn("w", F.lit(1.0))
    wr = {
        r["id"]: r["r"]
        for r in pagerank_weighted(we, small.vertices, iters=3).collect()
    }
    ur = {
        r["id"]: r["rank"]
        for r in pagerank(
            spark, small.edges, small.vertices, tol=0.0, max_iter=3
        ).ranks.collect()
    }
    assert set(wr) == set(ur)
    for i, v in ur.items():
        assert abs(wr[i] - v) < 1e-12


def test_weighted_pagerank_weights_shift_mass(spark):
    from linkgraph.pagerank import pagerank_weighted

    # 0 links to 1 (weight 9) and 2 (weight 1): 1 must outrank 2
    we = spark.createDataFrame(
        [(0, 1, 9.0), (0, 2, 1.0), (1, 0, 1.0), (2, 0, 1.0)],
        "src long, dst long, w double",
    )
    verts = spark.createDataFrame([(i,) for i in range(3)], "id long")
    r = {x["id"]: x["r"] for x in pagerank_weighted(we, verts, iters=8).collect()}
    assert r[1] > r[2]
    assert abs(sum(r.values()) - 1.0) < 1e-9


def test_trustrank_spam_mass(spark, small):
    """trustrank == (python PR oracle, python PPR oracle, their ratio);
    vertices unreachable from the seed set get tr == 0, spam_mass == 1."""
    from linkgraph.pagerank import trustrank
    from oracles import pagerank_oracle, ppr_oracle

    g = small.nx_digraph_ids()
    seed_ids = sorted(i for i in g.nodes if i % 7 == 0)[:6]
    assert seed_ids
    want_pr = pagerank_oracle(g.nodes, g.edges, tol=1e-12)
    want_tr = ppr_oracle(g.nodes, g.edges, seed_ids, tol=1e-12)

    seeds = spark.createDataFrame([(i,) for i in seed_ids], "id long")
    out = trustrank(
        spark, small.edges, small.vertices, seeds, max_iter=300, tol=1e-10
    )
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == set(want_pr)
    for v, r in rows.items():
        assert math.isclose(r["pr"], want_pr[v], rel_tol=1e-6, abs_tol=1e-6)
        assert math.isclose(r["tr"], want_tr[v], rel_tol=1e-6, abs_tol=1e-6)
        want_sm = (want_pr[v] - want_tr[v]) / want_pr[v]
        assert math.isclose(r["spam_mass"], want_sm, rel_tol=1e-5, abs_tol=1e-5)
        if want_tr[v] == 0.0:
            assert r["tr"] == 0.0 and r["spam_mass"] == 1.0
