"""Blocked HITS == flat HITS (same L1-per-half-step spec) to float64
round-off; zero-shuffle supersteps over the fwd/rev store pair."""

import numpy as np
import pytest

from linkgraph.hits import hits, hits_oracle
from linkgraph.hits_csr import build_hits_stores, hits_blocked


def _as_map(df):
    return {r["id"]: (r["hub"], r["authority"]) for r in df.collect()}


@pytest.mark.parametrize("iterations", [2, 10])
def test_hits_blocked_matches_flat(spark, small, iterations):
    flat = _as_map(hits(spark, small.edges, small.vertices, iterations))
    g_fwd, g_rev = build_hits_stores(
        spark, small.edges, small.vertices, n_blocks=8
    )
    try:
        got = _as_map(hits_blocked(spark, g_fwd, g_rev, iterations))
        assert set(got) == set(flat)
        for k in flat:
            assert got[k] == pytest.approx(flat[k], abs=1e-9), k
    finally:
        g_fwd.delete()
        g_rev.delete()


def test_hits_blocked_matches_pure_python_oracle(spark, tiny):
    edges = [(r["src"], r["dst"])
             for r in tiny.edges.select("src", "dst").distinct().collect()]
    nodes = [r["id"] for r in tiny.vertices.select("id").collect()]
    want = hits_oracle(nodes, edges, iterations=5)
    g_fwd, g_rev = build_hits_stores(
        spark, tiny.edges, tiny.vertices, n_blocks=4
    )
    try:
        got = _as_map(hits_blocked(spark, g_fwd, g_rev, 5))
        for k, (wh, wa) in want.items():
            assert got[k] == pytest.approx((wh, wa), abs=1e-9), k
    finally:
        g_fwd.delete()
        g_rev.delete()


def test_hits_blocked_edgeless_graph_zeroes(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    vertices = spark.createDataFrame([(i,) for i in range(5)], "id long")
    g_fwd, g_rev = build_hits_stores(spark, edges, vertices, n_blocks=2)
    try:
        got = _as_map(hits_blocked(spark, g_fwd, g_rev, 3))
        assert got == {i: (0.0, 0.0) for i in range(5)}
    finally:
        g_fwd.delete()
        g_rev.delete()


def test_katz_blocked_matches_flat(spark, small):
    from linkgraph.hits import katz
    from linkgraph.hits_csr import katz_blocked
    from linkgraph.pagerank_csr import build_blocked

    flat = {
        r["id"]: r["katz"]
        for r in katz(
            spark, small.edges, small.vertices, iterations=3
        ).collect()
    }
    g = build_blocked(
        spark, small.edges.select("src", "dst"),
        small.vertices.select("id"), n_blocks=8,
    )
    try:
        got = {
            r["id"]: r["katz"]
            for r in katz_blocked(spark, g, iterations=3).collect()
        }
        assert set(got) == set(flat)
        for k in flat:
            assert got[k] == pytest.approx(flat[k], rel=1e-12), k
    finally:
        g.delete()


def test_salsa_blocked_matches_flat(spark, small):
    from linkgraph.hits import salsa
    from linkgraph.hits_csr import build_hits_stores, salsa_blocked

    flat = {
        r["id"]: (r["hub"], r["authority"])
        for r in salsa(
            spark, small.edges, small.vertices, iterations=2
        ).collect()
    }
    g_fwd, g_rev = build_hits_stores(
        spark, small.edges, small.vertices, n_blocks=8
    )
    try:
        got = {
            r["id"]: (r["hub"], r["authority"])
            for r in salsa_blocked(spark, g_fwd, g_rev, 2).collect()
        }
        assert set(got) == set(flat)
        for k in flat:
            assert got[k] == pytest.approx(flat[k], abs=1e-12), k
    finally:
        g_fwd.delete()
        g_rev.delete()


def test_salsa_blocked_matches_pure_python_oracle(spark, tiny):
    from linkgraph.hits import salsa_oracle
    from linkgraph.hits_csr import build_hits_stores, salsa_blocked

    edges = [(r["src"], r["dst"])
             for r in tiny.edges.select("src", "dst").distinct().collect()]
    nodes = [r["id"] for r in tiny.vertices.select("id").collect()]
    want = salsa_oracle(nodes, edges, iterations=3)
    g_fwd, g_rev = build_hits_stores(
        spark, tiny.edges, tiny.vertices, n_blocks=4
    )
    try:
        got = {
            r["id"]: (r["hub"], r["authority"])
            for r in salsa_blocked(spark, g_fwd, g_rev, 3).collect()
        }
        for k, w in want.items():
            assert got[k] == pytest.approx(w, abs=1e-12), k
    finally:
        g_fwd.delete()
        g_rev.delete()
