"""Blocked-store triangle counting == flat path == nx, exactly.

The blocked path (linkgraph.triangles_csr) must reproduce
linkgraph.triangles per-vertex counts bit-for-bit on every fixture —
any acyclic orientation finds each triangle exactly once, so this is an
equality assert, not a tolerance."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.triangles import triangle_counts, triangle_total
from linkgraph.triangles_csr import (
    build_tri_store,
    load_tri_store,
    triangle_counts_blocked,
    triangle_total_blocked,
)

from conftest import collect_map


def _flat_map(spark, bundle):
    return collect_map(
        triangle_counts(spark, bundle.edges, bundle.vertices),
        "id",
        "triangles",
    )


def test_blocked_matches_flat_tiny(spark, tiny):
    ts = build_tri_store(spark, tiny.edges, n_blocks=4)
    try:
        got = collect_map(
            triangle_counts_blocked(spark, ts, tiny.vertices),
            "id",
            "triangles",
        )
        assert got == _flat_map(spark, tiny)
    finally:
        ts.delete()


def test_blocked_matches_flat_small(spark, small):
    ts = build_tri_store(spark, small.edges, n_blocks=8)
    try:
        flat = _flat_map(spark, small)
        got = collect_map(
            triangle_counts_blocked(spark, ts, small.vertices),
            "id",
            "triangles",
        )
        assert got == flat
        stats = {}
        assert (
            triangle_total_blocked(spark, ts, stats=stats)
            == sum(flat.values()) // 3
            == triangle_total(spark, small.edges)
        )
        assert len(stats["block_secs"]) > 0
    finally:
        ts.delete()


def test_blocked_powerlaw_hub(spark):
    """Power-law-ish star+cliques shape: a hub linked to everyone plus
    chained 3-cliques; exercises the orientation bound and the diagonal
    (same-block) run path."""
    import networkx as nx

    g = nx.barabasi_albert_graph(300, 3, seed=7)
    edges = spark.createDataFrame(
        [(int(u) * 7919 + 13, int(v) * 7919 + 13) for u, v in g.edges()],
        "src long, dst long",
    )
    vertices = spark.createDataFrame(
        [(int(n) * 7919 + 13,) for n in g.nodes()], "id long"
    )
    nx_tri = nx.triangles(g)
    want = {int(n) * 7919 + 13: c for n, c in nx_tri.items()}
    ts = build_tri_store(spark, edges, n_blocks=6)
    try:
        got = collect_map(
            triangle_counts_blocked(spark, ts, vertices), "id", "triangles"
        )
        assert got == want
        assert triangle_total_blocked(spark, ts) == sum(want.values()) // 3
    finally:
        ts.delete()


def test_blocked_numpy_fallback(spark, tiny, monkeypatch):
    """LINKGRAPH_NATIVE=0 (no cc on host) must give identical counts via
    the per-edge intersect1d fallback."""
    monkeypatch.setenv("LINKGRAPH_NATIVE", "0")
    ts = build_tri_store(spark, tiny.edges, n_blocks=3)
    try:
        got = collect_map(
            triangle_counts_blocked(spark, ts, tiny.vertices),
            "id",
            "triangles",
        )
        assert got == _flat_map(spark, tiny)
    finally:
        ts.delete()


def test_store_reload(spark, tiny, tmp_path):
    """A named store reopens across sessions-in-spirit: counts from the
    reloaded handle equal the fresh build."""
    loc = str(tmp_path / "tristore")
    ts = build_tri_store(spark, tiny.edges, n_blocks=4, store_path=loc)
    fresh = collect_map(
        triangle_counts_blocked(spark, ts, tiny.vertices), "id", "triangles"
    )
    ts.unpersist()
    ts2 = load_tri_store(spark, loc)
    try:
        again = collect_map(
            triangle_counts_blocked(spark, ts2, tiny.vertices),
            "id",
            "triangles",
        )
        assert again == fresh
        assert ts2.n == ts.n and ts2.n_blocks == ts.n_blocks
        assert np.array_equal(ts2.goff, ts.goff)
    finally:
        ts2.delete()


def test_empty_graph(spark):
    """Zero edges -> empty store, zero triangles, empty per-vertex frame."""
    edges = spark.createDataFrame([], "src long, dst long")
    ts = build_tri_store(spark, edges, n_blocks=2)
    try:
        assert ts.n == 0
        assert triangle_total_blocked(spark, ts) == 0
        assert triangle_counts_blocked(spark, ts).count() == 0
    finally:
        ts.delete()


def test_self_loops_and_duplicates_ignored(spark):
    """Self loops and duplicate/reciprocal directed edges must not change
    counts (canonical distinct pairs)."""
    rows = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3), (3, 3)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    vertices = spark.createDataFrame([(i,) for i in (1, 2, 3)], "id long")
    ts = build_tri_store(spark, edges, n_blocks=2)
    try:
        got = collect_map(
            triangle_counts_blocked(spark, ts, vertices), "id", "triangles"
        )
        assert got == {1: 1, 2: 1, 3: 1}
        assert triangle_total_blocked(spark, ts) == 1
    finally:
        ts.delete()


def test_lcc_blocked_matches_flat(spark, small):
    from linkgraph.triangles import clustering_coefficients
    from linkgraph.triangles_csr import clustering_coefficients_blocked

    flat = {
        r["id"]: (r["deg"], r["triangles"], r["lcc"])
        for r in clustering_coefficients(
            spark, small.edges, small.vertices
        ).collect()
    }
    ts = build_tri_store(spark, small.edges, n_blocks=8)
    try:
        got = {
            r["id"]: (r["deg"], r["triangles"], r["lcc"])
            for r in clustering_coefficients_blocked(
                spark, ts, small.vertices
            ).collect()
        }
        assert got == flat
    finally:
        ts.delete()


def _flat_supports(spark, edges):
    """Oracle: per-edge triangle counts from the flat triangle listing."""
    from linkgraph.triangles import _canon_pairs, _triangles_of

    tris = _triangles_of(_canon_pairs(edges), persist=False)
    tedges = tris.select(
        F.explode(
            F.array(
                F.struct(F.least("a", "b").alias("u"),
                         F.greatest("a", "b").alias("v")),
                F.struct(F.least("a", "c").alias("u"),
                         F.greatest("a", "c").alias("v")),
                F.struct(F.least("b", "c").alias("u"),
                         F.greatest("b", "c").alias("v")),
            )
        ).alias("e")
    ).select("e.u", "e.v")
    return {
        (r["u"], r["v"]): r["s"]
        for r in tedges.groupBy("u", "v")
        .agg(F.count("*").alias("s")).collect()
    }


def test_edge_supports_blocked_matches_flat(spark, small):
    from linkgraph.triangles_csr import edge_supports_blocked

    want = _flat_supports(spark, small.edges)
    ts = build_tri_store(spark, small.edges, n_blocks=8)
    try:
        got = {
            (r["u"], r["v"]): r["support"]
            for r in edge_supports_blocked(spark, ts).collect()
        }
        assert got == want
    finally:
        ts.delete()


def test_edge_supports_blocked_powerlaw(spark):
    import networkx as nx

    from linkgraph.triangles_csr import edge_supports_blocked

    g = nx.barabasi_albert_graph(200, 4, seed=11)
    edges = spark.createDataFrame(
        [(int(u) * 131 + 3, int(v) * 131 + 3) for u, v in g.edges()],
        "src long, dst long",
    )
    want = _flat_supports(spark, edges)
    ts = build_tri_store(spark, edges, n_blocks=5)
    try:
        got = {
            (r["u"], r["v"]): r["support"]
            for r in edge_supports_blocked(spark, ts).collect()
        }
        assert got == want
        # sanity vs networkx total: sum of supports = 3 * n_triangles
        assert sum(got.values()) == 3 * (
            sum(nx.triangles(g).values()) // 3
        )
    finally:
        ts.delete()


def test_ktruss_blocked_matches_flat(spark, small):
    from linkgraph.triangles import ktruss
    from linkgraph.triangles_csr import ktruss_blocked

    for kwargs in ({"k": 3, "rounds": 2}, {"k": 3}, {"k": 4}):
        flat = {
            (r["u"], r["v"]): r["support"]
            for r in ktruss(spark, small.edges, **kwargs).collect()
        }
        got = {
            (r["u"], r["v"]): r["support"]
            for r in ktruss_blocked(
                spark, small.edges, n_blocks=6, **kwargs
            ).collect()
        }
        assert got == flat, kwargs
