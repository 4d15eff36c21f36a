"""Weighted SSSP: flat Bellman-Ford vs networkx, blocked vs flat."""

import pytest
from pyspark.sql import functions as F

from linkgraph.pagerank_csr import build_blocked
from linkgraph.sssp import build_weight_store, sssp_blocked, sssp_distances

from conftest import collect_map


def _wedges(small):
    # deterministic POSITIVE weights (bundle ids may be negative: pmod)
    return small.edges.select(
        "src", "dst",
        (
            (F.pmod("src", F.lit(97)) + F.pmod("dst", F.lit(89)) + 1)
            .cast("double") / 10.0
        ).alias("w"),
    )


def _seeds(small, mod=7):
    return small.vertices.select("id").where(F.pmod("id", F.lit(mod)) == 0)


def test_sssp_flat_matches_networkx(spark, small):
    import networkx as nx

    wedges = _wedges(small)
    seeds = _seeds(small)
    seed_ids = {r["id"] for r in seeds.collect()}
    g = nx.DiGraph()
    g.add_nodes_from(small.id_of_url.values())
    for r in wedges.collect():
        w = r["w"]
        if r["src"] == r["dst"]:
            continue
        if g.has_edge(r["src"], r["dst"]):
            w = min(w, g[r["src"]][r["dst"]]["weight"])
        g.add_edge(r["src"], r["dst"], weight=w)

    for hops in (1, 3):
        got = collect_map(
            sssp_distances(spark, wedges, seeds, max_hops=hops), "id", "dist"
        )
        # reference: min over seeds of the cheapest path using <= hops edges
        want = {}
        for s in seed_ids:
            # single_source_dijkstra with cutoff counts WEIGHT, not hops —
            # do a bounded Bellman-Ford by hand instead
            dist = {s: 0.0}
            for _ in range(hops):
                nxt = dict(dist)
                for u, d in dist.items():
                    for _, v, data in g.out_edges(u, data=True):
                        nd = d + data["weight"]
                        if nd < nxt.get(v, float("inf")):
                            nxt[v] = nd
                dist = nxt
            for v, d in dist.items():
                if d < want.get(v, float("inf")):
                    want[v] = d
        assert got.keys() == want.keys()
        for k in want:
            assert abs(got[k] - want[k]) < 1e-9, k


def test_sssp_seed_distance_zero_and_monotone(spark, small):
    wedges = _wedges(small)
    seeds = _seeds(small)
    got = collect_map(
        sssp_distances(spark, wedges, seeds, max_hops=2), "id", "dist"
    )
    for r in seeds.collect():
        assert got[r["id"]] == 0.0
    assert all(v >= 0.0 for v in got.values())


def test_sssp_blocked_matches_flat(spark, small):
    wedges = _wedges(small)
    seeds = _seeds(small)
    g = build_blocked(
        spark, small.edges, small.vertices.select("id"), n_blocks=8
    )
    try:
        wpath = build_weight_store(spark, g, wedges)
        for hops in (1, 3):
            flat = collect_map(
                sssp_distances(spark, wedges, seeds, max_hops=hops),
                "id", "dist",
            )
            blk = collect_map(
                sssp_blocked(spark, g, wpath, seeds, max_hops=hops),
                "id", "dist",
            )
            assert flat.keys() == blk.keys()
            for k in flat:
                assert abs(flat[k] - blk[k]) < 1e-12, k
    finally:
        g.delete()


def test_sssp_blocked_parallel_edges_min_collapse(spark):
    rows = [(1, 2, 5.0), (1, 2, 1.0), (2, 3, 2.0), (3, 3, 0.5)]
    edges = spark.createDataFrame(rows, "src long, dst long, w double")
    verts = spark.createDataFrame([(i,) for i in (1, 2, 3)], "id long")
    seeds = spark.createDataFrame([(1,)], "id long")
    flat = collect_map(
        sssp_distances(spark, edges, seeds, max_hops=3), "id", "dist"
    )
    assert flat == {1: 0.0, 2: 1.0, 3: 3.0}  # self-loop dropped, min kept
    g = build_blocked(spark, edges.select("src", "dst"), verts, n_blocks=2)
    try:
        wpath = build_weight_store(spark, g, edges)
        blk = collect_map(
            sssp_blocked(spark, g, wpath, seeds, max_hops=3), "id", "dist"
        )
        assert blk == flat
    finally:
        g.delete()


def test_sssp_voronoi_matches_reference(spark, small):
    from linkgraph.sssp import sssp_voronoi

    wedges = _wedges(small)
    seeds = _seeds(small)
    seed_ids = sorted(r["id"] for r in seeds.collect())
    # reference: bounded per-seed Bellman-Ford, then (dist, seed) lexmin
    g = {}
    for r in wedges.collect():
        if r["src"] == r["dst"]:
            continue
        key = (r["src"], r["dst"])
        g[key] = min(g.get(key, float("inf")), r["w"])
    adj = {}
    for (u, v), w in g.items():
        adj.setdefault(u, []).append((v, w))
    want = {}
    for s in seed_ids:
        dist = {s: 0.0}
        for _ in range(3):
            nxt = dict(dist)
            for u, d in dist.items():
                for v, w in adj.get(u, []):
                    if d + w < nxt.get(v, float("inf")):
                        nxt[v] = d + w
            dist = nxt
        for v, d in dist.items():
            cur = want.get(v)
            if cur is None or (d, s) < cur:
                want[v] = (d, s)
    got = {
        r["id"]: (r["dist"], r["seed"])
        for r in sssp_voronoi(spark, wedges, seeds, max_hops=3).collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][1] == want[k][1], k           # owner exact
        assert abs(got[k][0] - want[k][0]) < 1e-9   # distance


def test_sssp_voronoi_seeds_own_themselves(spark, small):
    from linkgraph.sssp import sssp_voronoi

    wedges = _wedges(small)
    seeds = _seeds(small)
    got = {
        r["id"]: r["seed"]
        for r in sssp_voronoi(spark, wedges, seeds, max_hops=2).collect()
    }
    for r in seeds.collect():
        assert got[r["id"]] == r["id"]


def test_sssp_voronoi_blocked_matches_flat(spark, small):
    from linkgraph.sssp import sssp_voronoi, sssp_voronoi_blocked

    wedges = _wedges(small)
    seeds = _seeds(small)
    g = build_blocked(
        spark, small.edges, small.vertices.select("id"), n_blocks=8
    )
    try:
        wpath = build_weight_store(spark, g, wedges)
        for hops in (1, 3):
            flat = {
                r["id"]: (r["seed"], r["dist"])
                for r in sssp_voronoi(
                    spark, wedges, seeds, max_hops=hops
                ).collect()
            }
            blk = {
                r["id"]: (r["seed"], r["dist"])
                for r in sssp_voronoi_blocked(
                    spark, g, wpath, seeds, max_hops=hops
                ).collect()
            }
            assert flat.keys() == blk.keys()
            for k in flat:
                assert flat[k][0] == blk[k][0], k  # owner exact
                assert abs(flat[k][1] - blk[k][1]) < 1e-12, k
    finally:
        g.delete()
