"""Blocked weighted PageRank == flat pagerank_weighted."""

import pytest
from pyspark.sql import functions as F

from linkgraph.pagerank import pagerank_weighted
from linkgraph.pagerank_csr import build_blocked
from linkgraph.sssp import build_weight_store
from linkgraph.wpagerank_csr import wpagerank_blocked

from conftest import collect_map


def _wedges(small):
    return small.edges.select(
        "src", "dst",
        (F.pmod("src", F.lit(5)) + F.pmod("dst", F.lit(3)) + 1)
        .cast("double").alias("w"),
    )


def test_wpr_blocked_matches_flat(spark, small):
    wedges = _wedges(small)
    g = build_blocked(
        spark, wedges.select("src", "dst"), small.vertices.select("id"),
        n_blocks=8,
    )
    try:
        wpath = build_weight_store(
            spark, g, wedges, agg="sum", keep_self=True
        )
        for iters in (2, 5):
            flat = collect_map(
                pagerank_weighted(wedges, small.vertices, iters=iters),
                "id", "r",
            )
            blk = collect_map(
                wpagerank_blocked(
                    spark, g, wpath, wedges, max_iter=iters
                ).ranks,
                "id", "rank",
            )
            assert flat.keys() == blk.keys()
            for k in flat:
                assert abs(flat[k] - blk[k]) < 1e-12, k
    finally:
        g.delete()


def test_wpr_blocked_self_loop_and_parallel_edges(spark):
    rows = [
        (1, 1, 2.0),   # self-loop keeps rank
        (1, 2, 1.0),
        (1, 2, 3.0),   # parallel edges: weights add
        (2, 3, 1.0),
        # 3 dangling
    ]
    wedges = spark.createDataFrame(rows, "src long, dst long, w double")
    verts = spark.createDataFrame([(i,) for i in (1, 2, 3)], "id long")
    flat = collect_map(
        pagerank_weighted(wedges, verts, iters=4), "id", "r"
    )
    g = build_blocked(spark, wedges.select("src", "dst"), verts, n_blocks=2)
    try:
        wpath = build_weight_store(
            spark, g, wedges, agg="sum", keep_self=True
        )
        blk = collect_map(
            wpagerank_blocked(spark, g, wpath, wedges, max_iter=4).ranks,
            "id", "rank",
        )
        assert flat.keys() == blk.keys()
        for k in flat:
            assert abs(flat[k] - blk[k]) < 1e-14, k
        # mass conserved
        assert abs(sum(blk.values()) - 1.0) < 1e-12
    finally:
        g.delete()


def test_wpr_zero_strength_vertex_is_dangling_both_paths(spark):
    """A vertex whose outgoing weights sum to 0 must be treated as
    dangling (mass redistributed), not leak its mass via a NULL division
    — and flat and blocked must agree (code-review regression test)."""
    rows = [
        (1, 2, 0.0),   # vertex 1: all-zero out-strength -> dangling
        (2, 3, 1.0),
        (3, 2, 1.0),
    ]
    wedges = spark.createDataFrame(rows, "src long, dst long, w double")
    verts = spark.createDataFrame([(i,) for i in (1, 2, 3)], "id long")
    flat = collect_map(
        pagerank_weighted(wedges, verts, iters=4), "id", "r"
    )
    assert abs(sum(flat.values()) - 1.0) < 1e-12  # mass conserved
    g = build_blocked(spark, wedges.select("src", "dst"), verts, n_blocks=2)
    try:
        wpath = build_weight_store(
            spark, g, wedges, agg="sum", keep_self=True
        )
        blk = collect_map(
            wpagerank_blocked(spark, g, wpath, wedges, max_iter=4).ranks,
            "id", "rank",
        )
        for k in flat:
            assert abs(flat[k] - blk[k]) < 1e-14, k
    finally:
        g.delete()


def test_weight_store_sidecar_validation(spark, small, tmp_path):
    """Round-4 ADVICE: a named weight store records agg/keep_self/graph
    token in _wmeta.json; reuse with different parameters (or a store
    missing the sidecar, or weighted PageRank fed a min-collapsed store)
    raises instead of silently corrupting results."""
    import json as _json
    import os

    wedges = _wedges(small)
    g = build_blocked(
        spark, wedges.select("src", "dst"), small.vertices.select("id"),
        n_blocks=4,
    )
    try:
        wpath = str(tmp_path / "wstore")
        built = build_weight_store(spark, g, wedges, wpath=wpath)  # min
        assert built == wpath
        assert _json.load(open(f"{wpath}/_wmeta.json")) == {
            "agg": "min", "keep_self": False, "token": g.build_token}
        # same params: reused without rebuild
        assert build_weight_store(spark, g, wedges, wpath=wpath) == wpath
        # different params over the same path: refuse
        with pytest.raises(ValueError, match="built with"):
            build_weight_store(
                spark, g, wedges, agg="sum", keep_self=True, wpath=wpath
            )
        # weighted PageRank over a min store: refuse
        with pytest.raises(ValueError, match="weighted\\s+PageRank needs"):
            wpagerank_blocked(spark, g, wpath, wedges, max_iter=1)
        # sidecar missing (pre-check store): refuse rather than trust
        os.remove(f"{wpath}/_wmeta.json")
        with pytest.raises(ValueError, match="no _wmeta.json"):
            build_weight_store(spark, g, wedges, wpath=wpath)
        with pytest.raises(ValueError, match="no _wmeta.json"):
            wpagerank_blocked(spark, g, wpath, wedges, max_iter=1)
    finally:
        g.delete()
