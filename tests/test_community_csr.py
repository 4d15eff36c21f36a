"""Blocked-CSR Louvain local moves == flat join+agg path, bit for bit."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.community import louvain_communities
from linkgraph.community_csr import louvain_blocked
from linkgraph.graph import undirected_edges
from linkgraph.pagerank_csr import build_blocked

from conftest import collect_map


@pytest.fixture(scope="module")
def blocked_und(spark, small, tmp_path_factory):
    """Store built from the DISTINCT symmetric closure — k_{i,c} counts
    are wrong under duplicate edges (labelprop_csr's rule)."""
    store = str(tmp_path_factory.mktemp("blocks_louv"))
    return build_blocked(
        spark, undirected_edges(small.edges), small.vertices.select("id"),
        n_blocks=8, store_path=store,
    )


@pytest.mark.parametrize("rounds", [1, 3])
def test_blocked_louvain_equals_flat(spark, small, blocked_und, rounds):
    flat = collect_map(
        louvain_communities(
            spark, small.edges, small.vertices, rounds=rounds
        ),
        "id", "label",
    )
    blk = collect_map(
        louvain_blocked(spark, blocked_und, rounds=rounds), "id", "label"
    )
    assert flat == blk


def test_blocked_louvain_powerlaw_random(spark, tmp_path):
    """Random power-law-ish multigraph: dedup/self-loop normalization,
    hub segments (the kernel's qsort pair path) vs the flat path."""
    rng = np.random.default_rng(47)
    n = 400
    src = np.where(rng.random(4000) < 0.3, rng.integers(0, 10, 4000),
                   rng.integers(0, n, 4000))
    dst = rng.integers(0, n, 4000)
    edges = spark.createDataFrame(
        [(int(s), int(d)) for s, d in zip(src, dst)], "src long, dst long"
    )
    verts = spark.range(n).select(F.col("id"))
    flat = collect_map(
        louvain_communities(spark, edges, verts, rounds=3), "id", "label"
    )
    g = build_blocked(
        spark, undirected_edges(edges), verts, n_blocks=4,
        store_path=str(tmp_path / "plaw"),
    )
    blk = collect_map(louvain_blocked(spark, g, rounds=3), "id", "label")
    assert flat == blk
    g.delete()


def test_blocked_louvain_stats(spark, small, blocked_und):
    stats = {}
    out = louvain_blocked(spark, blocked_und, rounds=2, stats=stats)
    assert out.count() == small.vertices.count()
    assert stats["steps"] == 2 and len(stats["step_secs"]) == 2
    assert len(stats["changed"]) == 2 and stats["changed"][0] > 0


def test_blocked_louvain_run_dir_resume(spark, small, blocked_und,
                                        tmp_path):
    """A killed run handed the same run_dir resumes after its last
    completed round and ends bit-identical to an uninterrupted run."""
    want = collect_map(
        louvain_blocked(spark, blocked_und, rounds=4), "id", "label"
    )
    rdir = str(tmp_path / "louv-run")
    stats1 = {}
    louvain_blocked(
        spark, blocked_und, rounds=2, stats=stats1, run_dir=rdir
    ).count()
    stats2 = {}
    got = collect_map(
        louvain_blocked(
            spark, blocked_und, rounds=4, stats=stats2, run_dir=rdir
        ),
        "id", "label",
    )
    assert got == want
    assert stats2["step_secs"][:2] == [0.0, 0.0]
    assert stats2["changed"] == stats1["changed"] + stats2["changed"][2:]


def test_blocked_louvain_resume_recomputes_unmarked_round(
    spark, small, blocked_und, tmp_path
):
    import os

    want = collect_map(
        louvain_blocked(spark, blocked_und, rounds=3), "id", "label"
    )
    rdir = str(tmp_path / "louv-crash")
    louvain_blocked(spark, blocked_und, rounds=3, run_dir=rdir).count()
    os.remove(f"{rdir}/part/g2.npy")  # simulate pre-marker crash
    got = collect_map(
        louvain_blocked(spark, blocked_und, rounds=3, run_dir=rdir),
        "id", "label",
    )
    assert got == want


def test_louvain_vote_native_matches_numpy_fallback(monkeypatch):
    from linkgraph import native

    rng = np.random.default_rng(11)
    dsize, n, n_lab = 1500, 50_000, 60
    dl = rng.integers(0, dsize, n).astype(np.int32)
    lab = rng.integers(0, n_lab, n).astype(np.float64)
    tot = rng.integers(1, 500, n_lab).astype(np.float64)
    totv = tot[lab.astype(np.int64)]
    kdeg = rng.integers(0, 40, dsize).astype(np.float64)
    old = rng.integers(0, n_lab, dsize).astype(np.float64)
    totown = tot[old.astype(np.int64)]
    two_m = 2.0 * 12345.0
    a_native = old.copy()
    native.louvain_vote(dl, lab, totv, kdeg, old, totown, two_m, a_native)
    monkeypatch.setenv("LINKGRAPH_NATIVE", "0")
    a_numpy = old.copy()
    native.louvain_vote(dl, lab, totv, kdeg, old, totown, two_m, a_numpy)
    assert (a_native == a_numpy).all()
    # voteless destinations keep their previous label
    hit = np.zeros(dsize, dtype=bool)
    hit[dl] = True
    assert (a_native[~hit] == old[~hit]).all()
