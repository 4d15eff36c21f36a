"""Blocked-CSR personalized PageRank == flat personalized path."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.pagerank import pagerank
from linkgraph.pagerank_csr import build_blocked
from linkgraph.ppr_csr import ppr_blocked

from conftest import collect_map


@pytest.fixture(scope="module")
def blocked(spark, small, tmp_path_factory):
    store = str(tmp_path_factory.mktemp("blocks_ppr"))
    return build_blocked(
        spark, small.edges, small.vertices.select("id"),
        n_blocks=8, store_path=store,
    )


def _seeds(small, mod=7):
    return small.vertices.select("id").where(F.pmod("id", F.lit(mod)) == 0)


def test_ppr_blocked_matches_flat_fixed_steps(spark, small, blocked):
    seeds = _seeds(small)
    flat = collect_map(
        pagerank(
            spark, small.edges, small.vertices, tol=0.0, max_iter=3,
            seeds=seeds,
        ).ranks,
        "id", "rank",
    )
    blk = collect_map(
        ppr_blocked(spark, blocked, seeds, tol=0.0, max_iter=3).ranks,
        "id", "rank",
    )
    assert flat.keys() == blk.keys()
    for k in flat:
        assert abs(flat[k] - blk[k]) < 1e-12, k


def test_ppr_blocked_deep_run_matches_flat(spark, small, blocked):
    # 30 fixed supersteps: any semantic drift (teleport vector, dangling
    # redistribution, scaling order) compounds and must stay within float
    # round-off of the flat path
    seeds = _seeds(small, mod=11)
    rf = pagerank(
        spark, small.edges, small.vertices, tol=0.0, max_iter=30,
        seeds=seeds,
    )
    rb = ppr_blocked(spark, blocked, seeds, tol=0.0, max_iter=30)
    flat = collect_map(rf.ranks, "id", "rank")
    blk = collect_map(rb.ranks, "id", "rank")
    for k in flat:
        assert abs(flat[k] - blk[k]) < 1e-12, k
    # probability mass is conserved (teleport + dangling both land on seeds)
    assert abs(sum(blk.values()) - 1.0) < 1e-9


def test_ppr_blocked_mass_concentrates_on_seed_neighborhood(
    spark, small, blocked
):
    # a single-seed restart walk must give the seed itself the top rank
    # among vertices with no in-links from the seed's neighborhood tail
    seed_id = small.vertices.select("id").orderBy("id").limit(1)
    blk = collect_map(
        ppr_blocked(spark, blocked, seed_id, tol=1e-10, max_iter=100).ranks,
        "id", "rank",
    )
    sid = seed_id.collect()[0]["id"]
    assert blk[sid] == max(blk.values())


def test_ppr_blocked_empty_seeds_raises(spark, small, blocked):
    with pytest.raises(ValueError):
        ppr_blocked(
            spark, blocked,
            small.vertices.select("id").where(F.lit(False)),
        )


def test_ppr_blocked_matches_python_oracle(spark, small, blocked):
    # same pure-Python personalization replica the flat tests use
    # (networkx personalization semantics; nx itself needs scipy, absent)
    from oracles import ppr_oracle

    g = small.nx_digraph_ids()
    seed_ids = sorted(i for i in g.nodes if i % 7 == 0)
    assert seed_ids
    want = ppr_oracle(g.nodes, g.edges, seed_ids, tol=1e-12)
    seeds = spark.createDataFrame([(i,) for i in seed_ids], "id long")
    res = ppr_blocked(spark, blocked, seeds, tol=1e-10, max_iter=300)
    assert res.converged
    blk = collect_map(res.ranks, "id", "rank")
    assert set(blk) == set(want)
    for k, v in want.items():
        assert abs(blk[k] - v) < 1e-6, k


def test_ppr_blocked_resume_bit_identical(spark, small, blocked, tmp_path):
    seeds = _seeds(small)
    rdir = str(tmp_path / "ppr_run")
    # uninterrupted 8-step reference (fresh run dir)
    ref = collect_map(
        ppr_blocked(
            spark, blocked, seeds, tol=0.0, max_iter=8,
            run_dir=str(tmp_path / "ppr_ref"),
        ).ranks,
        "id", "rank",
    )
    # killed-after-3 run + resume to 8 in the same dir
    r1 = ppr_blocked(
        spark, blocked, seeds, tol=0.0, max_iter=3, run_dir=rdir
    )
    assert r1.iterations == 3
    r2 = ppr_blocked(
        spark, blocked, seeds, tol=0.0, max_iter=8, run_dir=rdir
    )
    assert r2.iterations == 8
    # resumed steps re-enter the history with seconds=0.0
    assert [s.seconds for s in r2.supersteps[:3]] == [0.0, 0.0, 0.0]
    got = collect_map(r2.ranks, "id", "rank")
    assert got == ref  # bit-identical, not just allclose


def test_ppr_resume_with_different_seeds_raises(spark, small, tmp_path):
    """Round-4 ADVICE: the run_dir pins the seed set at prep; resuming
    with a different seed set must fail loudly, not return ranks
    personalized on the old seeds."""
    from linkgraph.pagerank_csr import build_blocked
    from linkgraph.ppr_csr import ppr_blocked

    g = build_blocked(
        spark, small.edges, small.vertices.select("id"), n_blocks=4
    )
    try:
        seeds_a = small.vertices.select("id").where(F.col("id") % 7 == 0)
        seeds_b = small.vertices.select("id").where(F.col("id") % 5 == 0)
        rdir = str(tmp_path / "ppr-seeds")
        ppr_blocked(spark, g, seeds_a, tol=0.0, max_iter=1, run_dir=rdir)
        import pytest as _pytest

        with _pytest.raises(ValueError, match="different seed set"):
            ppr_blocked(spark, g, seeds_b, tol=0.0, max_iter=2,
                        run_dir=rdir)
        # the SAME seed set resumes fine
        res = ppr_blocked(spark, g, seeds_a, tol=0.0, max_iter=2,
                          run_dir=rdir)
        assert res.ranks.count() == small.vertices.count()
    finally:
        g.delete()
