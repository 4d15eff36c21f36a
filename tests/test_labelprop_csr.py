"""Blocked-CSR label propagation == flat join+agg path, bit for bit."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.graph import undirected_edges
from linkgraph.labelprop import label_propagation
from linkgraph.labelprop_csr import id_ranks, label_propagation_blocked
from linkgraph.pagerank_csr import build_blocked

from conftest import collect_map


@pytest.fixture(scope="module")
def blocked_und(spark, small, tmp_path_factory):
    """Store built from the DISTINCT symmetric closure — modal counts are
    wrong under duplicate edges, so undirected_edges (not symmetrize)."""
    store = str(tmp_path_factory.mktemp("blocks_und"))
    return build_blocked(
        spark, undirected_edges(small.edges), small.vertices.select("id"),
        n_blocks=8, store_path=store,
    )


@pytest.mark.parametrize("iterations", [1, 3])
def test_blocked_lp_equals_flat(spark, small, blocked_und, iterations):
    flat = collect_map(
        label_propagation(spark, small.edges, small.vertices, iterations),
        "id", "label",
    )
    blk = collect_map(
        label_propagation_blocked(spark, blocked_und, iterations),
        "id", "label",
    )
    assert flat == blk


def test_blocked_lp_stats_and_resume_files(spark, small, blocked_und):
    stats = {}
    out = label_propagation_blocked(spark, blocked_und, 2, stats=stats)
    assert out.count() == small.vertices.count()
    assert stats["steps"] == 2 and len(stats["step_secs"]) == 2
    assert len(stats["changed"]) == 2 and stats["changed"][0] > 0


def test_blocked_lp_powerlaw_random(spark, tmp_path):
    """Random power-law-ish multigraph input: dedup/self-loop handling and
    hub segments (qsort path in the kernel) vs the flat path."""
    rng = np.random.default_rng(31)
    n = 400
    # skewed: vertex 0..9 are hubs
    src = np.where(rng.random(4000) < 0.3, rng.integers(0, 10, 4000),
                   rng.integers(0, n, 4000))
    dst = rng.integers(0, n, 4000)
    edges = spark.createDataFrame(
        [(int(s), int(d)) for s, d in zip(src, dst)], "src long, dst long"
    )
    verts = spark.range(n).select(F.col("id"))
    flat = collect_map(
        label_propagation(spark, edges, verts, 3), "id", "label"
    )
    g = build_blocked(
        spark, undirected_edges(edges), verts, n_blocks=4,
        store_path=str(tmp_path / "plaw"),
    )
    blk = collect_map(label_propagation_blocked(spark, g, 3), "id", "label")
    assert flat == blk
    g.delete()


def test_id_ranks_dense_and_order_preserving(spark):
    ids = [7, -3, 1000, 0, -900000000000, 42]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = collect_map(id_ranks(df, num_partitions=3), "id", "rank")
    want = {v: r for r, v in enumerate(sorted(ids))}
    assert got == want


def test_modal_vote_native_matches_numpy_fallback(monkeypatch):
    from linkgraph import native

    rng = np.random.default_rng(5)
    dsize, n = 2000, 60_000
    dl = rng.integers(0, dsize, n).astype(np.int32)
    lab = rng.integers(0, 50, n).astype(np.float64)
    base = np.arange(dsize, dtype=np.float64) + 10_000
    a_native = base.copy()
    native.modal_vote(dl, lab, a_native)
    monkeypatch.setenv("LINKGRAPH_NATIVE", "0")
    a_numpy = base.copy()
    native.modal_vote(dl, lab, a_numpy)
    assert (a_native == a_numpy).all()
    # untouched (no-vote) destinations keep their previous label
    hit = np.zeros(dsize, dtype=bool)
    hit[dl] = True
    assert (a_native[~hit] == base[~hit]).all()


def test_blocked_lp_run_dir_resume(spark, small, blocked_und, tmp_path):
    """A killed run handed the same run_dir resumes after its last
    completed superstep and ends bit-identical to an uninterrupted run."""
    want = collect_map(
        label_propagation_blocked(spark, blocked_und, 5), "id", "label"
    )
    rdir = str(tmp_path / "lp-run")
    stats1 = {}
    label_propagation_blocked(
        spark, blocked_und, 2, stats=stats1, run_dir=rdir
    ).count()
    stats2 = {}
    got = collect_map(
        label_propagation_blocked(
            spark, blocked_und, 5, stats=stats2, run_dir=rdir
        ),
        "id", "label",
    )
    assert got == want
    # the first two supersteps were resumed, not re-run
    assert stats2["step_secs"][:2] == [0.0, 0.0]
    assert stats2["changed"] == stats1["changed"] + stats2["changed"][2:]
    assert stats2["steps"] == 5


def test_blocked_lp_resume_recomputes_unmarked_step(
    spark, small, blocked_und, tmp_path
):
    """Crash between the step's block writes and its marker: the marker
    prefix stops earlier, the partial/complete step dir is recomputed
    (atomic same-bytes rewrites), and the final labels are unchanged."""
    import os

    want = collect_map(
        label_propagation_blocked(spark, blocked_und, 4), "id", "label"
    )
    rdir = str(tmp_path / "lp-crash")
    label_propagation_blocked(
        spark, blocked_und, 3, run_dir=rdir
    ).count()
    os.remove(f"{rdir}/part/g2.npy")  # simulate pre-marker crash
    got = collect_map(
        label_propagation_blocked(spark, blocked_und, 4, run_dir=rdir),
        "id", "label",
    )
    assert got == want


def test_blocked_lp_resume_past_iterations_raises(
    spark, small, blocked_und, tmp_path
):
    rdir = str(tmp_path / "lp-over")
    label_propagation_blocked(spark, blocked_und, 3, run_dir=rdir).count()
    with pytest.raises(ValueError):
        label_propagation_blocked(spark, blocked_und, 2, run_dir=rdir)
