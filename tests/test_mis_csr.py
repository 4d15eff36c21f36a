"""Blocked-CSR Luby MIS == flat join+agg path, state for state."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.graph import undirected_edges
from linkgraph.mis import maximal_independent_set
from linkgraph.mis_csr import mis_blocked, priority_ranks
from linkgraph.pagerank_csr import build_blocked

from conftest import collect_map


@pytest.fixture(scope="module")
def blocked_und(spark, small, tmp_path_factory):
    store = str(tmp_path_factory.mktemp("blocks_mis"))
    return build_blocked(
        spark, undirected_edges(small.edges), small.vertices.select("id"),
        n_blocks=8, store_path=store,
    )


@pytest.mark.parametrize("rounds", [1, 2])
def test_blocked_mis_bounded_equals_flat(spark, small, blocked_und,
                                         rounds):
    flat = collect_map(
        maximal_independent_set(
            spark, small.edges, small.vertices, rounds=rounds
        ),
        "id", "state",
    )
    blk = collect_map(
        mis_blocked(spark, blocked_und, rounds=rounds), "id", "state"
    )
    assert flat == blk


def test_blocked_mis_fixpoint_equals_flat_and_is_maximal(
    spark, small, blocked_und
):
    flat = collect_map(
        maximal_independent_set(spark, small.edges, small.vertices),
        "id", "state",
    )
    stats = {}
    blk_df = mis_blocked(spark, blocked_und, stats=stats)
    blk = collect_map(blk_df, "id", "state")
    assert flat == blk
    assert "und" not in set(blk.values())  # fixpoint: no partial state
    assert stats["undecided"][-1] == 0
    # independence: no stored edge joins two 'in' vertices
    members = blk_df.where(F.col("state") == "in").select("id")
    sym = undirected_edges(small.edges)
    both = (
        sym.join(members.select(F.col("id").alias("src")), "src")
        .join(members.select(F.col("id").alias("dst")), "dst")
    )
    assert both.count() == 0
    # maximality: every 'out' vertex has an 'in' neighbor
    outs = blk_df.where(F.col("state") == "out").select("id")
    covered = (
        sym.join(members.select(F.col("id").alias("src")), "src")
        .select(F.col("dst").alias("id"))
        .distinct()
    )
    assert outs.join(covered, "id", "left_anti").count() == 0


def test_blocked_mis_powerlaw_random(spark, tmp_path):
    rng = np.random.default_rng(61)
    n = 300
    src = np.where(rng.random(3000) < 0.3, rng.integers(0, 10, 3000),
                   rng.integers(0, n, 3000))
    dst = rng.integers(0, n, 3000)
    edges = spark.createDataFrame(
        [(int(s), int(d)) for s, d in zip(src, dst)], "src long, dst long"
    )
    verts = spark.range(n).select(F.col("id"))
    flat = collect_map(
        maximal_independent_set(spark, edges, verts), "id", "state"
    )
    g = build_blocked(
        spark, undirected_edges(edges), verts, n_blocks=4,
        store_path=str(tmp_path / "plaw"),
    )
    blk = collect_map(mis_blocked(spark, g), "id", "state")
    assert flat == blk
    g.delete()


def test_priority_ranks_match_string_order(spark):
    ids = [7, -3, 1000, 0, -900000000000, 42, 999999999]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = collect_map(priority_ranks(df, num_partitions=3), "id", "rank")
    import hashlib

    pri = {i: f"{hashlib.md5(str(i).encode()).hexdigest()}-{i}"
           for i in ids}
    want = {i: r for r, i in
            enumerate(sorted(ids, key=lambda i: pri[i]))}
    assert got == want
