"""k-core decomposition: fixpoint matches networkx.k_core and the pure-
Python peel replica; bounded-rounds prefix matches the replica round for
round (the shape the SQL oracle checks); no persisted frames leak."""

import random

import networkx as nx
import pytest

from linkgraph.kcore import kcore, kcore_oracle

from conftest import collect_map


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in pairs], "src long, dst long"
    )


def verts_df(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "id long")


def test_kcore_handcrafted(spark):
    # triangle {0,1,2} + tail 3-0 + pendant pair 4-5: 2-core is the triangle
    pairs = [(0, 1), (1, 2), (2, 0), (3, 0), (4, 5)]
    got = collect_map(
        kcore(spark, edges_df(spark, pairs), verts_df(spark, range(6)), k=2),
        "id",
        "core_deg",
    )
    assert got == {0: 2, 1: 2, 2: 2}


def test_kcore_vs_networkx(spark, tiny):
    g = tiny.nx_digraph_ids().to_undirected()
    g.remove_edges_from(nx.selfloop_edges(g))
    for k in (1, 2, 3):
        core = nx.k_core(g, k)
        got = collect_map(
            kcore(spark, tiny.edges, tiny.vertices, k=k), "id", "core_deg"
        )
        assert got == {v: d for v, d in core.degree()}


@pytest.mark.parametrize("seed", [7, 21, 42])
def test_kcore_random_fixpoint(spark, seed):
    rng = random.Random(seed)
    n = 40
    pairs = {(rng.randrange(n), rng.randrange(n)) for _ in range(120)}
    for k in (2, 3):
        want = kcore_oracle(range(n), pairs, k)
        got = collect_map(
            kcore(spark, edges_df(spark, pairs), verts_df(spark, range(n)), k=k),
            "id",
            "core_deg",
        )
        assert got == want, (seed, k)


def test_kcore_bounded_rounds(spark):
    rng = random.Random(11)
    n = 30
    pairs = {(rng.randrange(n), rng.randrange(n)) for _ in range(70)}
    for rounds in (1, 2, 3):
        want = kcore_oracle(range(n), pairs, 2, rounds=rounds)
        got = collect_map(
            kcore(
                spark,
                edges_df(spark, pairs),
                verts_df(spark, range(n)),
                k=2,
                rounds=rounds,
            ),
            "id",
            "core_deg",
        )
        assert got == want, rounds


def test_kcore_no_cache_leak(spark, tiny):
    """kcore unpersists its explicit cache (the symmetrized edge set) AND
    every superseded per-round checkpoint (pagerank's RDD-id-diff
    discipline) — at most the FINAL round's state may remain persisted
    after a call, deterministically, with no reliance on async GC."""
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    kcore(spark, tiny.edges, tiny.vertices, k=2).collect()
    after = len(spark.sparkContext._jsc.getPersistentRDDs())
    assert after <= before + 1
