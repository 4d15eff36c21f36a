"""HITS == the spec's pure-Python replica exactly; == an independent
dense numpy power iteration at convergence."""

import math
import random


import pytest

from linkgraph.hits import hits, hits_oracle


def _random_digraph(seed: int, n: int, m: int):
    rng = random.Random(seed)
    edges = set()
    while len(edges) < m:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            edges.add((u, v))
    return sorted(edges)


@pytest.mark.parametrize("seed,n,m", [(11, 30, 80), (12, 50, 120)])
def test_hits_matches_reference_replica(spark, seed, n, m):
    e = _random_digraph(seed, n, m)
    edges = spark.createDataFrame(e, "src long, dst long")
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {
        r["id"]: (r["hub"], r["authority"])
        for r in hits(spark, edges, verts, iterations=8).collect()
    }
    want = hits_oracle(range(n), e, iterations=8)
    for v in want:
        assert math.isclose(got[v][0], want[v][0], rel_tol=1e-9, abs_tol=1e-12), v
        assert math.isclose(got[v][1], want[v][1], rel_tol=1e-9, abs_tol=1e-12), v


def test_hits_converges_to_dense_eigen_iteration(spark):
    """Independent check: the DataFrame fixpoint equals a dense numpy
    matrix power iteration (principal eigenvectors of A^T A / A A^T,
    L1-normalized). networkx's hits needs scipy (absent here); the dense
    formulation is the same textbook definition via a different code
    path."""
    import numpy as np

    n = 25
    e = _random_digraph(13, n, 70)
    A = np.zeros((n, n))
    for u, v in e:
        A[u, v] = 1.0
    h = np.full(n, 1.0 / n)
    for _ in range(200):
        a = A.T @ h
        s = a.sum()
        a = a / s if s > 0 else a
        h = A @ a
        s = h.sum()
        h = h / s if s > 0 else h
    edges = spark.createDataFrame(e, "src long, dst long")
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {
        r["id"]: (r["hub"], r["authority"])
        for r in hits(spark, edges, verts, iterations=60).collect()
    }
    for v in range(n):
        assert math.isclose(got[v][0], h[v], rel_tol=1e-5, abs_tol=1e-6), v
        assert math.isclose(got[v][1], a[v], rel_tol=1e-5, abs_tol=1e-6), v


def test_hits_dangling_rows(spark):
    # 0->1, 2 isolated: 2 has hub 0 and authority 0; mass sums to 1
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    verts = spark.createDataFrame([(i,) for i in range(3)], "id long")
    got = {r["id"]: r for r in hits(spark, edges, verts, iterations=4).collect()}
    assert got[2]["hub"] == 0.0 and got[2]["authority"] == 0.0
    assert math.isclose(sum(r["hub"] for r in got.values()), 1.0)
    assert math.isclose(sum(r["authority"] for r in got.values()), 1.0)


def test_katz_matches_python_replica(spark):
    """katz == beta + alpha*A^T x unrolled, on a random digraph, at a
    deeper iteration count than the oracle row exercises."""
    import random

    from linkgraph.hits import katz

    rng = random.Random(21)
    n = 30
    pairs = set()
    while len(pairs) < 90:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            pairs.add((u, v))
    edges = spark.createDataFrame(sorted(pairs), "src long, dst long")
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")

    alpha, beta, iters = 0.05, 1.0, 5
    x = {i: beta for i in range(n)}
    for _ in range(iters):
        nxt = {i: beta for i in range(n)}
        for u, v in pairs:
            nxt[v] += alpha * x[u]
        x = nxt

    got = {
        r["id"]: r["katz"]
        for r in katz(spark, edges, verts, iterations=iters).collect()
    }
    assert set(got) == set(x)
    for v in x:
        assert abs(got[v] - x[v]) < 1e-9, v


# ---------------------------------------------------------------- SALSA


def test_salsa_matches_replica(spark):
    from linkgraph.hits import salsa, salsa_oracle

    e = _random_digraph(21, 30, 90)
    edges = spark.createDataFrame(e, "src long, dst long")
    verts = spark.createDataFrame([(i,) for i in range(30)], "id long")
    got = {
        r["id"]: (r["hub"], r["authority"])
        for r in salsa(spark, edges, verts, iterations=3).collect()
    }
    want = salsa_oracle(range(30), e, iterations=3)
    for v in want:
        assert math.isclose(got[v][0], want[v][0], rel_tol=1e-9, abs_tol=1e-12), v
        assert math.isclose(got[v][1], want[v][1], rel_tol=1e-9, abs_tol=1e-12), v


def test_salsa_conserves_mass_and_is_stationary_on_indegree(spark):
    """Both SALSA updates are column-stochastic: authority and hub mass
    each sum to 1 every round. And on a graph whose authority-side walk
    is connected, the stationary authority is indeg(j)/|E| — run enough
    rounds and check convergence to that closed form (Lempel-Moran)."""
    from pyspark.sql import functions as F

    from linkgraph.hits import salsa

    # connected bipartite-ish support: hubs 0..4, authorities 10..13
    e = [(0, 10), (0, 11), (1, 11), (1, 12), (2, 12), (2, 13),
         (3, 13), (3, 10), (4, 10), (4, 12)]
    edges = spark.createDataFrame(e, "src long, dst long")
    verts = spark.createDataFrame(
        [(i,) for i in range(5)] + [(i,) for i in range(10, 14)], "id long"
    )
    out = salsa(spark, edges, verts, iterations=24)
    sums = out.agg(F.sum("hub"), F.sum("authority")).first()
    assert math.isclose(sums[0], 1.0, rel_tol=1e-9)
    assert math.isclose(sums[1], 1.0, rel_tol=1e-9)
    indeg = {}
    for _, v in e:
        indeg[v] = indeg.get(v, 0) + 1
    got = {r["id"]: r["authority"] for r in out.collect() if r["id"] >= 10}
    for j, d in indeg.items():
        assert math.isclose(got[j], d / len(e), rel_tol=1e-6), j
