"""Seed-bounded two-round SimRank vs a literal python replica of
Jeh & Widom's recurrence (S0 = I, two synchronous updates)."""

import random

from pyspark.sql import functions as F

from linkgraph.simrank import simrank2_topk

C, K = 0.8, 10


def simrank2_py(n, edges, c=C):
    inn = {v: set() for v in range(n)}
    for u, v in edges:
        if u != v:
            inn[v].add(u)

    def step(prev):
        s = {}
        for a in range(n):
            for b in range(n):
                if a == b:
                    s[(a, b)] = 1.0
                elif inn[a] and inn[b]:
                    tot = sum(
                        prev[(i, j)] for i in inn[a] for j in inn[b]
                    )
                    s[(a, b)] = c * tot / (len(inn[a]) * len(inn[b]))
                else:
                    s[(a, b)] = 0.0
        return s

    s0 = {(a, b): 1.0 if a == b else 0.0 for a in range(n) for b in range(n)}
    return step(step(s0))


def test_simrank2_matches_replica(spark):
    rng = random.Random(31)
    n = 25
    pairs = set()
    while len(pairs) < 80:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            pairs.add((u, v))
    edges = spark.createDataFrame(sorted(pairs), "src long, dst long")
    seed_ids = [0, 7, 13]
    seeds = spark.createDataFrame([(i,) for i in seed_ids], "id long")

    got = {
        (r["q"], r["v"]): (r["s2_6"], r["rk"])
        for r in simrank2_topk(spark, edges, seeds, c=C, k=K).collect()
    }

    s2 = simrank2_py(n, pairs)
    want = {}
    for q in seed_ids:
        scored = [
            (round(s2[(q, v)], 6), v)
            for v in range(n)
            if v != q and round(s2[(q, v)], 6) > 0
        ]
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rk, (s, v) in enumerate(scored[:K], start=1):
            want[(q, v)] = (s, rk)
    assert got == want


def test_simrank2_empty_inset_is_zero(spark):
    """A seed with no in-edges has similarity 0 to everything (the
    definition's empty-in-set clause) — no rows emitted."""
    edges = spark.createDataFrame([(0, 1), (2, 1)], "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "id long")
    assert simrank2_topk(spark, edges, seeds).count() == 0
