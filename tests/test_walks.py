"""Deterministic hash-argmin random walks vs a pure-Python replay."""

import hashlib

from linkgraph.walks import random_walks


def _argmin_md5(walk_id, step, dsts, seed="w"):
    return min(
        dsts,
        key=lambda d: hashlib.md5(f"{seed}:{walk_id}:{step}:{d}".encode()).hexdigest(),
    )


def test_walks_match_python_replay(spark):
    out = {0: [1, 2], 1: [2, 3], 2: [0, 3], 3: [1]}
    edges = spark.createDataFrame(
        [(u, v) for u, vs in out.items() for v in vs], "src long, dst long"
    )
    starts = spark.createDataFrame([(0,), (2,)], "id long")
    got = {
        (r["walk_id"], r["step"]): r["vertex"]
        for r in random_walks(edges, starts, steps=3).collect()
    }
    for w in (0, 2):
        v = w
        assert got[(w, 0)] == v
        for s in (1, 2, 3):
            v = _argmin_md5(w, s, out[v])
            assert got[(w, s)] == v


def test_walks_truncate_at_dangling(spark):
    # 0 -> 1, 1 has no out-edges: steps 2+ emit nothing
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    starts = spark.createDataFrame([(0,)], "id long")
    rows = random_walks(edges, starts, steps=4).collect()
    assert {(r["step"], r["vertex"]) for r in rows} == {(0, 0), (1, 1)}


def test_skipgram_pairs_window(spark):
    from linkgraph.walks import skipgram_pairs

    walks = spark.createDataFrame(
        [(0, 0, 10), (0, 1, 11), (0, 2, 12), (0, 3, 13), (1, 0, 10), (1, 1, 12)],
        "walk_id long, step int, vertex long",
    )
    got = {(r["center"], r["context"]): r["n"] for r in skipgram_pairs(walks, 2).collect()}
    # walk 0: 10-11 (d1), 10-12 (d2), 11-12, 11-13, 12-13; walk 1: 10-12 (d1)
    assert got[(10, 11)] == 1 and got[(11, 10)] == 1
    assert got[(10, 12)] == 2  # once per walk
    assert (10, 13) not in got  # distance 3 > window
    assert sum(got.values()) == 2 * (5 + 1)  # symmetric pairs


def test_node2vec_walks_match_replica(spark):
    """Biased successor choice == the exact A-Res replica (return 1/p,
    neighbor-of-previous 1, else 1/q), walk for walk."""
    import hashlib
    import math
    import random

    from linkgraph.walks import node2vec_walks

    rng = random.Random(17)
    n = 30
    pairs = set()
    while len(pairs) < 110:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            pairs.add((u, v))
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
    P, Q, STEPS = 4.0, 0.5, 3

    def key(wid, s, d, w):
        h = int(
            hashlib.md5(f"n2v:{wid}:{s}:{d}".encode()).hexdigest()[:15], 16
        )
        return math.log((h + 1) / (2**60 + 1)) / w

    def walk_py(start):
        seq, prev, v = [start], -1, start
        for s in range(1, STEPS + 1):
            cands = adj.get(v)
            if not cands:
                break
            best = None
            for d in cands:
                if d == prev:
                    w = 1.0 / P
                elif prev in adj and d in adj[prev]:
                    w = 1.0
                else:
                    w = 1.0 / Q
                k = key(start, s, d, w)
                if best is None or k > best[0]:
                    best = (k, d)
            prev, v = v, best[1]
            seq.append(v)
        return seq

    edges = spark.createDataFrame(sorted(pairs), "src long, dst long")
    starts = spark.createDataFrame(
        [(i,) for i in range(0, n, 3)], "id long"
    )
    got = {}
    for r in node2vec_walks(
        edges, starts, steps=STEPS, p=P, q=Q
    ).collect():
        got.setdefault(r["walk_id"], {})[r["step"]] = r["vertex"]
    for s0 in range(0, n, 3):
        want = walk_py(s0)
        seq = [got[s0][i] for i in sorted(got[s0])]
        assert seq == want, (s0, seq, want)
