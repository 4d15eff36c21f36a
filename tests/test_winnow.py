"""Winnowing fingerprints (Schleimer/Wilkerson/Aiken SIGMOD'03) vs a
pure-Python replica: exact selection equality (min-per-window, rightmost
tie), the k+w-1 shared-run detection guarantee, and the MOSS pair step."""

import hashlib
import random

import pytest

from linkgraph.dedup import winnow_fingerprints, winnow_pairs

K, W = 4, 5


def winnow_py(tokens, k=K, w=W):
    """The paper's algorithm, literally: every window of w k-gram hashes
    selects its min, ties to the rightmost position; selections dedup."""
    if len(tokens) < k:
        return set()
    grams = [" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)]
    hs = [hashlib.md5(g.encode()).hexdigest()[:15] for g in grams]
    out = set()
    for i in range(0, max(len(hs) - w, 0) + 1):
        window = hs[i:i + w]
        mn = min(window)
        j = max(p for p, h in enumerate(window, start=i) if h == mn)
        out.add((j, mn))
    return out


WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


@pytest.fixture(scope="module")
def fixture_docs(spark):
    rng = random.Random(7)
    rows = []
    for d in range(30):
        n = rng.choice([0, 2, K - 1, K, K + 1, W + K - 2, 20, 60])
        toks = [rng.choice(WORDS) for _ in range(n)]  # tiny alphabet: ties
        rows.append((d, " ".join(toks), toks))
    df = spark.createDataFrame(
        [(d, t) for d, t, _ in rows], "doc_id long, text string"
    )
    return df, {d: toks for d, _, toks in rows}


def test_matches_python_replica(spark, fixture_docs):
    df, toks_by_id = fixture_docs
    got = {}
    for r in winnow_fingerprints(df, k=K, w=W).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    want = {d: winnow_py(t) for d, t in toks_by_id.items() if len(t) >= K}
    want = {d: s for d, s in want.items() if s}
    assert got == want


def test_shared_run_guarantee(spark):
    """Any shared run of k+w-1 tokens => >=1 shared fingerprint, at ANY
    offset (the winnowing detection floor)."""
    run = ["q%d" % i for i in range(K + W - 1)]
    a = ["left%d" % i for i in range(9)] + run + ["tail%d" % i for i in range(5)]
    b = ["other%d" % i for i in range(3)] + run + ["post%d" % i for i in range(11)]
    df = spark.createDataFrame(
        [(0, " ".join(a)), (1, " ".join(b))], "doc_id long, text string"
    )
    sel = winnow_fingerprints(df, k=K, w=W).collect()
    fps = {}
    for r in sel:
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[0] & fps[1]
    pairs = winnow_pairs(df, k=K, w=W, min_shared=1).collect()
    assert [(p["doc_a"], p["doc_b"]) for p in pairs] == [(0, 1)]


def test_fp_cap_drops_boilerplate(spark):
    """A fingerprint selected in every doc is dropped at fp_cap < n_docs,
    so no pair survives on boilerplate alone."""
    boiler = ["same%d" % i for i in range(K + W - 1)]
    rows = [
        (d, " ".join(["u%d_%d" % (d, i) for i in range(6)] + boiler))
        for d in range(6)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert winnow_pairs(df, k=K, w=W, min_shared=1, fp_cap=3).count() == 0
    assert winnow_pairs(df, k=K, w=W, min_shared=1, fp_cap=10).count() == 15
