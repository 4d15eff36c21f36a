"""Similarity search vs a numpy oracle (exact top-k; LSH recall on its
own bucket)."""

import numpy as np
import pytest

from linkgraph import simsearch


def _vecs(n=40, dim=16, seed=7):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, dim)).astype(np.float32)


@pytest.fixture(scope="module")
def embs_df(spark):
    v = _vecs()
    rows = [(i, v[i].tolist()) for i in range(len(v))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _oracle_topk(v, qid, k):
    q = v[qid].astype(np.float64)
    sims = []
    for i in range(len(v)):
        if i == qid:
            continue
        c = v[i].astype(np.float64)
        cos = float(q @ c / (np.linalg.norm(q) * np.linalg.norm(c)))
        sims.append((round(cos, 6), i))
    sims.sort(key=lambda t: (-t[0], t[1]))
    return sims[:k]


def test_topk_bruteforce_matches_numpy(spark, embs_df):
    v = _vecs()
    q = simsearch.queries_from(embs_df, 10)
    got = {}
    for r in simsearch.topk_bruteforce(embs_df, q, k=5).collect():
        got.setdefault(r["query_id"], []).append((r["cos"], r["neighbor_id"]))
    for qid in range(0, len(v), 10):
        want = _oracle_topk(v, qid, 5)
        have = sorted(got[qid], key=lambda t: (-t[0], t[1]))
        assert [i for _, i in have] == [i for _, i in want], qid
        for (gc, _), (wc, _) in zip(have, want):
            assert gc == pytest.approx(wc, abs=2e-6)


def test_lsh_topk_subset_of_bucket(spark, embs_df):
    v = _vecs()
    dims = (0, 1, 2, 3)
    q = simsearch.queries_from(embs_df, 10)
    got = simsearch.topk_lsh(embs_df, q, k=5, dims=dims).collect()
    def bucket(x):
        return "".join("1" if x[d] >= 0 else "0" for d in dims)
    for r in got:
        assert bucket(v[r["query_id"]]) == bucket(v[r["neighbor_id"]])


def test_bucket_histogram(spark, embs_df):
    v = _vecs()
    dims = (0, 1)
    got = {
        r["bucket"]: r["n_vecs"]
        for r in simsearch.bucket_histogram(embs_df, dims=dims).collect()
    }
    want = {}
    for x in v:
        b = "".join("1" if x[d] >= 0 else "0" for d in dims)
        want[b] = want.get(b, 0) + 1
    assert got == want
    assert sum(got.values()) == len(v)


def test_ivf_subset_of_bruteforce_and_recall(spark, embs_df):
    """IVF results are drawn from the probed cells only; with generous
    nprobe the top-k must converge to the exact bruteforce answer."""
    from linkgraph import simsearch

    qs = simsearch.queries_from(embs_df, 7)
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in simsearch.topk_bruteforce(embs_df, qs, k=3).collect()
    }
    cents = simsearch.centroids_from(embs_df, 5)
    n_cells = cents.count()
    full = {
        (r["query_id"], r["neighbor_id"])
        for r in simsearch.topk_ivf(
            embs_df, qs, k=3, centroid_modulus=5, nprobe=n_cells
        ).collect()
    }
    assert full == bf  # probing every cell == exact
    few = simsearch.topk_ivf(embs_df, qs, k=3, centroid_modulus=5, nprobe=1)
    assert 0 < few.count() <= len(bf)


def test_label_centroids(spark):
    from linkgraph.simsearch import label_centroids

    rows = [
        (0, [1.0, 0.0, 3.0], 1),
        (1, [3.0, 2.0, 1.0], 1),
        (2, [-1.0, -1.0, -1.0], 2),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {r["label"]: r for r in label_centroids(df, dim=3).collect()}
    assert got[1]["n"] == 2 and got[1]["centroid"] == [2.0, 1.0, 2.0]
    assert got[2]["n"] == 1 and got[2]["centroid"] == [-1.0, -1.0, -1.0]


def test_quantize_int8_roundtrip_properties(spark):
    """q in [-127,127]; amax dim hits exactly +/-127; reconstruction
    error bounded by scale/2 per dim; zero vector -> scale 0, q = 0."""
    import numpy as np

    from linkgraph.simsearch import quantize_int8

    rng = np.random.default_rng(5)
    vecs = [rng.standard_normal(16).astype("float32") for _ in range(20)]
    vecs.append(np.zeros(16, dtype="float32"))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    for i, v in enumerate(vecs):
        x = v.astype("float64")
        amax = float(np.abs(x).max())
        r = rows[i]
        if amax == 0.0:
            assert r["scale9"] == 0.0 and r["q_sum"] == 0 and r["sse9"] == 0.0
            continue
        scale = amax / 127.0
        q = np.round(x / scale)
        assert np.abs(q).max() == 127
        assert r["q_sum"] == int(q.sum())
        assert r["q_abs_sum"] == int(np.abs(q).sum())
        sse = float(((x - q * scale) ** 2).sum())
        assert abs(r["sse9"] - round(sse, 9)) < 1e-8
        assert sse <= 16 * (scale / 2) ** 2 + 1e-12


def test_kmeans_lloyd_matches_replica_and_descends(spark):
    """kmeans_lloyd == a numpy Lloyd replica (same deterministic init,
    argmin ties to smallest cid); total SSE is non-increasing across
    rounds (Lloyd's monotonicity)."""
    import numpy as np

    from linkgraph.simsearch import kmeans_lloyd

    rng = np.random.default_rng(3)
    base = rng.standard_normal((4, 8))
    vecs = np.vstack([
        base[i % 4] + 0.1 * rng.standard_normal(8) for i in range(48)
    ]).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(48)],
        "vec_id long, embedding array<float>",
    )

    def replica(rounds):
        x = vecs.astype("float64")
        cents = {i: x[i].copy() for i in range(0, 48, 12)}  # id%12==0
        for _ in range(rounds + 1):  # rounds M-steps + final E-step
            assign = {}
            for i in range(48):
                best = min(
                    (float(((x[i] - c) ** 2).sum()), cid)
                    for cid, c in cents.items()
                )
                assign[i] = best
            if _ == rounds:
                return assign, cents
            new = {}
            for cid in cents:
                members = [x[i] for i in range(48) if assign[i][1] == cid]
                if members:
                    new[cid] = np.mean(members, axis=0)
            cents = new

    sse = []
    for rounds in (0, 1, 2):
        a, _ = kmeans_lloyd(df, init_modulus=12, rounds=rounds)
        rows = {r["vec_id"]: (r["dist"], r["cid"]) for r in a.collect()}
        want, _ = replica(rounds)
        assert set(rows) == set(want)
        for i in rows:
            assert rows[i][1] == want[i][1], i
            assert abs(rows[i][0] - want[i][0]) < 1e-9
        sse.append(sum(d for d, _ in rows.values()))
    assert sse[1] <= sse[0] + 1e-9 and sse[2] <= sse[1] + 1e-9
