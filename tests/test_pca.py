"""PCA ops vs numpy: covariance exact, power iteration replica-exact and
eigh-convergent, projection exact."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.pca import pca_cov, pca_power, pca_project

DIM, N = 8, 60


@pytest.fixture(scope="module")
def xmat():
    rng = np.random.default_rng(5)
    # anisotropic so the top eigenvector is well separated
    base = rng.normal(size=(N, DIM))
    base[:, 0] *= 4.0
    base[:, 1] *= 2.0
    return np.round(base, 4).astype(np.float64)


@pytest.fixture(scope="module")
def embs(spark, xmat):
    rows = [(i, [float(v) for v in xmat[i]]) for i in range(N)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(4)


def _np_cov(x):
    # match the engine's f32 storage: what Spark reads back is f32-rounded
    xf = x.astype(np.float32).astype(np.float64)
    return np.cov(xf.T, bias=True), xf


def test_cov_matches_numpy(spark, embs, xmat):
    want, _ = _np_cov(xmat)
    got = {(r["i"], r["j"]): r["cov"]
           for r in pca_cov(embs, dim=DIM).collect()}
    assert len(got) == DIM * (DIM + 1) // 2
    for (i, j), c in got.items():
        assert i <= j
        assert c == pytest.approx(want[i, j], rel=1e-9, abs=1e-12), (i, j)


def test_power_matches_replica_and_eigh(spark, embs, xmat):
    cov_np, _ = _np_cov(xmat)
    v = np.full(DIM, 1.0 / np.sqrt(DIM))
    for _ in range(3):
        w = cov_np @ v
        v = w / np.linalg.norm(w)
    cov = pca_cov(embs, dim=DIM)
    got = np.zeros(DIM)
    for r in pca_power(cov, DIM, rounds=3).collect():
        got[r["i"]] = r["v"]
    assert np.allclose(got, v, rtol=1e-8, atol=1e-10)
    # more rounds converge to the true top eigenvector (up to sign)
    got12 = np.zeros(DIM)
    for r in pca_power(cov, DIM, rounds=12).collect():
        got12[r["i"]] = r["v"]
    evals, evecs = np.linalg.eigh(cov_np)
    top = evecs[:, -1]
    assert abs(float(got12 @ top)) > 0.9999


def test_project_is_exact_dot_product(spark, embs, xmat):
    _, xf = _np_cov(xmat)
    cov = pca_cov(embs, dim=DIM)
    comp = pca_power(cov, DIM, rounds=3)
    vnp = np.zeros(DIM)
    for r in comp.collect():
        vnp[r["i"]] = r["v"]
    got = {r["vec_id"]: r["proj"]
           for r in pca_project(embs, comp).collect()}
    want = xf @ vnp
    for i in range(N):
        assert got[i] == pytest.approx(want[i], rel=1e-9, abs=1e-12)
