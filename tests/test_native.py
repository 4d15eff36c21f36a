"""Native scatter-add kernel == numpy fallback == reference bincount."""

import numpy as np
import pytest

from linkgraph import native


@pytest.fixture(autouse=True)
def reset_lib_state():
    yield
    native._lib = None
    native._lib_failed = False


def _ref(sl, dl, rs, dsize):
    return np.bincount(
        dl.astype(np.int64), weights=rs[sl.astype(np.int64)], minlength=dsize
    )


def test_native_compiles_here():
    # this sandbox has cc; the kernel must actually be the native one
    assert native.get_lib() is not None


@pytest.mark.parametrize("force_fallback", [False, True])
def test_pack16_matches_reference(force_fallback, monkeypatch):
    if force_fallback:
        monkeypatch.setenv("LINKGRAPH_NATIVE", "0")
    rng = np.random.default_rng(1)
    dsize, ssize, n = 5000, 3000, 200_000
    sl = rng.integers(0, ssize, n).astype(np.uint32)
    dl = rng.integers(0, dsize, n).astype(np.uint32)
    e = (sl << np.uint32(16)) | dl
    rs = rng.random(ssize)
    acc = np.zeros(dsize)
    native.scatter_add_pack16(e, rs, acc)
    ref = _ref(sl, dl, rs, dsize)
    np.testing.assert_allclose(acc, ref, rtol=1e-12)


@pytest.mark.parametrize("force_fallback", [False, True])
def test_scatter32_matches_reference(force_fallback, monkeypatch):
    if force_fallback:
        monkeypatch.setenv("LINKGRAPH_NATIVE", "0")
    rng = np.random.default_rng(2)
    dsize, ssize, n = 300_000, 200_000, 500_000
    sl = rng.integers(0, ssize, n).astype(np.int32)
    dl = rng.integers(0, dsize, n).astype(np.int32)
    rs = rng.random(ssize)
    acc = np.zeros(dsize)
    native.scatter_add32(sl, dl, rs, acc)
    ref = _ref(sl, dl, rs, dsize)
    np.testing.assert_allclose(acc, ref, rtol=1e-12)


def test_native_is_bit_identical_to_unchunked_bincount():
    # native accumulates in edge order — exactly np.bincount's order, so
    # the native path is bit-compatible with the historical kernel
    rng = np.random.default_rng(3)
    dsize, n = 1000, 50_000
    sl = rng.integers(0, dsize, n).astype(np.uint32)
    dl = rng.integers(0, dsize, n).astype(np.uint32)
    e = (sl << np.uint32(16)) | dl
    rs = rng.random(dsize)
    acc = np.zeros(dsize)
    native.scatter_add_pack16(e, rs, acc)
    if native.get_lib() is not None:
        assert (acc == _ref(sl, dl, rs, dsize)).all()


def test_accumulates_into_existing_acc():
    rng = np.random.default_rng(4)
    sl = rng.integers(0, 100, 1000).astype(np.int32)
    dl = rng.integers(0, 100, 1000).astype(np.int32)
    rs = rng.random(100)
    acc = np.full(100, 7.0)
    native.scatter_add32(sl, dl, rs, acc)
    np.testing.assert_allclose(acc, 7.0 + _ref(sl, dl, rs, 100), rtol=1e-12)


@pytest.mark.parametrize("force_fallback", [False, True])
def test_scatter_addw32_matches_reference(force_fallback, monkeypatch):
    if force_fallback:
        monkeypatch.setenv("LINKGRAPH_NATIVE", "0")
    rng = np.random.default_rng(11)
    dsize, ssize, n = 4000, 3000, 150_000
    sl = rng.integers(0, ssize, n).astype(np.int32)
    dl = rng.integers(0, dsize, n).astype(np.int32)
    w = rng.random(n)
    rs = rng.random(ssize)
    acc = np.zeros(dsize)
    native.scatter_addw32(sl, dl, w, rs, acc)
    ref = np.bincount(
        dl.astype(np.int64),
        weights=rs[sl.astype(np.int64)] * w,
        minlength=dsize,
    )
    np.testing.assert_allclose(acc, ref, rtol=1e-12)


@pytest.mark.parametrize("force_fallback", [False, True])
def test_scatter_minw32_matches_reference(force_fallback, monkeypatch):
    if force_fallback:
        monkeypatch.setenv("LINKGRAPH_NATIVE", "0")
    rng = np.random.default_rng(12)
    dsize, ssize, n = 4000, 3000, 150_000
    sl = rng.integers(0, ssize, n).astype(np.int32)
    dl = rng.integers(0, dsize, n).astype(np.int32)
    w = rng.random(n)
    rs = rng.random(ssize)
    acc = np.full(dsize, np.inf)
    native.scatter_minw32(sl, dl, w, rs, acc)
    ref = np.full(dsize, np.inf)
    np.minimum.at(
        ref, dl.astype(np.int64), rs[sl.astype(np.int64)] + w
    )
    assert (acc == ref).all()  # min is order-free: exact equality
