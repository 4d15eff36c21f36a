"""Per-host JIT-compiled scatter-add kernel for the blocked-CSR superstep.

The blocked PageRank inner loop is ``acc[dl[i]] += rs[sl[i]]`` over the
edges of one (src_block, dst_block) pair — a gather/scatter between two
L2-resident vectors. numpy can only express it via ``np.bincount`` with a
materialized weights temp, which costs ~5 allocations and ~60B of memory
traffic per edge; measured on 32 cores that saturates DRAM long before CPU
(round-1 scaling efficiency 0.22-0.29). The C loop below touches exactly
the edge words (4-8B/edge, streamed) plus two cache-resident vectors, so
throughput scales with cores: measured 395M edges/s/core (split int32) and
667M edges/s/core (packed u32) vs ~63M for the numpy formulation.

Compilation model — the same pattern as Spark's own whole-stage codegen,
done host-side for the Python workers: the C source is embedded here,
compiled ONCE per host into a shared object cached under a directory keyed
by the MD5 of the source (``$LINKGRAPH_NATIVE_DIR``, default tmpfs/tmp),
with an atomic rename so racing executors are idempotent. Every worker
process dlopens the cached .so. On hosts with no C compiler — or with
``LINKGRAPH_NATIVE=0`` — everything transparently falls back to a chunked
numpy path (L2-sized bincount chunks; same results to float64 round-off,
pinned by tests/test_native.py).

Sum order is identical between the C kernels and an unchunked
``np.bincount``: both accumulate in edge order, so the native path is
bit-compatible with the historical kernel; the chunked numpy fallback
differs only in partial-sum association (<=1e-12 relative).
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile

import numpy as np

log = logging.getLogger(__name__)

_C_SRC = r"""
#include <stdint.h>

/* packed edge word: (src_local << 16) | dst_local; both blocks <= 65536 */
void scatter_pack16(const uint32_t *e, int64_t n, const double *rs,
                    double *acc) {
    for (int64_t i = 0; i < n; i++) {
        uint32_t w = e[i];
        acc[w & 0xffffu] += rs[w >> 16];
    }
}

/* wide blocks: separate int32 locals */
void scatter32(const int32_t *sl, const int32_t *dl, int64_t n,
               const double *rs, double *acc) {
    for (int64_t i = 0; i < n; i++) acc[dl[i]] += rs[sl[i]];
}

/* min-combiner variants: label propagation / connected components */
void scatter_min_pack16(const uint32_t *e, int64_t n, const double *rs,
                        double *acc) {
    for (int64_t i = 0; i < n; i++) {
        uint32_t w = e[i];
        double v = rs[w >> 16];
        if (v < acc[w & 0xffffu]) acc[w & 0xffffu] = v;
    }
}

void scatter_min32(const int32_t *sl, const int32_t *dl, int64_t n,
                   const double *rs, double *acc) {
    for (int64_t i = 0; i < n; i++) {
        double v = rs[sl[i]];
        if (v < acc[dl[i]]) acc[dl[i]] = v;
    }
}
"""

_CHUNK = 1 << 18  # numpy fallback: 256k-edge chunks keep temps ~L2-sized

_lib = None
_lib_failed = False


def _cache_dir() -> str:
    env = os.environ.get("LINKGRAPH_NATIVE_DIR")
    if env:
        return env
    # per-uid, mode-0700 cache dir: a world-writable shared path would let
    # another local user pre-plant kern_<md5>.so for every worker to
    # dlopen (round-2 ADVICE, medium)
    uid = os.getuid()
    if os.path.isdir("/dev/shm"):
        return f"/dev/shm/linkgraph-native-{uid}"
    return os.path.join(tempfile.gettempdir(), f"linkgraph-native-{uid}")


def _dir_is_trusted(d: str) -> bool:
    """True iff ``d`` is owned by the current uid and not group/world
    writable — the precondition for dlopening a cached .so from it."""
    try:
        st = os.stat(d)
    except OSError:
        return False
    return st.st_uid == os.getuid() and not (st.st_mode & 0o022)


def _compile() -> "ctypes.CDLL | None":
    """Compile (or reuse) the kernel .so for this host; None on failure."""
    src_hash = hashlib.md5(_C_SRC.encode()).hexdigest()[:16]
    d = _cache_dir()
    if os.path.isdir(d) and not _dir_is_trusted(d):
        log.warning(
            "native kernel cache dir %s is not owned-by-uid/0700-safe; "
            "refusing to load cached .so — numpy fallback", d,
        )
        return None
    so_path = os.path.join(d, f"kern_{src_hash}.so")
    if not os.path.exists(so_path):
        try:
            os.makedirs(d, mode=0o700, exist_ok=True)
            if not _dir_is_trusted(d):
                log.warning(
                    "native kernel cache dir %s untrusted after mkdir; "
                    "numpy fallback", d,
                )
                return None
            c_path = os.path.join(d, f"kern_{src_hash}.c")
            with open(f"{c_path}.{os.getpid()}", "w") as f:
                f.write(_C_SRC)
            os.replace(f"{c_path}.{os.getpid()}", c_path)
            tmp_so = f"{so_path}.{os.getpid()}.tmp"
            subprocess.run(
                ["cc", "-O3", "-march=native", "-shared", "-fPIC",
                 c_path, "-o", tmp_so],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp_so, so_path)  # atomic; racing compilers idempotent
        except Exception as exc:  # no cc, read-only fs, ...
            log.warning(
                "native kernel compile failed (%s); using numpy fallback", exc
            )
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError as exc:
        log.warning("native kernel dlopen failed (%s); numpy fallback", exc)
        return None
    lib.scatter_pack16.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    lib.scatter32.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    lib.scatter_min_pack16.argtypes = lib.scatter_pack16.argtypes
    lib.scatter_min32.argtypes = lib.scatter32.argtypes
    return lib


def get_lib() -> "ctypes.CDLL | None":
    """Worker-global kernel library; None => use numpy fallback."""
    global _lib, _lib_failed
    if os.environ.get("LINKGRAPH_NATIVE", "1") == "0":
        return None
    if _lib is None and not _lib_failed:
        _lib = _compile()
        _lib_failed = _lib is None
    return _lib


def _as_f64_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def scatter_add_pack16(e: np.ndarray, rs: np.ndarray, acc: np.ndarray) -> None:
    """acc[e & 0xffff] += rs[e >> 16] for packed-u32 edge words ``e``.

    ``e`` may be a read-only memmap; ``rs``/``acc`` are float64 and must be
    C-contiguous. Accumulates in edge order (native) or chunked (fallback).
    """
    lib = get_lib()
    if lib is not None:
        e = np.ascontiguousarray(e, dtype=np.uint32)
        lib.scatter_pack16(
            e.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            ctypes.c_int64(len(e)), _as_f64_ptr(rs), _as_f64_ptr(acc),
        )
        return
    dsize = len(acc)
    for off in range(0, len(e), _CHUNK):
        w = np.asarray(e[off:off + _CHUNK])
        acc += np.bincount(
            (w & np.uint32(0xFFFF)).astype(np.int64),
            weights=rs[(w >> np.uint32(16)).astype(np.int64)],
            minlength=dsize,
        )


def scatter_add32(
    sl: np.ndarray, dl: np.ndarray, rs: np.ndarray, acc: np.ndarray
) -> None:
    """acc[dl[i]] += rs[sl[i]] for int32 locals (wide blocks)."""
    lib = get_lib()
    if lib is not None:
        sl = np.ascontiguousarray(sl, dtype=np.int32)
        dl = np.ascontiguousarray(dl, dtype=np.int32)
        lib.scatter32(
            sl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            dl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int64(len(sl)), _as_f64_ptr(rs), _as_f64_ptr(acc),
        )
        return
    dsize = len(acc)
    for off in range(0, len(sl), _CHUNK):
        s = np.asarray(sl[off:off + _CHUNK]).astype(np.int64, copy=False)
        d = np.asarray(dl[off:off + _CHUNK]).astype(np.int64, copy=False)
        acc += np.bincount(d, weights=rs[s], minlength=dsize)


def scatter_min_pack16(e: np.ndarray, rs: np.ndarray, acc: np.ndarray) -> None:
    """acc[e & 0xffff] = min(acc[...], rs[e >> 16]) — min-combiner for
    label propagation / connected components over the packed layout."""
    lib = get_lib()
    if lib is not None:
        e = np.ascontiguousarray(e, dtype=np.uint32)
        lib.scatter_min_pack16(
            e.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            ctypes.c_int64(len(e)), _as_f64_ptr(rs), _as_f64_ptr(acc),
        )
        return
    for off in range(0, len(e), _CHUNK):
        w = np.asarray(e[off:off + _CHUNK])
        np.minimum.at(
            acc,
            (w & np.uint32(0xFFFF)).astype(np.int64),
            rs[(w >> np.uint32(16)).astype(np.int64)],
        )


def scatter_min32(
    sl: np.ndarray, dl: np.ndarray, rs: np.ndarray, acc: np.ndarray
) -> None:
    """acc[dl[i]] = min(acc[dl[i]], rs[sl[i]]) for int32 locals."""
    lib = get_lib()
    if lib is not None:
        sl = np.ascontiguousarray(sl, dtype=np.int32)
        dl = np.ascontiguousarray(dl, dtype=np.int32)
        lib.scatter_min32(
            sl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            dl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int64(len(sl)), _as_f64_ptr(rs), _as_f64_ptr(acc),
        )
        return
    for off in range(0, len(sl), _CHUNK):
        s = np.asarray(sl[off:off + _CHUNK]).astype(np.int64, copy=False)
        d = np.asarray(dl[off:off + _CHUNK]).astype(np.int64, copy=False)
        np.minimum.at(acc, d, rs[s])
