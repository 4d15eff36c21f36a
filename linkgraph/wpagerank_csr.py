"""Weighted PageRank on the blocked-CSR store — weight-aligned supersteps.

The scale-path twin of ``linkgraph.pagerank.pagerank_weighted``: rank
flows in proportion to edge weight (link multiplicity, anchor counts,
link-quality priors), contrib = r(src) * w / strength(src) with
strength = sum of outgoing weights and dangling = zero out-strength.

Rides the SAME weight-aligned edge store as ``linkgraph.sssp``
(``build_weight_store``: per-(db: sb, sl) clustering + an aligned float64
cost array, decoded once per host to mmap'd sidecars). The pre-scaled
rank file per block is ``s = r * inv_strength`` — exactly the plain
blocked path's ``r * inv_od`` generalized — so a superstep gathers
``sum_edges s[sl] * w`` per destination through the native
``scatter_addw32`` kernel (one C loop per (db, sb) segment; chunked
``np.bincount`` fallback): a fused gather-multiply-scatter-add, no
Python loop over edges, zero shuffle,
O(B) scalar driver rows per superstep. Scaling shape is the measured
scatter-add gate's (BENCH/BASELINE.md: PageRank gate, median 1.06).

Dual-engine row ``graph_wpagerank2_blocked`` replays the SAME unrolled
SQL as the flat weighted path.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .checkpoint import StepTimer
from . import native
from .lineage import truncate_plan
from .pagerank import PageRankResult, SuperstepInfo
from .pagerank_csr import BlockedGraph, _ranks_root, _write_npy_atomic
from .sssp import _load_wblock


def wpagerank_blocked(
    spark,
    g: BlockedGraph,
    wpath: str,
    wedges: DataFrame | None = None,
    damping: float = 0.85,
    tol: float = 0.0,
    max_iter: int = 2,
    keep_steps: int = 2,
    stats: dict | None = None,
) -> PageRankResult:
    """-> PageRankResult over the weighted graph in ``wpath`` (a
    ``build_weight_store`` directory for ``g``'s vertex mapping, built
    with ``agg="sum"``/``keep_self=True`` — the store's ``_wmeta.json``
    sidecar is validated here, raising on mismatch or absence).

    Per-vertex out-strengths are derived FROM THE STORE (one JVM-side
    aggregation over its (sb, sl, w) rows), so the superstep edge data
    and the strengths can never disagree — round-4 ADVICE: deriving
    strengths from a separately-passed ``wedges`` frame let an
    inconsistent (wedges, wpath) pair silently leak or double-count rank
    mass. ``wedges`` is accepted for caller compatibility but unused.
    Strength equivalence vs the flat ``pagerank_weighted`` (which sums
    the raw wedges): agg="sum" collapses parallel (src, dst) rows first,
    so with parallel edges the float64 summation ASSOCIATION differs —
    exact when weights sum exactly (integer-valued, or wedges already
    per-(src,dst) collapsed, both true of every engine fixture), last-bit
    otherwise; the oracle rows round to 9 decimals either way.

    ``stats``, if given, is filled with ``step_secs`` (wall seconds per
    superstep job — every superstep streams ALL stored weighted edges, so
    per-step wall IS throughput), ``steps``, and ``final_dir``/``run_dir``
    (final rank vectors for the scaling bench's cross-level checksum;
    per-block vectors are a pure function of step inputs, hence
    bit-identical across cluster sizes)."""
    n, n_blocks, token = g.n, g.n_blocks, g.build_token
    mpath = f"{wpath}/_wmeta.json"
    if not os.path.exists(mpath):
        raise ValueError(
            f"weight store {wpath} has no _wmeta.json sidecar — rebuild "
            "it with build_weight_store(agg='sum', keep_self=True)"
        )
    with open(mpath) as f:
        wmeta = json.load(f)
    want = {"agg": "sum", "keep_self": True, "token": token}
    if wmeta != want:
        raise ValueError(
            f"weight store {wpath} was built with {wmeta}, but weighted "
            f"PageRank needs {want} (rank mass leaks or double-counts "
            "otherwise)"
        )
    rdir = f"{_ranks_root(g)}/wpr-{uuid.uuid4().hex[:12]}"
    os.makedirs(rdir, exist_ok=True)

    # per-block out-strength arrays in local order (block_meta's od
    # pattern, weighted), summed from the STORE's own rows: strength of
    # (block=sb, local=sl) = sum of w over its stored out-edges. NO
    # self-loop filter: pagerank_weighted keeps them (rank may flow to
    # self) — guaranteed present by the sidecar check above. O(V) total
    # but O(V/B) per task; vertices with no out-edges get 0 (dangling).
    # basePath + explicit db=* glob: the store dir also holds the decoded
    # .npy sidecar cache, which plain recursive parquet discovery trips on
    s = (
        spark.read.schema("sb int, sl int, dl int, w double, db int")
        .option("basePath", wpath)
        .parquet(f"{wpath}/db=*")
        .groupBy(F.col("sb").alias("block"), F.col("sl").alias("local"))
        .agg(F.sum("w").alias("strength"))
    )
    per_block = (
        g.vmap.withColumn("block", F.col("block").cast("int"))
        .withColumn("local", F.col("local").cast("int"))
        .join(s, ["block", "local"], "left")
        .groupBy("block")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("local").cast("int").alias("l"),
                            F.coalesce("strength", F.lit(0.0)).alias("v"),
                        )
                    )
                ),
                lambda x: x["v"],
            ).alias("sv"),
        )
    )

    def prep_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        for d in ("step0", "dangling", "static"):
            os.makedirs(f"{rdir}/{d}", exist_ok=True)
        out = []
        for b, sv in zip(pdf["block"], pdf["sv"]):
            b = int(b)
            sv_arr = np.asarray(sv, dtype=np.float64)
            with np.errstate(divide="ignore"):
                inv = np.where(sv_arr > 0, 1.0 / sv_arr, 0.0)
            _write_npy_atomic(f"{rdir}/static/inv{b}.npy", inv)
            dang = np.flatnonzero(sv_arr <= 0)
            _write_npy_atomic(f"{rdir}/dangling/b{b}.npy", dang)
            r0 = np.full(len(sv_arr), 1.0 / n)
            _write_npy_atomic(f"{rdir}/step0/b{b}.npy", r0)
            _write_npy_atomic(f"{rdir}/step0/s{b}.npy", r0 * inv)
            out.append((b, float(len(dang)) / n))
        return pd.DataFrame(out, columns=["block", "dm"])

    dangling = float(
        per_block.groupBy("block")
        .applyInPandas(prep_kernel, "block int, dm double")
        .agg(F.sum("dm"))
        .collect()[0][0]
        or 0.0
    )

    work = truncate_plan(
        g.block_meta.select(
            F.col("block").alias("db"), F.col("size").alias("dsize")
        ).repartitionByRange(g.n_blocks, "db")
    )

    supersteps: list[SuperstepInfo] = []
    converged = False
    import time as _time

    step_secs: list[float] = []
    for step in range(max_iter):
        t_step = _time.perf_counter()
        with StepTimer() as t:
            base = (1.0 - damping) / n + damping * dangling / n
            cur, nxt = f"{rdir}/step{step}", f"{rdir}/step{step + 1}"

            def make_step_fn(_cur, _nxt, _base):
                def step_fn(batches):
                    dfs = [b for b in batches if len(b)]
                    if not dfs:
                        return
                    pdf = pd.concat(dfs, ignore_index=True)
                    rows = []
                    rs_cache: dict = {}
                    for db, dsize in zip(pdf["db"], pdf["dsize"]):
                        db, dsize = int(db), int(dsize)
                        acc = np.zeros(dsize)
                        offs, sl, dl, w = _load_wblock(
                            wpath, token, db, n_blocks
                        )
                        for sb in np.flatnonzero(np.diff(offs)):
                            a, b_ = int(offs[sb]), int(offs[sb + 1])
                            rs = rs_cache.get(sb)
                            if rs is None:
                                rs = np.load(
                                    f"{_cur}/s{sb}.npy", mmap_mode="r"
                                )
                                rs_cache[sb] = rs
                            # fused gather-multiply-scatter-add (native
                            # kernel; chunked-numpy fallback inside)
                            native.scatter_addw32(
                                sl[a:b_], dl[a:b_], w[a:b_], rs, acc
                            )
                        new = _base + damping * acc
                        old = np.load(f"{_cur}/b{db}.npy", mmap_mode="r")
                        l1 = float(np.abs(new - old).sum())
                        dang = np.load(
                            f"{rdir}/dangling/b{db}.npy", mmap_mode="r"
                        )
                        dm = float(new[dang].sum()) if len(dang) else 0.0
                        inv = np.load(
                            f"{rdir}/static/inv{db}.npy", mmap_mode="r"
                        )
                        os.makedirs(_nxt, exist_ok=True)
                        _write_npy_atomic(f"{_nxt}/b{db}.npy", new)
                        _write_npy_atomic(f"{_nxt}/s{db}.npy", new * inv)
                        rows.append((db, l1, dm))
                    yield pd.DataFrame(rows, columns=["block", "l1", "dm"])

                return step_fn

            row = (
                work.mapInPandas(
                    make_step_fn(cur, nxt, base),
                    "block int, l1 double, dm double",
                )
                .agg(F.sum("l1").alias("l1"), F.sum("dm").alias("dm"))
                .collect()[0]
            )
            delta, next_dangling = float(row["l1"]), float(row["dm"])
            stale = step - keep_steps + 1
            if stale >= 0:
                shutil.rmtree(f"{rdir}/step{stale}", ignore_errors=True)
        step_secs.append(_time.perf_counter() - t_step)
        supersteps.append(SuperstepInfo(step, delta, dangling, t.seconds))
        dangling = next_dangling
        if tol > 0 and delta < tol:
            converged = True
            break

    last = f"{rdir}/step{len(supersteps)}"
    if stats is not None:
        stats["step_secs"] = [round(s, 3) for s in step_secs]
        stats["steps"] = len(supersteps)
        stats["final_dir"] = last
        stats["run_dir"] = rdir

    def read_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for b in pdf["block"]:
            b = int(b)
            out.append((b, np.load(f"{last}/b{b}.npy")))
        return pd.DataFrame(out, columns=["block", "rv"])

    flat = (
        g.block_meta.groupBy("block")
        .applyInPandas(read_kernel, "block int, rv array<double>")
        .select("block", F.posexplode("rv").alias("local", "rank"))
        .join(g.vmap, ["block", "local"])
        .select("id", "rank")
    )
    return PageRankResult(flat, len(supersteps), converged, supersteps)
