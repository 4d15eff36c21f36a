"""Synchronous Louvain local moves on the blocked-CSR store — the scale
path for community detection (round-4 verdict item #1).

Why this exists: the flat ``linkgraph.community`` round is one |2E|-row
join against the label map + three aggregations — exactly the
per-superstep executor-to-executor exchange shape whose label-propagation
incarnation FAILED the N->4N scaling gate at median 0.40 before the
blocked port fixed it at 0.94 (BENCH/BASELINE.md). This module runs the
SAME synchronous semantics (``community.louvain_move_round``: every
vertex simultaneously argmaxes the modularity-gain score over its
neighbors' current communities plus its own, ties to the smaller label)
on the compacted block store, so a round is two map-only jobs over the
per-block work index with zero shuffle:

- **tot job**: Σtot(c) — the total degree of each community under the
  CURRENT labeling — is a dense per-label vector, blocked into B uniform
  label-range stripes exactly like the label vectors themselves. Each
  move task emits its block's (label, Σdeg) partials binned by stripe
  (written with the step's label files — a map-side combine through the
  file transport); the tot job sums ≤B small partial files per stripe.
  O(n) bytes total per round, never O(nB).
- **move job**: per destination block, gather every incoming neighbor
  label (the labelprop_csr gather kernels over the packed/wide edge
  arrays), gather tot(c) per vote from the stripe files, then ONE
  ``native.louvain_vote`` call — counting-sort by dst local carrying the
  (label, tot) pair + per-segment sort + run scan. Scores are computed
  with the flat SQL's exact expression tree over exact integer-valued
  float64 inputs (counts, degrees, Σtot < 2^53), so the argmax — and the
  smaller-label tie-break — is BIT-IDENTICAL to the flat path.

Like labelprop_csr, the label VALUE space is the dense id-rank (0..n-1
ascending-id order, float64-exact), mapped back to ids with one join at
the end; labels travel the per-step .npy file transport (O(B) files per
round, page-cache shared, resumable — the step directory IS the
checkpoint, marker contract of ``_lp_completed``).

Store contract: build the BlockedGraph from ``undirected_edges(edges)``
(distinct symmetric closure, self-loops dropped) — k_{i,c} COUNTS are
wrong under duplicate edges, the labelprop_csr rule. In that store,
per-vertex degree == block_meta's out-degree array (symmetry), so the
degree sidecar costs one tiny per-block job, and 2m == sum(od).

Scaling shape: the vote is the modal-vote kernel family (gate median
0.94, BENCH/BASELINE.md) with a per-vote f64 tot payload and a per-round
O(n)-byte stripe reduction; a dedicated Louvain gate section is measured
in BENCH/BASELINE.md.

Output matches ``linkgraph.community.louvain_communities`` EXACTLY
(pinned by tests/test_community_csr.py and the graph_louvain_blocked
oracle row). Reference parity: extends the reference's per-component
structural metrics (/root/reference/src/ccm/complexity.py) to web-scale
community structure, same family as labelprop_csr.
"""

from __future__ import annotations

import glob
import os
import shutil
import time
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from . import native
from .caching import register_cache
from .labelprop_csr import _lp_completed, id_ranks
from .lineage import truncate_plan
from .pagerank_csr import (
    BlockedGraph,
    _load_block,
    _ranks_root,
    _write_npy_atomic,
)


def _emit_tot_partials(
    rdir: str, step: int, b: int, labels: np.ndarray, kdeg: np.ndarray,
    stride: int,
) -> None:
    """Write block b's contribution to the step's Σtot vector, binned by
    label stripe: one atomic .npy per non-empty stripe holding the
    stacked (label, Σdeg-at-that-label) pairs. Degrees are exact
    integer-valued float64, so partial sums are order-free exact."""
    os.makedirs(f"{rdir}/totp{step}", exist_ok=True)
    ul, inv = np.unique(labels, return_inverse=True)
    uk = np.bincount(inv, weights=kdeg)
    ts = ul.astype(np.int64) // stride
    for t in np.unique(ts):
        m = ts == t
        _write_npy_atomic(
            f"{rdir}/totp{step}/t{int(t)}_s{b}.npy",
            np.stack([ul[m], uk[m]]),
        )


def louvain_blocked(
    spark,
    g: BlockedGraph,
    rounds: int = 2,
    keep_steps: int = 2,
    stats: dict | None = None,
    run_dir: str | None = None,
) -> DataFrame:
    """-> (id, label) after exactly ``rounds`` synchronous local-move
    rounds from singleton labels; ``label`` is a vertex id, bit-identical
    to ``community.louvain_communities(..., rounds=rounds)``.

    ``g`` MUST be built from ``undirected_edges(edges)`` (see module
    docstring). ``stats``, if given, receives ``step_secs`` (wall seconds
    per round: tot job + move job), ``kernel_secs``, ``steps``,
    ``changed`` (labels changed per round), and ``final_dir``/``run_dir``
    (the scaling bench's cross-level checksum hooks).

    ``run_dir`` names the run's checkpoint directory; a killed run handed
    the same ``run_dir`` RESUMES after its last completed round
    (labelprop_csr's ``part/g<k>.npy`` marker contract — the marker is
    written AFTER round k's aggregation returns, so every step-k+1 label
    file and every totp{k+1} partial landed first; a partially-written
    next round is recomputed via atomic same-bytes rewrites). Resumed
    rounds report ``step_secs`` 0.0 with their recorded ``changed``."""
    n, n_blocks = g.n, g.n_blocks
    store, token = g.store_path, g.build_token
    stride = (n + n_blocks - 1) // n_blocks if n else 1
    rdir = run_dir or f"{_ranks_root(g)}/louv-{uuid.uuid4().hex[:12]}"
    os.makedirs(f"{rdir}/part", exist_ok=True)
    done = _lp_completed(rdir) if run_dir else []
    start = len(done)
    if start > rounds:
        raise ValueError(
            f"run_dir {rdir} already holds {start} completed rounds "
            f"> rounds={rounds}; pass rounds >= {start}")

    # 2m = total stored (symmetric) edges = sum of the store's
    # out-degrees — free from the build's metadata aggregate; the O(B)
    # fallback aggregate only runs for stores predating the field
    sym_total = g.sum_od
    if sym_total is None:
        sym_total = int(
            g.block_meta.agg(
                F.sum(
                    F.expr("aggregate(od, 0L, (a, x) -> a + bigint(x))")
                ).alias("s")
            ).collect()[0]["s"]
            or 0
        )
    m = sym_total // 2
    if m == 0:
        # edgeless graph: every vertex keeps its singleton community
        return g.vmap.select("id", F.col("id").alias("label"))
    two_m = 2.0 * m  # == the flat path's F.lit(2.0 * m)

    # lazy truncation: the prep job below is the materializing action for
    # the rank map (it is reused by the final id decode via the cache)
    ranks = register_cache(
        truncate_plan(id_ranks(g.vmap.select("id")), eager=False).persist()
    )

    if start == 0:
        # ONE cogrouped prep job (was two): per block, the degree sidecar
        # (straight from block_meta's out-degree arrays — symmetric store:
        # out-deg == degree), the step-0 labels (own rank scattered into
        # local order — labelprop_csr's init), and the step-0 tot partials
        def prep_cg(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if not len(right):
                return pd.DataFrame({"block": []})
            os.makedirs(f"{rdir}/deg", exist_ok=True)
            os.makedirs(f"{rdir}/step0", exist_ok=True)
            b = int(right["block"].iloc[0])
            kdeg = np.asarray(right["od"].iloc[0], dtype=np.float64)
            arr = np.empty(len(kdeg), dtype=np.float64)
            arr[left["local"].to_numpy(dtype=np.int64)] = (
                left["rank"].to_numpy(dtype=np.float64)
            )
            _write_npy_atomic(f"{rdir}/deg/b{b}.npy", kdeg)
            _write_npy_atomic(f"{rdir}/step0/b{b}.npy", arr)
            _emit_tot_partials(rdir, 0, b, arr, kdeg, stride)
            return pd.DataFrame({"block": [b]})

        (
            g.vmap.join(ranks, "id")
            .select("block", "local", "rank")
            .groupBy("block")
            .cogroup(g.block_meta.select("block", "od").groupBy("block"))
            .applyInPandas(prep_cg, "block int")
            .count()
        )

    work = truncate_plan(
        g.block_meta.select(
            F.col("block").alias("db"), F.col("size").alias("dsize")
        ).repartitionByRange(g.n_blocks, "db")
    )

    step_secs: list[float] = [0.0] * start  # resumed rounds: no wall
    kernel_secs: list[float] = [float(d[1]) for d in done]
    changed_per_step: list[int] = [int(d[0]) for d in done]
    for step in range(start, rounds):
        t_step = time.perf_counter()
        cur, nxt = f"{rdir}/step{step}", f"{rdir}/step{step + 1}"
        totp, totd = f"{rdir}/totp{step}", f"{rdir}/tot{step}"

        # tot job: per label stripe t, sum the ≤B (label, Σdeg) partial
        # files into the dense stripe vector. Recomputed idempotently on
        # resume (partials are complete before the round marker lands).
        def make_tot_fn(_totp, _totd):
            def tot_fn(batches):
                rows = []
                for pdf in batches:
                    for t in pdf["db"]:
                        t = int(t)
                        size = min(stride, n - t * stride)
                        if size <= 0:
                            rows.append((t,))
                            continue
                        acc = np.zeros(size, dtype=np.float64)
                        for fn in glob.glob(f"{_totp}/t{t}_s*.npy"):
                            pair = np.load(fn)
                            acc[
                                pair[0].astype(np.int64) - t * stride
                            ] += pair[1]
                        os.makedirs(_totd, exist_ok=True)
                        _write_npy_atomic(f"{_totd}/b{t}.npy", acc)
                        rows.append((t,))
                yield pd.DataFrame(rows, columns=["block"])

            return tot_fn

        work.mapInPandas(make_tot_fn(totp, totd), "block int").count()

        # move job: the per-destination-block vote (module docstring)
        def make_step_fn(_cur, _nxt, _totd, _next_step):
            def step_fn(batches):
                dfs = [b for b in batches if len(b)]
                if not dfs:
                    return
                pdf = pd.concat(dfs, ignore_index=True)
                rows = []
                lbl_cache: dict = {}
                tot_cache: dict = {}

                def tot_of(vals: np.ndarray) -> np.ndarray:
                    idx = vals.astype(np.int64)
                    ts = idx // stride
                    out = np.empty(len(vals), dtype=np.float64)
                    for t in np.unique(ts):
                        t = int(t)
                        s = tot_cache.get(t)
                        if s is None:
                            s = np.load(f"{_totd}/b{t}.npy")
                            tot_cache[t] = s
                        mask = ts == t
                        out[mask] = s[idx[mask] - t * stride]
                    return out

                for db, dsize in zip(pdf["db"], pdf["dsize"]):
                    db = int(db)
                    t_k = time.perf_counter()
                    old = np.load(f"{_cur}/b{db}.npy")
                    kdeg = np.load(f"{rdir}/deg/b{db}.npy")
                    acc = old.copy()
                    blk = _load_block(store, token, db, n_blocks)
                    offs = blk[1]
                    labs, dls = [], []
                    for sb in np.flatnonzero(np.diff(offs)):
                        a, b_ = int(offs[sb]), int(offs[sb + 1])
                        ls = lbl_cache.get(sb)
                        if ls is None:
                            ls = np.load(f"{_cur}/b{sb}.npy")
                            lbl_cache[sb] = ls
                        if blk[0] == "p":
                            lab, dl = native.gather_labels_pack16(
                                blk[2][a:b_], ls
                            )
                        else:
                            lab = native.gather_labels32(blk[2][a:b_], ls)
                            dl = np.ascontiguousarray(
                                blk[3][a:b_], dtype=np.int32
                            )
                        labs.append(lab)
                        dls.append(dl)
                    if labs:
                        lab_all = np.concatenate(labs)
                        dl_all = np.concatenate(dls)
                        native.louvain_vote(
                            dl_all, lab_all, tot_of(lab_all),
                            kdeg, old, tot_of(old), two_m, acc,
                        )
                    changed = int((acc != old).sum())
                    os.makedirs(_nxt, exist_ok=True)
                    _write_npy_atomic(f"{_nxt}/b{db}.npy", acc)
                    _emit_tot_partials(
                        rdir, _next_step, db, acc, kdeg, stride
                    )
                    rows.append((db, changed, time.perf_counter() - t_k))
                yield pd.DataFrame(
                    rows, columns=["block", "changed", "kern"]
                )

            return step_fn

        agg = (
            work.mapInPandas(make_step_fn(cur, nxt, totd, step + 1),
                             "block int, changed long, kern double")
            .agg(F.sum("changed").alias("c"), F.sum("kern").alias("k"))
            .collect()[0]
        )
        changed = int(agg["c"])
        kernel_secs.append(float(agg["k"]))
        step_secs.append(time.perf_counter() - t_step)
        changed_per_step.append(changed)
        # completion marker AFTER the agg (resume contract)
        _write_npy_atomic(
            f"{rdir}/part/g{step}.npy",
            np.array([changed, float(agg["k"])], dtype=np.float64),
        )
        stale = step - keep_steps + 1
        if stale >= 0:
            for d in (f"step{stale}", f"tot{stale}", f"totp{stale}"):
                shutil.rmtree(f"{rdir}/{d}", ignore_errors=True)
    last = f"{rdir}/step{rounds}"
    if stats is not None:
        stats["step_secs"] = [round(s, 3) for s in step_secs]
        stats["kernel_secs"] = [round(s, 3) for s in kernel_secs]
        stats["steps"] = rounds
        stats["changed"] = changed_per_step
        stats["final_dir"] = last
        stats["run_dir"] = rdir

    def read_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for b in pdf["block"]:
            b = int(b)
            out.append((b, np.load(f"{last}/b{b}.npy")))
        return pd.DataFrame(out, columns=["block", "lv"])

    from .joinhints import fits_broadcast

    bcast = fits_broadcast(g.n)
    vm = F.broadcast(g.vmap) if bcast else g.vmap
    final = (
        g.block_meta.groupBy("block")
        .applyInPandas(read_kernel, "block int, lv array<double>")
        .select("block", F.posexplode("lv").alias("local", "flabel"))
        .join(vm, ["block", "local"])
        .select("id", F.col("flabel").cast("long").alias("flabel"))
    )
    # rank -> owning vertex id: the inverse of the init mapping
    owner = ranks.select(
        F.col("rank").alias("flabel"), F.col("id").alias("label")
    )
    return final.join(
        F.broadcast(owner) if bcast else owner, "flabel"
    ).select("id", "label")
