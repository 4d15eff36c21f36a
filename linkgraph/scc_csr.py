"""Strongly connected components on the blocked-CSR store pair.

The flat path (linkgraph.scc: trim + forward coloring + per-color
backward settle, the Orzan/FW-BW coloring family) runs every phase as
|E|-row joins — one shuffle per BSP round. This module runs the SAME
algorithm on the fwd/rev block-store pair (one shared vertex layout,
like hits_csr), with every phase a map-only job over per-block state
vectors and O(B) scalar driver traffic:

- TRIM: in/out-degree among survivors = two scatter-adds of the 0/1
  active mask (fwd store gives in-degrees, rev store out-degrees); a
  vertex with either zero is a singleton SCC, assigned in-task.
- COLOR: forward min fixpoint f(v) = min rank reaching v — masked
  scatter-min supersteps (the CC kernel over active sources only).
- SETTLE: the flat path's backward min-propagation over intra-color
  edges collapses to a BOOLEAN reach propagation with a per-destination
  color check: a finite backward label always equals its own color
  (within a color class the only seed is the pivot), so v joins the
  settled set iff some already-reached in-neighbor u (on the REVERSED
  graph) has f(u) == f(v). Per superstep: gather incoming
  (reached ? f : nan) values through the LP gather kernels, compare to
  the destination block's own f vector, OR into the reached mask —
  vectorized numpy on top of the native gathers, no per-edge Python.

State lives in rank space (dense id-ascending ranks, float64-exact —
labelprop_csr.id_ranks), so min-rank pivots correspond exactly to the
flat path's min-id pivots; the final (id, component) is one rank->id
join. Output equals linkgraph.scc.strongly_connected_components EXACTLY
(pinned by tests/test_scc_csr.py and the graph_scc_blocked oracle row).
"""

from __future__ import annotations

import os
import shutil
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from . import native
from .caching import register_cache
from .labelprop_csr import id_ranks
from .lineage import truncate_plan
from .pagerank_csr import (
    BlockedGraph,
    _load_block,
    _ranks_root,
    _write_npy_atomic,
    build_blocked,
)

_INF = np.inf


def build_scc_stores(
    spark,
    edges: DataFrame,
    vertices: DataFrame,
    n_blocks: int | None = None,
    store_path: str | None = None,
) -> "tuple[BlockedGraph, BlockedGraph]":
    """-> (g_fwd, g_rev) over the self-loop-free DISTINCT directed edge
    set (the flat path's normalization), one shared vertex layout."""
    if n_blocks is None:
        n_blocks = 2 * int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    ids = vertices.select("id").distinct()
    g_fwd = build_blocked(
        spark, e, ids, n_blocks=n_blocks,
        store_path=f"{store_path}/fwd" if store_path else None,
    )
    g_rev = build_blocked(
        spark,
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        ids, n_blocks=n_blocks,
        store_path=f"{store_path}/rev" if store_path else None,
    )
    e.unpersist()
    return g_fwd, g_rev


def _work_of(g: BlockedGraph) -> DataFrame:
    return truncate_plan(
        g.block_meta.select(
            F.col("block").alias("db"), F.col("size").alias("dsize")
        ).repartitionByRange(g.n_blocks, "db")
    )


def strongly_connected_components_blocked(
    spark,
    g_fwd: BlockedGraph,
    g_rev: BlockedGraph,
    max_outer: int = 50,
    max_rounds: int = 200,
    stats: dict | None = None,
) -> DataFrame:
    """-> (id, component), component = min vertex id of the SCC; exactly
    linkgraph.scc.strongly_connected_components. ``stats`` (optional)
    receives ``outer_rounds`` / ``trim_rounds`` like the flat path."""
    assert g_fwd.n_blocks == g_rev.n_blocks and g_fwd.n == g_rev.n, \
        "fwd/rev stores must share the vertex layout (build_scc_stores)"
    n_blocks = g_fwd.n_blocks
    fstore, ftoken = g_fwd.store_path, g_fwd.build_token
    rstore, rtoken = g_rev.store_path, g_rev.build_token
    rdir = f"{_ranks_root(g_fwd)}/scc-{uuid.uuid4().hex[:12]}"
    os.makedirs(rdir, exist_ok=True)
    work = _work_of(g_fwd)  # both stores share the block id space

    # rank vector per block (dense id-ascending ranks — labelprop's
    # init), plus active=1 / comp=nan: ONE O(V) init shuffle total
    ranks = register_cache(
        truncate_plan(id_ranks(g_fwd.vmap.select("id"))).persist()
    )

    def prep_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        for d in ("rank", "active0", "comp0"):
            os.makedirs(f"{rdir}/{d}", exist_ok=True)
        b = int(pdf["block"].iloc[0])
        arr = np.empty(len(pdf), dtype=np.float64)
        arr[pdf["local"].to_numpy(dtype=np.int64)] = pdf["rank"].to_numpy(
            dtype=np.float64
        )
        _write_npy_atomic(f"{rdir}/rank/b{b}.npy", arr)
        _write_npy_atomic(
            f"{rdir}/active0/b{b}.npy", np.ones(len(pdf), dtype=np.float64)
        )
        _write_npy_atomic(
            f"{rdir}/comp0/b{b}.npy",
            np.full(len(pdf), np.nan, dtype=np.float64),
        )
        return pd.DataFrame({"block": [b]})

    (
        g_fwd.vmap.join(ranks, "id")
        .select("block", "local", "rank")
        .groupBy("block")
        .applyInPandas(prep_kernel, "block int")
        .count()
    )

    av, cv = 0, 0  # active / comp version counters
    outer_rounds = trim_rounds = 0
    n_active = g_fwd.n

    def run_job(step_fn, schema="block int, changed long") -> int:
        row = (
            work.mapInPandas(step_fn, schema)
            .agg(F.sum("changed").alias("c"))
            .collect()[0]
        )
        return int(row["c"] or 0)

    for _outer in range(max_outer):
        if n_active == 0:
            break
        outer_rounds += 1

        # ---- TRIM loop: peel indeg==0 or outdeg==0 among active ----
        while True:
            trim_rounds += 1
            a_cur = f"{rdir}/active{av}"
            ind_dir = f"{rdir}/ind"

            def indeg_fn(batches, _a=a_cur, _out=ind_dir):
                for pdf in batches:
                    rows = []
                    cache: dict = {}
                    for db, dsize in zip(pdf["db"], pdf["dsize"]):
                        db, dsize = int(db), int(dsize)
                        acc = np.zeros(dsize, dtype=np.float64)
                        blk = _load_block(fstore, ftoken, db, n_blocks)
                        offs = blk[1]
                        for sb in np.flatnonzero(np.diff(offs)):
                            a, b_ = int(offs[sb]), int(offs[sb + 1])
                            vs = cache.get(sb)
                            if vs is None:
                                vs = np.load(f"{_a}/b{sb}.npy")
                                cache[sb] = vs
                            if blk[0] == "p":
                                native.scatter_add_pack16(
                                    blk[2][a:b_], vs, acc)
                            else:
                                native.scatter_add32(
                                    blk[2][a:b_], blk[3][a:b_], vs, acc)
                        os.makedirs(_out, exist_ok=True)
                        _write_npy_atomic(f"{_out}/b{db}.npy", acc)
                        rows.append((db, 0))
                    yield pd.DataFrame(rows, columns=["block", "changed"])

            run_job(indeg_fn)

            a_nxt = f"{rdir}/active{av + 1}"
            c_cur, c_nxt = f"{rdir}/comp{cv}", f"{rdir}/comp{cv + 1}"

            def trim_fn(batches, _a=a_cur, _an=a_nxt, _c=c_cur, _cn=c_nxt,
                        _ind=ind_dir):
                for pdf in batches:
                    rows = []
                    cache: dict = {}
                    for db, dsize in zip(pdf["db"], pdf["dsize"]):
                        db, dsize = int(db), int(dsize)
                        outd = np.zeros(dsize, dtype=np.float64)
                        blk = _load_block(rstore, rtoken, db, n_blocks)
                        offs = blk[1]
                        for sb in np.flatnonzero(np.diff(offs)):
                            a, b_ = int(offs[sb]), int(offs[sb + 1])
                            vs = cache.get(sb)
                            if vs is None:
                                vs = np.load(f"{_a}/b{sb}.npy")
                                cache[sb] = vs
                            if blk[0] == "p":
                                native.scatter_add_pack16(
                                    blk[2][a:b_], vs, outd)
                            else:
                                native.scatter_add32(
                                    blk[2][a:b_], blk[3][a:b_], vs, outd)
                        act = np.load(f"{_a}/b{db}.npy")
                        ind = np.load(f"{_ind}/b{db}.npy")
                        comp = np.load(f"{_c}/b{db}.npy").copy()
                        rank = np.load(f"{rdir}/rank/b{db}.npy")
                        keep = (act > 0) & (ind > 0) & (outd > 0)
                        trimmed = (act > 0) & ~keep
                        comp[trimmed] = rank[trimmed]  # singleton SCCs
                        os.makedirs(_an, exist_ok=True)
                        os.makedirs(_cn, exist_ok=True)
                        _write_npy_atomic(
                            f"{_an}/b{db}.npy",
                            keep.astype(np.float64))
                        _write_npy_atomic(f"{_cn}/b{db}.npy", comp)
                        rows.append((db, int(trimmed.sum())))
                    yield pd.DataFrame(rows, columns=["block", "changed"])

            n_trimmed = run_job(trim_fn)
            av += 1
            cv += 1
            n_active -= n_trimmed
            if n_trimmed == 0 or n_active == 0:
                break
        if n_active == 0:
            break

        # ---- COLOR: forward min fixpoint over the active subgraph ----
        a_cur = f"{rdir}/active{av}"
        f0 = f"{rdir}/f0"

        def color_init(batches, _a=a_cur, _f=f0):
            for pdf in batches:
                rows = []
                for db in pdf["db"]:
                    db = int(db)
                    act = np.load(f"{_a}/b{db}.npy")
                    rank = np.load(f"{rdir}/rank/b{db}.npy")
                    os.makedirs(_f, exist_ok=True)
                    _write_npy_atomic(
                        f"{_f}/b{db}.npy",
                        np.where(act > 0, rank, _INF))
                    rows.append((db, 0))
                yield pd.DataFrame(rows, columns=["block", "changed"])

        run_job(color_init)
        ft = 0
        for _ in range(max_rounds):
            f_cur, f_nxt = f"{rdir}/f{ft}", f"{rdir}/f{ft + 1}"

            def color_fn(batches, _a=a_cur, _f=f_cur, _fn=f_nxt):
                for pdf in batches:
                    rows = []
                    cache: dict = {}
                    for db in pdf["db"]:
                        db = int(db)
                        f_old = np.load(f"{_f}/b{db}.npy")
                        acc = f_old.copy()
                        blk = _load_block(fstore, ftoken, db, n_blocks)
                        offs = blk[1]
                        for sb in np.flatnonzero(np.diff(offs)):
                            a, b_ = int(offs[sb]), int(offs[sb + 1])
                            vs = cache.get(sb)
                            if vs is None:
                                # inactive sources propagate nothing
                                vs = np.where(
                                    np.load(f"{_a}/b{sb}.npy") > 0,
                                    np.load(f"{_f}/b{sb}.npy"), _INF)
                                cache[sb] = vs
                            if blk[0] == "p":
                                native.scatter_min_pack16(
                                    blk[2][a:b_], vs, acc)
                            else:
                                native.scatter_min32(
                                    blk[2][a:b_], blk[3][a:b_], vs, acc)
                        act = np.load(f"{_a}/b{db}.npy") > 0
                        f_new = np.where(act, acc, f_old)
                        os.makedirs(_fn, exist_ok=True)
                        _write_npy_atomic(f"{_fn}/b{db}.npy", f_new)
                        rows.append((db, int((f_new != f_old).sum())))
                    yield pd.DataFrame(rows, columns=["block", "changed"])

            changed = run_job(color_fn)
            ft += 1
            if ft >= 2:
                shutil.rmtree(f"{rdir}/f{ft - 2}", ignore_errors=True)
            if changed == 0:
                break
        f_fin = f"{rdir}/f{ft}"

        # ---- SETTLE: boolean backward reach within color classes ----
        r0 = f"{rdir}/r0"

        def settle_init(batches, _a=a_cur, _f=f_fin, _r=r0):
            for pdf in batches:
                rows = []
                for db in pdf["db"]:
                    db = int(db)
                    act = np.load(f"{_a}/b{db}.npy") > 0
                    fv = np.load(f"{_f}/b{db}.npy")
                    rank = np.load(f"{rdir}/rank/b{db}.npy")
                    os.makedirs(_r, exist_ok=True)
                    _write_npy_atomic(
                        f"{_r}/b{db}.npy",
                        (act & (fv == rank)).astype(np.float64))
                    rows.append((db, 0))
                yield pd.DataFrame(rows, columns=["block", "changed"])

        run_job(settle_init)
        rt = 0
        for _ in range(max_rounds):
            r_cur, r_nxt = f"{rdir}/r{rt}", f"{rdir}/r{rt + 1}"

            def settle_fn(batches, _f=f_fin, _r=r_cur, _rn=r_nxt):
                for pdf in batches:
                    rows = []
                    cache: dict = {}
                    for db in pdf["db"]:
                        db = int(db)
                        reached = np.load(f"{_r}/b{db}.npy").copy()
                        fv = np.load(f"{_f}/b{db}.npy")
                        blk = _load_block(rstore, rtoken, db, n_blocks)
                        offs = blk[1]
                        for sb in np.flatnonzero(np.diff(offs)):
                            a, b_ = int(offs[sb]), int(offs[sb + 1])
                            vs = cache.get(sb)
                            if vs is None:
                                # reached sources broadcast their color;
                                # nan (never equal) silences the rest
                                vs = np.where(
                                    np.load(f"{_r}/b{sb}.npy") > 0,
                                    np.load(f"{_f}/b{sb}.npy"), np.nan)
                                cache[sb] = vs
                            if blk[0] == "p":
                                lab, dl = native.gather_labels_pack16(
                                    blk[2][a:b_], vs)
                            else:
                                lab = native.gather_labels32(
                                    blk[2][a:b_], vs)
                                dl = np.ascontiguousarray(
                                    blk[3][a:b_], dtype=np.int32)
                            ok = lab == fv[dl]  # per-dst color check
                            if ok.any():
                                reached[dl[ok]] = 1.0
                        os.makedirs(_rn, exist_ok=True)
                        _write_npy_atomic(f"{_rn}/b{db}.npy", reached)
                        old = np.load(f"{_r}/b{db}.npy")
                        rows.append((db, int((reached != old).sum())))
                    yield pd.DataFrame(rows, columns=["block", "changed"])

            changed = run_job(settle_fn)
            rt += 1
            if rt >= 2:
                shutil.rmtree(f"{rdir}/r{rt - 2}", ignore_errors=True)
            if changed == 0:
                break
        r_fin = f"{rdir}/r{rt}"

        # ---- APPLY: settled vertices leave the active set ----
        a_nxt = f"{rdir}/active{av + 1}"
        c_cur, c_nxt = f"{rdir}/comp{cv}", f"{rdir}/comp{cv + 1}"

        def apply_fn(batches, _a=a_cur, _an=a_nxt, _c=c_cur, _cn=c_nxt,
                     _f=f_fin, _r=r_fin):
            for pdf in batches:
                rows = []
                for db in pdf["db"]:
                    db = int(db)
                    act = np.load(f"{_a}/b{db}.npy")
                    reached = np.load(f"{_r}/b{db}.npy") > 0
                    fv = np.load(f"{_f}/b{db}.npy")
                    comp = np.load(f"{_c}/b{db}.npy").copy()
                    comp[reached] = fv[reached]
                    os.makedirs(_an, exist_ok=True)
                    os.makedirs(_cn, exist_ok=True)
                    _write_npy_atomic(
                        f"{_an}/b{db}.npy",
                        np.where(reached, 0.0, act))
                    _write_npy_atomic(f"{_cn}/b{db}.npy", comp)
                    rows.append((db, int(reached.sum())))
                yield pd.DataFrame(rows, columns=["block", "changed"])

        n_settled = run_job(apply_fn)
        av += 1
        cv += 1
        n_active -= n_settled
        for d in ("f0", f"f{ft - 1}", f_fin, "r0", f"r{rt - 1}", r_fin,
                  "ind"):
            shutil.rmtree(f"{rdir}/{d}" if not d.startswith("/") else d,
                          ignore_errors=True)
        shutil.rmtree(f"{rdir}/active{av - 1}", ignore_errors=True)
        shutil.rmtree(f"{rdir}/comp{cv - 1}", ignore_errors=True)

    if stats is not None:
        stats["outer_rounds"] = outer_rounds
        stats["trim_rounds"] = trim_rounds

    last = f"{rdir}/comp{cv}"

    def read_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for b in pdf["block"]:
            b = int(b)
            out.append((b, np.load(f"{last}/b{b}.npy")))
        return pd.DataFrame(out, columns=["block", "cvv"])

    labels = (
        g_fwd.block_meta.groupBy("block")
        .applyInPandas(read_kernel, "block int, cvv array<double>")
        .select("block", F.posexplode("cvv").alias("local", "crank"))
        .where(~F.isnan("crank"))
        .join(g_fwd.vmap, ["block", "local"])
        .select("id", F.col("crank").cast("long").alias("crank"))
    )
    owner = ranks.select(
        F.col("rank").alias("crank"), F.col("id").alias("component")
    )
    out = truncate_plan(
        labels.join(owner, "crank").select("id", "component"), eager=False
    )
    out.count()  # materialize before cleanup
    shutil.rmtree(rdir, ignore_errors=True)
    return out
