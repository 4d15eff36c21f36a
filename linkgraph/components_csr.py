"""Connected components on the blocked-CSR store — min-label supersteps.

The same compacted layout, transport, and native kernels that power
pagerank_blocked (linkgraph.pagerank_csr) generalize to any
gather-COMBINE-apply superstep; here the combiner is MIN and the vertex
state is a label vector, giving weak connected components by min-label
propagation (≙ the flat small-star/large-star path in
linkgraph.components, and the reference's P — /root/reference/src/ccm/
complexity.py:84 — at web scale).

- labels are float64 global vertex indices (exact for < 2^53 vertices),
  so the per-step label files are bit-compatible with the rank-file
  transport and the scatter-min kernel shares the scatter-add layout
  (packed u32 edge words / int32 pairs, see linkgraph.native)
- a superstep is the same single-stage map job over the per-db work
  index: load my label block, scatter-min every source block's labels
  into it, write the next label file, return ONE changed-count scalar
- convergence: no label changed anywhere (integer-exact, no tolerance)
- the store must be built from SYMMETRIZED edges (undirected
  reachability): ``build_blocked(spark, symmetrize(edges), ...)``
- complexity: O(diameter of the component graph) supersteps; web graphs
  are short-diameter, and each superstep is cache-shaped exactly like a
  PageRank superstep, so the 0.84-efficiency scaling evidence in
  BENCH/BASELINE.md carries over to this operator

Output matches linkgraph.components.connected_components EXACTLY
(component = min vertex id in the component): the converged min-INDEX
labels are remapped to min vertex ids with one group-by + join.
"""

from __future__ import annotations

import os
import shutil
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from . import native
from .lineage import truncate_plan
from .pagerank_csr import (
    BlockedGraph,
    _load_block,
    _ranks_root,
    _write_npy_atomic,
    vmap_side,
)


def symmetrize(edges: DataFrame) -> DataFrame:
    """edges(src,dst) -> both directions (weak-connectivity input)."""
    return edges.select("src", "dst").unionByName(
        edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    )


def connected_components_blocked(
    spark,
    g: BlockedGraph,
    max_iter: int = 200,
    keep_steps: int = 2,
    stats: dict | None = None,
) -> DataFrame:
    """-> (id, component), component = min vertex id in the component.

    ``g`` MUST be built from symmetrized edges (see ``symmetrize``);
    propagation only follows stored edge direction.

    ``stats``, if given, is filled with ``step_secs`` (wall seconds per
    min-label superstep job) and ``steps`` — the scaling bench reads these
    (every superstep does the full scatter-min over all edges regardless
    of how many labels still change, so per-step wall IS throughput).
    """
    n_blocks, store, token = g.n_blocks, g.store_path, g.build_token
    rdir = f"{_ranks_root(g)}/cc-{uuid.uuid4().hex[:12]}"
    os.makedirs(rdir, exist_ok=True)

    # global index base per block: labels must be totally ordered across
    # blocks. O(B) scalars on the driver — never O(V).
    sizes = {
        int(r["block"]): int(r["size"])
        for r in g.block_meta.select("block", "size").collect()
    }
    goff, acc_off = {}, 0
    for b in sorted(sizes):
        goff[b] = acc_off
        acc_off += sizes[b]

    def prep_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        os.makedirs(f"{rdir}/step0", exist_ok=True)
        for b, size in zip(pdf["block"], pdf["size"]):
            b = int(b)
            _write_npy_atomic(
                f"{rdir}/step0/b{b}.npy",
                goff[b] + np.arange(int(size), dtype=np.float64),
            )
        return pd.DataFrame({"block": [int(b) for b in pdf["block"]]})

    g.block_meta.groupBy("block").applyInPandas(
        prep_kernel, "block int"
    ).count()

    work = truncate_plan(
        g.block_meta.select(
            F.col("block").alias("db"), F.col("size").alias("dsize")
        ).repartitionByRange(g.n_blocks, "db")
    )

    import time as _time

    step_secs: list[float] = []
    steps = 0
    for step in range(max_iter):
        t_step = _time.perf_counter()
        cur, nxt = f"{rdir}/step{step}", f"{rdir}/step{step + 1}"

        def make_step_fn(_cur, _nxt):
            def step_fn(batches):
                dfs = [b for b in batches if len(b)]
                if not dfs:
                    return
                pdf = pd.concat(dfs, ignore_index=True)
                rows = []
                lbl_cache: dict = {}
                for db, dsize in zip(pdf["db"], pdf["dsize"]):
                    db = int(db)
                    old = np.load(f"{_cur}/b{db}.npy")
                    acc = old.copy()
                    blk = _load_block(store, token, db, n_blocks)
                    offs = blk[1]
                    for sb in np.flatnonzero(np.diff(offs)):
                        a, b_ = int(offs[sb]), int(offs[sb + 1])
                        ls = lbl_cache.get(sb)
                        if ls is None:
                            ls = np.load(f"{_cur}/b{sb}.npy", mmap_mode="r")
                            lbl_cache[sb] = ls
                        if blk[0] == "p":
                            native.scatter_min_pack16(blk[2][a:b_], ls, acc)
                        else:
                            native.scatter_min32(
                                blk[2][a:b_], blk[3][a:b_], ls, acc
                            )
                    changed = int((acc != old).sum())
                    os.makedirs(_nxt, exist_ok=True)
                    _write_npy_atomic(f"{_nxt}/b{db}.npy", acc)
                    rows.append((db, changed))
                yield pd.DataFrame(rows, columns=["block", "changed"])

            return step_fn

        changed = int(
            work.mapInPandas(make_step_fn(cur, nxt), "block int, changed long")
            .agg(F.sum("changed").alias("c"))
            .collect()[0]["c"]
        )
        steps = step + 1
        step_secs.append(_time.perf_counter() - t_step)
        stale = step - keep_steps + 1
        if stale >= 0:
            shutil.rmtree(f"{rdir}/step{stale}", ignore_errors=True)
        if changed == 0:
            break
    if stats is not None:
        stats["step_secs"] = [round(s, 3) for s in step_secs]
        stats["steps"] = steps

    last = f"{rdir}/step{steps}"

    def read_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for b in pdf["block"]:
            b = int(b)
            out.append((b, np.load(f"{last}/b{b}.npy")))
        return pd.DataFrame(out, columns=["block", "lv"])

    labels = (
        g.block_meta.groupBy("block")
        .applyInPandas(read_kernel, "block int, lv array<double>")
        .select("block", F.posexplode("lv").alias("local", "glabel"))
        .join(vmap_side(g), ["block", "local"])
        .select("id", F.col("glabel").cast("long").alias("glabel"))
    )
    # min-INDEX label -> min vertex ID per component (exactly the flat
    # path's contract); one aggregation + one broadcast-able join on the
    # (small) per-component reps
    reps = labels.groupBy("glabel").agg(F.min("id").alias("component"))
    return labels.join(reps, "glabel").select("id", "component")


def bfs_distances_blocked(
    spark,
    g: BlockedGraph,
    seeds: DataFrame,
    max_hops: int = 3,
    keep_steps: int = 2,
) -> DataFrame:
    """-> (id, dist): minimal DIRECTED hop distance from the seed set,
    bounded at ``max_hops``; unreached vertices absent — exactly
    linkgraph.graph.bfs_distances, on the blocked store.

    Build ``g`` from ``edges.where(src != dst).distinct()`` (the flat
    path's edge normalization) WITHOUT symmetrizing — propagation follows
    stored direction. Distances travel as float64 block vectors (inf =
    unreached); a superstep scatter-mins every source block's
    distances + 1 into each destination block ON TOP of the block's
    current vector — the same single-stage map job as the min-label CC
    superstep, zero shuffle, with the frontier bound coming from the
    FIXED unrolled hop count (the scalable bounded-radius form)."""
    import time as _time  # noqa: F401  (parity with sibling supersteps)

    n_blocks, store, token = g.n_blocks, g.store_path, g.build_token
    rdir = f"{_ranks_root(g)}/bfs-{uuid.uuid4().hex[:12]}"
    os.makedirs(rdir, exist_ok=True)

    # step0: inf everywhere, 0 at seed positions. Blocks without seeds
    # get their all-inf file from the first (sizes-only) job; seed blocks
    # are then atomically overwritten by the seed job.
    def inf_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        os.makedirs(f"{rdir}/step0", exist_ok=True)
        for b, size in zip(pdf["block"], pdf["size"]):
            _write_npy_atomic(
                f"{rdir}/step0/b{int(b)}.npy",
                np.full(int(size), np.inf, dtype=np.float64),
            )
        return pd.DataFrame({"block": [int(b) for b in pdf["block"]]})

    g.block_meta.groupBy("block").applyInPandas(
        inf_kernel, "block int"
    ).count()

    sizes_by_block = g.block_meta.select("block", "size")

    def seed_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(pdf["block"].iloc[0])
        arr = np.full(int(pdf["size"].iloc[0]), np.inf, dtype=np.float64)
        arr[pdf["local"].to_numpy(dtype=np.int64)] = 0.0
        _write_npy_atomic(f"{rdir}/step0/b{b}.npy", arr)
        return pd.DataFrame({"block": [b]})

    (
        seeds.select("id").distinct()
        .join(vmap_side(g), "id")
        .join(sizes_by_block, "block")
        .select("block", "local", "size")
        .groupBy("block")
        .applyInPandas(seed_kernel, "block int")
        .count()
    )

    work = truncate_plan(
        g.block_meta.select(
            F.col("block").alias("db"), F.col("size").alias("dsize")
        ).repartitionByRange(g.n_blocks, "db")
    )

    for step in range(max_hops):
        cur, nxt = f"{rdir}/step{step}", f"{rdir}/step{step + 1}"

        def make_step_fn(_cur, _nxt):
            def step_fn(batches):
                dfs = [b for b in batches if len(b)]
                if not dfs:
                    return
                pdf = pd.concat(dfs, ignore_index=True)
                rows = []
                vec_cache: dict = {}
                for db in pdf["db"]:
                    db = int(db)
                    acc = np.load(f"{_cur}/b{db}.npy").copy()
                    blk = _load_block(store, token, db, n_blocks)
                    offs = blk[1]
                    for sb in np.flatnonzero(np.diff(offs)):
                        a, b_ = int(offs[sb]), int(offs[sb + 1])
                        vs = vec_cache.get(sb)
                        if vs is None:
                            vs = np.load(f"{_cur}/b{sb}.npy") + 1.0
                            vec_cache[sb] = vs
                        if blk[0] == "p":
                            native.scatter_min_pack16(blk[2][a:b_], vs, acc)
                        else:
                            native.scatter_min32(
                                blk[2][a:b_], blk[3][a:b_], vs, acc
                            )
                    os.makedirs(_nxt, exist_ok=True)
                    _write_npy_atomic(f"{_nxt}/b{db}.npy", acc)
                    rows.append((db, int(np.isfinite(acc).sum())))
                yield pd.DataFrame(rows, columns=["block", "reached"])

            return step_fn

        (
            work.mapInPandas(make_step_fn(cur, nxt), "block int, reached long")
            .agg(F.sum("reached"))
            .collect()
        )
        stale = step - keep_steps + 1
        if stale >= 0:
            shutil.rmtree(f"{rdir}/step{stale}", ignore_errors=True)

    last = f"{rdir}/step{max_hops}"

    def read_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for b in pdf["block"]:
            b = int(b)
            out.append((b, np.load(f"{last}/b{b}.npy")))
        return pd.DataFrame(out, columns=["block", "dv"])

    out = truncate_plan(
        g.block_meta.groupBy("block")
        .applyInPandas(read_kernel, "block int, dv array<double>")
        .select("block", F.posexplode("dv").alias("local", "d"))
        .where(F.col("d") != float("inf"))
        .join(vmap_side(g), ["block", "local"])
        .select("id", F.col("d").cast("int").alias("dist")),
        eager=False,
    )
    out.count()
    shutil.rmtree(rdir, ignore_errors=True)
    return out


def kcore_blocked(
    spark,
    g: BlockedGraph,
    k: int = 2,
    rounds: int | None = None,
    max_iter: int = 200,
    keep_steps: int = 2,
) -> DataFrame:
    """-> (id, core_deg) for every vertex in the k-core — exactly
    linkgraph.kcore.kcore (``rounds`` = bounded unrolled prefix,
    ``rounds=None`` = fixpoint), on the blocked store.

    Build ``g`` from ``kcore.undirected_edges(edges)`` (distinct
    symmetric closure, self-loops dropped). The peel round is ONE
    map-only job: scatter-add the 0/1 alive mask into each destination
    block (degree among survivors — the source's aliveness is the
    summand, the destination's gates the output), then
    ``alive' = alive AND deg >= k`` in-task; the returned changed count
    (O(B) scalars) drives the fixpoint. No per-round shuffle, edge set
    never rewritten — the mask does the filtering the flat path's two
    semi-joins do."""
    n_blocks, store, token = g.n_blocks, g.store_path, g.build_token
    rdir = f"{_ranks_root(g)}/kcore-{uuid.uuid4().hex[:12]}"
    os.makedirs(rdir, exist_ok=True)

    def ones_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        os.makedirs(f"{rdir}/alive0", exist_ok=True)
        for b, size in zip(pdf["block"], pdf["size"]):
            _write_npy_atomic(
                f"{rdir}/alive0/b{int(b)}.npy",
                np.ones(int(size), dtype=np.float64),
            )
        return pd.DataFrame({"block": [int(b) for b in pdf["block"]]})

    g.block_meta.groupBy("block").applyInPandas(
        ones_kernel, "block int"
    ).count()

    work = truncate_plan(
        g.block_meta.select(
            F.col("block").alias("db"), F.col("size").alias("dsize")
        ).repartitionByRange(g.n_blocks, "db")
    )

    n_rounds = rounds if rounds is not None else max_iter
    if n_rounds < 1:
        raise ValueError("kcore_blocked needs rounds >= 1 (or rounds=None)")
    done = 0
    for step in range(n_rounds):
        cur = f"{rdir}/alive{step}"
        nxt = f"{rdir}/alive{step + 1}"
        degd = f"{rdir}/deg{step + 1}"

        def make_step_fn(_cur, _nxt, _deg):
            def step_fn(batches):
                dfs = [b for b in batches if len(b)]
                if not dfs:
                    return
                pdf = pd.concat(dfs, ignore_index=True)
                rows = []
                vec_cache: dict = {}
                for db, dsize in zip(pdf["db"], pdf["dsize"]):
                    db, dsize = int(db), int(dsize)
                    acc = np.zeros(dsize, dtype=np.float64)
                    blk = _load_block(store, token, db, n_blocks)
                    offs = blk[1]
                    for sb in np.flatnonzero(np.diff(offs)):
                        a, b_ = int(offs[sb]), int(offs[sb + 1])
                        vs = vec_cache.get(sb)
                        if vs is None:
                            vs = np.load(f"{_cur}/b{sb}.npy")
                            vec_cache[sb] = vs
                        if blk[0] == "p":
                            native.scatter_add_pack16(blk[2][a:b_], vs, acc)
                        else:
                            native.scatter_add32(
                                blk[2][a:b_], blk[3][a:b_], vs, acc
                            )
                    old = np.load(f"{_cur}/b{db}.npy")
                    new = old * (acc >= k)
                    os.makedirs(_nxt, exist_ok=True)
                    os.makedirs(_deg, exist_ok=True)
                    _write_npy_atomic(f"{_nxt}/b{db}.npy", new)
                    _write_npy_atomic(f"{_deg}/b{db}.npy", acc)
                    rows.append((db, int((new != old).sum())))
                yield pd.DataFrame(rows, columns=["block", "changed"])

            return step_fn

        changed = int(
            work.mapInPandas(
                make_step_fn(cur, nxt, degd), "block int, changed long"
            )
            .agg(F.sum("changed").alias("c"))
            .collect()[0]["c"]
        )
        done = step + 1
        stale = step - keep_steps + 1
        if stale >= 0:
            shutil.rmtree(f"{rdir}/alive{stale}", ignore_errors=True)
            shutil.rmtree(f"{rdir}/deg{stale}", ignore_errors=True)
        if rounds is None and changed == 0:
            break

    av, dv = f"{rdir}/alive{done}", f"{rdir}/deg{done}"

    def read_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for b in pdf["block"]:
            b = int(b)
            out.append((
                b, np.load(f"{av}/b{b}.npy"), np.load(f"{dv}/b{b}.npy")
            ))
        return pd.DataFrame(out, columns=["block", "av", "dv"])

    out = truncate_plan(
        g.block_meta.groupBy("block")
        .applyInPandas(
            read_kernel, "block int, av array<double>, dv array<double>"
        )
        .select(
            "block", F.posexplode(F.arrays_zip("av", "dv")).alias("local", "z")
        )
        .select("block", "local", "z.av", "z.dv")
        .where(F.col("av") > 0)
        .join(vmap_side(g), ["block", "local"])
        .select("id", F.col("dv").cast("long").alias("core_deg")),
        eager=False,
    )
    out.count()
    shutil.rmtree(rdir, ignore_errors=True)
    return out
