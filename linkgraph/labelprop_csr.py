"""Synchronous label propagation on the blocked-CSR store — modal-vote
supersteps with zero shuffle.

Round-3 finding (BENCH/BASELINE.md "LP + triangle scaling"): the flat
join+agg LP path shuffles |E| vote rows per superstep through executor-to-
executor exchange and failed the N->4N scaling gate at median 0.40. This
module runs the SAME BSP semantics (linkgraph.labelprop.label_propagation:
every vertex simultaneously adopts the modal label among its neighbors'
previous labels, ties -> minimum label, isolated vertices keep theirs) on
the compacted block store that powers pagerank_blocked / the CC blocked
path — a superstep is ONE map-only job over the per-destination-block work
index, no exchange at all:

- per destination block: gather every incoming neighbor label (native
  gather kernels over the packed/wide edge arrays), then ONE modal_vote
  kernel call — counting-sort by dst local + per-segment sort + run scan
  (linkgraph.native). A mode has no streaming combiner (unlike PageRank's
  sum or CC's min), so the votes ARE materialized per block — O(in-edges
  of the block) memory per task, bounded by |E|/B by construction.
- labels travel the same per-step .npy file transport as ranks/CC labels:
  O(B) files per superstep, page-cache-shared per host, resumable (the
  step directory IS the checkpoint).
- the label VALUE space is the dense id-RANK (0..n-1 in ascending vertex-
  id order, float64-exact below 2^53), not the raw 64-bit id: xxhash64 ids
  overflow float64's 53-bit mantissa, and the min-label tie-break must
  order exactly like the flat path's min(id). ``id_ranks`` computes the
  rank scale-out (range repartition + O(P) driver offsets — never a
  single-partition global window); the converged ranks are mapped back to
  ids with one join.

Store contract: build the BlockedGraph from ``undirected_edges(edges)``
(distinct symmetric closure, self-loops dropped) — modal COUNTS, unlike
CC's min, are wrong under duplicate edges, so ``components_csr.symmetrize``
(which keeps duplicates) is NOT a valid input here.

Output matches linkgraph.labelprop.label_propagation EXACTLY (pinned by
tests/test_labelprop_csr.py and the graph_labelprop_blocked oracle row).
Reference parity: the reference's graph metrics are single-process
(/root/reference/src/ccm/graphs.py); this is the web-scale community
face of its per-component structure analysis.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from . import native
from .caching import register_cache
from .lineage import truncate_plan
from .pagerank_csr import (
    BlockedGraph,
    _load_block,
    _ranks_root,
    _write_npy_atomic,
    vmap_side,
)


def id_ranks(ids: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """ids(id) -> (id, rank): dense 0..n-1 rank in ascending id order.

    Scale-out dense rank: range-repartition by id, count per partition
    (O(P) scalars on the driver — never O(V)), then per-partition
    row_number + broadcast offset. The partition-tagged frame is persisted
    (registered with caching.register_cache) so partition identity is
    stable between the count job and the rank job; the caller releases it
    via caching.release_caches() after materializing downstream frames.
    """
    spark = ids.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    tagged = register_cache(
        ids.select("id")
        .repartitionByRange(num_partitions, "id")
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        int(r["pid"]): int(r["c"])
        for r in tagged.groupBy("pid").agg(F.count("*").alias("c")).collect()
    }
    rows, acc = [], 0
    for p in sorted(counts):
        rows.append((p, acc))
        acc += counts[p]
    offs = spark.createDataFrame(rows or [(0, 0)], "pid int, off long")
    w = Window.partitionBy("pid").orderBy("id")
    return tagged.join(F.broadcast(offs), "pid").select(
        "id", (F.row_number().over(w) - 1 + F.col("off")).alias("rank")
    )


def _lp_completed(rdir: str) -> list[np.ndarray]:
    """Contiguous prefix of per-step (changed, kernel_secs) marker files —
    ``part/g<k>.npy`` is written by the driver AFTER superstep k's
    aggregation returns, so its presence proves every block's step-k+1
    label file landed (atomic per-block writes happen-before the agg).
    The prefix length is exactly the resumable position."""
    out = []
    k = 0
    while os.path.exists(f"{rdir}/part/g{k}.npy"):
        out.append(np.load(f"{rdir}/part/g{k}.npy"))
        k += 1
    return out


def label_propagation_blocked(
    spark,
    g: BlockedGraph,
    iterations: int = 5,
    keep_steps: int = 2,
    stats: dict | None = None,
    run_dir: str | None = None,
) -> DataFrame:
    """-> (id, label) after exactly ``iterations`` synchronous supersteps;
    ``label`` is a vertex id, bit-identical to the flat path's output.

    ``g`` MUST be built from ``undirected_edges(edges)`` (see module
    docstring). ``stats``, if given, receives ``step_secs`` (wall seconds
    per superstep job), ``steps``, and ``changed`` (labels changed per
    superstep) — the scaling bench reads these, so throughput is measured
    per-superstep INSIDE one run (round-3 estimator fix: no more
    differencing two runs whose base wall swings).

    ``run_dir`` names the run's checkpoint directory; a killed run handed
    the same ``run_dir`` RESUMES after its last completed superstep
    (marker contract of ``_lp_completed``; a partially-written next step
    is simply recomputed — per-block files are atomic same-bytes
    rewrites). Resumed supersteps report ``step_secs`` 0.0 and their
    recorded ``changed`` counts, the PageRank resume convention."""
    n_blocks, store, token = g.n_blocks, g.store_path, g.build_token
    rdir = run_dir or f"{_ranks_root(g)}/lp-{uuid.uuid4().hex[:12]}"
    os.makedirs(f"{rdir}/part", exist_ok=True)
    done = _lp_completed(rdir) if run_dir else []
    start = len(done)
    if start > iterations:
        raise ValueError(
            f"run_dir {rdir} already holds {start} completed supersteps "
            f"> iterations={iterations}; pass iterations >= {start}")

    ranks = register_cache(
        truncate_plan(id_ranks(g.vmap.select("id"))).persist()
    )

    # step0: per-block initial label files = each vertex's own rank,
    # scattered into local order (one O(V) shuffle, the only one anywhere
    # in this operator — init, not per-superstep)
    def prep_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        os.makedirs(f"{rdir}/step0", exist_ok=True)
        b = int(pdf["block"].iloc[0])
        arr = np.empty(len(pdf), dtype=np.float64)
        arr[pdf["local"].to_numpy(dtype=np.int64)] = pdf["rank"].to_numpy(
            dtype=np.float64
        )
        _write_npy_atomic(f"{rdir}/step0/b{b}.npy", arr)
        return pd.DataFrame({"block": [b]})

    if start == 0:
        (
            g.vmap.join(ranks, "id")
            .select("block", "local", "rank")
            .groupBy("block")
            .applyInPandas(prep_kernel, "block int")
            .count()
        )

    work = truncate_plan(
        g.block_meta.select(
            F.col("block").alias("db"), F.col("size").alias("dsize")
        ).repartitionByRange(g.n_blocks, "db")
    )

    step_secs: list[float] = [0.0] * start  # resumed steps: no wall
    kernel_secs: list[float] = [float(d[1]) for d in done]
    changed_per_step: list[int] = [int(d[0]) for d in done]
    for step in range(start, iterations):
        t_step = time.perf_counter()
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
                    t_k = time.perf_counter()
                    old = np.load(f"{_cur}/b{db}.npy")
                    acc = old.copy()
                    blk = _load_block(store, token, db, n_blocks)
                    offs = blk[1]
                    labs, dls = [], []
                    for sb in np.flatnonzero(np.diff(offs)):
                        a, b_ = int(offs[sb]), int(offs[sb + 1])
                        ls = lbl_cache.get(sb)
                        if ls is None:
                            # full load (not mmap): gather kernels need a
                            # contiguous array; label files are V/B doubles
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
                        native.modal_vote(
                            np.concatenate(dls), np.concatenate(labs), acc
                        )
                    changed = int((acc != old).sum())
                    os.makedirs(_nxt, exist_ok=True)
                    _write_npy_atomic(f"{_nxt}/b{db}.npy", acc)
                    rows.append((db, changed, time.perf_counter() - t_k))
                yield pd.DataFrame(rows,
                                   columns=["block", "changed", "kern"])

            return step_fn

        agg = (
            work.mapInPandas(make_step_fn(cur, nxt),
                             "block int, changed long, kern double")
            .agg(F.sum("changed").alias("c"), F.sum("kern").alias("k"))
            .collect()[0]
        )
        changed = int(agg["c"])
        kernel_secs.append(float(agg["k"]))
        step_secs.append(time.perf_counter() - t_step)
        changed_per_step.append(changed)
        # completion marker AFTER the agg (resume contract, and it
        # restores this step's changed/kernel stats on resume)
        _write_npy_atomic(
            f"{rdir}/part/g{step}.npy",
            np.array([changed, float(agg["k"])], dtype=np.float64),
        )
        stale = step - keep_steps + 1
        if stale >= 0:
            shutil.rmtree(f"{rdir}/step{stale}", ignore_errors=True)
    last = f"{rdir}/step{iterations}"
    if stats is not None:
        stats["step_secs"] = [round(s, 3) for s in step_secs]
        # summed in-task block work (load + gather + vote + write) per
        # superstep: wall - kernel/slots ≈ scheduling/coordination, the
        # split the scaling-gate hygiene note reads
        stats["kernel_secs"] = [round(s, 3) for s in kernel_secs]
        stats["steps"] = iterations
        stats["changed"] = changed_per_step
        # benches checksum the final rank-space label files directly (this
        # host shares the transport dir) instead of paying the id decode
        stats["final_dir"] = last
        stats["run_dir"] = rdir

    def read_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for b in pdf["block"]:
            b = int(b)
            out.append((b, np.load(f"{last}/b{b}.npy")))
        return pd.DataFrame(out, columns=["block", "lv"])

    final = (
        g.block_meta.groupBy("block")
        .applyInPandas(read_kernel, "block int, lv array<double>")
        .select("block", F.posexplode("lv").alias("local", "flabel"))
        .join(vmap_side(g), ["block", "local"])
        .select("id", F.col("flabel").cast("long").alias("flabel"))
    )
    # rank -> owning vertex id: the inverse of the init mapping, one join
    owner = ranks.select(
        F.col("rank").alias("flabel"), F.col("id").alias("label")
    )
    return final.join(owner, "flabel").select("id", "label")
