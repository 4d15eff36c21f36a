"""Blocked-CSR PageRank — the engine's high-throughput superstep.

The flat DataFrame superstep (linkgraph.pagerank) shuffles |E| rows per
iteration; correct, declarative, but row-shuffle-bound. This module is the
scale path mandated by the north star (edge table compacted into
per-partition CSR blocks, PageRank run *on that layout*): the classic
2D-blocked sparse-matrix × vector formulation (cf. MLlib BlockMatrix):

- vertex space is hash-partitioned into B blocks; each vertex gets a dense
  local index within its block (one-time `row_number` shuffle)
- edges compact once into per-(src_block, dst_block) triplet arrays
  (src_local, dst_local, weight = 1/out_deg), written to Parquet
  partitioned by (db, sb) — the static side of every superstep
- a superstep joins the B^2-row *block index* (no edge payload) with the B
  rank-vector rows and runs a numpy ``bincount`` kernel per destination
  block inside ``applyInPandas``. The edge arrays are side-loaded from the
  Parquet block store and memoized in a worker-global cache
  (spark.python.worker.reuse keeps workers alive across supersteps), so
  per-superstep traffic is O(B * |rank block|) vectors — never O(|E|) rows.

At cluster scale the block store lives on shared storage (HDFS/S3/Iceberg
data files) and the worker cache plays the role of executor-resident state;
sizing: pick B so a block's rank vector fits an executor
(10^12 vertices * 8B / B ≈ 1-2 GiB → B ≈ 4-8k).

Semantics are identical to linkgraph.pagerank / networkx.pagerank
(damping, uniform teleport, dangling mass redistributed uniformly, L1
convergence); tests pin blocked == flat == networkx.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .checkpoint import StepTimer
from .lineage import truncate_plan
from .pagerank import (
    PageRankResult,
    SuperstepInfo,
    _persistent_rdd_ids,
    _unpersist_rdds,
)

# worker-global memo: (store_path, db, sb) -> (sl, dl, w) numpy triplets.
# Populated lazily inside the superstep kernel; safe because the block
# store is immutable for the lifetime of a BlockedGraph.
_EDGE_CACHE: dict = {}


@dataclass
class BlockedGraph:
    store_path: str            # parquet block store, partitioned by (db, sb)
    pair_index: DataFrame      # (sb, db) — one row per non-empty block pair
    vmap: DataFrame            # (id, block, local)
    block_sizes: dict[int, int]
    dangling_locals: dict[int, list[int]]  # block -> locals with out_deg 0
    n: int
    n_blocks: int


def build_blocked(
    spark,
    edges: DataFrame,
    vertices: DataFrame,
    n_blocks: int | None = None,
    store_path: str | None = None,
) -> BlockedGraph:
    """One-time compaction: edges(src,dst) + vertices(id) -> BlockedGraph.

    All heavy lifting is JVM-side (joins + one write); no Python touches
    the |E| rows here.
    """
    if n_blocks is None:
        n_blocks = 2 * int(spark.conf.get("spark.sql.shuffle.partitions"))
    if store_path is None:
        base = (
            "/dev/shm/linkgraph-blocks"
            if os.path.isdir("/dev/shm")
            else "/tmp/linkgraph-blocks"
        )
        store_path = f"{base}/{abs(hash((id(edges), n_blocks)))}"

    w = Window.partitionBy("block").orderBy("id")
    vmap = (
        vertices.select(
            "id", F.pmod(F.col("id"), F.lit(n_blocks)).cast("int").alias("block")
        )
        .withColumn("local", (F.row_number().over(w) - 1).cast("long"))
        .persist()
    )
    n = vmap.count()
    block_sizes = {
        int(r["block"]): int(r["c"])
        for r in vmap.groupBy("block").agg(F.count("*").alias("c")).collect()
    }
    out_deg = edges.groupBy("src").agg(F.count("*").alias("od"))
    dangling = (
        vmap.join(out_deg, vmap["id"] == out_deg["src"], "left_anti")
        .select("block", "local")
        .collect()
    )
    dangling_locals: dict[int, list[int]] = {}
    for r in dangling:
        dangling_locals.setdefault(int(r["block"]), []).append(int(r["local"]))

    src_map = vmap.select(
        F.col("id").alias("src"), F.col("block").alias("sb"), F.col("local").alias("sl")
    )
    dst_map = vmap.select(
        F.col("id").alias("dst"), F.col("block").alias("db"), F.col("local").alias("dl")
    )
    e2 = (
        edges.join(out_deg, "src")
        .join(src_map, "src")
        .join(dst_map, "dst")
        .select("sb", "db", "sl", "dl", (F.lit(1.0) / F.col("od")).alias("w"))
    )
    (
        e2.repartition("db", "sb")
        .sortWithinPartitions("sl")
        .write.mode("overwrite")
        .partitionBy("db", "sb")
        .parquet(store_path)
    )
    pair_index = truncate_plan(
        spark.read.parquet(store_path).select("sb", "db").distinct()
    )
    return BlockedGraph(
        store_path, pair_index, vmap, block_sizes, dangling_locals, n, n_blocks
    )


def _load_block(store_path: str, db: int, sb: int):
    key = (store_path, db, sb)
    hit = _EDGE_CACHE.get(key)
    if hit is None:
        import pyarrow.parquet as pq

        t = pq.read_table(f"{store_path}/db={db}/sb={sb}", columns=["sl", "dl", "w"])
        hit = (
            t.column("sl").to_numpy().astype(np.int64, copy=False),
            t.column("dl").to_numpy().astype(np.int64, copy=False),
            t.column("w").to_numpy().astype(np.float64, copy=False),
        )
        _EDGE_CACHE[key] = hit
    return hit


def pagerank_blocked(
    spark,
    g: BlockedGraph,
    damping: float = 0.85,
    tol: float = 1e-9,
    max_iter: int = 100,
) -> PageRankResult:
    """-> PageRankResult whose .ranks is (id, rank) via the vertex map."""
    n, sizes, dmask = g.n, g.block_sizes, g.dangling_locals
    store = g.store_path
    all_blocks = sorted(sizes)
    ranks_pdf = pd.DataFrame(
        {"block": all_blocks, "rv": [np.full(sizes[b], 1.0 / n) for b in all_blocks]}
    )
    before0 = _persistent_rdd_ids(spark)
    ranks_df = truncate_plan(
        spark.createDataFrame(ranks_pdf, "block int, rv array<double>")
    )
    ckpt_ids = _persistent_rdd_ids(spark) - before0

    dangling = sum((1.0 / n) * len(locs) for locs in dmask.values())
    supersteps: list[SuperstepInfo] = []
    converged = False

    def reduce_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        db = int(pdf["db"].iloc[0])
        acc = np.zeros(sizes[db])
        for sb, rv in zip(pdf["sb"], pdf["rv"]):
            sl, dl, wv = _load_block(store, db, int(sb))
            rv = np.asarray(rv, dtype=np.float64)
            acc += np.bincount(dl, weights=rv[sl] * wv, minlength=sizes[db])
        return pd.DataFrame({"block": [db], "contrib": [acc]})

    for step in range(max_iter):
        with StepTimer() as t:
            base = (1.0 - damping) / n + damping * dangling / n
            joined = g.pair_index.join(
                ranks_df.select(F.col("block").alias("sb"), "rv"), "sb"
            )
            contribs = joined.groupBy("db").applyInPandas(
                reduce_kernel, "block int, contrib array<double>"
            )
            old = ranks_df.select("block", F.col("rv").alias("rv_old"))

            def update_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
                rows = []
                for b, rv_old, contrib in zip(
                    pdf["block"], pdf["rv_old"], pdf["contrib"]
                ):
                    b = int(b)
                    c = (
                        np.asarray(contrib, dtype=np.float64)
                        if contrib is not None
                        else np.zeros(sizes[b])
                    )
                    new = base + damping * c
                    old_v = np.asarray(rv_old, dtype=np.float64)
                    locs = dmask.get(b)
                    rows.append(
                        (
                            b,
                            new,
                            float(np.abs(new - old_v).sum()),
                            float(new[locs].sum()) if locs else 0.0,
                        )
                    )
                return pd.DataFrame(rows, columns=["block", "rv", "l1", "dm"])

            before = _persistent_rdd_ids(spark)
            state = (
                old.join(contribs, "block", "left")
                .groupBy("block")
                .applyInPandas(
                    update_kernel, "block int, rv array<double>, l1 double, dm double"
                )
            )
            state = truncate_plan(state)
            row = state.agg(F.sum("l1").alias("l1"), F.sum("dm").alias("dm")).collect()[0]
            delta, next_dangling = float(row["l1"]), float(row["dm"])
            new_ids = _persistent_rdd_ids(spark) - before
            _unpersist_rdds(spark, ckpt_ids)
            ckpt_ids = new_ids
            ranks_df = state.select("block", "rv")
        supersteps.append(SuperstepInfo(step, delta, dangling, t.seconds))
        dangling = next_dangling
        if delta < tol:
            converged = True
            break

    flat = (
        ranks_df.select("block", F.posexplode("rv").alias("local", "rank"))
        .join(g.vmap, ["block", "local"])
        .select("id", "rank")
    )
    return PageRankResult(flat, len(supersteps), converged, supersteps)
