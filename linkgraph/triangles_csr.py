"""Per-vertex triangle counting over a blocked oriented-CSR store.

The flat path (linkgraph.triangles) enumerates wedges with two |E|-scale
shuffle joins per count; its round-3 scaling reps passed the N->4N gate
but with wide variance (0.83-1.11) and 8-13 min walls at 45.7M edges —
the join plans re-exchange the oriented edge side per stage. This module
is the blocked-store answer, the same compaction discipline as
linkgraph.pagerank_csr / components_csr: ONE build job lays the oriented
adjacency down as per-block CSR sidecars, and the count itself is a
single map-only stage — B independent tasks, each a sorted-merge
adjacency intersection in native code, zero shuffle beyond the final
O(touched-vertices) count aggregation.

Algorithm (the standard degree-ordered orientation, cf. the triangle
listing literature in PAPERS.md; reference parity: per-node triangle /
clustering analytics over the link graph, /root/reference/src/ccm/
complexity.py's per-component aggregates ride the same undirected simple
graph):

- orient every undirected edge from its lower-(deg, id) endpoint to the
  higher one; every out-neighbourhood is O(sqrt(E)) even on power-law
  graphs, and ANY acyclic orientation finds each triangle exactly once
  (unique wedge apex), so blocked == flat counts exactly, not just
  statistically
- vertices get a dense global index (block offset + local, int32 =>
  <= 2^31 vertices per store; the int64 kernel variant is the documented
  scale-up); out-lists are stored SORTED by that index, so support
  |N+(a) /\ N+(b)| is one linear merge (native.tri_run)
- triangle (a, b, w) credits a (wedge apex), b (mid), and w (witness):
  a/b accrue in dense per-block int64 arrays inside the kernel, witnesses
  are bincounted per task — emitted rows total O(|E| + T), shuffled ONCE

At 100 TB scale each task streams one block's edge partition (parquet,
column-pruned) against mmap'd adjacency sidecars shared host-wide via the
page cache — the same first-touch decode contract as _load_block — so
the count is bounded by memory bandwidth, not shuffle: the shape the
N->4N gate rewards.
"""

from __future__ import annotations

import ctypes  # noqa: F401  (ctypes pointers built in native.tri_run)
import json
import os
import shutil
import uuid
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from . import native
from .lineage import truncate_plan
from .pagerank_csr import _npy_cache_dir, _write_npy_atomic

TRI_STORE_FORMAT = 1


@dataclass
class TriStore:
    store_path: str           # parquet oriented edges, partitioned by ub
    build_token: str          # uniquifies worker-side adjacency caching
    vmap: DataFrame           # (id, block, local)
    n: int
    n_blocks: int
    goff: np.ndarray          # int64[B+1] global index base per block
    fingerprint: dict = field(default_factory=dict)

    def unpersist(self) -> None:
        try:
            self.vmap.unpersist()
        except Exception:
            pass

    def delete(self) -> None:
        """Unpersist and remove the on-disk store + decoded sidecars."""
        import tempfile

        self.unpersist()
        shutil.rmtree(self.store_path, ignore_errors=True)
        for root in (
            os.environ.get("LINKGRAPH_NPY_DIR"),
            tempfile.gettempdir(),
        ):
            if root:
                shutil.rmtree(
                    f"{root}/{self.build_token}", ignore_errors=True
                )


def _canon_pairs(edges: DataFrame) -> DataFrame:
    return (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )


def build_tri_store(
    spark,
    edges: DataFrame,
    n_blocks: int | None = None,
    store_path: str | None = None,
    fingerprint: dict | None = None,
    persist_sidecars: bool | None = None,
) -> TriStore:
    """One-time compaction: directed edges(src,dst) -> oriented blocked
    adjacency store. All |E|-scale work is JVM-side (joins + one
    partitioned write); the driver holds only O(B) scalars."""
    if n_blocks is None:
        n_blocks = 2 * int(spark.conf.get("spark.sql.shuffle.partitions"))
    build_token = uuid.uuid4().hex
    if persist_sidecars is None:
        persist_sidecars = store_path is not None
    if store_path is None:
        base = (
            "/dev/shm/linkgraph-tri"
            if os.path.isdir("/dev/shm")
            else "/tmp/linkgraph-tri"
        )
        store_path = f"{base}/{build_token}"
    else:
        shutil.rmtree(f"{store_path}/npy", ignore_errors=True)

    pairs = _canon_pairs(edges)
    sym = pairs.unionByName(
        pairs.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = sym.groupBy(F.col("u").alias("id")).agg(F.count("*").alias("deg"))

    w = Window.partitionBy("block").orderBy("id")
    vmap = (
        deg.select(
            "id", "deg", F.pmod(F.col("id"), F.lit(n_blocks)).cast("int").alias("block")
        )
        .withColumn("local", (F.row_number().over(w) - 1).cast("int"))
        .persist()
    )
    # O(B) scalars: block sizes -> global index offsets
    sizes_rows = (
        vmap.groupBy("block").agg(F.count("*").cast("long").alias("sz")).collect()
    )
    sizes = np.zeros(n_blocks, dtype=np.int64)
    for r in sizes_rows:
        sizes[int(r["block"])] = int(r["sz"])
    goff = np.zeros(n_blocks + 1, dtype=np.int64)
    np.cumsum(sizes, out=goff[1:])
    n = int(goff[-1])
    assert n < 2**31, (
        f"tri store global index is int32 (n={n}); use the int64 kernel "
        "variant beyond 2^31 vertices"
    )

    # orient low-(deg, id) -> high-(deg, id); map both endpoints to
    # (block, local). Performance-only choice of orientation: ANY total
    # order yields identical counts (each triangle has one wedge apex).
    umap = vmap.select(
        F.col("id").alias("u"), F.col("deg").alias("du"),
        F.col("block").alias("ub0"), F.col("local").alias("ul0"),
    )
    vmap2 = vmap.select(
        F.col("id").alias("v"), F.col("deg").alias("dv"),
        F.col("block").alias("vb0"), F.col("local").alias("vl0"),
    )
    a_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        pairs.join(umap, "u")
        .join(vmap2, "v")
        .select(
            F.when(a_first, F.col("ub0")).otherwise(F.col("vb0")).alias("ub"),
            F.when(a_first, F.col("ul0")).otherwise(F.col("vl0")).alias("al"),
            F.when(a_first, F.col("vb0")).otherwise(F.col("ub0")).alias("vb"),
            F.when(a_first, F.col("vl0")).otherwise(F.col("ul0")).alias("bl"),
        )
    )
    # ONE parquet partition per a-block, clustered by (vb, al): the count
    # task consumes contiguous vb runs; adjacency CSR is derived from the
    # same partition at first touch (lexsort by (al, global(b)))
    (
        oriented.repartition("ub")
        .sortWithinPartitions("ub", "vb", "al")
        .write.mode("overwrite")
        .partitionBy("ub")
        .parquet(f"{store_path}/edges")
    )
    if persist_sidecars:
        vmap.write.mode("overwrite").parquet(f"{store_path}/_vmap")
    with open(f"{store_path}/_info.json", "w") as f:
        json.dump(
            {
                "format": TRI_STORE_FORMAT,
                "n": n,
                "n_blocks": n_blocks,
                "build_token": build_token,
                "goff": [int(x) for x in goff],
                "sidecars": bool(persist_sidecars),
                "fingerprint": fingerprint or {},
            },
            f,
        )
    return TriStore(
        store_path, build_token, vmap, n, n_blocks, goff, fingerprint or {}
    )


def load_tri_store(spark, store_path: str) -> TriStore:
    """Reopen a store written by build_tri_store (no recompute)."""
    with open(f"{store_path}/_info.json") as f:
        info = json.load(f)
    if not info.get("sidecars", True):
        raise ValueError(
            f"tri store {store_path} was built ephemeral "
            "(persist_sidecars=False); rebuild with a named store_path"
        )
    if info.get("format") != TRI_STORE_FORMAT:
        raise ValueError(
            f"tri store {store_path} is format {info.get('format')}, "
            f"engine expects {TRI_STORE_FORMAT}"
        )
    vmap = spark.read.parquet(f"{store_path}/_vmap").persist()
    return TriStore(
        store_path,
        info["build_token"],
        vmap,
        int(info["n"]),
        int(info["n_blocks"]),
        np.asarray(info["goff"], dtype=np.int64),
        info.get("fingerprint") or {},
    )


# worker-global adjacency cache: (token, block) -> (aip, aadj) mmaps
_ADJ_CACHE: dict = {}


def _load_adj(
    store: str, token: str, block: int, size: int, goff: np.ndarray
):
    """Worker-side oriented out-adjacency CSR for one block: (aip int64
    [size+1], aadj int32 sorted global indices). First touch anywhere on
    the host lexsorts the block's parquet partition into .npy sidecars
    (atomic rename, idempotent under racing/speculative tasks); later
    loads mmap them — one decoded image host-wide, pages shared."""
    key = (token, block)
    hit = _ADJ_CACHE.get(key)
    if hit is not None:
        return hit
    cache_dir = _npy_cache_dir(store, token)
    aip_p = f"{cache_dir}/tri{block}.aip.npy"
    adj_p = f"{cache_dir}/tri{block}.adj.npy"
    if not os.path.exists(aip_p):
        vb, al, bl = _read_edge_partition(store, block)
        bg = (goff[vb] + bl).astype(np.int32)
        order = np.lexsort((bg, al))
        aadj = bg[order]
        aip = np.searchsorted(
            al[order], np.arange(size + 1, dtype=np.int64)
        ).astype(np.int64)
        _write_npy_atomic(adj_p, aadj)
        _write_npy_atomic(aip_p, aip)  # aip last: presence = decoded
    hit = (np.load(aip_p), np.load(adj_p, mmap_mode="r"))
    _ADJ_CACHE[key] = hit
    if len(_ADJ_CACHE) > int(
        os.environ.get("LINKGRAPH_EDGE_CACHE_ENTRIES", "8192")
    ):
        _ADJ_CACHE.pop(next(iter(_ADJ_CACHE)))
    return hit


def _read_edge_partition(store: str, block: int):
    """(vb, al, bl) int64 arrays for one a-block, in (vb, al) order."""
    import pyarrow.parquet as pq

    part = f"{store}/edges/ub={block}"
    if not os.path.exists(part):
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    t = pq.read_table(part, columns=["vb", "al", "bl"])
    vb = t.column("vb").to_numpy().astype(np.int64, copy=False)
    al = t.column("al").to_numpy().astype(np.int64, copy=False)
    bl = t.column("bl").to_numpy().astype(np.int64, copy=False)
    if len(vb) and np.any(np.diff(vb) < 0):
        # defensive vs a future writer re-sorting by partition column only
        order = np.lexsort((al, vb))
        vb, al, bl = vb[order], al[order], bl[order]
    return vb, al, bl


def _count_kernel(
    store: str,
    token: str,
    goff: np.ndarray,
    sizes: np.ndarray,
    ub: int,
    per_vertex: bool,
):
    """Count all triangles whose wedge apex lives in block ub. Returns
    (total, rows) where rows is a list of (global_idx, count) arrays when
    per_vertex (apex + mid + witness credits, aggregated task-side)."""
    import time as _time

    t0 = _time.perf_counter()
    vb, al, bl = _read_edge_partition(store, block=ub)
    aip, aadj = _load_adj(store, token, ub, int(sizes[ub]), goff)
    total = 0
    rows: list[tuple[np.ndarray, np.ndarray]] = []
    if len(vb) == 0:
        return 0, rows, _time.perf_counter() - t0
    cnt_a = np.zeros(int(sizes[ub]), dtype=np.int64) if per_vertex else None
    cnt_vb: dict[int, np.ndarray] = {}
    wit_parts: list[np.ndarray] = []
    # contiguous vb runs (partition is (vb, al)-sorted)
    run_starts = np.flatnonzero(np.r_[True, vb[1:] != vb[:-1]])
    run_ends = np.r_[run_starts[1:], len(vb)]
    for s, e in zip(run_starts, run_ends):
        b = int(vb[s])
        bip, badj = _load_adj(store, token, b, int(sizes[b]), goff)
        if per_vertex:
            if b == ub:
                cb = cnt_a  # diagonal run: same dense buffer
            else:
                cb = cnt_vb.get(b)
                if cb is None:
                    cb = cnt_vb[b] = np.zeros(int(sizes[b]), dtype=np.int64)
            t, wit = native.tri_run(
                al[s:e], bl[s:e], aip, aadj, bip, badj,
                cnt_a=cnt_a, cnt_b=cb, collect_witness=True,
            )
            if len(wit):
                wit_parts.append(wit)
        else:
            t, _ = native.tri_run(al[s:e], bl[s:e], aip, aadj, bip, badj)
        total += t
    if per_vertex:
        nz = np.flatnonzero(cnt_a)
        if len(nz):
            rows.append(((goff[ub] + nz).astype(np.int64), cnt_a[nz]))
        for b, cb in cnt_vb.items():
            nz = np.flatnonzero(cb)
            if len(nz):
                rows.append(((goff[b] + nz).astype(np.int64), cb[nz]))
        if wit_parts:
            uw, cw = np.unique(np.concatenate(wit_parts), return_counts=True)
            rows.append((uw.astype(np.int64), cw.astype(np.int64)))
    return total, rows, _time.perf_counter() - t0


def _work_frame(spark, ts: TriStore) -> DataFrame:
    """One row per block, range-partitioned so each task owns ~1 block."""
    blocks = spark.range(ts.n_blocks).select(F.col("id").cast("int").alias("ub"))
    return truncate_plan(
        blocks.repartitionByRange(ts.n_blocks, "ub"), eager=False
    )


def _sizes_from_goff(goff: np.ndarray) -> np.ndarray:
    return np.diff(goff).astype(np.int64)


def triangle_counts_blocked(
    spark, ts: TriStore, vertices: DataFrame | None = None
) -> DataFrame:
    """-> (id, triangles), exactly linkgraph.triangles.triangle_counts.

    One map stage over the B block partitions (apex/mid credits in-kernel,
    witness bincount task-side), one O(touched + T) count aggregation,
    one join back to ids. ``vertices`` (optional) left-joins zero rows
    for vertices outside the simple graph (flat-path contract)."""
    store, token = ts.store_path, ts.build_token
    goff, sizes = ts.goff, _sizes_from_goff(ts.goff)

    def task(batches):
        for pdf in batches:
            for ub in pdf["ub"]:
                _, rows, _sec = _count_kernel(
                    store, token, goff, sizes, int(ub), per_vertex=True
                )
                for gidx, cnt in rows:
                    yield pd.DataFrame({"gidx": gidx, "cnt": cnt})

    work = _work_frame(spark, ts)
    counts = (
        work.mapInPandas(task, "gidx long, cnt long")
        .groupBy("gidx")
        .agg(F.sum("cnt").alias("triangles"))
    )
    offsets = spark.createDataFrame(
        [(b, int(goff[b])) for b in range(ts.n_blocks)], "block int, off long"
    )
    idmap = ts.vmap.join(F.broadcast(offsets), "block").select(
        "id", (F.col("off") + F.col("local")).alias("gidx")
    )
    out = idmap.join(counts, "gidx", "left").select(
        "id", F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles")
    )
    if vertices is not None:
        out = (
            vertices.select("id")
            .join(out, "id", "left")
            .select(
                "id",
                F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
            )
        )
    return out


def edge_supports_blocked(spark, ts: TriStore) -> DataFrame:
    """-> (u, v, support) for every undirected edge in >= 1 triangle:
    support = number of triangles containing the edge (u < v by id) —
    the k-truss peeling primitive / link-farm cohesion signal, blocked.

    Each triangle (a, b, w) found at apex edge (a, b) credits its THREE
    edges: (a, b) from the kernel's per-edge ``sup`` array, and (a, w) /
    (b, w) reconstructed task-side by segmenting the witness buffer with
    cumsum(sup) (the kernel appends witnesses in edge order). Credits are
    pre-aggregated per task (np.unique over sorted pair keys), then ONE
    count aggregation + id joins — the same O(T) shuffle the flat path's
    triangle-edge explode pays, without the wedge joins before it."""
    store, token = ts.store_path, ts.build_token
    goff, sizes = ts.goff, _sizes_from_goff(ts.goff)
    n = max(ts.n, 1)

    def task(batches):
        for pdf in batches:
            for ub in pdf["ub"]:
                ub = int(ub)
                vb, al, bl = _read_edge_partition(store, ub)
                if len(vb) == 0:
                    continue
                aip, aadj = _load_adj(store, token, ub, int(sizes[ub]), goff)
                ag_all = goff[ub] + al
                keys: list[np.ndarray] = []
                run_starts = np.flatnonzero(np.r_[True, vb[1:] != vb[:-1]])
                run_ends = np.r_[run_starts[1:], len(vb)]
                for s_, e_ in zip(run_starts, run_ends):
                    b = int(vb[s_])
                    bip, badj = _load_adj(store, token, b, int(sizes[b]), goff)
                    m = e_ - s_
                    sup = np.zeros(m, dtype=np.int64)
                    _, wit = native.tri_run(
                        al[s_:e_], bl[s_:e_], aip, aadj, bip, badj,
                        collect_witness=True, sup=sup,
                    )
                    if wit is None or not len(wit):
                        continue
                    ag = ag_all[s_:e_]
                    bg = goff[b] + bl[s_:e_]
                    wg = wit.astype(np.int64)
                    # apex edge (a,b): one key per edge weighted by sup;
                    # (a,w) and (b,w): one key per triangle
                    a_rep = np.repeat(ag, sup)
                    b_rep = np.repeat(bg, sup)
                    for x, y in ((a_rep, b_rep), (a_rep, wg), (b_rep, wg)):
                        lo, hi = np.minimum(x, y), np.maximum(x, y)
                        keys.append(lo * n + hi)  # n < 2^31 => fits i64
                if not keys:
                    continue
                uk, cnt = np.unique(np.concatenate(keys), return_counts=True)
                yield pd.DataFrame({
                    "ug": uk // n, "vg": uk % n, "c": cnt.astype(np.int64)
                })

    work = _work_frame(spark, ts)
    counts = (
        work.mapInPandas(task, "ug long, vg long, c long")
        .groupBy("ug", "vg")
        .agg(F.sum("c").alias("support"))
    )
    offsets = spark.createDataFrame(
        [(b, int(goff[b])) for b in range(ts.n_blocks)], "block int, off long"
    )
    idmap = ts.vmap.join(F.broadcast(offsets), "block").select(
        "id", (F.col("off") + F.col("local")).alias("g")
    )
    return (
        counts
        .join(idmap.select(F.col("g").alias("ug"), F.col("id").alias("iu")), "ug")
        .join(idmap.select(F.col("g").alias("vg"), F.col("id").alias("iv")), "vg")
        .select(
            F.least("iu", "iv").alias("u"),
            F.greatest("iu", "iv").alias("v"),
            F.col("support").cast("long").alias("support"),
        )
    )


def clustering_coefficients_blocked(
    spark, ts: TriStore, vertices: DataFrame | None = None
) -> DataFrame:
    """-> (id, deg, triangles, lcc), exactly
    linkgraph.triangles.clustering_coefficients — the store's vmap
    already carries each vertex's distinct-neighbour degree (computed for
    the orientation), so this is the blocked count + ONE join, no extra
    degree aggregate."""
    tri = triangle_counts_blocked(spark, ts, vertices)
    deg = ts.vmap.select("id", "deg")
    return tri.join(deg, "id", "left").select(
        "id",
        F.coalesce("deg", F.lit(0)).cast("long").alias("deg"),
        F.col("triangles").cast("long").alias("triangles"),
        F.when(
            F.coalesce("deg", F.lit(0)) >= 2,
            F.round(
                2.0 * F.col("triangles") / (F.col("deg") * (F.col("deg") - 1)),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("lcc"),
    )


def ktruss_blocked(
    spark,
    edges: DataFrame,
    k: int = 3,
    rounds: int | None = None,
    n_blocks: int | None = None,
) -> DataFrame:
    """-> (u, v, support): the k-truss via blocked peeling — same
    semantics as linkgraph.triangles.ktruss (support in the output is the
    edge's triangle count within the PREVIOUS round's survivor set;
    ``rounds=None`` peels to the fixpoint), but each round's support pass
    is the map-only blocked kernel instead of two wedge-join shuffles.
    The store is rebuilt per round over the shrinking survivor set — a
    one-time compaction whose cost drops geometrically as edges peel (the
    flat path pays its per-round shuffles on the same shrinking set)."""
    from .lineage import truncate_plan

    def _round(cur: DataFrame) -> "tuple[DataFrame, int]":
        ts = build_tri_store(
            spark,
            cur.select(F.col("u").alias("src"), F.col("v").alias("dst")),
            n_blocks=n_blocks,
        )
        supp = edge_supports_blocked(spark, ts)
        out = truncate_plan(
            cur.select("u", "v")
            .join(supp, ["u", "v"], "left")
            .select(
                "u", "v",
                F.coalesce("support", F.lit(0)).cast("long").alias("support"),
            )
            .where(F.col("support") >= k - 2),
            eager=False,
        )
        # the round's ONE action: materializes the checkpoint blocks
        # (store can then be deleted) AND is the fixpoint count
        n = out.count()
        ts.delete()
        return out, n

    cur = _canon_pairs(edges)
    if rounds is not None:
        for _ in range(rounds):
            cur, _n = _round(cur)
        return cur
    n_prev = cur.count()
    while True:
        cur, n_cur = _round(cur)
        if n_cur == n_prev or n_cur == 0:
            break
        n_prev = n_cur
    return cur


def triangle_total_blocked(spark, ts: TriStore, stats: dict | None = None) -> int:
    """Total triangle count — the scaling-gate workload: B independent
    map tasks, each one native merge pass over its block's edges; the
    only cross-task traffic is B (block, total, seconds) scalars."""
    store, token = ts.store_path, ts.build_token
    goff, sizes = ts.goff, _sizes_from_goff(ts.goff)

    def task(batches):
        for pdf in batches:
            out = []
            for ub in pdf["ub"]:
                t, _, sec = _count_kernel(
                    store, token, goff, sizes, int(ub), per_vertex=False
                )
                out.append((int(ub), t, sec))
            if out:
                yield pd.DataFrame(out, columns=["ub", "t", "sec"])

    work = _work_frame(spark, ts)
    row = (
        work.mapInPandas(task, "ub int, t long, sec double")
        .agg(F.sum("t").alias("t"), F.collect_list("sec").alias("secs"))
        .collect()[0]
    )
    if stats is not None:
        stats["block_secs"] = sorted(round(s, 3) for s in row["secs"])
        stats["kernel_sec_sum"] = round(sum(row["secs"]), 3)
    return int(row["t"])
