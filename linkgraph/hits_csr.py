"""HITS (hubs & authorities) on the blocked-CSR store — zero-shuffle
supersteps over BOTH edge orientations.

The flat path (linkgraph.hits) shuffles |E| rows twice per iteration
(authority gather keyed on dst, hub gather keyed on src) — the exact
shape that failed the N->4N gate for flat LP. This module runs the same
spec on two block stores sharing ONE vertex layout:

- ``g_fwd``  — edges as given, grouped by destination block: the
  authority half-step is pagerank's scatter-add kernel verbatim
  (acc[dst_local] += h[src_local]);
- ``g_rev``  — edges reversed, so the hub half-step is the SAME kernel
  on the other store (acc[src] += a[dst]).

Both stores are built from the same DISTINCT edge set with the same
hash blocking and vertex set, so (block, local) coordinates agree and
the per-step score vectors are shared .npy files (the rank-file
transport of pagerank_csr / components_csr / labelprop_csr).

L1 normalization per half-step (the flat spec) is folded into the NEXT
half-step's block loads: each half-step scatters RAW vectors and
returns per-block partial sums (O(B) scalars — the only cross-task
traffic), the driver forms the normalizer, and the next kernel divides
each loaded source block by it — numerically the same per-element
division the flat path performs, without a separate normalization pass
over V. Scores match linkgraph.hits to float64 round-off (pinned
allclose 1e-9 by tests/test_hits_csr.py and the dual-engine oracle row,
which rounds to 6 decimals like the flat row).
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
    build_blocked,
)


def build_hits_stores(
    spark,
    edges: DataFrame,
    vertices: DataFrame,
    n_blocks: int | None = None,
    store_path: str | None = None,
) -> "tuple[BlockedGraph, BlockedGraph]":
    """-> (g_fwd, g_rev) over the DISTINCT edge set, one shared vertex
    layout (same hash blocking + n_blocks => identical (block, local)
    coordinates in both stores)."""
    if n_blocks is None:
        n_blocks = 2 * int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.select("src", "dst").distinct().persist()
    ids = vertices.select("id")
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


def _scatter_step(
    spark,
    g: BlockedGraph,
    work: DataFrame,
    src_dir: str,
    dst_dir: str,
    src_norm: float,
) -> float:
    """One zero-shuffle half-step: for every destination block of ``g``,
    acc[dst] += (src_vec[src] / src_norm) over the block's edges; writes
    ``dst_dir/b<db>.npy`` and returns the RAW global sum (the next
    half-step's normalizer). ``src_norm`` <= 0 => source treated as all
    zeros (the flat spec's zero-mass case)."""
    store, token, n_blocks = g.store_path, g.build_token, g.n_blocks

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
            if src_norm > 0:
                for sb in np.flatnonzero(np.diff(offs)):
                    a, b_ = int(offs[sb]), int(offs[sb + 1])
                    vs = vec_cache.get(sb)
                    if vs is None:
                        # normalization folded into the load: the same
                        # per-element division the flat path performs
                        vs = np.load(f"{src_dir}/b{sb}.npy") / src_norm
                        vec_cache[sb] = vs
                    if blk[0] == "p":
                        native.scatter_add_pack16(blk[2][a:b_], vs, acc)
                    else:
                        native.scatter_add32(
                            blk[2][a:b_], blk[3][a:b_], vs, acc
                        )
            os.makedirs(dst_dir, exist_ok=True)
            _write_npy_atomic(f"{dst_dir}/b{db}.npy", acc)
            rows.append((db, float(acc.sum())))
        yield pd.DataFrame(rows, columns=["block", "part"])

    row = (
        work.mapInPandas(step_fn, "block int, part double")
        .agg(F.sum("part").alias("s"))
        .collect()[0]
    )
    return float(row["s"] or 0.0)


def hits_blocked(
    spark,
    g_fwd: BlockedGraph,
    g_rev: BlockedGraph,
    iterations: int = 50,
    keep_steps: int = 2,
) -> DataFrame:
    """-> (id, hub, authority) after ``iterations`` full HITS rounds —
    the spec of linkgraph.hits.hits, on the blocked stores.

    Per round: TWO map-only jobs (authority scatter on g_fwd, hub
    scatter on g_rev), O(B) scalar driver traffic each, no shuffle. The
    missing-block case (a vertex block with no in-edges anywhere) still
    writes its zero vector, so every block file exists every step."""
    assert g_fwd.n_blocks == g_rev.n_blocks and g_fwd.n == g_rev.n, \
        "fwd/rev stores must share the vertex layout (build_hits_stores)"
    rdir = f"{_ranks_root(g_fwd)}/hits-{uuid.uuid4().hex[:12]}"
    os.makedirs(rdir, exist_ok=True)
    n = g_fwd.n

    def work_of(g: BlockedGraph) -> DataFrame:
        return truncate_plan(
            g.block_meta.select(
                F.col("block").alias("db"), F.col("size").alias("dsize")
            ).repartitionByRange(g.n_blocks, "db")
        )

    work_fwd, work_rev = work_of(g_fwd), work_of(g_rev)

    # h0 = 1/n everywhere: derivable from block sizes alone, no shuffle
    def prep_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        os.makedirs(f"{rdir}/h0", exist_ok=True)
        for b, size in zip(pdf["block"], pdf["size"]):
            _write_npy_atomic(
                f"{rdir}/h0/b{int(b)}.npy",
                np.full(int(size), 1.0 / n, dtype=np.float64),
            )
        return pd.DataFrame({"block": [int(b) for b in pdf["block"]]})

    g_fwd.block_meta.groupBy("block").applyInPandas(
        prep_kernel, "block int"
    ).count()

    h_norm = 1.0  # h0 is already normalized
    a_norm = 1.0
    for t in range(iterations):
        # authority: a_raw = A^T (h / h_norm) — scatter over g_fwd
        a_norm = _scatter_step(
            spark, g_fwd, work_fwd,
            f"{rdir}/h{t}", f"{rdir}/a{t + 1}", h_norm,
        )
        # hub: h_raw = A (a / a_norm) — scatter over g_rev
        h_norm = _scatter_step(
            spark, g_rev, work_rev,
            f"{rdir}/a{t + 1}", f"{rdir}/h{t + 1}", a_norm,
        )
        stale = t - keep_steps + 1
        if stale >= 0:
            shutil.rmtree(f"{rdir}/h{stale}", ignore_errors=True)
            shutil.rmtree(f"{rdir}/a{stale}", ignore_errors=True)

    ha, hn = f"{rdir}/a{iterations}", f"{rdir}/h{iterations}"
    an_s, hn_s = a_norm, h_norm

    def read_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for b in pdf["block"]:
            b = int(b)
            a = np.load(f"{ha}/b{b}.npy")
            h = np.load(f"{hn}/b{b}.npy")
            out.append((
                b,
                (h / hn_s if hn_s > 0 else np.zeros_like(h)),
                (a / an_s if an_s > 0 else np.zeros_like(a)),
            ))
        return pd.DataFrame(out, columns=["block", "hv", "av"])

    scores = (
        g_fwd.block_meta.groupBy("block")
        .applyInPandas(
            read_kernel, "block int, hv array<double>, av array<double>"
        )
        .select(
            "block",
            F.posexplode(F.arrays_zip("hv", "av")).alias("local", "z"),
        )
        .select("block", "local", "z.hv", "z.av")
        .join(g_fwd.vmap, ["block", "local"])
        .select(
            "id", F.col("hv").alias("hub"), F.col("av").alias("authority")
        )
    )
    out = truncate_plan(scores, eager=False)
    out.count()  # materialize before callers delete the stores
    shutil.rmtree(rdir, ignore_errors=True)
    return out
