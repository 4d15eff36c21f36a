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
    vmap_side,
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
    src_scale_dir: str | None = None,
    post: "tuple[float, float] | None" = None,
) -> float:
    """One zero-shuffle half-step: for every destination block of ``g``,
    acc[dst] += (src_vec[src] / src_norm) over the block's edges; writes
    ``dst_dir/b<db>.npy`` and returns the RAW global sum (the next
    half-step's normalizer). ``src_norm`` <= 0 => source treated as all
    zeros (the flat spec's zero-mass case).

    ``src_scale_dir`` names per-block elementwise source multipliers
    (SALSA's 1/degree vectors, loaded once per task like the source
    vectors). ``post = (add, mul)`` applies ``add + mul * acc`` before
    the write (Katz's beta + alpha·gather)."""
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
                        if src_scale_dir is not None:
                            vs = vs * np.load(f"{src_scale_dir}/b{sb}.npy")
                        vec_cache[sb] = vs
                    if blk[0] == "p":
                        native.scatter_add_pack16(blk[2][a:b_], vs, acc)
                    else:
                        native.scatter_add32(
                            blk[2][a:b_], blk[3][a:b_], vs, acc
                        )
            if post is not None:
                acc = post[0] + post[1] * acc
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


def _work_of(g: BlockedGraph) -> DataFrame:
    return truncate_plan(
        g.block_meta.select(
            F.col("block").alias("db"), F.col("size").alias("dsize")
        ).repartitionByRange(g.n_blocks, "db")
    )


def _write_const_blocks(g: BlockedGraph, out_dir: str, value: float) -> None:
    """Per-block constant vector files from block sizes alone."""
    def prep_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        os.makedirs(out_dir, exist_ok=True)
        for b, size in zip(pdf["block"], pdf["size"]):
            _write_npy_atomic(
                f"{out_dir}/b{int(b)}.npy",
                np.full(int(size), value, dtype=np.float64),
            )
        return pd.DataFrame({"block": [int(b) for b in pdf["block"]]})

    g.block_meta.groupBy("block").applyInPandas(
        prep_kernel, "block int"
    ).count()


def _write_invdeg_blocks(g: BlockedGraph, out_dir: str,
                         mask_value: float | None = None) -> None:
    """Per-block 1/out-degree vectors from block_meta's od arrays
    (mask_value instead of 1/od when given — SALSA's h0 wants the
    support mask scaled by a constant). od == 0 -> 0."""
    def prep_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        os.makedirs(out_dir, exist_ok=True)
        for b, od in zip(pdf["block"], pdf["od"]):
            od = np.asarray(od, dtype=np.float64)
            if mask_value is None:
                with np.errstate(divide="ignore"):
                    v = np.where(od > 0, 1.0 / np.maximum(od, 1), 0.0)
            else:
                v = np.where(od > 0, mask_value, 0.0)
            _write_npy_atomic(f"{out_dir}/b{int(b)}.npy", v)
        return pd.DataFrame({"block": [int(b)]})

    g.block_meta.select("block", "od").groupBy("block").applyInPandas(
        prep_kernel, "block int"
    ).count()


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

    work_fwd, work_rev = _work_of(g_fwd), _work_of(g_rev)

    # h0 = 1/n everywhere: derivable from block sizes alone, no shuffle
    _write_const_blocks(g_fwd, f"{rdir}/h0", 1.0 / n)

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


def _read_scores(
    g: BlockedGraph,
    specs: "list[tuple[str, str, float]]",
) -> DataFrame:
    """(id, <name>...) from per-block vector files: specs are
    (column_name, step_dir, divisor) — divisor <= 0 reads as zeros."""
    names = [s[0] for s in specs]

    def read_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for b in pdf["block"]:
            b = int(b)
            row = [b]
            for _name, d, div in specs:
                v = np.load(f"{d}/b{b}.npy")
                row.append(v / div if div > 0 else np.zeros_like(v))
            out.append(tuple(row))
        return pd.DataFrame(out, columns=["block"] + names)

    schema = "block int, " + ", ".join(f"{n} array<double>" for n in names)
    zipped = F.posexplode(F.arrays_zip(*names)).alias("local", "z")
    return (
        g.block_meta.groupBy("block")
        .applyInPandas(read_kernel, schema)
        .select("block", zipped)
        .select("block", "local", *[F.col(f"z.{n}").alias(n) for n in names])
        .join(vmap_side(g), ["block", "local"])
        .select("id", *names)
    )


def katz_blocked(
    spark,
    g_fwd: BlockedGraph,
    iterations: int = 2,
    alpha: float = 0.05,
    beta: float = 1.0,
    keep_steps: int = 2,
) -> DataFrame:
    """-> (id, katz): linkgraph.hits.katz on the blocked store — each
    round is ONE map-only scatter job with the affine transform
    ``beta + alpha * gather`` applied in-task before the block write
    (no normalization pass; Katz is unnormalized by spec). Build
    ``g_fwd`` from the edges AS GIVEN (the flat path counts duplicate
    edges — do not distinct)."""
    rdir = f"{_ranks_root(g_fwd)}/katz-{uuid.uuid4().hex[:12]}"
    os.makedirs(rdir, exist_ok=True)
    work = _work_of(g_fwd)
    _write_const_blocks(g_fwd, f"{rdir}/x0", float(beta))
    for t in range(iterations):
        _scatter_step(
            spark, g_fwd, work, f"{rdir}/x{t}", f"{rdir}/x{t + 1}", 1.0,
            post=(float(beta), float(alpha)),
        )
        stale = t - keep_steps + 1
        if stale >= 0:
            shutil.rmtree(f"{rdir}/x{stale}", ignore_errors=True)
    out = truncate_plan(
        _read_scores(
            g_fwd, [("katz", f"{rdir}/x{iterations}", 1.0)]
        ),
        eager=False,
    )
    out.count()
    shutil.rmtree(rdir, ignore_errors=True)
    return out


def salsa_blocked(
    spark,
    g_fwd: BlockedGraph,
    g_rev: BlockedGraph,
    iterations: int = 2,
    keep_steps: int = 2,
) -> DataFrame:
    """-> (id, hub, authority): linkgraph.hits.salsa on the blocked store
    pair — degree-normalized HITS (the TKC-resistant Lempel-Moran walk).
    The per-source 1/out-degree (authority step) and 1/in-degree (hub
    step) factors are per-block sidecar vectors derived ONCE from each
    store's own out-degree metadata (g_rev's out-degrees ARE the original
    in-degrees), multiplied into the source blocks at load time —
    column-stochastic updates, so no normalizer and no driver reduction
    beyond the O(B) partial sums. Build both stores from the DISTINCT
    edge set with one shared layout (build_hits_stores)."""
    assert g_fwd.n_blocks == g_rev.n_blocks and g_fwd.n == g_rev.n, \
        "fwd/rev stores must share the vertex layout (build_hits_stores)"
    rdir = f"{_ranks_root(g_fwd)}/salsa-{uuid.uuid4().hex[:12]}"
    os.makedirs(rdir, exist_ok=True)
    work_fwd, work_rev = _work_of(g_fwd), _work_of(g_rev)

    # scale sidecars: 1/od (authority step), 1/idg (hub step)
    _write_invdeg_blocks(g_fwd, f"{rdir}/iod")
    _write_invdeg_blocks(g_rev, f"{rdir}/iidg")
    # h0 = 1/|{out-degree > 0}| on hub-side vertices, 0 elsewhere
    n_hub = int(
        g_fwd.block_meta.agg(
            F.sum(F.size(F.filter("od", lambda x: x > 0))).alias("s")
        ).collect()[0]["s"]
        or 0
    )
    _write_invdeg_blocks(
        g_fwd, f"{rdir}/h0",
        mask_value=(1.0 / n_hub) if n_hub else 0.0,
    )

    for t in range(iterations):
        _scatter_step(
            spark, g_fwd, work_fwd,
            f"{rdir}/h{t}", f"{rdir}/a{t + 1}", 1.0,
            src_scale_dir=f"{rdir}/iod",
        )
        _scatter_step(
            spark, g_rev, work_rev,
            f"{rdir}/a{t + 1}", f"{rdir}/h{t + 1}", 1.0,
            src_scale_dir=f"{rdir}/iidg",
        )
        stale = t - keep_steps + 1
        if stale >= 0:
            shutil.rmtree(f"{rdir}/h{stale}", ignore_errors=True)
            shutil.rmtree(f"{rdir}/a{stale}", ignore_errors=True)

    out = truncate_plan(
        _read_scores(
            g_fwd,
            [("hub", f"{rdir}/h{iterations}", 1.0),
             ("authority", f"{rdir}/a{iterations}", 1.0)],
        ),
        eager=False,
    )
    out.count()
    shutil.rmtree(rdir, ignore_errors=True)
    return out
