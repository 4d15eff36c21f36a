"""Deterministic Luby MIS on the blocked-CSR store — scatter-min rounds
with zero shuffle (round-4 verdict item #2).

The scale-path twin of ``linkgraph.mis.maximal_independent_set``: every
round, an UNDECIDED vertex joins the set iff its priority beats every
undecided neighbor's, and the new members' undecided neighbors are
eliminated. The flat round is a |2E|-row join + min-agg + two anti-joins
per round — the exact per-superstep exchange shape that measured 0.40 on
label propagation's N->4N gate before its blocked port. Here a round is
TWO map-only jobs over the per-block work index, each a scatter-MIN over
the compacted store (the connected-components kernel, gate median 0.93,
BENCH/BASELINE.md) with a state-masked source vector:

- **win job**: per destination block, acc = +inf, then scatter-min of
  ``eff = prio if undecided else +inf`` over all in-edges; vertex d wins
  iff it is undecided and ``prio[d] < acc[d]`` (strict — distinct
  priorities). Winners are written as a per-block 0/1 vector.
- **eliminate job**: same scatter-min with ``eff = 0 if just-won else
  +inf``; an undecided non-winner with a finite min has a winning
  neighbor and becomes 'out'. (Adjacent vertices can never both win, so
  the win/eliminate precedence is vacuous.)

Priorities: the flat path orders vertices by the PORTABLE string
``md5(id) || '-' || id`` (collision-free, engine-independent). float64
block vectors can't carry 128-bit strings, so prep computes each
vertex's dense RANK under that exact string order (0..n-1, exact in
float64) — a strictly monotone reindexing, so every strict comparison,
and hence every round's winner set, is IDENTICAL to the flat path's
string compares. Rank computation is the id_ranks scale-out (range
repartition by the priority string + per-partition row_number + O(P)
driver offsets — never a single-partition window).

State travels the per-step .npy transport (0 = undecided, 1 = in,
2 = out; O(B) files per round, page-cache shared). ``rounds=N`` runs a
fixed bounded prefix (the SQL-replicable form the ``graph_mis_blocked``
oracle row checks); ``rounds=None`` iterates to the empty-undecided
fixpoint with mis.py's progress guard (strictly shrinking undecided set,
warn past ``max_iter``, raise on non-progress).

Store contract: build from ``undirected_edges(edges)`` (distinct
symmetric closure, self-loops dropped). Duplicate edges would be
harmless to min/eliminate semantics, but the shared contract keeps one
store reusable across LP/Louvain/MIS.

Output matches ``linkgraph.mis.maximal_independent_set`` EXACTLY (pinned
by tests/test_mis_csr.py and the graph_mis_blocked oracle row).
Reference parity: engine extension beyond ccm's metric set
(/root/reference/src/ccm/complexity.py), same family as labelprop_csr.
"""

from __future__ import annotations

import logging
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

log = logging.getLogger(__name__)


def priority_ranks(
    ids: DataFrame, num_partitions: int | None = None
) -> DataFrame:
    """ids(id) -> (id, rank): dense 0..n-1 rank under ascending
    ``md5(id) || '-' || id`` string order — the flat MIS priority
    (mis.py:_priority), reindexed to a float64-exact total order.
    Same scale-out shape as labelprop_csr.id_ranks."""
    spark = ids.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    id_str = F.col("id").cast("string")
    tagged = register_cache(
        ids.select(
            "id",
            F.concat(F.md5(id_str), F.lit("-"), id_str).alias("pri"),
        )
        .repartitionByRange(num_partitions, "pri")
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
    w = Window.partitionBy("pid").orderBy("pri")
    return tagged.join(F.broadcast(offs), "pid").select(
        "id", (F.row_number().over(w) - 1 + F.col("off")).alias("rank")
    )


def mis_blocked(
    spark,
    g: BlockedGraph,
    rounds: int | None = None,
    max_iter: int = 64,
    keep_steps: int = 2,
    stats: dict | None = None,
) -> DataFrame:
    """-> (id, state): 'in' / 'out' / 'und' (bounded mode only),
    bit-identical to ``maximal_independent_set(..., rounds=rounds)``.

    ``g`` MUST be built from ``undirected_edges(edges)`` (module
    docstring). ``stats``, if given, receives ``step_secs`` (wall
    seconds per round: win job + eliminate job), ``steps``, ``winners``
    and ``undecided`` per round — the scaling bench's hooks."""
    n_blocks, store, token = g.n_blocks, g.store_path, g.build_token
    rdir = f"{_ranks_root(g)}/mis-{uuid.uuid4().hex[:12]}"
    os.makedirs(rdir, exist_ok=True)

    ranks = register_cache(
        truncate_plan(priority_ranks(g.vmap.select("id"))).persist()
    )

    # prep: per-block priority-rank vectors + all-undecided step0 state
    def prep_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        os.makedirs(f"{rdir}/prio", exist_ok=True)
        os.makedirs(f"{rdir}/step0", exist_ok=True)
        b = int(pdf["block"].iloc[0])
        arr = np.empty(len(pdf), dtype=np.float64)
        arr[pdf["local"].to_numpy(dtype=np.int64)] = pdf["rank"].to_numpy(
            dtype=np.float64
        )
        _write_npy_atomic(f"{rdir}/prio/b{b}.npy", arr)
        _write_npy_atomic(
            f"{rdir}/step0/b{b}.npy", np.zeros(len(pdf), dtype=np.float64)
        )
        return pd.DataFrame({"block": [b]})

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

    bounded = rounds is not None
    step_secs: list[float] = []
    winners_per: list[int] = []
    und_per: list[int] = []
    prev_und = None
    k = 0
    while True:
        if bounded and k >= rounds:
            break
        cur = f"{rdir}/step{k}"
        t_step = time.perf_counter()

        # win job: nbr-min of undecided priorities -> 0/1 winner vectors
        wdir = f"{rdir}/win{k}"

        def make_win_fn(_cur, _wdir):
            def win_fn(batches):
                dfs = [b for b in batches if len(b)]
                if not dfs:
                    return
                pdf = pd.concat(dfs, ignore_index=True)
                rows = []
                eff_cache: dict = {}
                for db, dsize in zip(pdf["db"], pdf["dsize"]):
                    db = int(db)
                    s = np.load(f"{_cur}/b{db}.npy")
                    p = np.load(f"{rdir}/prio/b{db}.npy")
                    acc = np.full(int(dsize), np.inf)
                    blk = _load_block(store, token, db, n_blocks)
                    offs = blk[1]
                    for sb in np.flatnonzero(np.diff(offs)):
                        a, b_ = int(offs[sb]), int(offs[sb + 1])
                        eff = eff_cache.get(sb)
                        if eff is None:
                            ss = np.load(f"{_cur}/b{sb}.npy")
                            pp = np.load(f"{rdir}/prio/b{sb}.npy")
                            eff = np.where(ss == 0.0, pp, np.inf)
                            eff_cache[sb] = eff
                        if blk[0] == "p":
                            native.scatter_min_pack16(blk[2][a:b_], eff, acc)
                        else:
                            native.scatter_min32(
                                blk[2][a:b_], blk[3][a:b_], eff, acc
                            )
                    win = (s == 0.0) & (p < acc)
                    os.makedirs(_wdir, exist_ok=True)
                    _write_npy_atomic(
                        f"{_wdir}/b{db}.npy", win.astype(np.float64)
                    )
                    rows.append((db, int(win.sum())))
                yield pd.DataFrame(rows, columns=["block", "w"])

            return win_fn

        n_win = int(
            work.mapInPandas(make_win_fn(cur, wdir), "block int, w long")
            .agg(F.sum("w").alias("w"))
            .collect()[0]["w"]
        )

        # eliminate job: finite min over winner-indicator sources => an
        # undecided neighbor of a winner -> 'out'; winners -> 'in'
        nxt = f"{rdir}/step{k + 1}"

        def make_elim_fn(_cur, _wdir, _nxt):
            def elim_fn(batches):
                dfs = [b for b in batches if len(b)]
                if not dfs:
                    return
                pdf = pd.concat(dfs, ignore_index=True)
                rows = []
                eff_cache: dict = {}
                for db, dsize in zip(pdf["db"], pdf["dsize"]):
                    db = int(db)
                    s = np.load(f"{_cur}/b{db}.npy")
                    win = np.load(f"{_wdir}/b{db}.npy")
                    acc = np.full(int(dsize), np.inf)
                    blk = _load_block(store, token, db, n_blocks)
                    offs = blk[1]
                    for sb in np.flatnonzero(np.diff(offs)):
                        a, b_ = int(offs[sb]), int(offs[sb + 1])
                        eff = eff_cache.get(sb)
                        if eff is None:
                            ww = np.load(f"{_wdir}/b{sb}.npy")
                            eff = np.where(ww == 1.0, 0.0, np.inf)
                            eff_cache[sb] = eff
                        if blk[0] == "p":
                            native.scatter_min_pack16(blk[2][a:b_], eff, acc)
                        else:
                            native.scatter_min32(
                                blk[2][a:b_], blk[3][a:b_], eff, acc
                            )
                    ns = s.copy()
                    ns[win == 1.0] = 1.0
                    ns[(acc < np.inf) & (s == 0.0) & (win == 0.0)] = 2.0
                    os.makedirs(_nxt, exist_ok=True)
                    _write_npy_atomic(f"{_nxt}/b{db}.npy", ns)
                    rows.append((db, int((ns == 0.0).sum())))
                yield pd.DataFrame(rows, columns=["block", "u"])

            return elim_fn

        n_und = int(
            work.mapInPandas(
                make_elim_fn(cur, wdir, nxt), "block int, u long"
            )
            .agg(F.sum("u").alias("u"))
            .collect()[0]["u"]
        )
        step_secs.append(time.perf_counter() - t_step)
        winners_per.append(n_win)
        und_per.append(n_und)
        shutil.rmtree(wdir, ignore_errors=True)
        stale = k - keep_steps + 1
        if stale >= 0:
            shutil.rmtree(f"{rdir}/step{stale}", ignore_errors=True)
        k += 1
        if not bounded:
            # mis.py's fixpoint discipline: run to emptiness, guard
            # progress, warn past max_iter
            if n_und == 0:
                break
            if prev_und is not None and n_und >= prev_und:
                raise RuntimeError(
                    f"mis_blocked: round {k} left {n_und} >= {prev_und} "
                    "undecided vertices — no progress; winner election "
                    "is broken"
                )
            prev_und = n_und
            if k >= max_iter:
                log.warning(
                    "mis_blocked: fixpoint still has %d undecided "
                    "vertices after %d rounds (> max_iter=%d); "
                    "continuing to emptiness", n_und, k, max_iter,
                )
    if stats is not None:
        stats["step_secs"] = [round(s, 3) for s in step_secs]
        stats["steps"] = k
        stats["winners"] = winners_per
        stats["undecided"] = und_per

    last = f"{rdir}/step{k}"

    def read_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for b in pdf["block"]:
            b = int(b)
            out.append((b, np.load(f"{last}/b{b}.npy")))
        return pd.DataFrame(out, columns=["block", "sv"])

    return (
        g.block_meta.groupBy("block")
        .applyInPandas(read_kernel, "block int, sv array<double>")
        .select("block", F.posexplode("sv").alias("local", "sv"))
        .join(vmap_side(g), ["block", "local"])
        .select(
            "id",
            F.when(F.col("sv") == 1.0, F.lit("in"))
            .when(F.col("sv") == 2.0, F.lit("out"))
            .otherwise(F.lit("und"))
            .alias("state"),
        )
    )
