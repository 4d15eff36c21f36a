"""Maximal independent set — deterministic Luby rounds (BSP, shuffle-lean).

Luby's classic parallel MIS (Luby, SIAM J. Comput. 1986): every round, an
UNDECIDED vertex joins the set iff its priority beats every undecided
neighbor's; the new members' undecided neighbors are eliminated. With
distinct priorities two adjacent vertices can never both win a round, so
the result is independent by construction and maximal once no vertex is
left undecided (expected O(log n) rounds on any graph).

Determinism (the engine's oracle discipline): the priority is a PORTABLE
string — ``md5(id) || '-' || id`` — totally ordered, engine-independent,
and collision-free (the id suffix breaks even md5-prefix ties), so Spark
and the DuckDB oracle elect byte-identical winners round for round. Never
engine-native hashes (sketches.py's rule).

Round shape at 100 TB: one join of the undecided set against the
(symmetrized) edge table + a per-vertex min aggregation + two anti-joins —
all keyed on vertex id, so AQE handles skew and the edge side can stay
hash-partitioned across rounds. ``rounds=N`` runs a FIXED bounded prefix
(SQL-replicable round for round — the form the dual-engine row
``graph_mis2`` checks); ``rounds=None`` iterates to the empty-undecided
fixpoint with one driver-side count per round (the components.py
fixpoint pattern). The static sides (symmetric neighbor table, priority
map) are materialized once; each round's winner set is truncated lazily
so its vote aggregation runs once, not once per downstream reference.

Uses: independent landing-page sampling (no two adjacent pages), parallel
scheduling of conflicting crawl/update tasks, and the classic reduction
base for graph coloring.

Reference parity: an engine extension beyond ccm's metric set (the
reference computes per-graph scalars — /root/reference/src/ccm/
complexity.py); same extension family as hits.py / kcore.py.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, functions as F

from .joinhints import fits_broadcast
from .lineage import truncate_plan

log = logging.getLogger(__name__)


def _priority(col):
    id_str = F.col(col).cast("string")
    return F.concat(F.md5(id_str), F.lit("-"), id_str)


def maximal_independent_set(
    spark,
    edges: DataFrame,
    vertices: DataFrame,
    rounds: int | None = None,
    max_iter: int = 64,
) -> DataFrame:
    """-> (id, state): 'in' (MIS member), 'out' (eliminated neighbor),
    or 'und' (still undecided — only possible in bounded mode).

    ``edges`` is used undirected (symmetrized, self-loops dropped).
    ``rounds=None`` runs Luby to the fixpoint — iteration continues until
    NO 'und' rows remain, so the no-partial-state guarantee holds
    unconditionally (round-4 ADVICE: the old code silently stopped at
    ``max_iter`` and could return 'und' rows). Termination is guaranteed:
    with distinct priorities the globally-minimum undecided priority
    always wins its round, so every round strictly shrinks the undecided
    set; deterministic (fixed) priorities make this greedy-lex MIS whose
    WORST case is O(n) rounds (e.g. a path with monotone priorities) —
    past ``max_iter`` rounds a warning is logged once per extra round,
    and a round that fails to shrink the undecided set (impossible
    without a bug) raises rather than looping forever.
    ``rounds=N`` runs exactly N bounded rounds ('und' rows mark the open
    frontier — the SQL-replicable prefix the oracle row checks).
    """
    # static across rounds: truncate ONCE, lazily (each round references
    # the neighbor table twice and the priority map three times — the
    # lazy checkpoint computes the 2|E| symmetric distinct a single time
    # inside the caller's one action and shares the blocks, without
    # spending a separate materialization job per static side)
    from .graph import undirected_edges

    nbr = truncate_plan(undirected_edges(edges), eager=False)
    pri = truncate_plan(
        vertices.select("id", _priority("id").alias("pri")), eager=False
    )
    # per-round strategy (guide §3.1): every per-round side (undecided
    # set, priorities, winners, eliminations) is bounded by |V| — when
    # that fits, broadcast them so the 2|E| neighbor table is never
    # exchanged; otherwise keep the shuffle_hash rounds
    n_verts = vertices.count()
    use_bcast = fits_broadcast(n_verts)

    def _small(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if use_bcast else df.hint("shuffle_hash")

    und = vertices.select("id")
    members = None  # accumulated 'in' rows

    bounded = rounds is not None
    prev_und = None  # fixpoint progress guard
    k = 0
    while True:
        if bounded:
            if k >= rounds:
                break
        else:
            # fixpoint mode: each round starts from a materialized state;
            # run to EMPTINESS (never return partial 'und' state). The
            # count doubles as the materializing action and the progress
            # guard: a non-shrinking round means the winner election is
            # broken (can't happen with distinct priorities) — raise
            # instead of spinning.
            und = truncate_plan(und)
            n_und = und.count()
            if n_und == 0:
                break
            if prev_und is not None and n_und >= prev_und:
                raise RuntimeError(
                    f"maximal_independent_set: round {k} left "
                    f"{n_und} >= {prev_und} undecided vertices — "
                    "no progress; winner election is broken"
                )
            prev_und = n_und
            if k >= max_iter:
                log.warning(
                    "maximal_independent_set: fixpoint still has %d "
                    "undecided vertices after %d rounds (> max_iter=%d); "
                    "continuing to emptiness (greedy-lex worst case is "
                    "O(n) rounds)", n_und, k, max_iter,
                )
        k += 1
        und_pri = und.join(_small(pri) if use_bcast else pri, "id")
        # min undecided-neighbor priority per undecided vertex.
        # shuffle_hash hints on the per-vertex sides: SMJ would re-sort
        # the 2|E| neighbor table every round (the labelprop.py finding)
        nbr_min = (
            nbr.join(
                _small(und.select(F.col("id").alias("dst"))),
                "dst",
            )
            .join(
                _small(pri.select(
                    F.col("id").alias("dst"), F.col("pri").alias("np")
                )),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("np").alias("mn"))
            .select(F.col("src").alias("id"), "mn")
        )
        win = (
            und_pri.join(
                F.broadcast(nbr_min) if use_bcast else nbr_min, "id", "left"
            )
            .where(F.col("mn").isNull() | (F.col("pri") < F.col("mn")))
            .select("id")
        )
        # win feeds members, the elimination join, AND the next und — a
        # lazy truncation computes the expensive vote once per round
        win = truncate_plan(win, eager=False)
        members = win if members is None else members.unionByName(win)
        # undecided neighbors of this round's winners are eliminated
        elim = (
            nbr.join(
                _small(win.select(F.col("id").alias("src"))),
                "src",
            )
            .select(F.col("dst").alias("id"))
            .join(_small(und) if use_bcast else und, "id")
            .distinct()
        )
        und = und.join(
            F.broadcast(win) if use_bcast else win, "id", "left_anti"
        ).join(F.broadcast(elim) if use_bcast else elim, "id", "left_anti")
        if bounded:
            und = truncate_plan(und, eager=False)

    members = (
        members
        if members is not None
        else vertices.select("id").where(F.lit(False))
    )
    def _small_or(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if use_bcast else df

    state = (
        vertices.select("id")
        .join(
            _small_or(members.select("id", F.lit("in").alias("s_in"))),
            "id", "left",
        )
        .join(
            _small_or(und.select("id", F.lit("und").alias("s_und"))),
            "id", "left",
        )
        .select(
            "id",
            F.coalesce("s_in", "s_und", F.lit("out")).alias("state"),
        )
    )
    return state


def greedy_coloring(
    spark,
    edges: DataFrame,
    vertices: DataFrame,
    max_colors: int = 64,
) -> DataFrame:
    """-> (id, color): proper vertex coloring by ITERATED Luby — color c
    is the maximal independent set of the residual graph after colors
    0..c-1 are removed (the classic MIS→coloring reduction; deterministic
    because each MIS round uses the same portable priorities).

    Colors used is bounded by degeneracy-order quality, not Δ+1-optimal,
    but web graphs have tiny degeneracy relative to Δ (hubs color early).
    Use: conflict-free scheduling of mutually-linked page updates /
    crawl-politeness batches. Raises if ``max_colors`` rounds leave
    vertices uncolored (pathological for sane inputs)."""
    remaining = truncate_plan(vertices.select("id"))
    colored = None
    for c in range(max_colors):
        if remaining.limit(1).count() == 0:
            break
        sub_edges = (
            edges.join(
                remaining.select(F.col("id").alias("src")), "src"
            ).join(remaining.select(F.col("id").alias("dst")), "dst")
        )
        mis = maximal_independent_set(spark, sub_edges, remaining)
        chosen = mis.where(F.col("state") == "in").select(
            "id", F.lit(c).alias("color")
        )
        chosen = truncate_plan(chosen)
        colored = chosen if colored is None else colored.unionByName(chosen)
        remaining = truncate_plan(
            remaining.join(chosen.select("id"), "id", "left_anti")
        )
    else:
        if remaining.limit(1).count() > 0:
            raise ValueError(f"greedy_coloring: > {max_colors} colors needed")
    return (
        colored
        if colored is not None
        else vertices.select("id", F.lit(0).alias("color")).where(F.lit(False))
    )
