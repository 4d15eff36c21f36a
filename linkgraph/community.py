"""Community detection — synchronous Louvain-style modularity local moves.

The greedy phase-1 step of Louvain (Blondel et al., J. Stat. Mech. 2008),
made SYNCHRONOUS and deterministic so it is a bounded BSP superstep the
dual-engine oracle can replay: every vertex simultaneously evaluates
moving to each candidate community (its neighbors' current communities
plus its own) and takes the argmax modularity gain, ties broken by the
smaller community label. The per-candidate score, with the vertex first
removed from its own community (standard Louvain accounting), is

    score(i, c) = k_{i,c} - k_i * (Σtot(c) - [c = c_i] * k_i) / (2m)

over the UNDIRECTED simple graph (canonical least/greatest pairs,
self-loops dropped — the exact normalization of ``graph.modularity``):
k_{i,c} = edges from i into community c, k_i = degree, Σtot(c) = total
degree of c under the CURRENT labeling, m = undirected edge count.
Maximizing score(i, c) - score(i, c_i) maximizes the Newman-Girvan ΔQ of
the move; comparing raw scores is the same argmax.

Round shape at 100 TB: one join of the (symmetrized) edge table against
the label map + three bounded-key aggregations + one per-vertex window
argmax — every exchange keyed on vertex id or community label, no
iteration state on the driver. Rounds unroll into one lazy plan
(``graph_louvain2`` replays two rounds in SQL), the
``graph.modularity`` terms score the result, and asynchronous sweeps /
graph coalescing (Louvain phase 2) compose from ``quotient.py``'s
rollup when a hierarchy is wanted.

Reference parity: extends the reference's per-component structural
metrics (/root/reference/src/ccm/complexity.py) with the standard
community-quality decomposition used on web link graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .graph import sym_pairs
from .joinhints import fits_broadcast, small_side
from .lineage import truncate_plan


def _undirected(edges: DataFrame) -> DataFrame:
    return (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )


def _prep_graph(edges: DataFrame):
    """Normalize ONCE for a multi-round run: (sym, deg, m), with the
    symmetric table and degree map truncated so every round (and every
    reference within a round) reuses the materialized blocks instead of
    recomputing the 2|E| distinct."""
    e = _undirected(edges)
    # one exploded pass, not a two-branch union (graph.undirected_edges'
    # rule): the canonical-pair aggregate is evaluated once
    sym = truncate_plan(
        e.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("u").alias("src"), F.col("v").alias("dst")
                    ),
                    F.struct(
                        F.col("v").alias("src"), F.col("u").alias("dst")
                    ),
                )
            ).alias("p")
        ).select("p.src", "p.dst")
    )
    m = sym.count() // 2  # the action that materializes sym's checkpoint
    deg = truncate_plan(
        sym.groupBy(F.col("src").alias("id")).agg(
            F.count("*").cast("double").alias("k")
        ),
        eager=False,  # first round's action materializes it off cached sym
    )
    return sym, deg, m


def louvain_move_round(
    spark, edges: DataFrame, labels: DataFrame, _prepped=None,
    n_state_rows: int | None = None,
) -> DataFrame:
    """One synchronous local-move round: labels(id, label) -> updated
    (id, label). ``edges`` is normalized to the undirected simple graph
    (``_prepped`` = a ``_prep_graph`` result reused across rounds).
    ``n_state_rows`` = an upper bound on |labels| (i.e. |V|) — when it
    fits the broadcast bound, every per-vertex side (labels, degrees,
    community totals) broadcasts and the only exchanges left in the
    round are the two map-side-combined aggregations (guide §3.1)."""
    sym, deg, m = _prepped if _prepped is not None else _prep_graph(edges)
    if m == 0:
        return labels.select("id", "label")
    bcast = fits_broadcast(n_state_rows)

    def _small(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if bcast else df

    la = labels.select("id", "label")
    tot = (
        la.join(_small(deg), "id", "left")
        .groupBy("label")
        .agg(F.sum(F.coalesce("k", F.lit(0.0))).alias("tot"))
    )
    # edges from i into each neighbor community under the current labels.
    # small-state side broadcast when |V| fits; otherwise shuffle_hash: a
    # sort-merge join would re-sort all 2|E| sym rows every round (the
    # labelprop.py finding); the hash join streams sym against a
    # per-partition map.
    kic = (
        sym.join(
            small_side(
                la.select(
                    F.col("id").alias("dst"), F.col("label").alias("cand")
                ),
                n_state_rows,
            ),
            "dst",
        )
        .groupBy(F.col("src").alias("id"), "cand")
        .agg(F.count("*").cast("double").alias("kic"))
    )
    # the vertex's own community is always a candidate (kic may be 0
    # there). NO re-aggregation of the union: when (id, own-label) also
    # appears in kic, the duplicate kic=0 row scores <= the true-kic row
    # for the SAME cand (score is monotone in kic, everything else per
    # (id, cand) equal), so the max_by argmax below picks the same winner
    # either way — the old groupBy(id, cand).max() was a second full
    # |cand| exchange per round buying nothing.
    own = la.select("id", F.col("label").alias("cand"), F.lit(0.0).alias("kic"))
    cand = kic.unionByName(own)
    scored = (
        cand.join(_small(la), "id")
        .join(_small(deg), "id", "left")
        .join(_small(tot.select(F.col("label").alias("cand"), "tot")), "cand")
        .select(
            "id",
            "cand",
            (
                F.col("kic")
                - F.coalesce("k", F.lit(0.0))
                * (
                    F.col("tot")
                    - F.when(
                        F.col("cand") == F.col("label"),
                        F.coalesce("k", F.lit(0.0)),
                    ).otherwise(F.lit(0.0))
                )
                / F.lit(2.0 * m)
            ).alias("score"),
        )
    )
    # argmax by (score desc, cand asc) as ONE hash aggregation: max_by
    # over the lexicographic struct (score, -cand) — max score wins, ties
    # fall to the larger negated (= smaller) community label. Same result
    # as a row_number window (the SQL oracle's formulation) without the
    # per-round shuffle-and-SORT of the full candidate table.
    moved = (
        scored.groupBy("id")
        .agg(
            F.max_by(
                "cand",
                F.struct(
                    F.col("score").alias("s"),
                    (-F.col("cand")).alias("nc"),
                ),
            ).alias("label")
        )
        .select("id", "label")
    )
    # vertices absent from the candidate table (isolated) keep their label
    return (
        la.join(
            _small(moved.select("id", F.col("label").alias("nl"))),
            "id", "left",
        )
        .select("id", F.coalesce("nl", "label").alias("label"))
    )


def _prep_weighted(wedges: DataFrame):
    """wedges(u, v, w) — canonical weighted undirected simple graph
    (u <= v, one row per pair; u == v rows are self-loop weights, the
    coarsened-graph intra-community mass) -> (sym_w, deg, m):
    symmetric non-self weighted closure, weighted degrees
    k_i = Σ_{j≠i} w(i,j) + 2·w(i,i), and total weight m. Both static
    sides truncated once for a multi-round run (the _prep_graph rule)."""
    nonself = wedges.where(F.col("u") != F.col("v"))
    sym_w = truncate_plan(
        sym_pairs(
            nonself.select(
                F.col("u").alias("src"), F.col("v").alias("dst"), "w"
            ),
            "src", "dst", extra=("w",),
        )
    )
    m = float(
        wedges.agg(F.sum(F.col("w").cast("double"))).collect()[0][0] or 0.0
    )
    selfw = wedges.where(F.col("u") == F.col("v")).select(
        F.col("u").alias("id"), F.col("w").alias("sw")
    )
    deg = truncate_plan(
        sym_w.groupBy(F.col("src").alias("id"))
        .agg(F.sum(F.col("w").cast("double")).alias("kn"))
        .join(selfw, "id", "full")
        .select(
            "id",
            (
                F.coalesce("kn", F.lit(0.0))
                + 2.0 * F.coalesce(F.col("sw").cast("double"), F.lit(0.0))
            ).alias("k"),
        ),
        eager=False,
    )
    return sym_w, deg, m


def louvain_move_round_weighted(
    spark, wedges: DataFrame, labels: DataFrame, _prepped=None,
    n_state_rows: int | None = None,
) -> DataFrame:
    """One synchronous WEIGHTED local-move round over the canonical
    weighted graph ``wedges(u, v, w)`` (see ``_prep_weighted``):
    score(i, c) = w_{i,c} - k_i·(Σtot(c) − [c=c_i]·k_i)/(2m) with
    w_{i,c} = Σ weight from i into community c (j ≠ i — self-loop mass
    is move-invariant and enters only through k_i / Σtot), argmax with
    the smaller-label tie-break. The unweighted round is the w = 1,
    no-self-loop special case. Same round shape at 100 TB: one weighted
    join + three bounded-key aggregations + one max_by argmax."""
    sym_w, deg, m = _prepped if _prepped is not None else _prep_weighted(
        wedges
    )
    if m == 0:
        return labels.select("id", "label")
    bcast = fits_broadcast(n_state_rows)

    def _small(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if bcast else df

    la = labels.select("id", "label")
    tot = (
        la.join(_small(deg), "id", "left")
        .groupBy("label")
        .agg(F.sum(F.coalesce("k", F.lit(0.0))).alias("tot"))
    )
    wic = (
        sym_w.join(
            small_side(
                la.select(
                    F.col("id").alias("dst"), F.col("label").alias("cand")
                ),
                n_state_rows,
            ),
            "dst",
        )
        .groupBy(F.col("src").alias("id"), "cand")
        .agg(F.sum(F.col("w").cast("double")).alias("kic"))
    )
    # duplicate-(id, cand) union, no re-aggregation — same argument as the
    # unweighted round: the kic=0 own row can never out-score the true
    # w_{i,c} row for the same candidate, so the argmax is unchanged
    own = la.select("id", F.col("label").alias("cand"), F.lit(0.0).alias("kic"))
    cand = wic.unionByName(own)
    scored = (
        cand.join(_small(la), "id")
        .join(_small(deg), "id", "left")
        .join(_small(tot.select(F.col("label").alias("cand"), "tot")), "cand")
        .select(
            "id",
            "cand",
            (
                F.col("kic")
                - F.coalesce("k", F.lit(0.0))
                * (
                    F.col("tot")
                    - F.when(
                        F.col("cand") == F.col("label"),
                        F.coalesce("k", F.lit(0.0)),
                    ).otherwise(F.lit(0.0))
                )
                / F.lit(2.0 * m)
            ).alias("score"),
        )
    )
    moved = (
        scored.groupBy("id")
        .agg(
            F.max_by(
                "cand",
                F.struct(
                    F.col("score").alias("s"),
                    (-F.col("cand")).alias("nc"),
                ),
            ).alias("label")
        )
        .select("id", "label")
    )
    return (
        la.join(
            _small(moved.select("id", F.col("label").alias("nl"))),
            "id", "left",
        )
        .select("id", F.coalesce("nl", "label").alias("label"))
    )


def community_quotient(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Coarsen the undirected simple graph by ``labels(id, label)`` ->
    canonical weighted community graph (u, v, w): w = number of
    fine-graph edges between communities u and v (u <= v; u == v rows
    carry the intra-community edge count — the coarse self-loops), the
    standard Louvain phase-2 aggregation. Two dictionary joins + one
    bounded-key aggregation; the fine-graph modularity of a coarse
    labeling equals its coarse-graph modularity, which is what makes
    phase-2 moves meaningful on the original graph."""
    e = _undirected(edges)
    lu = labels.select(F.col("id").alias("u"), F.col("label").alias("cu"))
    lv = labels.select(F.col("id").alias("v"), F.col("label").alias("cv"))
    return (
        e.join(lu, "u")
        .join(lv, "v")
        .select(
            F.least("cu", "cv").alias("u"),
            F.greatest("cu", "cv").alias("v"),
        )
        .groupBy("u", "v")
        .agg(F.count("*").cast("double").alias("w"))
    )


def louvain_hierarchy(
    spark,
    edges: DataFrame,
    vertices: DataFrame,
    rounds: int = 2,
    materialize_each: bool = True,
) -> DataFrame:
    """Two-level Louvain (Blondel et al. phase 1 + phase 2): ``rounds``
    synchronous local-move rounds from singletons, then the graph is
    coalesced by community (``community_quotient`` — weighted, with
    intra-community self-loops) and ``rounds`` WEIGHTED local-move
    rounds run on the coarse graph; the coarse labels compose back onto
    the vertices with one join. -> (id, label); modularity is
    non-decreasing across levels on real inputs (asserted over the test
    fixtures — the synchronous variant has no per-move monotonicity
    theorem, exactly like phase 1 itself).

    Scale shape: phase 1 is the per-round |2E| exchange (use
    ``community_csr.louvain_blocked`` for the gated zero-shuffle rounds
    at web scale — same labels bit for bit); the phase-2 graph has one
    node per phase-1 COMMUNITY, orders of magnitude smaller than the
    input on real web graphs (host-level structure collapses), so the
    flat weighted rounds here are the right tool at any input scale —
    the coarse graph's join+agg fits comfortably where the fine graph's
    did not."""
    l1 = louvain_communities(
        spark, edges, vertices, rounds=rounds,
        materialize_each=materialize_each,
    )
    if materialize_each:
        l1 = truncate_plan(l1)
    wq = community_quotient(edges, l1)
    if materialize_each:
        wq = truncate_plan(wq)
    comms = wq.select(F.col("u").alias("id")).unionByName(
        wq.select(F.col("v").alias("id"))
    ).distinct()
    l2 = comms.select("id", F.col("id").alias("label"))
    prepped = _prep_weighted(wq)
    # coarse-level state is bounded by the number of level-1 communities
    # <= |V|; reuse the vertex count as the (upper-bound) strategy input
    n_verts = vertices.count()
    for _ in range(rounds):
        l2 = louvain_move_round_weighted(
            spark, wq, l2, _prepped=prepped, n_state_rows=n_verts
        )
        if materialize_each:
            l2 = truncate_plan(l2)
    # compose: vertex -> level-1 community -> level-2 community; isolated
    # vertices (community absent from the quotient) keep their level-1
    # label
    return (
        l1.join(
            l2.select(
                F.col("id").alias("label"), F.col("label").alias("l2")
            ),
            "label",
            "left",
        )
        .select("id", F.coalesce("l2", "label").alias("label"))
    )


def louvain_communities(
    spark,
    edges: DataFrame,
    vertices: DataFrame,
    rounds: int = 2,
    materialize_each: bool = True,
) -> DataFrame:
    """-> (id, label): singleton start (label = id), then ``rounds``
    synchronous local-move rounds. ``materialize_each`` truncates the plan
    between rounds (the fixpoint-loop hygiene of components.py); pass
    False to keep the whole unrolled computation one lazy plan (the
    SQL-replicable form the oracle row uses)."""
    labels = vertices.select("id", F.col("id").alias("label"))
    prepped = _prep_graph(edges)
    n_verts = vertices.count()  # per-round join strategy (guide §3.1)
    for _ in range(rounds):
        labels = louvain_move_round(
            spark, edges, labels, _prepped=prepped, n_state_rows=n_verts
        )
        if materialize_each:
            labels = truncate_plan(labels)
    return labels
