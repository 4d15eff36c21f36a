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
    sym = truncate_plan(
        e.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionByName(
            e.select(F.col("v").alias("src"), F.col("u").alias("dst"))
        )
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
    spark, edges: DataFrame, labels: DataFrame, _prepped=None
) -> DataFrame:
    """One synchronous local-move round: labels(id, label) -> updated
    (id, label). ``edges`` is normalized to the undirected simple graph
    (``_prepped`` = a ``_prep_graph`` result reused across rounds)."""
    sym, deg, m = _prepped if _prepped is not None else _prep_graph(edges)
    if m == 0:
        return labels.select("id", "label")
    la = labels.select("id", "label")
    tot = (
        la.join(deg, "id", "left")
        .groupBy("label")
        .agg(F.sum(F.coalesce("k", F.lit(0.0))).alias("tot"))
    )
    # edges from i into each neighbor community under the current labels.
    # shuffle_hash hint on the (per-vertex) label side: a sort-merge join
    # would re-sort all 2|E| sym rows every round (the labelprop.py
    # finding); the hash join streams sym against a per-partition map.
    kic = (
        sym.join(
            la.select(
                F.col("id").alias("dst"), F.col("label").alias("cand")
            ).hint("shuffle_hash"),
            "dst",
        )
        .groupBy(F.col("src").alias("id"), "cand")
        .agg(F.count("*").cast("double").alias("kic"))
    )
    # the vertex's own community is always a candidate (kic may be 0 there)
    own = la.select("id", F.col("label").alias("cand"), F.lit(0.0).alias("kic"))
    cand = (
        kic.unionByName(own)
        .groupBy("id", "cand")
        .agg(F.max("kic").alias("kic"))
    )
    scored = (
        cand.join(la, "id")
        .join(deg, "id", "left")
        .join(tot.select(F.col("label").alias("cand"), "tot"), "cand")
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
        la.join(moved.select("id", F.col("label").alias("nl")), "id", "left")
        .select("id", F.coalesce("nl", "label").alias("label"))
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
    for _ in range(rounds):
        labels = louvain_move_round(spark, edges, labels, _prepped=prepped)
        if materialize_each:
            labels = truncate_plan(labels)
    return labels
