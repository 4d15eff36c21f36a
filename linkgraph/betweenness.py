"""Depth-bounded Brandes betweenness from a seed set.

Exact all-pairs betweenness is O(V·E) — not a 100 TB plan. The standard
production compromises are (a) a sampled source set and (b) a bounded
search depth (k-betweenness / ego-betweenness family); this module does
both, deterministically: Brandes' dependency accumulation (Brandes 2001)
run from an explicit seed set, with shortest paths truncated at
``depth`` hops. Both knobs are part of the operator's CONTRACT, so the
DuckDB oracle unrolls the identical computation level by level and the
result is hash-comparable — no sampling noise, no unbounded recursion.

Per seed: a forward BFS accumulating path counts sigma level by level
(a join + aggregate per level, all seeds advance together in one
DataFrame keyed by (seed, v)), then the backward sweep from the deepest
level: delta(v) += sigma(v)/sigma(w) * (1 + delta(w)) over tree edges
(v, w) with dist(w) = dist(v) + 1. The reported score of v is the sum
of delta over seeds, v excluded as its own source — exactly Brandes'
partial sums restricted to the seed sources and the bounded horizon.

Scale shape: every level is one equi-join frontier expansion keyed on
vertex id (the PageRank superstep signature) and state is O(reached
pairs), bounded by depth; the backward sweep reuses the same (seed,
dist) table. 2 * depth joins total, no driver loops over data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .lineage import truncate_plan


def seeded_betweenness(
    spark,
    edges: DataFrame,
    seeds: DataFrame,
    depth: int = 4,
) -> DataFrame:
    """-> (v, bc6): depth-bounded betweenness contributions summed over
    the seed sources (round 6; rows with bc > 0 only).
    """
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()

    # forward: dist/sigma per (seed, v), level by level
    cur = seeds.select(
        F.col("id").alias("s"), F.col("id").alias("v"),
        F.lit(0).alias("dist"), F.lit(1.0).alias("sigma"),
    )
    best = cur  # all settled (seed, v) pairs
    for lvl in range(1, depth + 1):
        nxt = (
            cur.join(e, cur["v"] == e["src"])
            .groupBy("s", F.col("dst").alias("v"))
            .agg(F.sum("sigma").alias("sigma"))
        )
        fresh = (
            nxt.join(best.select("s", "v"), ["s", "v"], "left_anti")
            .select("s", "v", F.lit(lvl).alias("dist"), "sigma")
        )
        fresh = truncate_plan(fresh, eager=False)
        best = best.unionByName(fresh)
        cur = fresh
    best = best.localCheckpoint()  # O(reached pairs), reused 2*depth times

    # backward: delta from the deepest level down. Tree edges are edges
    # (v, w) with dist(w) == dist(v) + 1 within the same seed's search.
    bl = best.select(F.col("s"), F.col("v"), F.col("dist"), F.col("sigma"))
    delta = bl.select("s", "v", F.lit(0.0).alias("delta")).where(F.lit(False))
    for lvl in range(depth - 1, -1, -1):
        upper = bl.where(F.col("dist") == lvl + 1).select(
            F.col("s").alias("s_u"), F.col("v").alias("w"),
            F.col("sigma").alias("sig_w"),
        )
        upper = upper.join(
            delta.select(
                F.col("s").alias("s_u"), F.col("v").alias("w"), "delta"
            ),
            ["s_u", "w"], "left",
        ).select(
            "s_u", "w", "sig_w", F.coalesce("delta", F.lit(0.0)).alias("dw")
        )
        contrib = (
            bl.where(F.col("dist") == lvl)
            .join(e, bl["v"] == e["src"])
            .join(
                upper,
                (F.col("dst") == F.col("w")) & (F.col("s") == F.col("s_u")),
            )
            .groupBy("s", "v")
            .agg(
                F.sum(
                    F.col("sigma") / F.col("sig_w") * (1.0 + F.col("dw"))
                ).alias("delta")
            )
        )
        delta = truncate_plan(
            delta.unionByName(contrib), eager=False
        )
    # Brandes excludes only v == s, not every source vertex: another
    # seed sitting on a shortest path still earns betweenness
    return (
        delta.where(F.col("v") != F.col("s"))
        .groupBy("v")
        .agg(F.round(F.sum("delta"), 6).alias("bc6"))
        .where(F.col("bc6") > 0)
    )
