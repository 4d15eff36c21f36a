"""SimRank structural similarity, seed-bounded, fixed unrolled rounds.

Jeh & Widom (KDD'02): two nodes are similar if their IN-neighbors are
similar — S(a,a)=1, S(a,b) = C/(|I(a)||I(b)|) * sum over in-neighbor
pairs of S(i,j), S=0 when either in-set is empty. The recursive cousin
of co-citation: round 1 IS normalized co-citation; round 2 already sees
two-hop structure (pages cited by similar pages become similar).

All-pairs SimRank is O(V^2) state — never the plan at web scale. This
implementation bounds the computation to a SEED set (the "find pages
structurally similar to these" query): round-1 similarities are only
materialized for pairs (i, j) with i an in-neighbor of a seed — the
frontier the round-2 sum actually reads — so state is
O(|I(seeds)| * cocitation fanout), not O(V^2). Two rounds, fixed, so
the DuckDB oracle replays the algebra exactly; ranking keys are rounded
to 6 BEFORE the top-k cut in BOTH engines (unrounded floats differ in
addition order across engines; ranking on the rounded key keeps the
cut deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def simrank2_topk(
    spark,
    edges: DataFrame,
    seeds: DataFrame,
    c: float = 0.8,
    k: int = 10,
) -> DataFrame:
    """-> (q, v, s2_6, rk) — for each seed q, the top-``k`` nodes v by
    two-round SimRank (v != q, score > 0), ties broken by v ascending.

    Shapes: in-edge table derived once; S1 terms come from a co-citation
    join with ONE side semi-joined to the seeds' in-neighborhood (the
    bounded frontier); the round-2 sum is a three-join chain
    seed-in-edges |X| S1 |X| candidate-in-edges, each keyed on a vertex
    id. Nothing materializes O(V^2).
    """
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    ine = e.select(F.col("dst").alias("v"), F.col("src").alias("i"))
    indeg = ine.groupBy("v").agg(F.count("*").alias("d"))
    q_in = (
        seeds.select(F.col("id").alias("q"))
        .join(ine.withColumnRenamed("v", "q"), "q")
    )  # (q, i): the seeds' in-neighborhoods
    frontier = q_in.select("i").distinct()

    # round-1 scores S1(i, j) = c * |I(i) ∩ I(j)| / (d_i * d_j) for i in
    # the frontier, any j, i != j; S1(i, i) = 1 handled separately below
    a = (
        ine.alias("x")
        .join(frontier.alias("f"), F.col("x.v") == F.col("f.i"), "left_semi")
        .select(F.col("x.v").alias("i"), F.col("x.i").alias("w"))
    )
    b = ine.select(F.col("v").alias("j"), F.col("i").alias("w"))
    common = (
        a.join(b, "w")
        .where(F.col("i") != F.col("j"))
        .groupBy("i", "j")
        .agg(F.count("*").alias("n_common"))
    )
    s1 = (
        common.join(indeg.select(F.col("v").alias("i"), F.col("d").alias("di")), "i")
        .join(indeg.select(F.col("v").alias("j"), F.col("d").alias("dj")), "j")
        .select(
            "i", "j",
            (F.lit(c) * F.col("n_common") / (F.col("di") * F.col("dj"))).alias("s1"),
        )
    )

    # round 2: S2(q, v) = c/(d_q d_v) * [ sum_{i!=j} S1(i,j) + |I(q)∩I(v)| ]
    cross = (
        q_in.join(s1, "i")
        .join(
            ine.select(F.col("v"), F.col("i").alias("j")),
            "j",
        )
        .groupBy("q", "v")
        .agg(F.sum("s1").alias("t_cross"))
    )
    diag = (
        q_in.alias("L")
        .join(ine.alias("R"), F.col("L.i") == F.col("R.i"))
        .groupBy(F.col("L.q").alias("q"), F.col("R.v").alias("v"))
        .agg(F.count("*").cast("double").alias("t_diag"))
    )
    s2 = (
        # FULL join: a pair can have cross-term mass with zero common
        # in-neighbors (S1(i,j) > 0 through i and j's own co-citations)
        diag.join(cross, ["q", "v"], "full")
        .join(indeg.select(F.col("v").alias("q"), F.col("d").alias("dq")), "q")
        .join(indeg, "v")
        .where(F.col("q") != F.col("v"))
        .select(
            "q", "v",
            F.round(
                F.lit(c)
                * (
                    F.coalesce("t_cross", F.lit(0.0))
                    + F.coalesce("t_diag", F.lit(0.0))
                )
                / (F.col("dq") * F.col("d")),
                6,
            ).alias("s2_6"),
        )
        .where(F.col("s2_6") > 0)
    )
    w = Window.partitionBy("q").orderBy(F.desc("s2_6"), F.col("v"))
    return (
        s2.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
    )
