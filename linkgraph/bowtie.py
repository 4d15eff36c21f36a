"""Bow-tie decomposition of a directed web graph (Broder et al., WWW 2000).

The classic structural map of a crawl-scale link graph: the giant
strongly connected CORE, the IN set that reaches it, the OUT set it
reaches, TUBEs from IN to OUT that bypass the CORE, TENDRILs hanging off
IN or leading into OUT, and the DISCONNECTED rest. This is the analysis
the reference's component/complexity reports (ccm complexity.py:84's
directed P, graphs.py's component partition) grow into on a web graph —
a per-vertex *structural class* rather than just a component id.

Classification is by directed reachability (the standard practical
formulation):

- CORE    — the largest SCC (ties broken by smallest component id);
- IN      — reaches CORE, not in it;
- OUT     — reachable from CORE, not in it;
- TUBE    — reachable from IN AND reaches OUT, not in any of the above;
- TENDRIL — reachable from IN OR reaches OUT (but not both);
- DISCONNECTED — none of the above.

Scale design: one SCC run (FW-BW coloring, linkgraph.scc — the standard
distributed choice for web graphs: giant SCC + shallow fringe) plus four
boolean BSP fixpoints (min-label propagation, lineage truncated per
round, one driver action per round). Nothing O(V) ever lands on the
driver — the giant-SCC pick collects exactly one row. Each fixpoint
converges in O(diameter-from-seed-set) rounds; seeding with the whole
CORE/IN/OUT set (not a single pivot) keeps that at the few-hop fringe
depth typical of crawl graphs, not the graph diameter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .scc import _min_fixpoint, strongly_connected_components

CLASSES = ("CORE", "IN", "OUT", "TUBE", "TENDRIL", "DISCONNECTED")


def reach_from(
    spark,
    edges: DataFrame,
    vertices: DataFrame,
    seeds: DataFrame,
    max_rounds: int = 200,
) -> DataFrame:
    """(id, reached:boolean): directed reachability from the seed set
    along ``edges`` (src -> dst). Seeds count as reached. BSP min-label
    fixpoint; one driver action per round."""
    labels0 = vertices.select("id").join(
        seeds.select("id").distinct().withColumn("lbl", F.lit(1)),
        "id",
        "left",
    )
    labels = _min_fixpoint(spark, edges, labels0, max_rounds)
    return labels.select("id", F.col("lbl").isNotNull().alias("reached"))


def bowtie(
    spark,
    edges: DataFrame,
    vertices: DataFrame,
    max_rounds: int = 200,
) -> DataFrame:
    """(id, cls): the bow-tie class of every vertex.

    ``edges`` (src, dst) directed, ``vertices`` (id, ...). The CORE is
    the largest SCC, ties broken by the smallest component id, so the
    result is deterministic.
    """
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    comps = strongly_connected_components(spark, edges, vertices)
    giant = (
        comps.groupBy("component")
        .count()
        .orderBy(F.desc("count"), F.asc("component"))
        .limit(1)
        .collect()[0]["component"]
    )  # one row to the driver, never O(V)
    core = comps.where(F.col("component") == F.lit(giant)).select("id")

    ids = vertices.select("id")
    fwd_core = reach_from(spark, edges, ids, core, max_rounds)
    bwd_core = reach_from(spark, rev, ids, core, max_rounds)
    in_set = (
        bwd_core.where("reached").join(core, "id", "left_anti").select("id")
    )
    out_set = (
        fwd_core.where("reached").join(core, "id", "left_anti").select("id")
    )
    fwd_in = reach_from(spark, edges, ids, in_set, max_rounds)
    bwd_out = reach_from(spark, rev, ids, out_set, max_rounds)

    flags = (
        ids.join(core.withColumn("is_core", F.lit(True)), "id", "left")
        .join(in_set.withColumn("is_in", F.lit(True)), "id", "left")
        .join(out_set.withColumn("is_out", F.lit(True)), "id", "left")
        .join(fwd_in.withColumnRenamed("reached", "from_in"), "id", "left")
        .join(bwd_out.withColumnRenamed("reached", "to_out"), "id", "left")
    )
    cls = (
        F.when(F.col("is_core"), "CORE")
        .when(F.col("is_in"), "IN")
        .when(F.col("is_out"), "OUT")
        .when(F.col("from_in") & F.col("to_out"), "TUBE")
        .when(F.col("from_in") | F.col("to_out"), "TENDRIL")
        .otherwise("DISCONNECTED")
    )
    return flags.select("id", cls.alias("cls"))


def bowtie_profile(spark, edges: DataFrame, vertices: DataFrame) -> DataFrame:
    """(cls, n, pct): the headline bow-tie size table of a crawl."""
    classes = bowtie(spark, edges, vertices)
    total = vertices.count()
    return (
        classes.groupBy("cls")
        .agg(F.count("*").alias("n"))
        .select(
            "cls", "n", F.round(F.col("n") / F.lit(total) * 100, 4).alias("pct")
        )
    )
