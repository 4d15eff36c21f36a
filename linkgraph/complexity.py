"""Per-component structural complexity — ccm's six measures over the link graph.

This is the reference capability reproduced verbatim at scale
(BASELINE.json:6): the six cyclomatic-complexity formulas are closed-form
functions of per-graph aggregates E (edges), N (nodes), P (components),
D (decision points), X (exit points) — /root/reference/src/ccm/complexity.py:
mccabe E−N+2 (:55), generalised mccabe E−N+2P (:86), Henderson-Sellers
E−N+P+1 (:116), Henderson-Sellers–Tegarden E−N+P (:146), generalised HST
E−N+X+2 (:179), Harrison D−X+2 (:207). (Doc quirk: the module docstring at
complexity.py:6 says E−N+1; the code and README.rst:25 say E−N+2 — we follow
the code.)

Point-class mapping from ccm's bytecode flags (xdis.py:447-465) to the link
graph: decision point = vertex with out-degree ≥ 2 (a page that branches),
exit point = vertex with out-degree 0 (dangling page — flow leaves the
graph), entry point = vertex with in-degree 0. All are plain conditional
aggregates — the reference's four tee'd index passes (graphs.py:252-256)
collapse into one groupBy.

Per component P = 1, so the per-component scores use P=1; the whole-graph
row uses P = number of components (the generalised formulas' raison d'être,
README.rst:34).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _formulas(P):
    e, n, d, x = F.col("E"), F.col("N"), F.col("D"), F.col("X")
    return [
        (e - n + F.lit(2)).alias("mccabe"),
        (e - n + F.lit(2) * P).alias("mccabe_generalised"),
        (e - n + P + F.lit(1)).alias("henderson_sellers"),
        (e - n + P).alias("henderson_sellers_tegarden"),
        (e - n + x + F.lit(2)).alias("hst_generalised"),
        (d - x + F.lit(2)).alias("harrison"),
    ]


def _component_aggregates(edges: DataFrame, components: DataFrame) -> DataFrame:
    """-> (component, N, E, D, X, entry_points) from edges(src,dst) +
    components(id, component). Every directed edge is intra-component by
    construction (components are over the undirected closure)."""
    deg = (
        components.join(
            edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("out_deg")),
            "id",
            "left",
        )
        .join(
            edges.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("in_deg")),
            "id",
            "left",
        )
        .select(
            "component",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
    )
    vstats = deg.groupBy("component").agg(
        F.count("*").alias("N"),
        F.sum(F.when(F.col("out_deg") >= 2, 1).otherwise(0)).alias("D"),
        F.sum(F.when(F.col("out_deg") == 0, 1).otherwise(0)).alias("X"),
        F.sum(F.when(F.col("in_deg") == 0, 1).otherwise(0)).alias("entry_points"),
    )
    estats = (
        edges.join(
            components.select(F.col("id").alias("src"), "component"), "src"
        )
        .groupBy("component")
        .agg(F.count("*").alias("E"))
    )
    return vstats.join(estats, "component", "left").na.fill({"E": 0})


def component_complexity(spark, edges: DataFrame, components: DataFrame) -> DataFrame:
    """-> per-component (component, N, E, D, X, six scores) with P=1."""
    aggs = _component_aggregates(edges, components)
    return aggs.select(
        "component", "N", "E", "D", "X", "entry_points", *_formulas(F.lit(1))
    )


def graph_complexity(spark, edges: DataFrame, components: DataFrame) -> DataFrame:
    """-> single row: whole-graph N, E, P, D, X + the six scores with
    P = number of (weakly) connected components (≙ ccm's generalised
    formulas for graphs that aren't strongly connected, README.rst:34)."""
    aggs = _component_aggregates(edges, components)
    totals = aggs.agg(
        F.sum("N").alias("N"),
        F.sum("E").alias("E"),
        F.count("*").alias("P"),
        F.sum("D").alias("D"),
        F.sum("X").alias("X"),
    )
    return totals.select("N", "E", "P", "D", "X", *_formulas(F.col("P")))
