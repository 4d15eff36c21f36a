"""Link prediction: common-neighbor and Adamic-Adar candidate scoring.

Given the (directed) link graph, score non-adjacent vertex pairs by how
many neighbors they share — the classic citation/web-graph "you probably
also link here" signal (Liben-Nowell & Kleinberg 2003). Adamic-Adar
down-weights shared neighbors by ``1/ln(degree)`` so promiscuous hubs
contribute less than selective pages.

Plan shape (all built-ins, one self-join + one aggregation):

- symmetric closure of the edge set (graph.undirected_edges);
- wedge enumeration: two copies of the neighbor table equi-joined on the
  shared center ``w`` with ``u < v`` — the same shape as the triangle
  wedge join (triangles.py), but keeping OPEN wedges;
- anti-join the existing edge set (a candidate must not already be
  linked), then one groupBy (u, v).

The wedge count through a center is ``deg(w)²`` — quadratic in hub
degree. Unlike triangle counting there is no orientation trick that
preserves exactness for OPEN wedges, so the scale guard is explicit:
``hub_cap`` drops centers with degree above the cap (default finite,
mirroring dedup's df_cap design — at web scale a center linking 10⁶
pages carries ~0 Adamic-Adar weight per pair anyway, ``1/ln(10⁶)``
spread over 10¹² pairs). ``hub_cap=None`` is the exact mode the oracle
checks.

Reference scope: ccm has no prediction; graft-added graph analytics
alongside cocitation (graph.py:208), SURVEY.md §2.5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .graph import undirected_edges

DEFAULT_HUB_CAP = 10_000


def link_prediction(
    edges: DataFrame,
    min_common: int = 2,
    hub_cap: int | None = DEFAULT_HUB_CAP,
) -> DataFrame:
    """-> (u, v, cn, aa): common-neighbor count and Adamic-Adar score for
    unlinked pairs sharing >= min_common neighbors."""
    und = undirected_edges(edges)
    deg = und.groupBy(F.col("src").alias("w")).agg(
        F.count(F.lit(1)).alias("d")
    )
    if hub_cap is not None:
        deg = deg.where(F.col("d") <= hub_cap)
    # neighbor table keyed by center w; the deg join also applies hub_cap
    nbr = und.select(F.col("src").alias("w"), F.col("dst").alias("n")) \
        .join(deg, "w")
    a = nbr.select("w", "d", F.col("n").alias("u"))
    b = nbr.select("w", F.col("n").alias("v"))
    wedges = a.join(b, "w").where(F.col("u") < F.col("v"))
    cand = (
        wedges.groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("cn"),
            F.round(F.sum(1.0 / F.log(F.col("d").cast("double"))), 6)
            .alias("aa"),
        )
        .where(F.col("cn") >= min_common)
    )
    # drop already-linked pairs (und is symmetric, so one direction is
    # enough given u < v)
    return cand.join(
        und.select(F.col("src").alias("u"), F.col("dst").alias("v")),
        ["u", "v"],
        "left_anti",
    )
