"""Bow-tie decomposition: hand-built graph with all six classes."""

from __future__ import annotations

from pyspark.sql import functions as F

from linkgraph.bowtie import bowtie, bowtie_profile


def _df(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_bowtie_all_six_classes(spark):
    # CORE: 0<->1<->2 (3-cycle); IN: 10 -> 0; OUT: 2 -> 20;
    # TUBE: 10 -> 30 -> 20 (bypasses CORE);
    # TENDRIL-in: 10 -> 40 (dead end); TENDRIL-out: 41 -> 20;
    # DISCONNECTED: 50 (isolated), 51 <-> 52 (a small SCC off to the side).
    edges = _df(
        spark,
        [(0, 1), (1, 2), (2, 0), (10, 0), (2, 20), (10, 30), (30, 20),
         (10, 40), (41, 20), (51, 52), (52, 51)],
        ["src", "dst"],
    )
    vertices = _df(
        spark,
        [(v,) for v in (0, 1, 2, 10, 20, 30, 40, 41, 50, 51, 52)],
        ["id"],
    )
    got = {r["id"]: r["cls"] for r in bowtie(spark, edges, vertices).collect()}
    assert got == {
        0: "CORE", 1: "CORE", 2: "CORE",
        10: "IN", 20: "OUT", 30: "TUBE",
        40: "TENDRIL", 41: "TENDRIL",
        50: "DISCONNECTED", 51: "DISCONNECTED", 52: "DISCONNECTED",
    }
    prof = {r["cls"]: (r["n"], r["pct"]) for r in
            bowtie_profile(spark, edges, vertices).collect()}
    assert prof["CORE"] == (3, round(3 / 11 * 100, 4))
    assert prof["DISCONNECTED"][0] == 3


def test_bowtie_ties_break_to_smallest_component_id(spark):
    # two SCCs of equal size 2: {1,2} and {8,9} — CORE must be {1,2}
    # (smallest component id), deterministically.
    edges = _df(spark, [(1, 2), (2, 1), (8, 9), (9, 8)], ["src", "dst"])
    vertices = _df(spark, [(v,) for v in (1, 2, 8, 9)], ["id"])
    got = {r["id"]: r["cls"] for r in bowtie(spark, edges, vertices).collect()}
    assert got[1] == "CORE" and got[2] == "CORE"
    # {8,9} has no directed path to/from CORE: DISCONNECTED
    assert got[8] == "DISCONNECTED" and got[9] == "DISCONNECTED"


def test_bowtie_no_edges_degenerate(spark):
    edges = _df(spark, [(0, 0)], ["src", "dst"]).where("src <> dst")
    vertices = _df(spark, [(0,), (1,), (2,)], ["id"])
    got = {r["id"]: r["cls"] for r in bowtie(spark, edges, vertices).collect()}
    # every vertex is its own SCC; the tie-break picks id 0 as CORE
    assert got == {0: "CORE", 1: "DISCONNECTED", 2: "DISCONNECTED"}
