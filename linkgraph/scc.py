"""Strongly connected components — directed P for the CCM formulas.

≙ reference capability A3: the reference's P is
``nx.number_strongly_connected_components`` (/root/reference/src/ccm/
complexity.py:84,114,144). Round 1 shipped only weak components
(components.py); this module reproduces the directed semantics at scale.

Algorithm: iterative **trim + forward/backward min-label peeling**
(the distributed FW-BW/coloring family — Hong et al. "On Fast Parallel
Detection of Strongly Connected Components", Orzan's coloring; each outer
round is O(diameter) BSP min-propagations, all DataFrame joins):

1. TRIM: repeatedly peel vertices with in-degree 0 or out-degree 0 among
   active vertices — each is its own singleton SCC. (Web graphs are mostly
   a giant SCC plus a DAG fringe; trimming removes the fringe fast.)
2. FWD: fixpoint f(v) = min id u with a directed path u ->* v
   (propagate min along edge direction).
3. BWD: fixpoint b(v) = min id u with a directed path v ->* u
   (propagate min against edge direction).
4. PEEL: every v with f(v) == b(v) == m belongs to SCC(m): f(v)=m means
   m ->* v, b(v)=m means v ->* m. Each round settles at least the SCC of
   every locally-minimal id (always the global min), so the outer loop
   terminates; labels are min-member ids — exact and deterministic,
   matching the engine's min-based tie-break convention (BASELINE.json:14).

Scale shape: every step is a join + min-aggregate keyed on vertex id —
the same shuffle signature as connected_components; state is one row per
active vertex, lineage truncated per round (linkgraph.lineage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .lineage import truncate_plan


def _min_fixpoint(spark, edges: DataFrame, verts: DataFrame, max_rounds: int = 200) -> DataFrame:
    """labels(id, lbl): lbl = min id that reaches ``id`` along ``edges``.

    BSP min-propagation: lbl(v) <- min(lbl(v), min over in-edges (u,v) of
    lbl(u)); O(diameter) rounds, fixpoint detected by a changed-count agg.
    """
    labels = truncate_plan(verts.select("id", F.col("id").alias("lbl")))
    for _ in range(max_rounds):
        incoming = (
            edges.join(labels.select(F.col("id").alias("src"), "lbl"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("lbl").alias("in_lbl"))
        )
        nxt = (
            labels.join(incoming, "id", "left")
            .select(
                "id",
                F.least(F.col("lbl"), F.coalesce("in_lbl", F.col("lbl"))).alias("new_lbl"),
                "lbl",
            )
        )
        nxt = truncate_plan(nxt)
        changed = nxt.where(F.col("new_lbl") != F.col("lbl")).count()
        labels = nxt.select("id", F.col("new_lbl").alias("lbl"))
        if changed == 0:
            break
    return labels


def strongly_connected_components(
    spark,
    edges: DataFrame,
    vertices: DataFrame,
    max_outer: int = 50,
    max_rounds: int = 200,
) -> DataFrame:
    """edges(src,dst) + vertices(id) -> (id, component) with component =
    min vertex id of the SCC. Exact (tests pin against networkx / a
    recursive-CTE SQL oracle)."""
    assigned = None  # accumulated (id, component)
    active_v = truncate_plan(vertices.select("id").distinct())
    active_e = truncate_plan(
        edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    )

    for _ in range(max_outer):
        if active_v.limit(1).count() == 0:
            break
        # -- TRIM: peel in-deg-0 / out-deg-0 vertices (singleton SCCs) --
        while True:
            srcs = active_e.select(F.col("src").alias("id")).distinct()
            dsts = active_e.select(F.col("dst").alias("id")).distinct()
            core = truncate_plan(
                active_v.join(srcs, "id", "left_semi").join(dsts, "id", "left_semi")
            )
            trimmed = active_v.join(core, "id", "left_anti").select(
                "id", F.col("id").alias("component")
            )
            n_trimmed = trimmed.count()
            if n_trimmed == 0:
                break
            assigned = (
                trimmed if assigned is None else assigned.unionByName(trimmed)
            )
            assigned = truncate_plan(assigned)
            active_v = core
            active_e = truncate_plan(
                active_e.join(
                    core.select(F.col("id").alias("src")), "src", "left_semi"
                ).join(core.select(F.col("id").alias("dst")), "dst", "left_semi")
            )
        if active_v.limit(1).count() == 0:
            break

        # -- FWD/BWD min fixpoints over the trimmed core --
        fwd = _min_fixpoint(spark, active_e, active_v, max_rounds)
        rev = active_e.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
        bwd = _min_fixpoint(spark, rev, active_v, max_rounds)

        # -- PEEL: f(v) == b(v) == m  =>  v in SCC(m) --
        both = fwd.select("id", F.col("lbl").alias("f")).join(
            bwd.select("id", F.col("lbl").alias("b")), "id"
        )
        settled = both.where(F.col("f") == F.col("b")).select(
            "id", F.col("f").alias("component")
        )
        settled = truncate_plan(settled)
        if settled.limit(1).count() == 0:
            # cannot happen (the global-min vertex always settles);
            # guard against an infinite loop regardless
            break
        assigned = settled if assigned is None else assigned.unionByName(settled)
        assigned = truncate_plan(assigned)
        active_v = truncate_plan(active_v.join(settled, "id", "left_anti"))
        active_e = truncate_plan(
            active_e.join(
                settled.select(F.col("id").alias("src")), "src", "left_anti"
            ).join(settled.select(F.col("id").alias("dst")), "dst", "left_anti")
        )

    if assigned is None:
        return vertices.select("id", F.col("id").alias("component")).where(F.lit(False))
    return assigned


def scc_count(spark, edges: DataFrame, vertices: DataFrame) -> int:
    """P = number of SCCs (the reference's formula input, complexity.py:84)."""
    comps = strongly_connected_components(spark, edges, vertices)
    return int(comps.select("component").distinct().count())
