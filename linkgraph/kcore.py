"""k-core decomposition by iterative degree peeling.

The k-core of an undirected graph is the maximal subgraph in which every
vertex has degree >= k — the standard "dense backbone" extractor for web
graphs (spam farms and tightly-knit communities live in high cores;
fringe/leaf pages peel out immediately). Peeling is the textbook BSP
shape: each round recomputes degrees over the surviving edge set and
drops vertices below k, until a fixpoint.

Scale notes: one round = one groupBy(id) degree aggregate + two
semi-joins, all keyed on vertex id — the identical shuffle signature as
a PageRank superstep, so hub salting/AQE skew handling there applies
here unchanged. The undirected symmetrized edge set is built ONCE and
persisted; each round filters it with join-pruned survivor sets rather
than rewriting it. Rounds are O(peel depth) — on power-law web graphs
the degeneracy ordering collapses in a few tens of rounds because whole
degree-1 fringes vanish per round (not one vertex at a time as in the
sequential algorithm).

≙ reference capability: structural reductions over the assembled graph
(/root/reference/src/ccm/complexity.py:34-55 scalar graph metrics; the
core number is the per-vertex refinement of the same edge-count family).

Determinism: the k-core is unique (independent of peel order), so
fixpoint output is exactly reproducible; ``rounds`` pins a bounded
unrolled prefix for SQL-oracle replication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .graph import sym_pairs
from .lineage import truncate_plan


def undirected_edges(edges: DataFrame) -> DataFrame:
    """Distinct symmetrized (u, v) pairs, self-loops dropped."""
    e = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    return (
        sym_pairs(e.where(F.col("u") != F.col("v")), "u", "v")
        .distinct()
    )


def kcore(
    spark,
    edges: DataFrame,
    vertices: DataFrame,
    k: int = 2,
    rounds: int | None = None,
) -> DataFrame:
    """-> (id, core_deg) for every vertex in the k-core.

    ``rounds=None`` peels to the fixpoint (one O(1)-row count action per
    round, the engine-wide BSP budget); an explicit ``rounds`` runs a
    fixed unrolled prefix lazily — zero driver actions — for
    SQL-replicable bounded runs. ``core_deg`` is each survivor's degree
    within the returned subgraph (>= k at the fixpoint; after a bounded
    prefix it is the degree among that prefix's survivors).
    """
    und = undirected_edges(edges).persist()
    # census AFTER und registers but BEFORE alive's checkpoint does:
    # persist()/localCheckpoint() enter the persistent-RDD map at call
    # time (not at materialization), so the fixpoint loop's id-diff below
    # must treat alive's checkpoint as round-0 state to release
    from .pagerank import _persistent_rdd_ids, _unpersist_rdds

    census0 = _persistent_rdd_ids(spark)
    alive = truncate_plan(vertices.select("id").distinct(), eager=False)

    def _survivors(cur: DataFrame) -> DataFrame:
        live = (
            und.join(cur.select(F.col("id").alias("u")), "u")
            .join(cur.select(F.col("id").alias("v")), "v")
        )
        deg = live.groupBy(F.col("u").alias("id")).agg(
            F.count("*").alias("core_deg")
        )
        return deg.where(F.col("core_deg") >= k)

    if rounds is not None:
        cur = alive
        for _ in range(rounds):
            cur = truncate_plan(
                _survivors(cur).select("id", "core_deg"), eager=False
            )
        out = cur
    else:
        # explicit per-round unpersist of the superseded checkpoint (the
        # same RDD-id-diff discipline as pagerank's superstep loop):
        # working set stays at exactly (und cache + 2 vertex states),
        # deterministically, instead of waiting on the async ContextCleaner
        cur = alive.select("id", F.lit(-1).cast("long").alias("core_deg"))
        n_prev = cur.count()  # materializes alive's lazy checkpoint too
        prev_ids: set[int] = _persistent_rdd_ids(spark) - census0
        while True:
            before = _persistent_rdd_ids(spark)
            cur = truncate_plan(_survivors(cur).select("id", "core_deg"))
            n_cur = cur.count()  # materializes the round AND tests fixpoint
            new_ids = _persistent_rdd_ids(spark) - before
            _unpersist_rdds(spark, prev_ids)
            prev_ids = new_ids
            if n_cur == n_prev or n_cur == 0:
                break
            n_prev = n_cur
        out = cur
    out = out.select("id", F.col("core_deg").cast("long").alias("core_deg"))
    und.unpersist()
    return out


def kcore_oracle(nodes, edges, k: int, rounds: int | None = None):
    """Pure-Python peel replica (test oracle) -> {id: core_deg}.

    Round-parity matches the engine exactly: each round's ``core_deg`` is
    the vertex's degree among the PREVIOUS round's survivors (that is what
    a bounded prefix returns; at the fixpoint the two sets coincide)."""
    und = set()
    for u, v in edges:
        if u != v:
            und.add((u, v))
            und.add((v, u))
    alive = set(nodes)
    last: dict = {}
    i = 0
    while rounds is None or i < rounds:
        deg: dict = {}
        for u, v in und:
            if u in alive and v in alive:
                deg[u] = deg.get(u, 0) + 1
        nxt = {u: d for u, d in deg.items() if d >= k}
        if rounds is None and set(nxt) == alive:
            return nxt
        alive = set(nxt)
        last = nxt
        i += 1
        if not alive:
            return {}
    return last
