"""Deterministic random walks over the link graph — the DeepWalk/node2vec
corpus-generation primitive (walk sequences feed skip-gram embedding
training the same way documents feed an LM).

Reference capability: graph traversal over the assembled edge table
(/root/reference/src/ccm/graphs.py builds the graph; walking it is the
training-data extension mandated for the LLM-pipeline tier).

Determinism instead of rand(): the step-s successor of vertex v on walk w
is argmin over out-neighbors d of md5("{seed}:{w}:{s}:{d}") — a keyed
hash coin, so walks are reproducible shard-by-shard and re-derivable by
any engine with md5 (the DuckDB oracle unrolls the same argmin).

Scale shape: each step is one shuffle join of the frontier against the
edge table keyed on src plus a min_by aggregation keyed on walk_id — the
frontier is one row per live walk, never the whole graph, and nothing
lands on the driver. Walks that reach a dangling vertex simply emit no
further rows (standard truncated-walk semantics).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from linkgraph.joinhints import fits_broadcast
from linkgraph.lineage import truncate_plan


def random_walks(
    edges: DataFrame,
    starts: DataFrame,
    steps: int = 4,
    seed: str = "w",
) -> DataFrame:
    """edges(src, dst) distinct, starts(id) -> (walk_id, step, vertex).

    One walk per start vertex (walk_id = start id), step 0 is the start
    itself; successor = hash-argmin over out-neighbors (see module doc).
    """
    if steps < 0:
        raise ValueError(f"steps must be >= 0, got {steps}")
    # the frontier is one row per live walk, bounded by |starts|: when
    # that fits the broadcast cap, broadcast it each step so the edge
    # side is never exchanged or re-sorted (guide §3.1; measured 5/5
    # interleaved pairs faster at sf0.1, min 1.00s vs 1.26s)
    bcast = fits_broadcast(starts.count())
    cur = starts.select(
        F.col("id").alias("walk_id"), F.col("id").alias("vertex")
    )
    levels = [cur.withColumn("step", F.lit(0).cast("int"))]
    for s in range(1, steps + 1):
        h = F.md5(
            F.concat_ws(
                ":",
                F.lit(seed),
                F.col("walk_id"),
                F.lit(str(s)),
                F.col("dst"),
            )
        )
        left = F.broadcast(cur) if bcast else cur
        cur = (
            left.join(edges, left.vertex == edges.src)
            .select("walk_id", "dst", h.alias("h"))
            .groupBy("walk_id")
            .agg(F.min_by("dst", "h").alias("vertex"))
        )
        # truncate per level: the final union has one branch per step, and
        # without this each branch would recompute the whole join chain
        # from step 0 (O(steps^2) joins); lazy checkpoint keeps it one job
        cur = truncate_plan(cur, eager=False)
        levels.append(cur.withColumn("step", F.lit(s).cast("int")))
    out = reduce(DataFrame.unionByName, levels)
    return out.select(
        "walk_id", "step", F.col("vertex").cast("long").alias("vertex")
    )


def skipgram_pairs(walks_df: DataFrame, window: int = 2) -> DataFrame:
    """walks(walk_id, step, vertex) -> (center, context, n) — the
    skip-gram co-occurrence table DeepWalk/node2vec train on (and GloVe's
    count matrix): every ordered pair of vertices within ``window`` steps
    on the same walk, aggregated corpus-wide.

    One self-join keyed on walk_id (walks are short — the per-key fanout
    is steps^2, a constant) followed by one count aggregation keyed on
    the pair; both shuffles are bounded by |walks|·window, never |V|^2.
    """
    a = walks_df.select(
        "walk_id", F.col("step").alias("sa"), F.col("vertex").alias("center")
    )
    b = walks_df.select(
        "walk_id", F.col("step").alias("sb"), F.col("vertex").alias("context")
    )
    j = a.join(b, "walk_id").where(
        (F.abs(F.col("sa") - F.col("sb")) <= window)
        & (F.col("sa") != F.col("sb"))
    )
    return j.groupBy("center", "context").agg(
        F.count("*").cast("long").alias("n")
    )


def node2vec_walks(
    edges: DataFrame,
    starts: DataFrame,
    steps: int = 3,
    p: float = 4.0,
    q: float = 0.5,
    seed: str = "n2v",
) -> DataFrame:
    """Second-order biased walks (node2vec, Grover & Leskovec KDD'16),
    deterministic: the successor of v given previous u is the A-Res
    weighted draw over out-neighbors d with the node2vec weights
    w = 1/p if d == u (return), 1 if (u, d) is an edge (stay close),
    else 1/q (explore) — drawn as argmax of ln(uh)/w where uh is the
    md5 uniform of (seed, walk, step, d). One extra broadcast-shape
    join per step (the d-in-N(u) membership flag) on top of the plain
    random_walks frontier join; the frontier carries (walk, prev,
    vertex) — still one row per live walk.

    Step 1 has no previous vertex: all candidates weigh 1/q, a constant,
    so the draw is the plain uniform hash-argmax.

    -> (walk_id, step, vertex), step 0 = the start vertex.
    """
    if steps < 0:
        raise ValueError(f"steps must be >= 0, got {steps}")
    inv_p, inv_q = 1.0 / p, 1.0 / q
    bcast = fits_broadcast(starts.count())  # frontier bound, see above
    e = edges.select("src", "dst").distinct()
    nbr = e.select(
        F.col("src").alias("prev"), F.col("dst").alias("dst"),
        F.lit(1).alias("is_nbr"),
    )
    cur = starts.select(
        F.col("id").alias("walk_id"),
        F.lit(-1).cast("long").alias("prev"),
        F.col("id").alias("vertex"),
    )
    levels = [
        cur.select("walk_id", F.lit(0).cast("int").alias("step"), "vertex")
    ]
    for s in range(1, steps + 1):
        left = F.broadcast(cur) if bcast else cur
        cand = left.join(e, left.vertex == e.src).select(
            "walk_id", "prev", "vertex", "dst"
        )
        cand = cand.join(nbr, ["prev", "dst"], "left")
        w = (
            F.when(F.col("dst") == F.col("prev"), F.lit(inv_p))
            .when(F.col("is_nbr") == 1, F.lit(1.0))
            .otherwise(F.lit(inv_q))
        )
        h60 = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(seed), F.col("walk_id"),
                        F.lit(str(s)), F.col("dst"),
                    )
                ),
                1, 15,
            ),
            16, 10,
        ).cast("long")
        u = (h60 + F.lit(1).cast("double")) / F.lit(float(2**60 + 1))
        key = F.log(u) / w
        cur = (
            cand.select("walk_id", "vertex", "dst", key.alias("k"))
            .groupBy("walk_id")
            .agg(
                F.max_by("dst", "k").alias("nxt"),
                F.first("vertex").alias("v0"),
            )
            .select(
                "walk_id",
                F.col("v0").alias("prev"),
                F.col("nxt").alias("vertex"),
            )
        )
        cur = truncate_plan(cur, eager=False)
        levels.append(
            cur.select(
                "walk_id", F.lit(s).cast("int").alias("step"), "vertex"
            )
        )
    out = reduce(DataFrame.unionByName, levels)
    return out.select(
        "walk_id", "step", F.col("vertex").cast("long").alias("vertex")
    )
