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
        cur = (
            cur.join(edges, cur.vertex == edges.src)
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
