"""Iterative PageRank as driver-side BSP over DataFrames.

Damping 0.85, uniform teleport, dangling mass redistributed uniformly
(matching ``networkx.pagerank`` semantics, the mandated oracle —
BASELINE.json:14), L1 convergence. One superstep = one join (ranks ⋈ edges
on src) + one two-stage aggregation (salted partial agg on (dst, salt),
final agg on dst) + one map — all built-in JVM expressions, no Python in
the hot path.

Skew: power-law hub *destinations* concentrate the groupBy(dst) shuffle.
Spark's map-side partial aggregation already bounds per-key fan-in at one
row per map task, but a single reducer still owns the hub key; the explicit
two-stage salt (BASELINE.json:14) spreads the hub key over ``salt_buckets``
reducers first. Salting changes only the order of float additions — the
rank-equivalence test pins salted == unsalted within 1e-12.

≙ reference capability: the per-graph scalar reductions over the edge table
(/root/reference/src/ccm/complexity.py:34-55 compute E−N+2 from one graph
pass; here the per-vertex fixpoint is the scaled-up whole-graph analytic).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from .checkpoint import CheckpointManager, StepTimer
from .lineage import truncate_plan

DAMPING = 0.85


def _persistent_rdd_ids(spark) -> set[int]:
    m = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in m.keySet().toArray()}


def _unpersist_rdds(spark, ids: set[int]) -> None:
    """Free localCheckpoint block storage for superseded vertex states.

    localCheckpoint pins its RDD in block storage and Python drops the only
    reference when the loop variable is reassigned; the async ContextCleaner
    frees it *eventually*, which at tens of supersteps means unbounded
    memory growth between GC cycles. Explicit unpersist keeps the loop's
    working set at exactly (edges cache + 2 vertex states).
    """
    m = spark.sparkContext._jsc.getPersistentRDDs()
    for k in m.keySet().toArray():
        if int(k) in ids:
            m.get(k).unpersist(False)


@dataclass
class SuperstepInfo:
    superstep: int
    l1_delta: float
    dangling_mass: float
    seconds: float


@dataclass
class PageRankResult:
    ranks: DataFrame  # (id, rank)
    iterations: int
    converged: bool
    supersteps: list[SuperstepInfo] = field(default_factory=list)


def _prepare_edges(
    edges: DataFrame,
    hub_threshold: int,
    salt_buckets: int,
    num_partitions: int,
) -> DataFrame:
    """Static per-run edge prep: attach src out-degree, pre-salt hub dsts,
    hash-partition by src and persist — the static side of every superstep
    join never re-shuffles (SURVEY.md §4.2)."""
    # degrees derive from the edge table itself (never trust a caller-supplied
    # degree column — a mismatch silently leaks rank mass); the hub list is
    # tiny by construction (degree >= threshold), so only IT is broadcast —
    # the full degree table joins by shuffle/AQE, which is the only strategy
    # that survives 10^12-vertex scale.
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    hub_dsts = (
        edges.groupBy("dst")
        .agg(F.count("*").alias("in_deg"))
        .where(F.col("in_deg") >= hub_threshold)
        .select("dst", F.lit(True).alias("is_hub"))
    )
    prepped = (
        edges.join(out_deg, "src")
        .join(F.broadcast(hub_dsts), "dst", "left")
        .select(
            "src",
            "dst",
            "out_deg",
            F.when(
                F.col("is_hub").isNotNull(), F.pmod(F.col("src"), F.lit(salt_buckets))
            )
            .otherwise(F.lit(0))
            .cast("int")
            .alias("salt"),
        )
        .repartition(num_partitions, "src")
    )
    return prepped


def pagerank(
    spark,
    edges: DataFrame,
    vertices: DataFrame,
    damping: float = DAMPING,
    tol: float = 1e-9,
    max_iter: int = 100,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 1,
    salt_buckets: int = 16,
    hub_threshold: int = 1024,
    num_partitions: int | None = None,
    resume: bool = False,
    seeds: DataFrame | None = None,
) -> PageRankResult:
    """PageRank over edges(src,dst) / vertices(id,url,out_deg,in_deg).

    With ``checkpoint`` set, every ``checkpoint_every``-th superstep writes
    vertex state + manifest (resumable: pass ``resume=True`` to continue
    from the latest completed superstep of the same run_id).

    ``seeds`` (a DataFrame with an ``id`` column) switches to PERSONALIZED
    PageRank: both the teleport and the dangling-mass redistribution go to
    the seed set (uniformly over seeds ∩ vertices) instead of all
    vertices — networkx ``pagerank(personalization=..., dangling=None)``
    semantics. Implementation-wise the teleport vector is just a per-vertex
    ``tp`` column carried in the superstep state (1/|S| on seeds, else 0;
    uniform 1/n without seeds), so the personalized path IS the plain path
    — same joins, same salting, same checkpoint/resume machinery.
    """
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    n = vertices.count()
    if n == 0:
        return PageRankResult(vertices.select("id", F.lit(0.0).alias("rank")), 0, True)

    if seeds is not None:
        seed_ids = seeds.select("id").distinct().join(
            vertices.select("id"), "id"
        )
        n_seeds = seed_ids.count()
        if n_seeds == 0:
            raise ValueError(
                "personalized pagerank needs a non-empty seeds ∩ vertices set"
            )
        # the seed set is small by use-case (a user's context / a topic
        # whitelist); broadcast the membership flag
        tp_join = F.broadcast(
            seed_ids.select("id", F.lit(1.0 / n_seeds).alias("tp"))
        )
    else:
        tp_join = None

    e = _prepare_edges(edges, hub_threshold, salt_buckets, num_partitions)
    e = e.persist()
    e.count()  # materialize the static side once

    # vertex out-degrees derived from the same edge table (see _prepare_edges)
    deg = (
        vertices.select("id")
        .join(
            edges.groupBy(F.col("src").alias("id")).agg(
                F.count("*").alias("out_deg")
            ),
            "id",
            "left",
        )
        .select("id", F.coalesce("out_deg", F.lit(0)).alias("out_deg"))
    )
    if tp_join is not None:
        deg = deg.join(tp_join, "id", "left").select(
            "id", "out_deg", F.coalesce("tp", F.lit(0.0)).alias("tp")
        )
    else:
        deg = deg.select("id", "out_deg", F.lit(1.0 / n).alias("tp"))

    start_step = 0
    if resume and checkpoint is not None:
        latest = checkpoint.latest_complete("pagerank")
        if latest is not None:
            state = checkpoint.read_state("pagerank", latest).select("id", "rank")
            ranks = state.join(deg, "id").select("id", "out_deg", "tp", "rank")
            start_step = latest + 1
        else:
            ranks = deg.select("id", "out_deg", "tp", F.lit(1.0 / n).alias("rank"))
    else:
        ranks = deg.select("id", "out_deg", "tp", F.lit(1.0 / n).alias("rank"))

    # NOTE: localCheckpoint drops partitioning metadata (the re-read plan is
    # an ExistingRDD with UnknownPartitioning), so pre-repartitioning vertex
    # state before a checkpoint is a wasted shuffle — the superstep join
    # re-exchanges the (small) vertex side regardless, while the (huge)
    # static edge side reuses its cached hash partitioning.
    before = _persistent_rdd_ids(spark)
    ranks = truncate_plan(ranks)
    ranks_rdd_ids = _persistent_rdd_ids(spark) - before
    supersteps: list[SuperstepInfo] = []
    converged = False
    step = start_step

    # dangling mass of the CURRENT state; after the first superstep it is
    # carried forward from the post-superstep aggregate (one job, not two)
    dangling = float(
        ranks.where(F.col("out_deg") == 0).agg(F.sum("rank")).collect()[0][0] or 0.0
    )

    _delta_aggs = [
        F.sum(F.abs(F.col("rank") - F.col("rank_old"))).alias("l1"),
        F.sum(F.when(F.col("out_deg") == 0, F.col("rank")).otherwise(F.lit(0.0))).alias(
            "dm"
        ),
    ]

    # per-round join strategy (guide §3.1): the rank state is |V| rows —
    # when that fits the broadcast cap, broadcast it (and the contrib
    # table) so the static |E| edge side is never exchanged per
    # superstep; otherwise the historical shuffle_hash rounds (a SMJ
    # would re-sort all |E| rows / step)
    from .joinhints import fits_broadcast

    bcast = fits_broadcast(n)

    def _state_side(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if bcast else df.hint("shuffle_hash")

    for step in range(start_step, start_step + max_iter):
        with StepTimer() as t:
            before = _persistent_rdd_ids(spark)
            contribs = (
                e.join(
                    _state_side(
                        ranks.select(F.col("id").alias("src"), "rank")
                    ),
                    "src",
                )
                .select(
                    "dst", "salt", (F.col("rank") / F.col("out_deg")).alias("c")
                )
                # stage 1: salted partial aggregation (hub keys spread over
                # salt_buckets reducers), stage 2: final per-dst sum
                .groupBy("dst", "salt")
                .agg(F.sum("c").alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("contrib"))
            )
            contribs_j = _state_side(contribs)
            new_ranks = (
                ranks.join(
                    contribs_j,
                    ranks["id"] == contribs_j["dst"],
                    "left",
                )
                .select(
                    "id",
                    "out_deg",
                    "tp",
                    F.col("rank").alias("rank_old"),
                    (
                        F.lit(1.0 - damping) * F.col("tp")
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("contrib"), F.lit(0.0))
                            + F.lit(dangling) * F.col("tp")
                        )
                    ).alias("rank"),
                )
            )
            # one heavy job materializes the superstep (plan truncation);
            # the L1 delta + next dangling mass are one cheap follow-up agg
            # over the materialized state — never a recompute of the join
            if checkpoint is not None and (step % checkpoint_every == 0):
                staged = new_ranks.persist()
                row = staged.agg(*_delta_aggs).collect()[0]
                delta, next_dangling = float(row["l1"] or 0.0), float(row["dm"] or 0.0)
                written = checkpoint.write_state(
                    staged.select("id", "rank", F.lit(step).alias("superstep")),
                    "pagerank",
                    step,
                    l1_delta=delta,
                    extra={"n": n, "damping": damping},
                )
                staged.unpersist()
                next_ranks = (
                    written.select("id", "rank")
                    .join(deg, "id")
                    .select("id", "out_deg", "tp", "rank")
                )
                next_ranks = truncate_plan(next_ranks)
            else:
                next_ranks = truncate_plan(new_ranks)
                row = next_ranks.agg(*_delta_aggs).collect()[0]
                delta, next_dangling = float(row["l1"] or 0.0), float(row["dm"] or 0.0)
                next_ranks = next_ranks.select("id", "out_deg", "tp", "rank")
            new_ids = _persistent_rdd_ids(spark) - before - ranks_rdd_ids
            _unpersist_rdds(spark, ranks_rdd_ids)
            ranks_rdd_ids = new_ids
            ranks = next_ranks
        supersteps.append(SuperstepInfo(step, float(delta), float(dangling), t.seconds))
        dangling = next_dangling
        if delta < tol:
            converged = True
            break

    e.unpersist()
    return PageRankResult(
        ranks.select("id", "rank"), len(supersteps) + start_step, converged, supersteps
    )


def top_k(ranks: DataFrame, vertices: DataFrame, k: int = 20) -> DataFrame:
    """Top-k pages by rank with url back-reference (orderBy+limit sink)."""
    return (
        ranks.join(vertices.select("id", "url"), "id")
        .orderBy(F.desc("rank"), "url")
        .limit(k)
    )


def pagerank_weighted(
    wedges: DataFrame,
    vertices: DataFrame,
    iters: int = 2,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank over wedges(src, dst, w) — rank flows in
    proportion to edge weight (link multiplicity / anchor count), the
    standard web-ranking generalization: contrib = r * w / strength(src),
    strength = sum of outgoing weights, dangling = strength 0. Same
    damping/dangling semantics as ``pagerank``; a FIXED unrolled
    superstep count (oracle-checkable round for round — the converging
    iterative machine stays the unweighted ``pagerank``/blocked path).

    Fully lazy: n and the per-round dangling mass ride broadcast 1-row
    aggregates (no driver actions); each round is the same join+agg shape
    as the flat path, shuffling on src then id.
    """
    # strength <= 0 (all-zero outgoing weights) is normalized to NULL =
    # dangling: rank can't flow out over zero weight, and leaving it
    # non-null would NULL the contrib division and silently LEAK the
    # vertex's mass from the system (code-review finding; the blocked
    # twin wpagerank_csr already classifies sv <= 0 as dangling)
    s = wedges.groupBy("src").agg(
        F.when(F.sum("w") > 0, F.sum("w")).alias("strength")
    )
    nn = vertices.agg(F.count("*").cast("double").alias("n"))
    r = (
        vertices.select("id")
        .join(s, F.col("id") == F.col("src"), "left")
        .select("id", "strength")
        .crossJoin(F.broadcast(nn))
        .select("id", "strength", (F.lit(1.0) / F.col("n")).alias("r"))
    )
    for _ in range(iters):
        dm = r.where(F.col("strength").isNull()).agg(
            F.coalesce(F.sum("r"), F.lit(0.0)).alias("dm")
        )
        contrib = (
            wedges.join(
                r.where(F.col("strength").isNotNull()).select(
                    F.col("id").alias("src"), "r", "strength"
                ),
                "src",
            )
            .select("dst", (F.col("r") * F.col("w") / F.col("strength")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        r = (
            r.select("id", "strength")
            .join(contrib, F.col("id") == F.col("dst"), "left")
            .crossJoin(F.broadcast(nn))
            .crossJoin(F.broadcast(dm))
            .select(
                "id",
                "strength",
                (
                    (1.0 - damping) / F.col("n")
                    + damping
                    * (F.coalesce("contrib", F.lit(0.0)) + F.col("dm") / F.col("n"))
                ).alias("r"),
            )
        )
    return r.select("id", "r")


def trustrank(
    spark,
    edges: DataFrame,
    vertices: DataFrame,
    seeds: DataFrame,
    max_iter: int = 2,
    tol: float = 0.0,
) -> DataFrame:
    """TrustRank + spam mass (Gyongyi/Garcia-Molina/Pedersen, VLDB'04).

    Trust is personalized PageRank from a whitelist seed set (teleport and
    dangling mass both land on the seeds); spam mass is the fraction of a
    vertex's plain PageRank NOT explained by propagated trust,
    ``(pr - tr) / pr`` — the standard web-spam demotion score. Both walks
    reuse the flat ``pagerank`` machine (same salting/broadcast/unpersist
    discipline), so this is two superstep pipelines plus one join — no new
    shuffle shapes, and the blocked-CSR path could serve either walk at
    100 TB (trust is just a tp vector).

    Returns ``(id, pr, tr, spam_mass)``. pr > 0 always (uniform teleport),
    so the division is total.
    """
    pr = pagerank(spark, edges, vertices, tol=tol, max_iter=max_iter).ranks
    tr = pagerank(
        spark, edges, vertices, tol=tol, max_iter=max_iter, seeds=seeds
    ).ranks
    return (
        pr.withColumnRenamed("rank", "pr")
        .join(tr.withColumnRenamed("rank", "tr"), "id")
        .withColumn("spam_mass", (F.col("pr") - F.col("tr")) / F.col("pr"))
    )
