"""Distributed deterministic synthetic link graph (scaling benchmarks).

The corpus generator (linkgraph.corpus) builds full HTML pages driver-side
— right for correctness fixtures, wrong for benchmarking multi-million-edge
graphs. This generator builds *edges directly on the executors* with pure
JVM expressions: `spark.range` partitions the vertex space, per-vertex
out-degree and targets derive from `xxhash64` (no RNG state, no wall
clock), so the same (n_vertices, avg_deg, seed) always yields the same
graph at any parallelism — exactly what a two-cluster-size scaling
comparison needs.

Degree model: heavy-tailed — u ~ U(0,1) from a hash; deg = avg_deg/2 base
+ Zipf-ish tail min(hub_cap, avg_deg/(2u)); vertices with
id % hub_every == 0 get hub_cap out-links (the power-law hub path the
engine's salting exists for).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def synth_edges(
    spark: SparkSession,
    n_vertices: int,
    avg_deg: int = 8,
    hub_cap: int = 2048,
    hub_every: int = 100_000,
    seed: int = 42,
    num_partitions: int | None = None,
    intra_host: float = 0.0,
    host_size: int = 64,
) -> DataFrame:
    """-> edges(src, dst) with src,dst in [0, n_vertices); ~avg_deg * n rows.

    ``intra_host`` models web-graph host locality: that fraction of each
    vertex's links lands inside its own ``host_size``-page "host" (ids are
    host-clustered: pages [k*host_size, (k+1)*host_size) are one host).
    Published Common-Crawl measurements put intra-host links at 70-90% of
    all hyperlinks; real engines exploit this with host-sorted vertex ids
    so most edges stay inside a partition block (see
    pagerank_csr.build_blocked(blocking="range")). intra_host=0 reproduces
    the previous fully-uniform generator bit-for-bit.
    """
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    v = spark.range(0, n_vertices, numPartitions=num_partitions).select(
        F.col("id").alias("src")
    )
    u = (
        F.pmod(F.xxhash64(F.col("src"), F.lit(seed)), F.lit(1_000_000)) + 1
    ) / 1_000_000.0
    base = avg_deg // 2
    tail = F.least(F.lit(hub_cap), (F.lit(float(avg_deg)) / (2.0 * u)).cast("int"))
    deg = F.when(
        F.col("src") % hub_every == 0, F.lit(hub_cap)
    ).otherwise(F.lit(base) + tail)

    def one_dst(j):
        g = F.pmod(F.xxhash64(F.col("src"), j, F.lit(seed + 1)), F.lit(n_vertices))
        if intra_host <= 0.0:
            return g
        pick = F.pmod(F.xxhash64(F.col("src"), j, F.lit(seed + 2)), F.lit(1_000_000))
        host_base = F.col("src") - F.pmod(F.col("src"), F.lit(host_size))
        local = host_base + F.pmod(
            F.xxhash64(F.col("src"), j, F.lit(seed + 3)), F.lit(host_size)
        )
        return F.when(
            pick < F.lit(int(intra_host * 1_000_000)),
            F.least(local, F.lit(n_vertices - 1)),
        ).otherwise(g)

    dsts = F.transform(F.sequence(F.lit(1), deg), one_dst)
    return (
        v.select("src", F.explode(dsts).alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )


def synth_vertices(spark: SparkSession, n_vertices: int, num_partitions: int | None = None) -> DataFrame:
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return spark.range(0, n_vertices, numPartitions=num_partitions).select(
        F.col("id")
    )
