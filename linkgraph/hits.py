"""HITS (hubs & authorities) over the link graph.

The companion eigenvector algorithm to PageRank (Kleinberg '99): a page's
AUTHORITY is the summed hub weight of pages linking TO it; its HUB score
is the summed authority of pages it links to. Widens the engine's graph
suite beyond the four mandated algorithms with the same dataflow shape:
each half-step is one join + one sum-aggregate keyed on vertex id — the
identical shuffle signature as a PageRank superstep, so everything said
about partitioning/skew there holds here.

Spec (deterministic, SQL-replicable): start h = 1/|V|; per iteration
  a_raw(v) = Σ_{(u,v)∈E} h(u);   a = a_raw / Σ a_raw   (0 if Σ = 0)
  h_raw(u) = Σ_{(u,v)∈E} a(v);   h = h_raw / Σ h_raw
(L1 normalization each half-step — both vectors always sum to 1, so the
fixpoint equals networkx's sum-normalized ``nx.hits`` at convergence;
tests pin allclose 1e-6.) Vertices with no in-links have authority 0, no
out-links hub 0.

Normalization scalars ride as broadcast one-row frames (crossJoin), so a
fixed-iteration run is ONE lazy plan — no per-round driver action
(lineage.truncate_plan eager=False per half-step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .lineage import truncate_plan


def _l1_normalize(df: DataFrame, col: str) -> DataFrame:
    total = df.agg(F.sum(col).alias("_t"))
    return df.crossJoin(F.broadcast(total)).select(
        "id",
        F.when(F.col("_t") > 0, F.col(col) / F.col("_t"))
        .otherwise(F.lit(0.0))
        .alias(col),
    )


def hits(
    spark,
    edges: DataFrame,
    vertices: DataFrame,
    iterations: int = 50,
) -> DataFrame:
    """-> (id, hub, authority) after ``iterations`` full HITS rounds."""
    e = edges.select("src", "dst").distinct()
    ids = vertices.select("id")
    h = truncate_plan(
        ids.crossJoin(
            F.broadcast(ids.agg((1.0 / F.count("*")).alias("_h0")))
        ).select("id", F.col("_h0").alias("hub")),
        eager=False,
    )
    a = None
    for _ in range(iterations):
        a_raw = (
            e.join(h.select(F.col("id").alias("src"), "hub"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("hub").alias("authority"))
        )
        a = _l1_normalize(
            ids.join(a_raw, "id", "left").select(
                "id", F.coalesce("authority", F.lit(0.0)).alias("authority")
            ),
            "authority",
        )
        a = truncate_plan(a, eager=False)
        h_raw = (
            e.join(a.select(F.col("id").alias("dst"), "authority"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("authority").alias("hub"))
        )
        h = _l1_normalize(
            ids.join(h_raw, "id", "left").select(
                "id", F.coalesce("hub", F.lit(0.0)).alias("hub")
            ),
            "hub",
        )
        h = truncate_plan(h, eager=False)
    return h.join(a, "id").select("id", "hub", "authority")


def hits_oracle(
    nodes, edges, iterations: int = 50
) -> dict[int, tuple[float, float]]:
    """Pure-Python replica of the spec (test oracle) -> {id: (hub, auth)}."""
    nodes = list(nodes)
    h = {v: 1.0 / len(nodes) for v in nodes}
    a = {v: 0.0 for v in nodes}
    for _ in range(iterations):
        a = {v: 0.0 for v in nodes}
        for u, v in edges:
            a[v] += h[u]
        s = sum(a.values())
        a = {v: (x / s if s > 0 else 0.0) for v, x in a.items()}
        h = {v: 0.0 for v in nodes}
        for u, v in edges:
            h[u] += a[v]
        s = sum(h.values())
        h = {v: (x / s if s > 0 else 0.0) for v, x in h.items()}
    return {v: (h[v], a[v]) for v in nodes}


def salsa(
    spark,
    edges: DataFrame,
    vertices: DataFrame,
    iterations: int = 2,
) -> DataFrame:
    """SALSA (Lempel & Moran '00): HITS with degree-normalized random
    walks instead of raw sums — the variant that resists tightly-knit
    community (TKC) score capture, and the shape of production
    who-to-follow rankers. Fixed unrolled iterations:

        a_{k+1}(j) = Σ_{(i,j)∈E} h_k(i)   / outdeg(i)
        h_{k+1}(i) = Σ_{(i,j)∈E} a_{k+1}(j) / indeg(j)

    h_0 = 1/|{outdeg>0}| on hub-side vertices. Both updates are
    column-stochastic, so L1 mass is conserved by construction — no
    global normalizer, hence exactly SQL-replicable round for round.

    Each half-step is one broadcast-degree join + one sum keyed on a
    vertex id: the PageRank-superstep shuffle signature (partial
    aggregation map-side; hub skew handled by AQE the same way).
    -> (id, hub, authority) with 0.0 for walk-unreachable sides.
    """
    e = edges.select("src", "dst").distinct()
    outd = e.groupBy("src").agg(F.count("*").alias("od"))
    ind = e.groupBy("dst").agg(F.count("*").alias("idg"))
    h = truncate_plan(
        outd.select(F.col("src").alias("id")).crossJoin(
            F.broadcast(outd.agg((1.0 / F.count("*")).alias("_h0")))
        ).select("id", F.col("_h0").alias("hub")),
        eager=False,
    )
    a = None
    for _ in range(iterations):
        a = truncate_plan(
            e.join(h.select(F.col("id").alias("src"), "hub"), "src")
            .join(outd, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("hub") / F.col("od")).alias("authority")),
            eager=False,
        )
        h = truncate_plan(
            e.join(a.select(F.col("id").alias("dst"), "authority"), "dst")
            .join(ind, "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum(F.col("authority") / F.col("idg")).alias("hub")),
            eager=False,
        )
    return (
        vertices.select("id")
        .join(h, "id", "left")
        .join(a, "id", "left")
        .select(
            "id",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("authority", F.lit(0.0)).alias("authority"),
        )
    )


def salsa_oracle(nodes, edges, iterations: int = 2):
    """Pure-Python replica of the salsa spec -> {id: (hub, auth)}."""
    es = sorted(set(edges))
    outd, ind = {}, {}
    for u, v in es:
        outd[u] = outd.get(u, 0) + 1
        ind[v] = ind.get(v, 0) + 1
    h = {u: 1.0 / len(outd) for u in outd}
    a = {}
    for _ in range(iterations):
        a = {}
        for u, v in es:
            a[v] = a.get(v, 0.0) + h.get(u, 0.0) / outd[u]
        h = {}
        for u, v in es:
            h[u] = h.get(u, 0.0) + a.get(v, 0.0) / ind[v]
    return {v: (h.get(v, 0.0), a.get(v, 0.0)) for v in nodes}


def katz(
    spark,
    edges: DataFrame,
    vertices: DataFrame,
    iterations: int = 2,
    alpha: float = 0.05,
    beta: float = 1.0,
) -> DataFrame:
    """Katz centrality, fixed unrolled iterations (Katz '53): x0 = beta;
    x_{k+1}(v) = beta + alpha * sum over in-edges (u,v) of x_k(u) — the
    attenuated count of walks of every length ending at v. The damped
    cousin of eigenvector centrality that stays finite on DAG-ish crawl
    graphs (alpha below 1/lambda_max converges; a FIXED iteration count
    keeps it SQL-replicable round for round, like graph_pagerank2).

    Each round is one join + one sum keyed on dst — a PageRank-superstep
    shuffle signature; the whole run is one lazy plan (truncate_plan per
    round, no driver actions).

    -> (id, katz) UNNORMALIZED (beta sets the scale), so the oracle
    needs no global normalizer.
    """
    x = vertices.select("id", F.lit(float(beta)).alias("katz"))
    e = edges.select("src", "dst")
    for _ in range(iterations):
        contrib = (
            e.join(x.select(F.col("id").alias("src"), "katz"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("katz").alias("c"))
        )
        x = truncate_plan(
            vertices.select("id")
            .join(contrib, "id", "left")
            .select(
                "id",
                (
                    F.lit(float(beta))
                    + F.lit(float(alpha)) * F.coalesce("c", F.lit(0.0))
                ).alias("katz"),
            ),
            eager=False,
        )
    return x
