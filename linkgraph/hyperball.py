"""HyperBall: the neighbourhood function of the whole graph at 100 TB.

``|ball(v, t)|`` — how many vertices each page reaches within t hops —
is the primitive behind the classic web-graph reports: the distance
distribution, the effective diameter, and approximate closeness /
harmonic centrality for EVERY vertex at once (Boldi & Vigna,
"In-Core Computation of Geometric Centralities with HyperBall", 2013 —
the algorithm used for the published Common-Crawl / Facebook
"four degrees of separation" measurements). Exact per-vertex BFS is
O(V·E) and impossible at web scale; HyperBall replaces each ball with a
mergeable HyperLogLog counter, so one superstep is

    ball(v, t+1) = ball(v, t)  UNION  ⋃_{(v,w) ∈ E} ball(w, t)

and a union of HLLs is a per-bucket register MAX — an aggregation Spark
executes as a map-side-combinable groupBy, never a distinct.

Engine shape (all JVM, zero Python in the loop):
- state is a SPARSE register table (id, bucket, r) — at most 2^b rows
  per vertex, so superstep t costs one hash join edges⋈state (keyed on
  dst — the same key every round, so the shuffle partitioning is
  reusable) plus one groupBy(id, bucket).max(r) with partial
  aggregation. Per-round state is bounded by V·2^b regardless of |E| or
  t — the reason this survives 10^12 pages where exact frontiers blow up.
- registers ride the DETERMINISTIC md5 layout of linkgraph.sketches
  (same bits in Spark and DuckDB), so every estimate is oracle-checkable
  to the rounded digit; the DuckDB twin is generated from the same
  constants by :func:`hyperball_sql`.

Reference tie: ccm reports whole-graph structural metrics per component
(/root/reference/src/ccm/complexity.py:69-99); HyperBall is the
web-scale generalisation of "how big is the reachable set" that those
McCabe-style counts summarise on CFGs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .lineage import truncate_plan
from .sketches import hll_alpha, hll_rho


def _hll_estimate(regs: DataFrame, key_cols: list[str], b: int) -> DataFrame:
    """(key..., bucket, r) -> key... + (nonempty_buckets, est) — the
    standard HLL estimate with linear-counting small-range correction,
    float-identical to sketches.hll_distinct / hll_sql."""
    m = 1 << b
    per_key = regs.groupBy(*key_cols).agg(
        F.count("*").cast("long").alias("nonempty"),
        F.sum(F.lit(1.0) / F.expr("shiftleft(1L, r)")).alias("s_nonempty"),
    )
    alpha = hll_alpha(m)
    s_total = F.col("s_nonempty") + (F.lit(m) - F.col("nonempty"))
    e_raw = F.lit(alpha * m * m) / s_total
    v = F.lit(m) - F.col("nonempty")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(e_raw)
    return per_key.select(
        *key_cols,
        F.col("nonempty").alias("nonempty_buckets"),
        est.alias("est"),
    )


def hyperball_regs(
    spark,
    edges: DataFrame,
    vertices: DataFrame,
    b: int = 6,
    iters: int = 3,
    checkpoint_every: int = 0,
) -> DataFrame:
    """-> (id, bucket, r): sparse HLL registers of ball(id, ``iters``).

    ``checkpoint_every`` > 0 truncates lineage every k supersteps (the
    long-horizon form — t ≈ graph diameter needs tens of rounds); 0
    leaves the unrolled lazy plan (the SQL-replicable form used by the
    oracle row).
    """
    bucket, rho = hll_rho(F.col("id").cast("string"), b)
    state = vertices.select("id", bucket.alias("bucket"), rho.alias("r"))
    e = edges.select("src", "dst")
    for t in range(iters):
        prop = e.join(state, e.dst == state.id).select(
            e.src.alias("id"), "bucket", "r"
        )
        state = (
            state.unionByName(prop)
            .groupBy("id", "bucket")
            .agg(F.max("r").cast("int").alias("r"))
        )
        if checkpoint_every and (t + 1) % checkpoint_every == 0:
            state = truncate_plan(state)
    return state


def hyperball(
    spark,
    edges: DataFrame,
    vertices: DataFrame,
    b: int = 6,
    iters: int = 3,
) -> DataFrame:
    """-> (id, nonempty_buckets, ball_est4): estimated |ball(id, iters)|
    (vertices within ``iters`` directed hops, INCLUDING id itself) for
    every vertex — per-vertex reach at any scale."""
    regs = hyperball_regs(spark, edges, vertices, b=b, iters=iters)
    out = _hll_estimate(regs, ["id"], b)
    return out.select(
        "id", "nonempty_buckets", F.round("est", 4).alias("ball_est4")
    )


def neighbourhood_function(
    spark,
    edges: DataFrame,
    vertices: DataFrame,
    b: int = 6,
    iters: int = 3,
) -> DataFrame:
    """-> (t, reachable_pairs2) for t = 0..iters: the neighbourhood
    function N(t) = Σ_v |ball(v, t)| — reachable pairs within t hops.
    Successive differences are the DISTANCE DISTRIBUTION; the smallest t
    with N(t) ≥ 0.9·N(∞) is the effective diameter. One job: the t-th
    state is a prefix of the (t+1)-th plan, so Spark shares the scans.

    Per-vertex estimates are rounded to 4 decimals BEFORE the global sum
    (each rounded value is a short decimal, so the cross-engine sum
    agrees to well past the 2 decimals kept)."""
    bucket, rho = hll_rho(F.col("id").cast("string"), b)
    state = vertices.select("id", bucket.alias("bucket"), rho.alias("r"))
    e = edges.select("src", "dst")
    rows = []
    for t in range(iters + 1):
        est = _hll_estimate(state, ["id"], b)
        rows.append(
            est.select(
                F.lit(t).cast("int").alias("t"),
                F.round("est", 4).alias("e4"),
            )
        )
        if t == iters:
            break
        prop = e.join(state, e.dst == state.id).select(
            e.src.alias("id"), "bucket", "r"
        )
        state = (
            state.unionByName(prop)
            .groupBy("id", "bucket")
            .agg(F.max("r").cast("int").alias("r"))
        )
    allt = rows[0]
    for r in rows[1:]:
        allt = allt.unionByName(r)
    return (
        allt.groupBy("t")
        .agg(F.round(F.sum("e4"), 2).alias("reachable_pairs2"))
        .orderBy("t")
    )


def effective_diameter(
    spark,
    edges: DataFrame,
    vertices: DataFrame,
    b: int = 6,
    iters: int = 3,
    q: float = 0.9,
) -> DataFrame:
    """-> one row (eff_diameter, eff_diameter_interp4,
    reachable_pairs_inf2): the smallest t with N(t) >= q*N(max t), plus
    the linearly-interpolated fractional variant — the published
    'effective diameter at 90%' readout (Boldi-Rosa-Vigna HyperBall,
    'four degrees of separation'). Runs on the already-2dp-rounded
    neighbourhood function, so both engines interpolate IDENTICAL
    doubles and the 4dp rounding is exact.

    The selection is all O(iters)-row arithmetic (self-join on t-1, one
    broadcast of the saturation row) — the heavy lifting stays in the
    register supersteps of neighbourhood_function."""
    nf = neighbourhood_function(spark, edges, vertices, b=b, iters=iters)
    last = (
        nf.orderBy(F.desc("t")).limit(1)
        .select(F.col("reachable_pairs2").alias("n_inf"))
    )
    prev = nf.select(
        (F.col("t") + 1).alias("t"), F.col("reachable_pairs2").alias("prev")
    )
    hit = (
        nf.crossJoin(F.broadcast(last))
        .join(prev, "t", "left")
        .where(F.col("reachable_pairs2") >= F.lit(q) * F.col("n_inf"))
        .orderBy("t")
        .limit(1)
    )
    return hit.select(
        F.col("t").alias("eff_diameter"),
        F.round(
            F.when(F.col("t") == 0, F.lit(0.0)).otherwise(
                F.col("t")
                - 1
                + (F.lit(q) * F.col("n_inf") - F.col("prev"))
                / (F.col("reachable_pairs2") - F.col("prev"))
            ),
            4,
        ).alias("eff_diameter_interp4"),
        F.col("n_inf").alias("reachable_pairs_inf2"),
    )


def hyperball_centrality(
    spark,
    edges: DataFrame,
    vertices: DataFrame,
    b: int = 6,
    iters: int = 3,
) -> DataFrame:
    """-> (id, totdist4, harmonic4): approximate ALL-vertex closeness
    ingredients from the HyperBall states — Boldi & Vigna's actual
    headline application. With N_t(v) = est |ball(v, t)| (rounded to 4,
    the cross-engine contract), the number of vertices AT distance t is
    N_t − N_{t−1}, so

        totdist(v)  = Σ_t t · (N_t − N_{t−1})      (closeness denominator)
        harmonic(v) = Σ_t (1/t) · (N_t − N_{t−1})  (harmonic centrality)

    truncated at ``iters`` (the bounded-radius form — web-graph distance
    mass sits within a handful of hops). Exact per-vertex BFS for this is
    O(V·E); this is ``iters`` joins + aggregations, any scale. Sums are
    written in fixed association order so DuckDB reproduces the floats."""
    bucket, rho = hll_rho(F.col("id").cast("string"), b)
    state = vertices.select("id", bucket.alias("bucket"), rho.alias("r"))
    e = edges.select("src", "dst")
    per_t = []
    for t in range(iters + 1):
        est = _hll_estimate(state, ["id"], b)
        per_t.append(
            est.select(
                "id",
                F.lit(t).cast("int").alias("t"),
                F.round("est", 4).alias("e4"),
            )
        )
        if t == iters:
            break
        prop = e.join(state, e.dst == state.id).select(
            e.src.alias("id"), "bucket", "r"
        )
        state = (
            state.unionByName(prop)
            .groupBy("id", "bucket")
            .agg(F.max("r").cast("int").alias("r"))
        )
    allt = per_t[0]
    for p in per_t[1:]:
        allt = allt.unionByName(p)
    et = [
        F.sum(F.when(F.col("t") == t, F.col("e4")).otherwise(F.lit(0.0)))
        for t in range(iters + 1)
    ]
    totdist = F.lit(0.0)
    harmonic = F.lit(0.0)
    for t in range(1, iters + 1):
        step = et[t] - et[t - 1]
        totdist = totdist + F.lit(float(t)) * step
        harmonic = harmonic + step / F.lit(float(t))
    return allt.groupBy("id").agg(
        F.round(totdist, 4).alias("totdist4"),
        F.round(harmonic, 4).alias("harmonic4"),
    )


def centrality_sql(
    edges_cte: str,
    verts_cte: str,
    b: int = 6,
    iters: int = 3,
) -> str:
    """DuckDB twin of :func:`hyperball_centrality`: CTEs ending in
    ``hb_cent(id, totdist4, harmonic4)`` — same register states, same
    per-t round-to-4, same fixed-order float sums."""
    m = 1 << b
    alpha = hll_alpha(m)
    parts = [hyperball_sql(edges_cte, verts_cte, b=b, iters=iters)]
    for t in range(iters):
        parts.append(
            _est_cte(f"hb_key{t}", f"hb_est{t}", f"hb_r{t}", m, alpha)
        )
    sel = "SELECT id, t, round(est, 4) AS e4 FROM (\n" + "\nUNION ALL\n".join(
        f"SELECT id, {t} AS t, est FROM "
        + ("hb_est" if t == iters else f"hb_est{t}")
        for t in range(iters + 1)
    ) + "\n)"
    parts.append(f"\nhb_allt AS (\n{sel}\n)")
    ets = [
        f"sum(CASE WHEN t = {t} THEN e4 ELSE 0.0 END)"
        for t in range(iters + 1)
    ]
    totdist = "0.0"
    harmonic = "0.0"
    for t in range(1, iters + 1):
        step = f"({ets[t]} - {ets[t - 1]})"
        totdist = f"({totdist} + {float(t)!r} * {step})"
        harmonic = f"({harmonic} + {step} / {float(t)!r})"
    parts.append(f"""
hb_cent AS (
  SELECT id, round({totdist}, 4) AS totdist4,
         round({harmonic}, 4) AS harmonic4
  FROM hb_allt GROUP BY id
)""")
    return ",".join(parts)


def hyperball_sql(
    edges_cte: str,
    verts_cte: str,
    b: int = 6,
    iters: int = 3,
) -> str:
    """DuckDB twin of :func:`hyperball` — generated from the SAME layout
    constants (md5 bucket/rho, alpha, small-range correction) so the two
    engines can never drift. ``edges_cte``/``verts_cte`` name CTEs
    ``edges(src, dst)`` and ``verts(id)`` that the caller prepends."""
    m = 1 << b
    width = 60 - b
    alpha = hll_alpha(m)
    parts = [
        f"""
hb_r0 AS (
  SELECT id, (h & {m - 1})::INT AS bucket,
         (CASE WHEN (h >> {b}) = 0 THEN {width + 1}
               ELSE {width + 1} - length(bin(h >> {b})) END)::INT AS r
  FROM (SELECT id,
               CAST('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15)
                    AS BIGINT) AS h
        FROM {verts_cte})
)"""
    ]
    for t in range(1, iters + 1):
        parts.append(f"""
hb_r{t} AS (
  SELECT id, bucket, max(r)::INT AS r FROM (
    SELECT * FROM hb_r{t - 1}
    UNION ALL
    SELECT e.src AS id, s.bucket, s.r
    FROM {edges_cte} e JOIN hb_r{t - 1} s ON e.dst = s.id
  ) GROUP BY 1, 2
)""")
    parts.append(_est_cte("hb_key", "hb_est", f"hb_r{iters}", m, alpha))
    return ",".join(parts)


def _est_cte(key_name: str, est_name: str, regs_name: str,
             m: int, alpha: float) -> str:
    return f"""
{key_name} AS (
  SELECT id, count(*)::BIGINT AS nonempty,
         sum(1.0 / (1::BIGINT << r)) AS s_nonempty
  FROM {regs_name} GROUP BY 1
),
{est_name} AS (
  SELECT id, nonempty,
         CASE WHEN ({alpha!r}::DOUBLE * {m} * {m})
                   / (s_nonempty + ({m} - nonempty)) <= {2.5 * m}
               AND {m} - nonempty > 0
              THEN {float(m)!r}::DOUBLE
                   * ln({float(m)!r}::DOUBLE / ({m} - nonempty))
              ELSE ({alpha!r}::DOUBLE * {m} * {m})
                   / (s_nonempty + ({m} - nonempty))
         END AS est
  FROM {key_name}
)"""


def nfunction_sql(
    edges_cte: str,
    verts_cte: str,
    b: int = 6,
    iters: int = 3,
) -> str:
    """DuckDB twin of :func:`neighbourhood_function`: CTEs ending in
    ``hb_nf(t, reachable_pairs2)`` — per-t estimates from the SAME
    register states hb_r0..hb_r{iters}, per-vertex round(est, 4) summed
    then rounded to 2 (the engine's float discipline)."""
    m = 1 << b
    alpha = hll_alpha(m)
    parts = [hyperball_sql(edges_cte, verts_cte, b=b, iters=iters)]
    selects = []
    for t in range(iters + 1):
        if t < iters:  # hb_est already estimates the final state
            parts.append(
                _est_cte(f"hb_key{t}", f"hb_est{t}", f"hb_r{t}", m, alpha)
            )
        src = "hb_est" if t == iters else f"hb_est{t}"
        selects.append(
            f"SELECT {t}::INT AS t, round(sum(round(est, 4)), 2) "
            f"AS reachable_pairs2 FROM {src}"
        )
    union = "\nUNION ALL\n".join(selects)
    parts.append(f"\nhb_nf AS (\n{union}\n)")
    return ",".join(parts)
