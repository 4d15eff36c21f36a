"""Portable cardinality sketches: HyperLogLog with DETERMINISTIC hashing.

Approximate distincts are how a 100 TB pipeline counts (vocabulary sizes,
per-host unique URLs, unique n-grams) without an exact shuffle-heavy
distinct. Spark's built-in ``approx_count_distinct`` and DuckDB's
``approx_count_distinct`` use incompatible private sketches, so their
outputs can never be compared — this module's HLL is built from md5
bits that BOTH engines compute identically, making the estimate itself
oracle-checkable to the last rounded digit (same registers, same
harmonic sum, same bias correction).

Flajolet et al. 2007 (HyperLogLog), with the standard small-range
correction (linear counting over empty buckets). Layout per item:

    h    = first 15 hex digits of md5(item)  -> 60-bit integer
    j    = h mod m          (bucket, m = 2^b)
    w    = h div m          (remaining 60-b bits)
    rho  = (60 - b) - bitlen(w) + 1, i.e. leading zeros + 1; w = 0 ->
           (60 - b) + 1. bitlen rides bin() (both engines: no leading
           zeros), so no float log2 — log2(2^k - 1) rounds UP to k in
           doubles, a real off-by-one trap.

Registers are max(rho) per bucket: a groupBy (key, bucket) then a key
aggregate — two exchanges total, both map-side combinable; duplicates
never change a max, so the input needs NO distinct. 2^-r is computed as
1.0 / (1 << r) — exact in both engines, no pow().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hll_alpha(m: int) -> float:
    """The standard bias constant for m >= 128 buckets."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_rho(item: Column, b: int) -> tuple[Column, Column]:
    """-> (bucket, rho) columns for one item expression (string)."""
    h = F.conv(F.substring(F.md5(item), 1, 15), 16, 10).cast("long")
    m = 1 << b
    bucket = h.bitwiseAND(F.lit(m - 1)).cast("int")
    w = F.shiftright(h, b)  # exact: float division would lose bits past 2^53
    width = 60 - b
    rho = (
        F.when(w == 0, F.lit(width + 1))
        .otherwise(F.lit(width + 1) - F.length(F.bin(w)))
        .cast("int")
    )
    return bucket, rho


def hll_distinct(
    df: DataFrame,
    key_cols: list[str],
    item: Column,
    b: int = 8,
) -> DataFrame:
    """-> key_cols + (nonempty_buckets, hll_estimate4): per-key estimated
    distinct count of ``item`` values, rounded to 4 decimals (the float
    work is identical-order in both engines up to the per-register sum,
    which is exact: each term 1/2^r is a power of two).

    Scale shape: one projection, groupBy (key, bucket) max -> groupBy key
    sum — both aggregates partial/map-side; 2^b rows per key in flight
    after the first exchange, independent of |df|.
    """
    m = 1 << b
    bucket, rho = hll_rho(item, b)
    regs = (
        df.select(*key_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*key_cols, "bucket")
        .agg(F.max("rho").alias("r"))
    )
    # empty buckets contribute 2^0 = 1 each to the harmonic sum
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
        F.round(est, 4).alias("hll_estimate4"),
    )


def hll_sql(key_expr: str, item_expr: str, from_clause: str, b: int = 8) -> str:
    """The DuckDB twin of :func:`hll_distinct` — the oracle is GENERATED
    from the same layout constants so the two can never drift."""
    m = 1 << b
    width = 60 - b
    alpha = hll_alpha(m)
    return f"""
hll_h AS (
  SELECT {key_expr} AS k,
         CAST('0x' || substr(md5({item_expr}), 1, 15) AS BIGINT) AS h
  {from_clause}
),
hll_regs AS (
  SELECT k, (h & {m - 1})::INT AS bucket,
         max(CASE WHEN (h >> {b}) = 0 THEN {width + 1}
                  ELSE {width + 1} - length(bin(h >> {b})) END)::INT AS r
  FROM hll_h GROUP BY 1, 2
),
hll_key AS (
  SELECT k, count(*)::BIGINT AS nonempty,
         sum(1.0 / (1::BIGINT << r)) AS s_nonempty
  FROM hll_regs GROUP BY 1
),
hll_est AS (
  -- literals cast to DOUBLE: DuckDB parses bare float literals as
  -- DECIMAL, whose fixed width overflows under * {m} * {m}
  SELECT k, nonempty,
         CASE WHEN ({alpha!r}::DOUBLE * {m} * {m})
                   / (s_nonempty + ({m} - nonempty)) <= {2.5 * m}
               AND {m} - nonempty > 0
              THEN {float(m)!r}::DOUBLE
                   * ln({float(m)!r}::DOUBLE / ({m} - nonempty))
              ELSE ({alpha!r}::DOUBLE * {m} * {m})
                   / (s_nonempty + ({m} - nonempty))
         END AS est
  FROM hll_key
)"""


def cms_table(
    df: DataFrame, item: Column, d: int = 4, w: int = 512
) -> DataFrame:
    """-> (row, col, c): a Count-Min sketch (Cormode & Muthukrishnan '05)
    of the item multiset — d independent md5 hash rows, w counters each.
    One projection exploding each occurrence into its d cells + one
    groupBy: the sketch is d*w rows however large the input, and the
    aggregation is map-side combinable (the classic mergeable-summary
    shape — per-partition sketches union by cell addition).
    """
    cells = F.array(*[
        F.struct(
            F.lit(i).alias("row"),
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"{i}:"), item)), 1, 15),
                    16, 10,
                ).cast("long") % w
            ).cast("int").alias("col"),
        )
        for i in range(d)
    ])
    return (
        df.select(F.explode(cells).alias("cell"))
        .select("cell.row", "cell.col")
        .groupBy("row", "col")
        .agg(F.count("*").cast("long").alias("c"))
    )


def cms_estimate(
    sketch: DataFrame, items: DataFrame, item_col: str, d: int = 4, w: int = 512
) -> DataFrame:
    """-> items + (cms_est): point-query the sketch for each item —
    min over the d rows of the addressed counters. CMS NEVER
    underestimates (each cell >= the item's true count), a property the
    tests pin. The items side is small by use-case (candidate heavy
    hitters), so the join broadcasts it against the d*w-row sketch.
    """
    addressed = items.select(
        "*",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("row"),
                    (
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat(F.lit(f"{i}:"), F.col(item_col))
                                ),
                                1, 15,
                            ),
                            16, 10,
                        ).cast("long") % w
                    ).cast("int").alias("col"),
                )
                for i in range(d)
            ])
        ).alias("cell"),
    ).select("*", "cell.row", "cell.col").drop("cell")
    return (
        addressed.join(sketch, ["row", "col"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce("c", F.lit(0))).cast("long").alias("cms_est"))
    )


def cms_sql(item_expr: str, from_clause: str, d: int = 4, w: int = 512) -> str:
    """DuckDB twin of cms_table — generated from the same constants.
    (Cell coordinates are named rw/cl: ROW is a DuckDB keyword.)"""
    rows = " UNION ALL ".join(
        f"SELECT {i} AS rw, "
        f"(CAST('0x' || substr(md5('{i}:' || {item_expr}), 1, 15) AS BIGINT)"
        f" % {w})::INT AS cl {from_clause}"
        for i in range(d)
    )
    return f"""
cms_cells AS ({rows}),
cms AS (SELECT rw, cl, count(*)::BIGINT AS c FROM cms_cells GROUP BY 1, 2)"""


def bloom_bits(
    df: DataFrame, item: Column, k: int = 3, m: int = 8192
) -> DataFrame:
    """-> (bit): the set bit positions of a Bloom filter over the item
    set — k md5 hash rows (same '{i}:' row-salt as the CMS), m bits.
    The filter is the DISTINCT of at most m integers however large the
    input: the classic broadcastable pre-filter (Bloom '70).
    """
    bits = F.array(*[
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{i}:"), item)), 1, 15),
                16, 10,
            ).cast("long") % m
        ).cast("int")
        for i in range(k)
    ])
    return df.select(F.explode(bits).alias("bit")).distinct()


def bloom_probe(
    bits: DataFrame, df: DataFrame, item: Column, k: int = 3, m: int = 8192
) -> DataFrame:
    """-> df columns + (bloom_hit): TRUE iff all k of the item's bit
    positions are set — no false negatives ever (a contained item's bits
    are all set by construction), false positives at the standard
    (1 - e^{-kn/m})^k rate, audited by the oracle row against the exact
    join. The bits side is <= m rows and broadcast.
    """
    probed = df.select(
        "*",
        F.posexplode(
            F.array(*[
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit(f"{i}:"), item)), 1, 15
                        ),
                        16, 10,
                    ).cast("long") % m
                ).cast("int")
                for i in range(k)
            ])
        ).alias("hx", "bit"),
    )
    hit = (
        probed.join(F.broadcast(bits.withColumn("set", F.lit(1))), "bit", "left")
        .groupBy(*df.columns)
        .agg((F.sum(F.coalesce("set", F.lit(0))) == k).alias("bloom_hit"))
    )
    return hit
