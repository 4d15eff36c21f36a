"""Range (interval) join — bucketed, never a nested loop.

``right.ts BETWEEN left.ts + lower AND left.ts + upper`` expressed as a
pure inequality join makes Spark fall back to BroadcastNestedLoopJoin /
cartesian — O(|L|·|R|) and the classic 100 TB footgun. This module
turns it into an EQUI-join: time is bucketed at width w = upper - lower,
each left row probes the (at most two) buckets its window can overlap,
and the exact bounds filter runs after the hash join. Work is
O(|L| + |R| + matches), shuffles key on (join keys, bucket), and skew
follows the same salting story as any hash join.

The same construction with both sides exploded over bucket spans
generalizes to arbitrary interval-overlap joins; the asymmetric probe
here (right side single-bucketed) is the common event-attribution shape:
"events of user u in the hour before each purchase".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
) -> DataFrame:
    """Inner-join rows where ``right_ts`` falls in
    ``[left_ts + lower_s, left_ts + upper_s]`` (seconds, inclusive),
    with equality on ``on``. Returns all left columns plus the right
    columns not in ``on`` (right columns colliding with left names are
    suffixed ``_r``). Alias-qualified throughout, so self-joins (left
    and right sliced from the same table) resolve unambiguously.

    Bucketing: w = upper_s - lower_s (> 0 required); the left window
    spans at most two w-buckets, so each left row emits exactly two
    probe buckets and the join stays equi on (on..., bucket).
    """
    w = upper_s - lower_s
    assert w > 0, "empty window"
    w_us = w * 1_000_000

    renames = {
        c: f"{c}_r"
        for c in right.columns
        if c in left.columns and c not in on
    }
    r2 = right
    for old, new in renames.items():
        r2 = r2.withColumnRenamed(old, new)
    rts = renames.get(right_ts, right_ts)

    rt = F.unix_micros(F.col(rts).cast("timestamp"))
    r2 = r2.withColumn("_rbin", F.floor(rt / F.lit(w_us))).alias("R")

    lt = F.unix_micros(F.col(left_ts).cast("timestamp"))
    lo_bin = F.floor((lt + lower_s * 1_000_000) / F.lit(w_us))
    l2 = left.withColumn(
        "_lbin", F.explode(F.array(lo_bin, lo_bin + 1))
    ).alias("L")

    cond = F.col("L._lbin") == F.col("R._rbin")
    for k in on:
        cond = cond & (F.col(f"L.{k}") == F.col(f"R.{k}"))

    lo = (
        F.unix_micros(F.col(f"L.{left_ts}").cast("timestamp"))
        + lower_s * 1_000_000
    )
    hi = (
        F.unix_micros(F.col(f"L.{left_ts}").cast("timestamp"))
        + upper_s * 1_000_000
    )
    rv = F.unix_micros(F.col(f"R.{rts}").cast("timestamp"))

    keep = [F.col(f"L.{c}") for c in left.columns] + [
        F.col(f"R.{renames.get(c, c)}")
        for c in right.columns
        if c not in on
    ]
    return l2.join(r2, cond).where((rv >= lo) & (rv <= hi)).select(*keep)
