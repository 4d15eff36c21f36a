"""As-of (temporal) join — attach to each left row the most recent right
row at or before it on the same key. The event-attribution primitive
(purchase -> latest preceding signup/click) and the standard market-data
join; Spark has no built-in, so this is a custom operator composed from
built-ins (the mandate's as-of-join example).

NOT a range join: a range/theta join explodes to O(|L|·|R|) candidate
pairs per key before filtering. This is the merge shape instead — union
the two streams with a tag, ONE shuffle on the key, and a running
`last(..., ignorenulls)` window carries each right row forward to the
left rows it attributes. Per-key state in the window frame is one row;
skewed keys cost a sort, never a blowup, and the plan is a single
exchange + window at any scale.

Tie rule: a right row at exactly left.ts matches (right sorts before left
at equal timestamps), the same `l.ts >= r.ts` semantics as DuckDB/Pandas
ASOF joins.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_cols: Sequence[str] = (),
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every left row, plus `{c}{suffix}` for each right
    payload column and `{ts_col}{suffix}` (matched right timestamp), all
    null when no right row precedes. Requires (on, ts_col) in both inputs;
    left column names must not collide with the suffixed outputs.
    """
    rpay = [c for c in right_cols if c != ts_col]
    lcols = [c for c in left.columns]
    l = left.withColumn("_tag", F.lit(1))
    for c in rpay:
        l = l.withColumn(f"{c}{suffix}", F.lit(None).cast(right.schema[c].dataType))
    l = l.withColumn(f"{ts_col}{suffix}", F.lit(None).cast(right.schema[ts_col].dataType))
    r = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("_tag"),
        *[F.col(c).alias(f"{c}{suffix}") for c in rpay],
        F.col(ts_col).alias(f"{ts_col}{suffix}"),
    )
    for c in lcols:
        if c not in (on, ts_col):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    merged = l.unionByName(r.select(*l.columns))
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [f"{c}{suffix}" for c in rpay] + [f"{ts_col}{suffix}"]
    for c in carried:
        merged = merged.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return merged.where(F.col("_tag") == 1).select(*lcols, *carried)
