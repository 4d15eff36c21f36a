"""Nested per-key rollups — group members into ordered nested rows.

≙ reference capability A5: ``XSourceCodeInfo`` groups the instruction map
into per-source-line nested records (/root/reference/src/ccm/source.py:
76-92 — an OrderedDict of line -> list of instruction namedtuples). The
Spark counterpart is one ``groupBy(key).agg(sort_array(collect_list(
struct(...))))`` — a single shuffle, order made deterministic by sorting
the collected structs (struct ordering = lexicographic on fields, id
first), never by assuming arrival order.

Scale note: ``collect_list`` materializes a group in one task — correct
for bounded groups (per-host pages, per-component members after capping);
for unbounded power-law keys, cap with a ranked window first
(``top_members``) so no single reducer owns an arbitrarily large nest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def nested_members(
    df: DataFrame, key: str = "key", member_cols: tuple[str, ...] = ("id",)
) -> DataFrame:
    """-> (key, n_members, members: array<struct<...>> sorted)."""
    return df.groupBy(key).agg(
        F.count("*").alias("n_members"),
        F.sort_array(F.collect_list(F.struct(*member_cols))).alias("members"),
    )


def top_members(
    df: DataFrame,
    key: str = "key",
    order: str = "id",
    k: int = 100,
    member_cols: tuple[str, ...] = ("id",),
) -> DataFrame:
    """Bounded variant: nest only the top-k members per key (rank by
    ``order`` asc) — the hub-safe form at web scale."""
    w = Window.partitionBy(key).orderBy(F.asc(order))
    ranked = df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    return nested_members(ranked.drop("_rn"), key, member_cols)


def members_digest(nested: DataFrame, fmt_cols: tuple[str, ...]) -> DataFrame:
    """Flatten the nest to a canonical string digest (oracle-comparable):
    members formatted "a/b/c" joined by "," in sorted order."""
    return nested.select(
        "key",
        "n_members",
        F.concat_ws(
            ",",
            F.transform(
                F.col("members"),
                lambda s: F.concat_ws("/", *[s[c].cast("string") for c in fmt_cols]),
            ),
        ).alias("members_str"),
    )
