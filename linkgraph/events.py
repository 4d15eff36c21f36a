"""Event-sequence analytics over the events table.

Ordered-funnel measurement — the step-completion query every product /
crawl-telemetry pipeline runs. Complements the pairwise lead-lag session
ops (SURVEY §2 P5 family; reference capability: ordered decoding of an
instruction/event stream, reference src scan ops) with an ORDER-SENSITIVE
multi-step operator: a user counts for step i only if the step-i event
occurs strictly after their step-(i-1) match in (ts, event_id) order.

Scale shape: events are filtered to the step types BEFORE the shuffle
(map-side), grouped once on user_id, and the per-user chain match is a
single JVM higher-order fold over the ts-sorted event array — no Python,
no self-join per step, no iteration. Per-user event counts are bounded
by user activity (the standard web-analytics assumption), so the
collected arrays stay small however large the corpus; the only shuffle
is the one groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def funnel_reached(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """-> (user_id, reached) — furthest funnel step (0..len(steps)) each
    user completes IN ORDER: step i matches the first step-i event
    strictly after the step-(i-1) match, events totally ordered by
    (ts, event_id) so ties are deterministic.

    The chain match is one ``F.aggregate`` fold over the sorted per-user
    array: state = steps completed so far; an event advances the state
    iff it is the next needed step. A fold over a sorted list is exactly
    the iterated first-match-after-previous definition, which is what
    the SQL oracle computes with per-step min-rank joins.
    """
    n = len(steps)
    assert n >= 1
    steps_arr = F.array(*[F.lit(s) for s in steps])
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("ts"),
                F.col(id_col).alias("eid"),
                F.col(type_col).alias("et"),
            )
        )
    )
    reached = F.aggregate(
        arr,
        F.lit(0),
        lambda acc, x: F.when(
            (acc < n) & (x["et"] == F.element_at(steps_arr, acc + 1)), acc + 1
        ).otherwise(acc),
    )
    return (
        events.where(F.col(type_col).isin(steps))
        .groupBy(F.col(user_col).alias("user_id"))
        .agg(reached.alias("reached"))
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """-> (step, step_name, n_users, conv_from_prev6) — the funnel report:
    users reaching each ordered step, with the step-over-step conversion
    ratio (step 1 pinned to 1.0 so the column is total). The report is
    len(steps) rows — the heavy lifting is in :func:`funnel_reached`.
    """
    per_user = funnel_reached(events, steps, user_col, ts_col, type_col, id_col)
    counts = (
        per_user.where(F.col("reached") >= 1)
        .select(
            F.explode(
                F.sequence(F.lit(1), F.col("reached"))
            ).alias("step")
        )
        .groupBy("step")
        .agg(F.count("*").cast("long").alias("n_users"))
    )
    names = F.array(*[F.lit(s) for s in steps])
    w = Window.orderBy("step")
    return (
        counts.select(
            F.col("step").cast("long").alias("step"),
            F.element_at(names, F.col("step")).alias("step_name"),
            "n_users",
        )
        .withColumn(
            "conv_from_prev6",
            F.round(
                F.when(F.col("step") == 1, F.lit(1.0)).otherwise(
                    F.col("n_users").cast("double") / F.lag("n_users").over(w)
                ),
                6,
            ),
        )
    )
