"""Ordered funnel: step i counts only strictly after the step-(i-1) match
in (ts, event_id) order — out-of-order and tied events pinned exactly."""

import datetime as dt

from linkgraph.events import funnel, funnel_reached

STEPS = ["view", "click", "signup", "purchase"]


def _t(s):
    return dt.datetime(2026, 1, 1, 0, 0, s)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_reached_semantics(spark):
    rows = [
        # u1: full chain in order
        (1, _t(1), 1, "view"), (2, _t(2), 1, "click"),
        (3, _t(3), 1, "signup"), (4, _t(4), 1, "purchase"),
        # u2: click BEFORE first view is ignored; chain restarts after view
        (5, _t(1), 2, "click"), (6, _t(2), 2, "view"),
        (7, _t(3), 2, "click"), (8, _t(4), 2, "signup"),
        # u3: skips click -> stuck at step 1 (order is mandatory)
        (9, _t(1), 3, "view"), (10, _t(2), 3, "signup"),
        (11, _t(3), 3, "purchase"),
        # u4: everything reversed -> only the view counts
        (12, _t(1), 4, "purchase"), (13, _t(2), 4, "signup"),
        (14, _t(3), 4, "click"), (15, _t(4), 4, "view"),
        # u5: no step-type events at all -> absent from the result
        (16, _t(1), 5, "error"),
        # u6: tie at the same ts, click's event_id sorts BEFORE view -> 1
        (17, _t(1), 6, "click"), (18, _t(1), 6, "view"),
        # u7: tie at the same ts, view's event_id sorts first -> 2
        (19, _t(1), 7, "view"), (20, _t(1), 7, "click"),
    ]
    got = {
        r["user_id"]: r["reached"]
        for r in funnel_reached(_df(spark, rows), STEPS).collect()
    }
    assert got == {1: 4, 2: 3, 3: 1, 4: 1, 6: 1, 7: 2}


def test_funnel_report(spark):
    rows = [
        (1, _t(1), 1, "view"), (2, _t(2), 1, "click"),
        (3, _t(3), 1, "signup"), (4, _t(4), 1, "purchase"),
        (5, _t(1), 2, "view"), (6, _t(2), 2, "click"),
        (7, _t(1), 3, "view"),
        (8, _t(1), 4, "click"),  # never views: reached 0, in no step count
    ]
    rep = {r["step"]: r for r in funnel(_df(spark, rows), STEPS).collect()}
    assert [rep[s]["n_users"] for s in (1, 2, 3, 4)] == [3, 2, 1, 1]
    assert rep[1]["conv_from_prev6"] == 1.0
    assert abs(rep[2]["conv_from_prev6"] - 2 / 3) < 1e-6
    assert rep[3]["conv_from_prev6"] == 0.5
    assert rep[4]["conv_from_prev6"] == 1.0
    assert [rep[s]["step_name"] for s in (1, 2, 3, 4)] == STEPS
