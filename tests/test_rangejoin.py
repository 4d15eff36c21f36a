"""Bucketed range join == brute-force inequality join, boundaries
inclusive, self-join safe."""

import datetime as dt
import random

from linkgraph.rangejoin import range_join


def _t(s):
    return dt.datetime(2026, 3, 1) + dt.timedelta(seconds=s)


def test_matches_bruteforce_including_boundaries(spark):
    rng = random.Random(11)
    left = [(i, rng.randrange(5), _t(rng.randrange(0, 50_000)))
            for i in range(120)]
    right = [(1000 + i, rng.randrange(5), _t(rng.randrange(0, 50_000)))
             for i in range(300)]
    # exact-boundary rows: right at left.ts+lower and left.ts+upper
    left.append((900, 9, _t(10_000)))
    right += [(1900, 9, _t(10_000 - 3600)), (1901, 9, _t(10_000)),
              (1902, 9, _t(10_000 - 3601)), (1903, 9, _t(10_001))]
    ldf = spark.createDataFrame(left, "lid long, user_id long, ts timestamp")
    rdf = spark.createDataFrame(right, "rid long, user_id long, ts timestamp")

    got = {
        (r["lid"], r["rid"])
        for r in range_join(
            ldf, rdf, on=["user_id"], left_ts="ts", right_ts="ts",
            lower_s=-3600, upper_s=0,
        ).collect()
    }
    want = {
        (li, ri)
        for (li, lu, lt) in left
        for (ri, ru, rt) in right
        if lu == ru and lt - dt.timedelta(seconds=3600) <= rt <= lt
    }
    assert got == want
    assert (900, 1900) in got and (900, 1901) in got
    assert (900, 1902) not in got and (900, 1903) not in got


def test_self_join_and_positive_window(spark):
    rows = [(i, i % 3, _t(i * 100)) for i in range(60)]
    df = spark.createDataFrame(rows, "eid long, user_id long, ts timestamp")
    got = {
        (r["eid"], r["eid_r"])
        for r in range_join(
            df, df, on=["user_id"], left_ts="ts", right_ts="ts",
            lower_s=1, upper_s=500,
        ).collect()
    }
    want = {
        (a, b)
        for (a, ua, ta) in rows
        for (b, ub, tb) in rows
        if ua == ub
        and ta + dt.timedelta(seconds=1) <= tb <= ta + dt.timedelta(seconds=500)
    }
    assert got == want
