"""As-of join semantics: latest right row at-or-before each left row."""

from datetime import datetime

from pyspark.sql import functions as F

from linkgraph.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_picks_latest_preceding(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts("2024-01-01T10:00:00")), (2, 7, _ts("2024-01-01T12:00:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 7, _ts("2024-01-01T09:00:00")),
            (101, 7, _ts("2024-01-01T11:00:00")),
            (102, 7, _ts("2024-01-01T13:00:00")),
        ],
        "sig_id long, user_id long, ts timestamp",
    )
    got = {
        r["event_id"]: r
        for r in asof_join(
            left, right, on="user_id", right_cols=["sig_id"]
        ).collect()
    }
    assert got[1]["sig_id_r"] == 100  # 11:00 and 13:00 are after 10:00
    assert got[2]["sig_id_r"] == 101  # latest <= 12:00
    assert got[2]["ts_r"] == _ts("2024-01-01T11:00:00")


def test_asof_tie_matches_and_missing_is_null(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts("2024-01-01T10:00:00")), (2, 8, _ts("2024-01-01T10:00:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 7, _ts("2024-01-01T10:00:00"))],
        "sig_id long, user_id long, ts timestamp",
    )
    got = {
        r["event_id"]: r
        for r in asof_join(
            left, right, on="user_id", right_cols=["sig_id"]
        ).collect()
    }
    assert got[1]["sig_id_r"] == 100  # equal ts matches (l.ts >= r.ts)
    assert got[2]["sig_id_r"] is None and got[2]["ts_r"] is None


def test_asof_keys_do_not_leak(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts("2024-01-01T10:00:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 8, _ts("2024-01-01T09:00:00"))],
        "sig_id long, user_id long, ts timestamp",
    )
    r = asof_join(left, right, on="user_id", right_cols=["sig_id"]).collect()[0]
    assert r["sig_id_r"] is None  # other user's signup never attributes
