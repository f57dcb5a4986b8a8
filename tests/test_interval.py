"""Binned interval join: known answers, boundary convention, and
cross-check against the naive theta-join on a few hundred rows."""

import pytest
from pyspark.sql import functions as F

from topic_store_spark.operators.interval import interval_join


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_known_answer_and_boundaries(spark):
    events = spark.createDataFrame(
        [("u1", 1, 5.0), ("u1", 2, 10.0), ("u1", 3, 20.0), ("u2", 4, 5.0)],
        "key string, event_id int, ts double",
    )
    wins = spark.createDataFrame(
        [("u1", 100, 0.0, 10.0), ("u1", 101, 10.0, 30.0), ("u2", 102, 6.0, 9.0)],
        "key string, win_id int, start double, end double",
    )
    out = interval_join(
        events, wins, on="key", left_ts="ts",
        right_start="start", right_end="end", bin_width=4.0,
    )
    got = _rows(out, ["event_id", "win_id"])
    # ts=10.0 is EXCLUDED from [0,10) and INCLUDED in [10,30)
    assert got == [(1, 100), (2, 101), (3, 101)]


def test_overlapping_windows_yield_multiple_matches(spark):
    events = spark.createDataFrame(
        [("k", 1, 5.0)], "key string, event_id int, ts double"
    )
    wins = spark.createDataFrame(
        [("k", 10, 0.0, 6.0), ("k", 11, 4.0, 9.0), ("k", 12, 5.5, 9.0)],
        "key string, win_id int, start double, end double",
    )
    out = interval_join(events, wins, on="key", bin_width=2.0)
    assert _rows(out, ["event_id", "win_id"]) == [(1, 10), (1, 11)]


@pytest.mark.parametrize("bin_width", [0.5, 3.0, 50.0, None])
def test_matches_naive_theta_join(spark, bin_width):
    events = spark.range(300).select(
        (F.col("id") % 7).cast("string").alias("key"),
        F.col("id").cast("int").alias("event_id"),
        (F.col("id") * 3.7 % 100).alias("ts"),
    )
    wins = spark.range(200).select(
        (F.col("id") % 7).cast("string").alias("key"),
        F.col("id").cast("int").alias("win_id"),
        (F.col("id") * 5.3 % 90).alias("start"),
        ((F.col("id") * 5.3 % 90) + (F.col("id") % 13) + 1).alias("end"),
    )
    fast = interval_join(events, wins, on="key", bin_width=bin_width)
    naive = events.join(wins, "key").filter(
        (F.col("ts") >= F.col("start")) & (F.col("ts") < F.col("end"))
    )
    cols = ["event_id", "win_id"]
    assert _rows(fast, cols) == _rows(naive, cols)
    assert fast.count() > 0


def test_multi_key_and_no_match(spark):
    events = spark.createDataFrame(
        [("a", 9, 1, 5.0), ("a", 9, 2, 50.0)],
        "k1 string, k2 int, event_id int, ts double",
    )
    wins = spark.createDataFrame(
        [("a", 9, 7, 0.0, 10.0), ("b", 9, 8, 0.0, 10.0), ("a", 3, 6, 0.0, 10.0)],
        "k1 string, k2 int, win_id int, start double, end double",
    )
    out = interval_join(events, wins, on=["k1", "k2"], bin_width=5.0)
    assert _rows(out, ["event_id", "win_id"]) == [(1, 7)]
