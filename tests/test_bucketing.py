"""Bucketed co-located joins: the plan must drop BOTH Exchanges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from topic_store_spark.operators.bucketing import (
    is_exchange_free_join,
    read_bucketed,
    write_bucketed,
)


@pytest.fixture()
def bucketed_pair(spark, tmp_path_factory):
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    a = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, "bk_a", "k", 8, sort_cols=["k"])
    write_bucketed(b, "bk_b", "k", 8, sort_cols=["k"])
    yield warehouse
    spark.sql("DROP TABLE IF EXISTS bk_a")
    spark.sql("DROP TABLE IF EXISTS bk_b")


def test_cobucketed_join_is_exchange_free(spark, bucketed_pair):
    left, right = read_bucketed(spark, "bk_a"), read_bucketed(spark, "bk_b")
    # force the sort-merge path a big-big join takes (tiny test tables
    # would otherwise broadcast and the planner disables bucketed scans)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined, no_shuffle = is_exchange_free_join(left, right, "k")
        assert no_shuffle, "co-bucketed equi-join must not shuffle either side"
        # and it is still the correct join
        n = joined.count()
        assert n == 2000
        row = joined.filter(F.col("k") == 7).first()
        assert (row["va"], row["vb"]) == (14, 21)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_join_shuffles_for_contrast(spark):
    a = spark.range(0, 2000).select(F.col("id").alias("k"))
    b = spark.range(0, 2000).select(F.col("id").alias("k"))
    # force the sort-merge path a big-big join would take (no broadcast)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        _, no_shuffle = is_exchange_free_join(a, b, "k")
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert not no_shuffle  # the baseline DOES exchange — bucketing removes it
