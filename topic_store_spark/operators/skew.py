"""Skew-resilient aggregation helpers.

At 100 TB a handful of hot keys (one session producing half the events,
one degenerate shingle) can pin a whole stage on one task.  AQE's skew
handling covers sort-merge *joins*; for hash *aggregations* with
algebraic functions the standard fix is salting — a two-phase aggregate:

    phase 1: groupBy(key, salt)  -- hot key splits across `salt_buckets`
             partial aggregation  tasks; map-side combine still applies
    phase 2: groupBy(key)        -- combine the few per-salt partials

The result is identical to a direct groupBy for any algebraic aggregate
(sum/count/min/max); the extra shuffle is tiny (``keys * salt_buckets``
rows).  Use when key cardinality is low relative to data volume or key
frequency is known to be skewed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (name, phase1 aggregator, phase2 combiner) for supported algebraic aggs
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column name -> (agg_fn, input_col) with agg_fn in
    {sum, count, min, max}.  Example::

        salted_aggregate(events, ["user_id"],
                         {"n": ("count", "*"), "total": ("sum", "value")})

    equals ``events.groupBy("user_id").agg(count("*"), sum("value"))`` but
    spreads each hot key over ``salt_buckets`` phase-1 tasks.
    """
    for name, (fn, _col) in aggs.items():
        if fn not in _ALGEBRAIC:
            raise ValueError(f"{name}: {fn!r} is not algebraic-salting-safe")

    salt = (F.spark_partition_id() + F.monotonically_increasing_id()) % salt_buckets
    salted = df.withColumn("_salt", salt.cast("int"))

    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[
            _ALGEBRAIC[fn][0](F.lit(1) if col == "*" else F.col(col)).alias(f"_p1_{name}")
            for name, (fn, col) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[fn][1](F.col(f"_p1_{name}")).alias(name)
            for name, (fn, _col) in aggs.items()
        ]
    )


def salted_join_left(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skewed equi-join: salt the (large, skewed) left side and explode
    the (small) right side across all salt values, then join on
    (key, salt).  Equivalent rows to ``left.join(right, key)``.

    Prefer AQE's automatic skew-join first; use this when the skew is in
    a broadcast-ineligible right side or AQE statistics miss it."""
    salt = (F.spark_partition_id() + F.monotonically_increasing_id()) % salt_buckets
    lsalted = left.withColumn("_salt", salt.cast("int"))
    rsalted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return lsalted.join(rsalted, [key, "_salt"]).drop("_salt")

