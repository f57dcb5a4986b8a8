"""Bucketed-table layout: co-located joins without a shuffle.

The third leg of the join-strategy tripod (broadcast for small dims —
used throughout the operators; salting for skewed keys — operators/
skew.py; BUCKETING for repeated big-big equi-joins).  At 100 TB, two
fact tables joined on the same key in every pipeline run should not
re-shuffle per query: writing both ``bucketBy(N, key)`` pre-partitions
the data on disk, and Spark's scan reports the bucketing as an output
partitioning, so ``SortMergeJoin`` runs with NO Exchange on either side
— the join cost collapses to a per-bucket merge.

Bucketed writes go through ``saveAsTable`` (bucket metadata lives in the
session catalog; a plain ``parquet(path)`` write cannot record it).
Reads resolve through ``spark.table``.  The bucket count is a real
tuning decision: buckets ≈ total_size / target_partition_size, matched
between co-joined tables (equal bucket counts join exchange-free;
Spark >= 3.1 can also coalesce mismatched counts when
``spark.sql.bucketing.coalesceBucketsInJoin.enabled`` is set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) parquet table.

    ``sort_cols`` additionally sorts within each bucket file — joins and
    merge scans then skip even the per-bucket sort (``SortMergeJoin``
    reads presorted runs).
    """
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *keys)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog —
    this is just ``spark.table`` with intent documented)."""
    return spark.table(table)


def is_exchange_free_join(
    left: DataFrame, right: DataFrame, on: str | list[str]
) -> tuple[DataFrame, bool]:
    """Join two (ideally co-bucketed) tables and report whether the
    physical plan is SHUFFLE-free — the verification hook for layout
    decisions: returns ``(joined_df, no_shuffle)``.  A BroadcastExchange
    does not count (broadcasting is the other legitimate no-shuffle
    strategy); what bucketing eliminates is the hash-partitioning
    shuffle of both sides."""
    keys = [on] if isinstance(on, str) else list(on)
    joined = left.join(right, keys)
    # public explain capture, not _jdf.queryExecution() — the private
    # JVM handle does not exist under Spark Connect (r9)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain(mode="simple")
    plan = buf.getvalue()
    n_shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    return joined, n_shuffles == 0
