"""Shared physical-plan helpers for operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition up to the cluster's default parallelism if
    the input has fewer partitions.

    CPU-bound per-row work (hashing, tokenization, signature computation)
    inherits the scan's partitioning; a corpus that arrives as a handful
    of files would otherwise run on a handful of cores.  At scale the
    input already has >= defaultParallelism partitions and this is a
    no-op — the repartition only fires when the data is too small for it
    to be expensive.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
