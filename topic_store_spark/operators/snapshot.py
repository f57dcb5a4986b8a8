"""Latest-value snapshot + rate metering (batch forms).

The reference keeps one latest message per topic and assembles a snapshot
on every trigger (reference store.py:28-44,76-84); its monitor reports
per-topic hz/size over a sliding window (scenario.py:235-274,
load_balancer.py:28-73).  Batch equivalents below; streaming forms live
in ``topic_store_spark.streaming``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_snapshot(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> DataFrame:
    """One row per key: the latest record (max ts, tie-break max tie_col).
    Deterministic; never-seen keys are simply absent (the streaming form
    fills NULL, parity test_serialisation.py:29-30)."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).desc(), F.col(tie_col).desc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def windowed_rates(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "hour",
) -> DataFrame:
    """Per-key per-window {count, avg} — the FPSCounter/monitor analog
    (tumbling processing-time window as a batch groupBy)."""
    return (
        df.groupBy(
            F.date_trunc(window, F.col(ts_col)).alias("window_start"),
            F.col(key_col).alias("key"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.col(value_col)).alias("avg_value"),
        )
        .orderBy("window_start", "key")
    )
