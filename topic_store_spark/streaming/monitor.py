"""Rate metering (SURVEY T8/T9): windowed per-topic hz/size stream.

The reference publishes per-topic {hz, size} at 5 Hz from a monitor
thread (reference scenario.py:235-274) and smooths write rates over a
sliding deque (load_balancer.py:28-73).  The streaming-native form is a
windowed aggregation with a slide — watermarked so state is bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rate_monitor_stream(
    stream: DataFrame,
    topic_col: str = "topic",
    ts_col: str = "ts",
    size_col: str | None = None,
    window: str = "10 seconds",
    slide: str | None = None,
    watermark: str = "30 seconds",
) -> DataFrame:
    """Per-topic windowed message rate (+ bytes when a size column
    exists).  hz = count / window; comparable to FPSCounter output."""
    win_seconds = _duration_seconds(window)
    aggs = [
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) / F.lit(win_seconds)).alias("hz"),
    ]
    if size_col:
        aggs.append(F.sum(F.col(size_col)).alias("bytes"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window, slide or window),
            F.col(topic_col).alias("topic"),
        )
        .agg(*aggs)
    )


def _duration_seconds(spec: str) -> float:
    value, unit = spec.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600, "millisecond": 0.001,
            "milliseconds": 0.001}[unit]
    return float(value) * mult
