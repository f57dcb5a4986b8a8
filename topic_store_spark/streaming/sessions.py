"""Streaming gap-based sessionization (the streaming twin of
``operators/sessions.py`` / the batch ``sessionize`` query).

The reference collects per-session documents keyed by a session id
minted at scenario start (reference scenario.py:89-96,
store.py session metadata); the streaming-native generalization is
Spark's ``session_window`` — a dynamic-gap window that closes after
``gap`` of inactivity, with watermarked state so memory stays bounded
no matter how many users/topics are live.

Scale notes: state is partitioned by the grouping key (user), merged
incrementally per micro-batch (``spark.sql.streaming
.sessionWindow.merge.sessions.in.local.partition`` handles in-partition
merge); watermark evicts closed sessions, so the state store holds only
open sessions — the 1000-executor version of the reference's
single-process "one session dict in memory".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_stream(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-user gap-based sessions over an event stream: a session ends
    after ``gap`` of inactivity.  Emits one row per closed session in
    append mode (open sessions emit when the watermark passes their
    close).  Output: user, session start/end, n_events."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap),
            F.col(user_col).alias("user"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
