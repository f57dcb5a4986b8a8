"""Session analytics (parity: reference database.py:237-266).

The reference computes per-session metadata with ``distinct`` + one count
query per session (N+1 round trips, database.py:258-266) or a legacy
Mongo ``$group`` pipeline (database.py:243-256).  One distributed
``groupBy`` replaces both: map-side partial aggregation, a single shuffle
keyed by session — the plan that survives 1000 sessions x 100 M docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from topic_store_spark.objectid import generation_time


def unique_sessions(df: DataFrame, session_col: str = "_ts_meta.session") -> DataFrame:
    """Per-session {session, time, date, count}, sorted by creation time
    (client-side sort parity: database.py:266)."""
    session = F.col(session_col)
    return (
        df.filter(session.isNotNull())
        .groupBy(session.alias("session"))
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.min(F.col("_ts_meta.sys_time")).alias("sys_time"),
        )
        .withColumn("time", generation_time(F.col("session")).cast("double"))
        .withColumn(
            "date", F.date_format(generation_time(F.col("session")), "dd-MM-yyyy HH:mm:ss")
        )
        .orderBy("time", "session")
    )
