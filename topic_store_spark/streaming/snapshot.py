"""Latest-value snapshot state over a topic stream (SURVEY T5/S7/J3).

The reference holds the newest message per subscribed topic and, at every
trigger, assembles one document from all current values
(reference store.py:28-44,76-84) — topics that never published stay None
(test_serialisation.py:29-30).

Streaming form: a streaming aggregation ``groupBy(topic).agg(max_by(value,
(ts, seq)))`` — Spark keeps the per-key state, updates are incremental
and partitioned by key, so a million topics costs a million small state
rows spread across executors, not a driver dict.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def latest_values_stream(
    stream: DataFrame,
    topic_col: str = "topic",
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming latest-value per topic: use with outputMode('complete')
    (small keyspace) or 'update' (incremental sinks)."""
    return stream.groupBy(F.col(topic_col).alias("topic")).agg(
        F.max_by(F.col(value_col), F.struct(F.col(ts_col))).alias("value"),
        F.max(F.col(ts_col)).alias("ts"),
    )


def dedup_stream(
    stream: DataFrame,
    id_col: str = "_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming ingest dedup (J2's streaming form): at-least-once
    sources (redelivered messages, replayed bags) dedup on document id
    with bounded state — ids are forgotten once older than the
    watermark, so state size tracks the redelivery horizon, not the
    stream's history."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [id_col]
    )


def snapshot_to_doc(latest_rows: list, expected_topics: list[str]) -> dict:
    """Assemble one snapshot document from the current latest values;
    missing topics -> None (parity: store.py:76-84)."""
    by_topic = {row["topic"]: row["value"] for row in latest_rows}
    return {topic: by_topic.get(topic) for topic in expected_topics}
