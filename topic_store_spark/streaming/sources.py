"""Pluggable live topic sources for ``ScenarioRunner.run`` (S6).

The reference subscribes to live ROS topics in-process (reference
store.py:17-44 ``SubscriberTree``).  In the Spark engine any streaming
DataFrame of ``topic, value, ts`` rows is a valid source — these helpers
build the common ones:

- ``socket_topic_stream``: a TCP push stream of JSON lines, the shape a
  rosbridge/websocket relay produces when piped to a socket.  This is a
  true live-push source: messages arrive as they are emitted, Spark's
  micro-batch engine owns batching/backpressure (T6/T7).
- ``file_drop_topic_stream``: a landing-directory stream (each dropped
  file is a batch of messages) — the replayable variant used throughout
  the tests.

Both parse with an explicit schema — no sampling-based inference in a
streaming context.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOPIC_SCHEMA = "topic string, value string, ts timestamp"


def socket_topic_stream(
    spark: SparkSession, host: str, port: int, schema: str = TOPIC_SCHEMA
) -> DataFrame:
    """JSON-lines-over-TCP -> streaming topic/value/ts DataFrame.

    Each line is one message document, e.g.
    ``{"topic": "/camera/image", "value": "...", "ts": "..."}`` —
    exactly what ``rosbridge``'s subscription relay (or ``rostopic echo
    -p`` piped through a JSON formatter) emits.  Unparseable lines become
    null-topic rows; filter them out rather than failing the stream
    (corrupt-frame tolerance, same stance as the pickle scan)."""
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", str(port))
        .load()
    )
    return (
        raw.select(F.from_json(F.col("value"), schema).alias("m"))
        .select("m.*")
        .filter(F.col("topic").isNotNull())
    )


def file_drop_topic_stream(
    spark: SparkSession, path: str, schema: str = TOPIC_SCHEMA
) -> DataFrame:
    """Landing-directory JSON stream (one file = one batch of messages)."""
    return spark.readStream.schema(schema).json(str(path))
