"""Log publication for streaming scenarios (T11, parity: reference
utils.py:60-77 ``DefaultLogger``).

The reference publishes every scenario log line to a
``/topic_store/<topic>`` ROS topic alongside printing it.  The Spark
equivalent of "the scenario's heartbeat" is the engine's own
StreamingQueryListener event stream — query started / per-batch progress
(rows, durations) / idle / terminated — so this listener turns those
events into published log lines through a pluggable publisher callback
(a rospy publisher, a Kafka producer, a metrics client; default is the
module logger, keeping the print side of the reference's publish+print
pair)."""

from __future__ import annotations

import logging
from typing import Any, Callable

from pyspark.sql.streaming import StreamingQueryListener

logger = logging.getLogger(__name__)

LOG_PREFIX = "Topic Store: "  # reference utils.py:68 base description


class LogPublicationListener(StreamingQueryListener):
    """Publishes per-batch streaming progress as log messages.

    ``publish(topic, message)`` is the injectable transport; captured
    events are kept on ``.events`` (kind, message) so callers (and tests)
    can assert on the publication stream without a broker.  Register with
    ``spark.streams.addListener(listener)`` — events arrive on the
    engine's listener-bus thread, asynchronously to ``foreachBatch``.
    """

    def __init__(
        self,
        publish: Callable[[str, str], None] | None = None,
        topic: str = "logs",
        verbose: bool = True,
    ) -> None:
        self.topic = f"/topic_store/{topic}"
        self._publish = publish
        self._verbose = verbose
        self.events: list[tuple[str, str]] = []

    def _emit(self, kind: str, message: str) -> None:
        self.events.append((kind, message))
        if self._publish is not None:
            self._publish(self.topic, message)
        if self._verbose:
            logger.info("%s%s", LOG_PREFIX, message)

    # -- engine callbacks (listener-bus thread) --------------------------
    def onQueryStarted(self, event: Any) -> None:
        self._emit("started", f"query started id={event.id} name={event.name}")

    def onQueryProgress(self, event: Any) -> None:
        p = event.progress
        self._emit(
            "progress",
            f"batch={p.batchId} rows={p.numInputRows} "
            f"durationMs={dict(p.durationMs or {})}",
        )

    def onQueryIdle(self, event: Any) -> None:
        self._emit("idle", f"query idle id={event.id}")

    def onQueryTerminated(self, event: Any) -> None:
        suffix = f" exception={event.exception}" if event.exception else ""
        self._emit("terminated", f"query terminated id={event.id}{suffix}")
