from topic_store_spark.streaming.scenario import ScenarioFileParser, ScenarioRunner
from topic_store_spark.streaming.snapshot import latest_values_stream, snapshot_to_doc
from topic_store_spark.streaming.monitor import rate_monitor_stream
from topic_store_spark.streaming.fps import fps_counter_stream
from topic_store_spark.streaming.listener import LogPublicationListener
from topic_store_spark.streaming.sources import (
    file_drop_topic_stream,
    socket_topic_stream,
)
from topic_store_spark.streaming.rosbridge import (
    RosbridgeReceiver,
    rosbridge_topic_stream,
)

__all__ = [
    "ScenarioFileParser",
    "ScenarioRunner",
    "LogPublicationListener",
    "RosbridgeReceiver",
    "rosbridge_topic_stream",
    "socket_topic_stream",
    "file_drop_topic_stream",
    "latest_values_stream",
    "snapshot_to_doc",
    "rate_monitor_stream",
    "fps_counter_stream",
]
