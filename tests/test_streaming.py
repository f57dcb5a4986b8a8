"""Streaming: scenario parser, runner triggers, latest-value state, monitor.
(model: reference test_scenario_parser.py + scenario runner semantics)."""

import json
import time

import pytest
from pyspark.sql import functions as F

from topic_store_spark.streaming import (
    ScenarioFileParser,
    ScenarioRunner,
    latest_values_stream,
    rate_monitor_stream,
    snapshot_to_doc,
)


def scenario_dict(tmp_path, method="timer", **collection_extra):
    collection = {"method": method, **collection_extra}
    if method == "timer":
        collection.setdefault("timer_delay", 1)
    if method in ("event", "start_stop"):
        collection.setdefault("watch_topic", "/camera/info")
    return {
        "context": "test_scenario",
        "storage": {"method": "filesystem", "location": str(tmp_path / "out.parquet"),
                    "ignored_key": 1},
        "data": {
            "robot_name": "thorvald",
            "sensors": {"cam": "/camera/image", "info": "/camera/info"},
        },
        "collection": collection,
    }


def test_scenario_parser_validation(tmp_path):
    parsed = ScenarioFileParser(scenario_dict(tmp_path))
    assert parsed.context == "test_scenario"
    assert "ignored_key" not in parsed.storage  # unused-key pruning
    with pytest.raises(ValueError):
        ScenarioFileParser({"context": "x"})  # missing sections
    bad = scenario_dict(tmp_path)
    bad["collection"] = {"method": "timer"}  # missing timer_delay
    with pytest.raises(ValueError):
        ScenarioFileParser(bad)
    bad2 = scenario_dict(tmp_path)
    bad2["storage"] = {"method": "carrier_pigeon"}
    with pytest.raises(ValueError):
        ScenarioFileParser(bad2)


def test_scenario_parser_from_yaml_file(tmp_path):
    import yaml

    path = tmp_path / "s.yaml"
    path.write_text(yaml.safe_dump(scenario_dict(tmp_path)))
    parsed = ScenarioFileParser(str(path))
    assert parsed.collection["method"] == "timer"


def _topic_stream_from_dir(spark, src_dir):
    schema = "topic string, value string, ts timestamp"
    return spark.readStream.schema(schema).json(str(src_dir))


def _write_events(src_dir, events, name="batch1.json"):
    src_dir.mkdir(exist_ok=True)
    lines = [
        json.dumps({"topic": t, "value": v, "ts": f"2024-01-01 00:00:{s:02d}"})
        for t, v, s in events
    ]
    (src_dir / name).write_text("\n".join(lines))


def test_timer_scenario_end_to_end(spark, tmp_path):
    scenario = ScenarioFileParser(scenario_dict(tmp_path))
    runner = ScenarioRunner(spark, scenario)
    src = tmp_path / "stream_src"
    _write_events(
        src,
        [("/camera/image", "img_v1", 1), ("/camera/image", "img_v2", 5),
         ("/camera/info", "info_v1", 2)],
    )
    q = runner.run(_topic_stream_from_dir(spark, src),
                   extra_trigger_kwargs={"availableNow": True})
    q.awaitTermination(60)
    assert runner.saved_count >= 1
    saved = runner.storage.find_one({})
    # constants verbatim, subscribed topics resolve to LATEST value
    assert saved["robot_name"] == "thorvald"
    assert saved["sensors"]["cam"] == "img_v2"
    assert saved["sensors"]["info"] == "info_v1"


def test_event_scenario_saves_per_watch_event(spark, tmp_path):
    scenario = ScenarioFileParser(scenario_dict(tmp_path, method="event"))
    runner = ScenarioRunner(spark, scenario)
    src = tmp_path / "stream_src_event"
    _write_events(
        src,
        [("/camera/image", "a", 1), ("/camera/info", "e1", 2),
         ("/camera/info", "e2", 3), ("/other", "x", 4)],
    )
    q = runner.run(_topic_stream_from_dir(spark, src),
                   extra_trigger_kwargs={"availableNow": True})
    q.awaitTermination(60)
    assert runner.saved_count == 2  # one save per watch-topic event


def test_start_stop_gate_captures_only_while_open(spark, tmp_path):
    # T4 parity (reference scenario.py:101-131): gate starts CLOSED; a
    # "start" control signal opens it, then every watch-topic message is
    # one save until "stop" — replayed in timestamp order within a batch.
    scenario = ScenarioFileParser(scenario_dict(
        tmp_path, method="start_stop", watch_topic="/camera/image",
        control_topic="/collect/gate"))
    assert scenario.collection["control_topic"] == "/collect/gate"
    runner = ScenarioRunner(spark, scenario)
    src = tmp_path / "stream_src_gate"
    _write_events(
        src,
        [("/camera/image", "before", 1),      # gate closed: ignored
         ("/collect/gate", "start", 2),
         ("/camera/image", "f1", 3),          # save
         ("/camera/image", "f2", 4),          # save
         ("/other", "noise", 5),              # not the watch topic
         ("/collect/gate", "stop", 6),
         ("/camera/image", "after", 7)],      # gate closed again
    )
    q = runner.run(_topic_stream_from_dir(spark, src),
                   extra_trigger_kwargs={"availableNow": True})
    q.awaitTermination(60)
    assert runner.saved_count == 2
    assert runner._gate_open is False


def test_never_seen_topic_is_none(spark, tmp_path):
    # parity: test_serialisation.py:29-30 (missing topics stay None)
    scenario = ScenarioFileParser(scenario_dict(tmp_path))
    runner = ScenarioRunner(spark, scenario)
    src = tmp_path / "stream_src_missing"
    _write_events(src, [("/camera/info", "only_info", 1)])
    q = runner.run(_topic_stream_from_dir(spark, src),
                   extra_trigger_kwargs={"availableNow": True})
    q.awaitTermination(60)
    saved = runner.storage.find_one({})
    assert saved["sensors"]["cam"] is None
    assert saved["sensors"]["info"] == "only_info"


def test_latest_values_stream_agg(spark, tmp_path):
    src = tmp_path / "stream_src_latest"
    _write_events(
        src,
        [("/a", "v1", 1), ("/a", "v3", 3), ("/b", "w1", 2)],
    )
    stream = _topic_stream_from_dir(spark, src)
    q = (
        latest_values_stream(stream)
        .writeStream.format("memory")
        .queryName("latest_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("select * from latest_t").collect()
    got = {r["topic"]: r["value"] for r in rows}
    assert got == {"/a": "v3", "/b": "w1"}
    doc = snapshot_to_doc(rows, ["/a", "/b", "/never"])
    assert doc["/never"] is None and doc["/a"] == "v3"


def test_rate_monitor_stream(spark, tmp_path):
    src = tmp_path / "stream_src_rate"
    _write_events(
        src,
        [("/a", "x", s) for s in range(1, 9)] + [("/b", "y", 4)],
    )
    stream = _topic_stream_from_dir(spark, src)
    q = (
        rate_monitor_stream(stream, window="10 seconds")
        .writeStream.format("memory")
        .queryName("rates_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    # watermark append-mode may hold the open window; check state via complete run
    rows = spark.sql("select * from rates_t").collect()
    assert isinstance(rows, list)  # plumbing works; rate values checked below

    q2 = (
        rate_monitor_stream(stream, window="10 seconds")
        .writeStream.format("memory")
        .queryName("rates_c")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(60)
    rows = spark.sql("select * from rates_c").collect()
    by_topic = {r["topic"]: r for r in rows}
    assert by_topic["/a"]["n"] == 8
    assert abs(by_topic["/a"]["hz"] - 0.8) < 1e-9


def test_fps_counter_stateful_stream(spark, tmp_path):
    from topic_store_spark.streaming.fps import fps_counter_stream

    src = tmp_path / "stream_src_fps"
    # /a publishes every 2s (fps 0.5); /b publishes once (no rate yet)
    _write_events(
        src,
        [("/a", "x", s) for s in (1, 3, 5, 7)] + [("/b", "y", 4)],
    )
    stream = _topic_stream_from_dir(spark, src)
    q = (
        fps_counter_stream(stream, queue_length=30)
        .writeStream.format("memory")
        .queryName("fps_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {r["topic"]: r for r in spark.sql("select * from fps_t").collect()}
    assert rows["/a"]["n_window"] == 3
    assert abs(rows["/a"]["fps"] - 0.5) < 1e-9
    assert abs(rows["/a"]["avg_delta_ms"] - 2000.0) < 1e-6
    assert rows["/b"]["n_window"] == 0 and rows["/b"]["fps"] == 0.0


def test_fps_counter_state_carries_across_batches(spark, tmp_path):
    from topic_store_spark.streaming.fps import fps_counter_stream

    src = tmp_path / "stream_src_fps2"
    _write_events(src, [("/a", "x", 1), ("/a", "x", 2)], name="b1.json")
    _write_events(src, [("/a", "x", 3)], name="b2.json")
    stream = _topic_stream_from_dir(spark, src)
    q = (
        fps_counter_stream(stream, queue_length=2)
        .writeStream.format("memory")
        .queryName("fps_t2")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("select * from fps_t2").collect()
    # final state saw all three stamps; queue_length=2 keeps 2 intervals
    final = max(rows, key=lambda r: r["n_window"])
    assert final["n_window"] == 2
    assert abs(final["fps"] - 1.0) < 1e-9


def test_dedup_stream_drops_redelivered_ids(spark, tmp_path):
    from topic_store_spark.streaming.snapshot import dedup_stream

    src = tmp_path / "stream_src_dedup"
    src.mkdir()
    lines = [
        json.dumps({"_id": i, "ts": f"2024-01-01 00:00:{s:02d}", "v": f"p{n}"})
        for n, (i, s) in enumerate([("a", 1), ("b", 2), ("a", 3), ("c", 4), ("b", 5)])
    ]
    (src / "b1.json").write_text("\n".join(lines))
    stream = (
        spark.readStream.schema("_id string, ts timestamp, v string").json(str(src))
    )
    q = (
        dedup_stream(stream, id_col="_id", ts_col="ts", watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("dedup_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("select * from dedup_t").collect()
    assert sorted(r["_id"] for r in rows) == ["a", "b", "c"]


def test_log_publication_listener_captures_progress(spark, tmp_path):
    """T11 (reference utils.py:60-77): streaming progress is published as
    log lines through the pluggable publisher — one 'started', at least
    one per-batch 'progress' with the batch's row count."""
    from topic_store_spark.streaming import LogPublicationListener

    published = []
    listener = LogPublicationListener(publish=lambda t, m: published.append((t, m)))
    spark.streams.addListener(listener)
    try:
        scenario = ScenarioFileParser(scenario_dict(tmp_path))
        runner = ScenarioRunner(spark, scenario)
        src = tmp_path / "stream_src_listener"
        _write_events(src, [("/camera/image", "v", 1), ("/camera/info", "w", 2)])
        q = runner.run(_topic_stream_from_dir(spark, src),
                       extra_trigger_kwargs={"availableNow": True})
        q.awaitTermination(60)
        # listener-bus delivery is async to the query thread
        deadline = time.time() + 30
        while time.time() < deadline:
            kinds = {k for k, _ in listener.events}
            if {"started", "progress"} <= kinds:
                break
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(listener)
    kinds = [k for k, _ in listener.events]
    assert "started" in kinds and "progress" in kinds
    progress_lines = [m for k, m in listener.events if k == "progress"]
    assert any("rows=2" in m for m in progress_lines)
    # the publisher seam received every event on the scenario log topic
    assert len(published) == len(listener.events)
    assert all(t == "/topic_store/logs" for t, _ in published)


def test_socket_topic_stream_live_push(spark, tmp_path):
    """S6: ScenarioRunner driven by a live TCP push source (the rosbridge
    relay shape) — not a file drop.  A local server emits JSON-line
    messages; the event trigger saves once per watch-topic message."""
    import socket
    import threading

    from topic_store_spark.streaming import socket_topic_stream

    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]
    stop = threading.Event()

    lines = [
        json.dumps({"topic": "/camera/image", "value": "img1", "ts": "2024-01-01 00:00:01"}),
        json.dumps({"topic": "/camera/info", "value": "snap!", "ts": "2024-01-01 00:00:02"}),
        "this is not json",  # tolerated: parsed to null topic, filtered
        json.dumps({"topic": "/camera/info", "value": "snap2", "ts": "2024-01-01 00:00:03"}),
    ]

    def serve():
        conn, _ = server.accept()
        try:
            conn.sendall(("\n".join(lines) + "\n").encode())
            stop.wait(60)  # keep the connection open while Spark reads
        finally:
            conn.close()
            server.close()

    threading.Thread(target=serve, daemon=True).start()

    scenario = ScenarioFileParser(scenario_dict(tmp_path, method="event"))
    runner = ScenarioRunner(spark, scenario)
    q = runner.run(
        socket_topic_stream(spark, "127.0.0.1", port),
        extra_trigger_kwargs={"processingTime": "1 second"},
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and runner.saved_count < 2:
            time.sleep(0.5)
    finally:
        stop.set()
        q.stop()
    assert runner.saved_count == 2  # one save per watch-topic message
    # the first snapshot captured the camera value that had arrived by then
    saved = runner.storage.find({}).orderBy("_id").collect()
    assert saved[0]["sensors"]["cam"] == "img1"


def test_session_window_stream(spark, tmp_path):
    """Gap-based streaming sessionization: events within the gap merge
    into one session; a quiet period opens a new one."""
    from topic_store_spark.streaming.sessions import session_stream

    src = tmp_path / "stream_src_sessions"
    src.mkdir()
    rows = [
        {"user_id": "u1", "ts": "2024-01-01 00:00:01"},
        {"user_id": "u1", "ts": "2024-01-01 00:00:20"},  # same session (gap 60s)
        {"user_id": "u1", "ts": "2024-01-01 00:05:00"},  # new session
        {"user_id": "u2", "ts": "2024-01-01 00:00:30"},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = spark.readStream.schema("user_id string, ts timestamp").json(str(src))
    q = (
        session_stream(stream, gap="60 seconds", watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("sessions_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = sorted(
        (r["user"], r["n_events"])
        for r in spark.sql("select * from sessions_t").collect()
    )
    assert got == [("u1", 1), ("u1", 2), ("u2", 1)]
    spans = {
        (r["user"], r["n_events"]): (r["session_start"], r["session_end"])
        for r in spark.sql("select * from sessions_t").collect()
    }
    start, end = spans[("u1", 2)]
    assert start.second == 1 and (end - start).total_seconds() == 79.0


def test_ingest_stream_two_level_dedup(spark, tmp_path):
    """End-to-end ingest: in-stream redeliveries drop inside the
    watermark; a second run replaying the same payload inserts nothing
    (historical anti-join), so restarts never double-insert."""
    import topic_store_spark as ts
    from topic_store_spark.streaming.ingest import ingest_stream

    store = ts.load(str(tmp_path / "ingested.parquet"), spark)
    src = tmp_path / "ingest_src"
    src.mkdir()
    lines = [
        json.dumps({"_id": i, "ts": f"2024-01-01 00:00:{s:02d}", "v": n})
        for n, (i, s) in enumerate(
            [("a", 1), ("b", 2), ("a", 3), ("c", 4), ("b", 5)]
        )
    ]
    (src / "b1.json").write_text("\n".join(lines))
    schema = "_id string, ts timestamp, v long"
    seen = []

    def run(ckpt):
        stream = spark.readStream.schema(schema).json(str(src))
        q = (
            ingest_stream(
                stream, store, on_batch=lambda bid, n: seen.append(n)
            )
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)

    run("ckpt1")
    assert sorted(r["_id"] for r in store.to_df().collect()) == ["a", "b", "c"]
    assert sum(seen) == 3

    # fresh checkpoint -> full source replay -> anti-join drops everything
    run("ckpt2")
    assert sorted(r["_id"] for r in store.to_df().collect()) == ["a", "b", "c"]
    assert sum(seen) == 3
