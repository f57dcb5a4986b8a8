"""Sliding-deque FPS counter as a custom stateful streaming operator
(SURVEY T8; parity: reference load_balancer.py:28-73 ``FPSCounter``).

The reference smooths per-topic rates over the last N message *intervals*
(a deque), not over a fixed time window — so the streaming-native
``window()`` aggregation (monitor.py) is not semantically equivalent.
This is the one operator in the engine that needs per-key custom state:
``applyInPandasWithState`` keeps the last N event timestamps per topic in
distributed GroupState (Arrow-batched, partitioned by key — a million
topics is a million small state rows across executors), and every
micro-batch emits the refreshed ``{topic, fps, avg_delta_ms, n_window}``.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType()),
        T.StructField("fps", T.DoubleType()),
        T.StructField("avg_delta_ms", T.DoubleType()),
        T.StructField("n_window", T.IntegerType()),
    ]
)

#: state = one row: array of the most recent epoch-second timestamps
STATE_SCHEMA = T.StructType([T.StructField("ts", T.ArrayType(T.DoubleType()))])


def _update(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    queue_length: int,
    ts_col: str,
) -> Iterator[pd.DataFrame]:
    (prev,) = state.get() if state.exists else ([],)
    window = list(prev or [])
    for pdf in pdfs:
        ts = pdf[ts_col]
        if str(ts.dtype).startswith("datetime"):
            ts = ts.astype("int64") / 1e9
        window.extend(float(t) for t in ts)
    window.sort()
    window = window[-(queue_length + 1):]  # N intervals need N+1 stamps
    state.update((window,))

    if len(window) >= 2:
        deltas = [b - a for a, b in zip(window, window[1:])]
        avg = sum(deltas) / len(deltas)
        fps = 1.0 / avg if avg > 0 else float("inf")
        out = pd.DataFrame(
            [
                {
                    "topic": key[0],
                    "fps": fps,
                    "avg_delta_ms": avg * 1000.0,
                    "n_window": len(deltas),
                }
            ]
        )
    else:
        out = pd.DataFrame(
            [{"topic": key[0], "fps": 0.0, "avg_delta_ms": 0.0, "n_window": 0}]
        )
    yield out


def fps_counter_stream(
    stream: DataFrame,
    topic_col: str = "topic",
    ts_col: str = "ts",
    queue_length: int = 30,
) -> DataFrame:
    """Per-topic sliding-window rate over the last ``queue_length``
    message intervals (reference default 30).  Works on streaming and
    batch DataFrames alike (batch runs a single state pass)."""

    def update(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
        return _update(key, pdfs, state, queue_length, ts_col)

    return (
        stream.selectExpr(f"{topic_col} as topic", f"{ts_col} as {ts_col}")
        .groupBy("topic")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
