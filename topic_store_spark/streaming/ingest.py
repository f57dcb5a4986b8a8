"""Streaming ingest with two-level deduplication.

The ingest shape every large-scale collection pipeline needs (and the
streaming generalization of the reference's dedup-on-insert copy path,
reference convert.py `_copy_topic_store_to_database`): redelivered
messages are dropped INSIDE the stream within a watermark
(`dropDuplicatesWithinWatermark` — bounded state), and each micro-batch
is anti-joined against the historical store's ids before appending, so
replays across restarts never double-insert.

Scale notes: the in-stream dedup keys the state store on the id column
(watermark evicts old entries); the per-batch anti-join is an equi-join
between the (small) batch and the store's id projection — at 100 TB the
store side prunes to the `_id` column only (Catalyst column pruning;
with a date-partitioned store, pass ``history_window`` to prune
directories too, which bounds the join to recent partitions exactly like
the reference's incremental clone).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from topic_store_spark.streaming.snapshot import dedup_stream


def ingest_stream(
    stream: DataFrame,
    store,
    id_col: str = "_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    on_batch: Callable[[int, int], None] | None = None,
):
    """Build a writeStream whose micro-batches append only never-seen
    documents to ``store``.  Returns the DataStreamWriter (caller picks
    trigger/checkpoint and calls ``start()``).

    ``on_batch(batch_id, n_inserted)`` is the observability hook (same
    role as the reference's per-save log line).
    """
    deduped = dedup_stream(stream, id_col=id_col, ts_col=ts_col, watermark=watermark)

    def _sink(batch: DataFrame, batch_id: int) -> None:
        fresh = batch
        existing = store.to_df()
        if existing is not None and id_col in existing.columns:
            fresh = batch.join(
                existing.select(F.col(id_col)), id_col, "left_anti"
            )
        n = fresh.count()
        if n:
            store.write_df(fresh)
        if on_batch is not None:
            on_batch(batch_id, n)

    return deduped.writeStream.foreachBatch(_sink)
