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


def _respread_target(batch: DataFrame, n_in: int) -> int | None:
    """Partition count a large micro-batch should re-spread to before
    the CPU-bound signing stage, or ``None`` to keep the source layout.

    Classic Spark: spread to ``min(defaultParallelism, n_in // 256)``
    when that exceeds the batch's current partition count.  Spark
    Connect (r10): ``sparkContext`` / ``batch.rdd`` do not exist inside
    ``foreachBatch`` either, and a micro-batch relation is never
    file-backed, so no layout probe exists — keep the source layout
    (no-op), the same scale-safe default as
    :func:`topic_store_spark.operators.util.ensure_parallelism`'s
    unprobeable branch; a blind repartition could shrink an
    already-parallel batch.
    """
    try:
        sc = batch.sparkSession.sparkContext
        want = min(sc.defaultParallelism, max(1, n_in // 256))
        current = batch.rdd.getNumPartitions()
    except Exception:  # Spark Connect: no RDD / driver-context surface
        return None
    return want if want > current else None


def near_dedup_ingest_stream(
    stream: DataFrame,
    store,
    index,
    id_col: str = "doc_id",
    on_batch: Callable[[int, int, int], None] | None = None,
    on_timing: Callable[[int, dict], None] | None = None,
):
    """Streaming NEAR-duplicate ingest against a standing MinHash-LSH
    index (`operators/index.MinHashIndex`) — the third dedup level on
    top of ``ingest_stream``'s exact two: each micro-batch is LSH-queried
    against everything ingested so far, colliding documents are dropped
    (batch-vs-index losers, and the larger id of batch-vs-batch pairs),
    and the survivors are appended to BOTH the store and the index, so
    the next batch dedups against them too.

    Per-batch cost is the incremental-ingest shape end-to-end: the index
    side is READ (parquet bands — partition-pruned to the batch's band
    directories when the index is hash-partitioned, Bloom-row-filtered
    either way), never recomputed; only the batch is signed, and the
    batch/survivor relations are cached for their multiple consumers
    then released (``index.release()``) before the sink returns.
    ``on_batch(batch_id, n_in, n_kept)`` is the observability hook;
    ``on_timing(batch_id, {"query": s, "append": s})`` records the
    per-batch stage split (tools/stream_bench.py writes it to
    STREAMBENCH.md).
    """
    import time

    def _sink(batch: DataFrame, batch_id: int) -> None:
        from pyspark import StorageLevel

        batch = batch.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            n_in = batch.count()
            if n_in == 0:
                if on_batch is not None:
                    on_batch(batch_id, 0, 0)
                return
            # streaming sources deliver as many partitions as source
            # FILES — a corpus-sized micro-batch from a handful of
            # files would sign on a handful of cores (the CPU-bound
            # stage).  Re-spread large batches; small batches keep
            # their layout (a 64-row batch across 32 partitions would
            # pay 32-task scheduling on every downstream job).
            want = _respread_target(batch, n_in)
            if want:
                spread = batch.repartition(want).persist(
                    StorageLevel.MEMORY_AND_DISK
                )
                spread.count()
                batch.unpersist()
                batch = spread
            t0 = time.monotonic()
            try:
                # batch-size hint lets MinHashIndex decide whether its
                # Bloom prefilter pays (on when batch << corpus)
                pairs = index.query(batch, batch_docs=n_in)
            except TypeError:
                pairs = index.query(batch)
            ids = batch.select(F.col(id_col))
            # membership tags: a batch doc loses to any index doc it
            # pairs with, and to any smaller-id batch doc
            tagged = pairs.join(
                ids.select(F.col(id_col).alias("a_doc")).withColumn(
                    "_a_in", F.lit(True)
                ),
                "a_doc",
                "left",
            ).join(
                ids.select(F.col(id_col).alias("b_doc")).withColumn(
                    "_b_in", F.lit(True)
                ),
                "b_doc",
                "left",
            )
            drops = tagged.select(
                F.when(
                    F.col("_a_in").isNotNull() & F.col("_b_in").isNull(),
                    F.col("a_doc"),
                )
                .otherwise(F.col("b_doc"))
                .alias(id_col)
            ).distinct()
            survivors = batch.join(drops, id_col, "left_anti").persist(
                StorageLevel.MEMORY_AND_DISK
            )
            n_kept = survivors.count()
            t_query = time.monotonic() - t0
            t0 = time.monotonic()
            if n_kept:
                # the three appends run SEQUENTIALLY on purpose: a
                # concurrent-submission variant (ThreadPool over the
                # store write + index appends) measured ~0.6s faster
                # per corpus-sized batch but hit an intermittent
                # "Block rdd_N does not exist" abort (~1 in 300
                # micro-batches) from concurrent jobs sharing the
                # batch/survivor cached relations — a killed streaming
                # query is worth more than the overlap.
                #
                # one parquet file per micro-batch, not one per shuffle
                # partition (the store directory's file count is what
                # every later reader lists)
                store.write_df(survivors.coalesce(1))
                if hasattr(index, "append_cached"):
                    # survivors are a subset of the just-queried batch —
                    # reuse its cached signatures, don't re-sign
                    try:
                        index.append_cached(
                            survivors.select(F.col(id_col)),
                            n_docs=n_kept,
                        )
                    except TypeError:
                        index.append_cached(survivors.select(F.col(id_col)))
                else:
                    index.append(survivors)
            t_append = time.monotonic() - t0
            survivors.unpersist()
            if hasattr(index, "release"):
                index.release()
            if on_timing is not None:
                on_timing(
                    batch_id,
                    {"query": round(t_query, 3), "append": round(t_append, 3)},
                )
            if on_batch is not None:
                on_batch(batch_id, n_in, n_kept)
        finally:
            batch.unpersist()

    return stream.writeStream.foreachBatch(_sink)
