"""Batch ETL pipelines between stores (parity: reference convert.py).

Every reference pipeline was a single-client cursor loop copying one
document at a time; here each is a distributed ``read -> filter ->
project -> write``:

- ``copy(src, dst, query, projection)``          (convert.py:35-47, 92-129)
- ``clone_incremental(src, dst)``                (convert.py:131-182 ``clone_fast``)
- ``to_ros_bag(df, path, writer)``               (convert.py:185-232, egress)

``clone_fast`` is the interesting one: the reference reads every ``_id``
from the target, builds a ``$nin`` query (falling back to a full scan
when the id list serializes over 15 MB) and re-fetches each missing
document by id.  Distributed, the whole dance is ONE ``left_anti`` join
on ``_id`` — AQE picks broadcast vs shuffle by actual size, which is
exactly the 15 MB heuristic done right, and there is no per-id refetch.
"""

from __future__ import annotations

import logging
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from topic_store_spark.api import Storage
from topic_store_spark.query import apply_projection, compile_query

logger = logging.getLogger(__name__)


def copy(
    src: Storage,
    dst: Storage,
    query: dict | None = None,
    projection: dict | None = None,
    dedup_on_id: bool = True,
) -> dict[str, int]:
    """Copy matching documents src -> dst.

    ``dedup_on_id=True`` reproduces the reference's DuplicateKeyError
    skip-and-count behaviour (convert.py:113-129) as a ``left_anti``
    join against the destination's existing ids — set semantics, no
    try/except per row.  Returns {"copied": n, "skipped_duplicates": m}.

    Counts come from ``observe()`` metrics collected DURING the write —
    one pass over the source instead of write + two standalone count
    scans (at 100 TB an extra count is a full extra read of the corpus).
    """
    from pyspark.sql import Observation

    df = src.to_df()
    df = df.filter(compile_query(query, df.schema))
    df = apply_projection(df, projection)

    obs_total = Observation("copy_total")
    df = df.observe(obs_total, F.count(F.lit(1)).alias("n"))
    if dedup_on_id and "_id" in df.columns:
        existing = dst.to_df()
        if "_id" in existing.columns:
            df = df.join(existing.select("_id"), on="_id", how="left_anti")
    obs_write = Observation("copy_written")
    df = df.observe(obs_write, F.count(F.lit(1)).alias("n"))

    _write_df(dst, df)
    total = obs_total.get["n"]
    to_write = obs_write.get["n"]
    return {"copied": to_write, "skipped_duplicates": total - to_write}


def clone_incremental(src: Storage, dst: Storage) -> dict[str, int]:
    """Incremental anti-join clone (parity: convert.py:131-182
    ``clone_fast``): copy only documents whose ``_id`` is absent from the
    destination."""
    return copy(src, dst, dedup_on_id=True)


def _write_df(dst: Storage, df: DataFrame) -> None:
    write_df = getattr(dst, "write_df", None)
    if callable(write_df):
        write_df(df)
        return
    for row in df.toLocalIterator():  # storages without bulk write (legacy)
        dst.insert_one(row.asDict(recursive=True))


# ---------------------------------------------------------------------------
# ROS bag egress (S9).  No Spark-native bag format exists; the writer is an
# egress callback over partitions.  Reading bags back is explicitly
# unsupported, matching the reference (convert.py:282-285, "lossy").
# ---------------------------------------------------------------------------


def to_ros_bag(
    df: DataFrame,
    path: str,
    bag_writer_factory: Callable[[str], Any] | None = None,
) -> int:
    """Write each stored message to a bag keyed by its original topic
    (``_ros_meta._connection_header.topic``) at ``_ts_meta.ros_time``
    (parity: convert.py:185-232).

    ``bag_writer_factory(path)`` must return an object with
    ``write(topic, msg_dict, t)`` and ``close()``.  Without a rosbag
    library in the environment the default factory raises — the Spark-side
    plumbing (ordering, topic extraction, partition fan-in) is real and
    tested with a fake writer.
    """
    if bag_writer_factory is None:
        def bag_writer_factory(_path: str):  # pragma: no cover
            raise NotImplementedError(
                "no rosbag library available; pass bag_writer_factory"
            )

    # bag files are single-writer: fan in ordered by ros_time through the
    # driver, the same boundary the reference has (one client process).
    ordered = df.orderBy(F.col("_ts_meta.ros_time").asc())
    writer = bag_writer_factory(path)
    count = 0
    try:
        for row in ordered.toLocalIterator():
            doc = row.asDict(recursive=True)
            ts = doc.get("_ts_meta", {}).get("ros_time")
            for key, msg in _iter_tagged_messages(doc):
                header = (msg.get("_ros_meta") or {}).get("connection_header") or {}
                topic = header.get("topic", f"/{key.replace('.', '/')}")
                writer.write(topic, msg, ts)
                count += 1
    finally:
        close = getattr(writer, "close", None)
        if callable(close):
            close()
    return count


def _iter_tagged_messages(doc: dict, prefix: str = ""):
    for key, value in doc.items():
        if key.startswith("_"):
            continue
        path = f"{prefix}.{key}" if prefix else key
        if isinstance(value, dict):
            if "_ros_meta" in value:
                yield path, value
            else:
                yield from _iter_tagged_messages(value, path)
