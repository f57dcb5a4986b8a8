"""Scalar functions (SURVEY §2.7 F1-F14)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from topic_store_spark.objectid import generation_time


def time_as_ms(ts: Column | None = None) -> Column:
    """Epoch seconds as double (parity: reference utils.py:43-46 —
    despite the name, the reference returns seconds)."""
    if ts is None:
        return F.current_timestamp().cast("double")
    return ts.cast("timestamp").cast("double")


def ros_time_as_ms(ros_ts: Column | None = None) -> Column:
    """ROS clock seconds with system-time fallback (utils.py:49-57)."""
    if ros_ts is None:
        return time_as_ms()
    return F.coalesce(ros_ts.cast("double"), time_as_ms())


def objectid_timestamp(id_col: Column) -> Column:
    """ObjectId -> creation TIMESTAMP (F3, database.py:263-265)."""
    return generation_time(id_col)


def redact_uri(uri: Column) -> Column:
    """Mask ``user:pass@`` credentials in URIs (F9, convert.py:254-259)."""
    return F.regexp_replace(uri, r"://[^/@]+@", "://****:****@")


def humanize_size(num_bytes: Column) -> Column:
    """Bytes -> '4.0 KiB' style strings (F10, utils.py:150-155)."""
    units = ["B", "KiB", "MiB", "GiB", "TiB", "PiB"]
    b = num_bytes.cast("double")
    expr = F.format_string("%.1f %s", b, F.lit("B"))
    scale = 1.0
    for unit in units[1:]:
        scale *= 1024.0
        expr = F.when(
            b >= scale, F.format_string("%.1f %s", b / scale, F.lit(unit))
        ).otherwise(expr)
    return expr
