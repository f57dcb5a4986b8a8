"""ObjectId semantics without bson.

The reference mints a ``bson.ObjectId`` per document and per session
(reference data.py:29-32) and later exploits the fact that the first 4
bytes encode creation time (reference database.py:263-266,
``ObjectId.generation_time``).

Here an ObjectId is a plain 24-char lowercase hex STRING column with the
same layout: 8 hex chars of big-endian unix seconds followed by 16 hex
chars of uniqueness payload.  Generation is fully distributed (no driver
coordination): the payload derives from a per-row uuid, or — in
deterministic mode — from md5 of a caller-supplied key column, which keeps
test data and oracle comparisons reproducible.
"""

from __future__ import annotations

import os
import struct
import threading
import time
import uuid

from pyspark.sql import Column
from pyspark.sql import functions as F

_counter_lock = threading.Lock()
_counter = int.from_bytes(os.urandom(3), "big")


def new_object_id(timestamp: float | None = None) -> str:
    """Driver-side single ObjectId (24-hex). Layout parity with bson:
    4B time + 5B random + 3B counter."""
    global _counter
    ts = int(timestamp if timestamp is not None else time.time())
    with _counter_lock:
        _counter = (_counter + 1) % 0xFFFFFF
        count = _counter
    payload = os.urandom(5) + struct.pack(">I", count)[1:]
    return struct.pack(">I", ts).hex() + payload.hex()


def object_id_col(ts_col: Column | None = None, key_col: Column | None = None) -> Column:
    """Column expression minting ObjectIds distributed across executors.

    ``ts_col``: optional epoch-seconds column for the time prefix
    (defaults to current time).  ``key_col``: optional column whose md5
    supplies the 16-hex uniqueness payload (deterministic mode); default
    uses uuid() (random, still collision-safe across executors).
    """
    ts = ts_col if ts_col is not None else F.unix_timestamp()
    seed = key_col if key_col is not None else F.expr("uuid()")
    prefix = F.lpad(F.lower(F.hex(ts.cast("long"))), 8, "0")
    payload = F.substring(F.md5(seed.cast("string")), 1, 16)
    return F.concat(prefix, payload)


def generation_time(id_col: Column) -> Column:
    """Creation TIMESTAMP recovered from an ObjectId column
    (parity: reference database.py:263-266)."""
    return F.to_timestamp(F.conv(F.substring(id_col, 1, 8), 16, 10).cast("long"))


def generation_time_py(object_id: str) -> float:
    """Driver-side epoch seconds from a 24-hex ObjectId string."""
    return float(int(object_id[:8], 16))
