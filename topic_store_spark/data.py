"""TopicStore document container (parity: reference data.py).

One document = one future DataFrame row.  Construction sanitises the tree
(reference data.py:28) and injects the two system fields
(reference data.py:29-32):

- ``_id``      fresh ObjectId-style 24-hex string if absent
- ``_ts_meta`` {session, sys_time, ros_time} — ``session`` is minted once
  per process, the primary grouping dimension of the engine.
"""

from __future__ import annotations

import datetime
import time
from typing import Any, Iterator

from topic_store_spark.codec import (
    ROS_META_KEY,
    DocumentCodec,
    rosify_dict,
    sanitise_dict,
)
from topic_store_spark.objectid import generation_time_py, new_object_id

#: one session id per process (parity: reference data.py:18)
SESSION_ID = new_object_id()


class TopicStore:
    """Nested-dict document with python + typed (rehydrated) views
    (parity: reference data.py:21-114)."""

    def __init__(self, data_tree: dict, codec: DocumentCodec | None = None) -> None:
        if not isinstance(data_tree, dict):
            raise ValueError("Data tree must be a dict")
        tree = sanitise_dict(data_tree, codec)
        if "_id" not in tree:
            tree["_id"] = new_object_id()
        if "_ts_meta" not in tree:
            tree["_ts_meta"] = {
                "session": SESSION_ID,
                "sys_time": time.time(),
                "ros_time": time.time(),  # no ROS clock: fall back (utils.py:49-57)
            }
        self.__data_tree = tree
        self.__typed_cache: Any = None

    # -- python view --------------------------------------------------
    @property
    def dict(self) -> dict:
        return self.__data_tree

    @property
    def id(self) -> str:
        return self.__data_tree["_id"]

    @property
    def session(self) -> str:
        return self.__data_tree["_ts_meta"]["session"]

    def __getitem__(self, key: str) -> Any:
        """Dotted-path lookup over the python view (data.py:64-65)."""
        node: Any = self.__data_tree
        for part in key.split("."):
            node = node[part]
        return node

    # -- typed (rehydrated) view --------------------------------------
    @property
    def msgs(self) -> Any:
        """Lazily rehydrated message view (data.py:40-44, cache 33-34)."""
        if self.__typed_cache is None:
            self.__typed_cache = rosify_dict(self.__data_tree)
        return self.__typed_cache

    def __call__(self, key: str) -> Any:
        node: Any = self.msgs
        for part in key.split("."):
            node = node[part] if isinstance(node, dict) else getattr(node, part)
        return node

    # -- flatten (parity: data.py:94-114) ------------------------------
    def flatten_ros_msg_dict(self) -> dict[str, Any]:
        """Depth-first walk yielding every tagged message node keyed by
        dotted path ``parent.child``."""
        out: dict[str, Any] = {}

        def walk(node: Any, prefix: str) -> None:
            if isinstance(node, dict):
                if ROS_META_KEY in node:
                    out[prefix] = node
                for key, val in node.items():
                    walk(val, f"{prefix}.{key}" if prefix else key)
            elif isinstance(node, list):
                for i, val in enumerate(node):
                    walk(val, f"{prefix}.{i}")

        walk(self.__data_tree, "")
        return out

    def to_ros_msg_list(self) -> list[Any]:
        return list(self.flatten_ros_msg_dict().values())

    # -- misc ----------------------------------------------------------
    def __iter__(self) -> Iterator:
        return iter(self.__data_tree.items())

    def __len__(self) -> int:
        return len(self.__data_tree)

    def __repr__(self) -> str:  # strftime parity: data.py:76
        ts = generation_time_py(self.id)
        stamp = datetime.datetime.fromtimestamp(ts, datetime.timezone.utc)
        return f"TopicStore({stamp.strftime('%d-%m-%Y %H:%M:%S')})"
