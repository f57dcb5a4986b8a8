"""Randomized property fuzzer for the bson-free ObjectId layer:
generation-time roundtrips across the epoch range (distributed column
mint AND driver mint), bson layout (24 lowercase hex), deterministic
mode reproducibility (same ts+key -> identical ids, plan re-executed),
and uniqueness in random mode.
"""

from __future__ import annotations

import random
import re


def test_objectid_properties(spark):
    from pyspark.sql import functions as F

    from topic_store_spark.objectid import (
        generation_time,
        generation_time_py,
        new_object_id,
        object_id_col,
    )

    rng = random.Random(0x0B1D)
    rows = [
        (i, float(rng.choice([0, 1, 946684800, 1786852405, 2**31 - 1])), f"k{i}")
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "i long, ts double, key string")

    det = df.select(
        "i", "ts",
        object_id_col(ts_col=F.col("ts"), key_col=F.col("key")).alias("oid"),
        object_id_col(ts_col=F.col("ts")).alias("rand_oid"),
    )
    out = {r["i"]: r for r in det.collect()}
    out2 = {r["i"]: r for r in det.collect()}  # re-execute the plan
    gt = {
        r["i"]: r["gt"]
        for r in det.select(
            "i", generation_time(F.col("oid")).cast("long").alias("gt")
        ).collect()
    }
    hex24 = re.compile(r"^[0-9a-f]{24}$")
    for i, ts, _k in rows:
        oid = out[i]["oid"]
        assert hex24.match(oid), oid
        assert hex24.match(out[i]["rand_oid"])
        # time prefix roundtrips through both extractors
        assert generation_time_py(oid) == float(int(ts)), (oid, ts)
        assert gt[i] == int(ts)  # timestamp column -> epoch seconds
        # deterministic mode reproduces across plan executions
        assert out2[i]["oid"] == oid
    # random mode: unique across 200 rows (and distinct from det mode)
    rand_ids = {r["rand_oid"] for r in out.values()}
    assert len(rand_ids) == len(rows)

    # driver mint: layout + roundtrip + uniqueness under a fixed ts
    ids = {new_object_id(1786852405.9) for _ in range(500)}
    assert len(ids) == 500
    for oid in list(ids)[:10]:
        assert hex24.match(oid)
        assert generation_time_py(oid) == 1786852405.0
