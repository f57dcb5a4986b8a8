"""Randomized lifecycle fuzzer for the out-of-row blob layer: random
documents with binary cells straddling the externalization threshold
(null / empty / threshold-edge / oversized payloads, multiple binary
columns) must roundtrip externalize→rehydrate byte-exactly, the
pointer inventory (`collect_blob_paths`) must name exactly the
oversized cells, GC must delete exactly those files, and the
lazy-skip path must leave pointers untouched (never opening a file).
"""

from __future__ import annotations

import os
import random
import shutil
import tempfile


def test_blob_lifecycle_random(spark):
    from topic_store_spark.blob import (
        collect_blob_paths,
        delete_blobs,
        externalize_blobs,
        rehydrate_blobs,
    )

    rng = random.Random(0xB10B)
    threshold = 64
    rows = []
    for i in range(60):
        def cell():
            r = rng.random()
            if r < 0.15:
                return None
            if r < 0.3:
                return b""
            n = rng.choice([1, threshold - 1, threshold, threshold + 1, 500])
            return bytes(rng.randrange(256) for _ in range(n))

        rows.append((f"id{i:03d}", cell(), cell(), rng.randint(0, 9)))

    df = spark.createDataFrame(
        rows, "_id string, img binary, aud binary, k int"
    )
    tmp = tempfile.mkdtemp(prefix="blobfuzz_")
    try:
        ext = externalize_blobs(df, tmp, threshold=threshold)
        # pointer inventory == exactly the oversized cells
        want_paths = {
            os.path.join(tmp, f"{i}_{name}.bin")
            for i, img, aud, _k in rows
            for name, payload in (("img", img), ("aud", aud))
            if payload is not None and len(payload) > threshold
        }
        got_paths = set(collect_blob_paths(ext))
        assert got_paths == want_paths, (
            f"extra={got_paths - want_paths} missing={want_paths - got_paths}"
        )

        # lazy skip: pointers stay structs, no bytes resolved
        lazy = rehydrate_blobs(ext, skip_fetch_binary=True)
        assert dict(lazy.dtypes)["img"].startswith("struct")

        # full roundtrip is byte-exact
        back = {
            r["_id"]: (
                None if r["img"] is None else bytes(r["img"]),
                None if r["aud"] is None else bytes(r["aud"]),
                r["k"],
            )
            for r in rehydrate_blobs(ext).collect()
        }
        want = {i: (img, aud, k) for i, img, aud, k in rows}
        assert back == want

        # GC removes exactly the inventory
        on_disk = {
            os.path.join(tmp, f) for f in os.listdir(tmp) if f.endswith(".bin")
        }
        assert on_disk == want_paths
        n = delete_blobs(sorted(got_paths))
        assert n == len(want_paths)
        assert not [f for f in os.listdir(tmp) if f.endswith(".bin")]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
