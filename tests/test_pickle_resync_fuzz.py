"""Differential fuzzer for the `.topic_store` corrupt-frame resync: the
same pickle stream is parsed by BOTH public surfaces — the driver-side
cursor (`parse_pickle_frames`, backing `TopicStorage.__iter__`) and the
distributed scan (`TopicStorage.to_df`, whose executor closure
re-implements the loop with stdlib only) — and the SET of intact
original frames recovered must be identical.

Corruptions are adversarial and unconstrained (byte flips, range
deletes, garbage inserts, truncation, garbage prefixes), so a corrupt
frame may unpickle into an arbitrary mutated object; the comparison
therefore keys on the planted unique `_id`s (any mutated/garbage doc
is ignored on both sides) — the property under test is resync parity,
not corruption detection.  An uncorrupted stream must recover every
frame on both surfaces.

Reference behavior: reference filesystem.py:52-68 keeps attempting
subsequent loads after a corrupt frame.
"""

from __future__ import annotations

import os
import pickle
import random
import shutil
import tempfile


def _make_stream(rng: random.Random, n: int) -> tuple[bytes, list[str]]:
    ids = [f"id{i:03d}" for i in range(n)]
    frames = [
        pickle.dumps(
            {"_id": i, "k": rng.randint(0, 99), "s": "x" * rng.randint(0, 30)},
            protocol=2,
        )
        for i in ids
    ]
    return b"".join(frames), ids


def _corrupt(rng: random.Random, raw: bytes) -> bytes:
    data = bytearray(raw)
    for _ in range(rng.randint(0, 3)):
        if not data:
            break
        op = rng.random()
        if op < 0.35:  # flip a byte
            p = rng.randrange(len(data))
            data[p] = rng.randrange(256)
        elif op < 0.6:  # delete a range
            p = rng.randrange(len(data))
            q = min(len(data), p + rng.randint(1, 40))
            del data[p:q]
        elif op < 0.8:  # insert garbage (may itself contain \x80\x02)
            p = rng.randrange(len(data) + 1)
            data[p:p] = bytes(rng.randrange(256) for _ in range(rng.randint(1, 30)))
        elif op < 0.9:  # truncate the tail
            data = data[: rng.randrange(1, len(data) + 1)]
        else:  # prepend garbage
            data[0:0] = bytes(rng.randrange(256) for _ in range(rng.randint(1, 20)))
    return bytes(data)


def _driver_ids(raw: bytes, expected: set[str]) -> set[str]:
    from topic_store_spark.filesystem import parse_pickle_frames

    out = set()
    for doc in parse_pickle_frames(raw):
        i = doc.get("_id")
        if isinstance(i, str) and i in expected:
            out.add(i)
    return out


def _scan_ids(spark, path: str, expected: set[str]) -> set[str]:
    from topic_store_spark.filesystem import TopicStorage

    df = TopicStorage.load(spark, path).to_df()
    if "_id" not in df.columns:
        return set()
    got = set()
    for r in df.select("_id").collect():
        i = r["_id"]
        if isinstance(i, str) and i in expected:
            got.add(i)
    return got


def test_pickle_resync_parity(spark):
    rng = random.Random(0x91C)
    tmp = tempfile.mkdtemp(prefix="resyncfuzz_")
    try:
        failures = []
        for case in range(12):
            raw, ids = _make_stream(rng, rng.randint(4, 12))
            if case:  # case 0 stays uncorrupted
                raw = _corrupt(rng, raw)
            path = os.path.join(tmp, f"case{case}.topic_store")
            with open(path, "wb") as fh:
                fh.write(raw)
            expected = set(ids)
            drv = _driver_ids(raw, expected)
            dist = _scan_ids(spark, path, expected)
            if case == 0 and drv != expected:
                failures.append(f"case 0 (uncorrupted): driver lost {expected - drv}")
            if drv != dist:
                failures.append(
                    f"case {case}: driver-only={sorted(drv - dist)} "
                    f"scan-only={sorted(dist - drv)} of {len(expected)} frames"
                )
        assert not failures, "\n".join(failures)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
