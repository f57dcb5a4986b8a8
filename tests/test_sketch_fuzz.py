"""Differential fuzzer for the probabilistic-filter infrastructure:

- `bloom_build` / `bloom_contains`: the blob is a pure function of the
  value set (md5-split 56-bit keys, universal-hash positions), so a
  pure-Python builder must reproduce it BIT-FOR-BIT, the JVM probe
  must agree with reference membership on members and non-members
  alike, and false negatives must be impossible;
- `heavy_hitters`: EXACT results by contract for ANY sketch width —
  fuzzed at adversarially tiny widths (heavy CMS collisions) against a
  plain Python Counter, null group included.
"""

from __future__ import annotations

import hashlib
import random
from collections import Counter

_M31 = (1 << 31) - 1


def _bloom_positions_py(value: str, num_bits: int, num_hashes: int) -> list[int]:
    from topic_store_spark.functions.hashing import mix_constants

    h = hashlib.md5(value.encode()).hexdigest()
    k1, k2 = int(h[:7], 16), int(h[7:14], 16)
    consts = mix_constants(2 * num_hashes)
    return [
        (((k1 * a1 + b1) % _M31 + (k2 * a2 + b2) % _M31) % _M31) % num_bits
        for (a1, b1), (a2, b2) in zip(consts[:num_hashes], consts[num_hashes:])
    ]


def test_bloom_filter_matches_reference(spark):
    from pyspark.sql import functions as F

    from topic_store_spark.operators.bloom import bloom_build, bloom_contains

    rng = random.Random(0xB100)
    num_hashes = rng.choice([3, 7])
    members = list(
        {
            rng.choice(
                [
                    "".join(rng.choice("abcdef-09") for _ in range(rng.randint(1, 12))),
                    str(rng.randint(-(10**9), 10**9)),
                ]
            )
            for _ in range(rng.randint(30, 120))
        }
    )
    df = spark.createDataFrame([(v,) for v in members], "v string")
    bf = bloom_build(
        df, "v", expected_items=len(members), num_hashes=num_hashes
    )

    # 1. bit-for-bit blob parity with the pure-Python builder
    ref = bytearray(bf.num_bits // 8)
    for v in members:
        for p in _bloom_positions_py(v, bf.num_bits, num_hashes):
            ref[p >> 3] |= 1 << (p & 7)
    assert bytes(ref) == bf.blob, "blob diverged from the Python builder"

    # 2. JVM probe parity on members and random non-members
    probes = members + [
        "".join(rng.choice("abcdef-09xyz") for _ in range(rng.randint(1, 12)))
        for _ in range(200)
    ]
    pdf = spark.createDataFrame([(v,) for v in probes], "v string")
    got = {
        r["v"]: r["hit"]
        for r in pdf.select(
            "v", bloom_contains(bf, F.col("v")).alias("hit")
        ).collect()
    }
    for v in set(probes):
        want = all(
            ref[p >> 3] >> (p & 7) & 1
            for p in _bloom_positions_py(v, bf.num_bits, num_hashes)
        )
        assert got[v] == want, f"probe {v!r}: jvm={got[v]} ref={want}"
    for v in members:  # no false negatives, ever
        assert got[v] is True


def test_heavy_hitters_exact_at_any_width(spark):
    from topic_store_spark.operators.sketch import heavy_hitters

    rng = random.Random(0xC35)
    pool = [f"dom{i}" for i in range(30)]
    rows = []
    for _ in range(rng.randint(300, 800)):
        r = rng.random()
        if r < 0.05:
            rows.append((None,))
        elif r < 0.5:  # hot head
            rows.append((pool[rng.randint(0, 3)],))
        else:
            rows.append((rng.choice(pool),))
    min_count = rng.randint(2, 25)
    width = rng.choice([16, 64, 1 << 13])  # tiny widths force collisions
    depth = rng.choice([2, 4])

    counts = Counter(v for (v,) in rows)
    want = {v: n for v, n in counts.items() if n >= min_count}

    df = spark.createDataFrame(rows, "domain string")
    got = {
        r["value"]: r["n"]
        for r in heavy_hitters(
            df, "domain", min_count, width=width, depth=depth
        ).collect()
    }
    assert got == want, (
        f"width={width} depth={depth} T={min_count}: "
        f"extra={set(got) - set(want)} missing={set(want) - set(got)}"
    )
