"""Distributed Bloom filter: build as a DataFrame aggregation, probe as
a broadcast JVM predicate.

The incremental-ingest dedup operators join a small NEW batch against a
standing corpus (`dedup.exact_duplicates_incremental`,
`dedup.minhash_lsh_pairs_incremental`).  At 100 TB the corpus side of
that join is the cost: even with the batch semi-joined first, every
corpus row's fingerprint/band key must reach a shuffle (or the batch key
set must broadcast exactly, which stops fitting once batches reach tens
of millions of keys).  A Bloom filter over the BATCH keys is the classic
runtime filter for exactly this shape: ~10 bits per batch key
(for ~1% false positives) instead of the exact key set, broadcast once,
applied map-side to the corpus scan — corpus rows that cannot collide
with the batch never enter the shuffle.  False positives only let a few
extra corpus rows through to the exact equi-join (where they match
nothing); false negatives are impossible, so operator results are
bit-identical with the filter on or off (`test_bloom.py` proves both).

The reference engine has no analog (its incremental clone is an exact
id-list anti-join, reference convert.py:72); this is Spark-shape
infrastructure in the spirit of Spark's own
`InjectRuntimeFilter`/`BloomFilterAggregate`, re-built on public
DataFrame primitives so the pipeline controls when it applies:

- **key**: TWO independent 28-bit integers (md5 hex digits 1-7 and
  8-14), each hashed with its own universal-hash constants and the
  results combined mod 2^31-1 — a 56-bit effective key.  A single
  28-bit key would put an n/2^28 floor under the false-positive rate
  (~4% at 10M keys) regardless of filter size; splitting keeps every
  multiply inside exact signed-64 arithmetic (28-bit key x 31-bit
  constant < 2^59) while pushing the key-collision term to ~n/2^56 —
  negligible at any batch size the filter itself can serve.
- **probe positions**: the `hashing.mix_constants` universal-hash family
  `((a_i*x + b_i) mod (2^31-1)) mod m` — k independent positions from
  one md5.
- **build**: explode k positions per key, map to (word=pos>>6,
  mask=1<<(pos&63)), one `bit_or` groupBy over at most m/64 word rows,
  collected and packed into a dense byte blob (m=2^23 bits -> 1 MiB;
  bounded by the filter size, never by data size).
- **probe**: the bitset rides the plan as ONE BinaryType literal —
  bytes cross py4j in a single transfer, where an equal-size array
  literal costs one driver round-trip PER ELEMENT (measured: 71 s for
  131k longs vs 0.5 s as bytes).  Membership = AND over k of
  `(blob[pos>>3] >> (pos&7)) & 1`, extracted with
  `conv(hex(substring(blob, byte, 1)))` — whole-stage-codegen, no
  Python, no join.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from topic_store_spark.functions.hashing import MERSENNE31, mix_constants


@dataclass(frozen=True)
class BloomFilter:
    """Immutable built filter: ``num_bits`` is a power of two, ``blob``
    is the dense bitset (``num_bits // 8`` bytes; bit ``p`` lives at
    ``blob[p >> 3] >> (p & 7)``)."""

    num_bits: int
    num_hashes: int
    blob: bytes


def _keys56(col: Column) -> tuple[Column, Column]:
    """Two independent 28-bit integer keys (md5 hex digits 1-7 / 8-14)
    from ONE md5 — a 56-bit effective key split so each half's
    universal-hash multiply stays inside exact signed-64 arithmetic."""
    h = F.md5(col.cast("string"))
    return (
        F.conv(F.substring(h, 1, 7), 16, 10).cast("long"),
        F.conv(F.substring(h, 8, 7), 16, 10).cast("long"),
    )


def _positions(col: Column, num_bits: int, num_hashes: int) -> list[Column]:
    k1, k2 = _keys56(col)
    m = F.lit(num_bits)
    consts = mix_constants(2 * num_hashes)
    return [
        F.pmod(
            (
                (k1 * F.lit(a1) + F.lit(b1)) % F.lit(MERSENNE31)
                + (k2 * F.lit(a2) + F.lit(b2)) % F.lit(MERSENNE31)
            )
            % F.lit(MERSENNE31),
            m,
        )
        for (a1, b1), (a2, b2) in zip(
            consts[:num_hashes], consts[num_hashes:]
        )
    ]


def _pow2_at_least(n: int) -> int:
    m = 1 << 14
    while m < n:
        m <<= 1
    return m


def bloom_build(
    df: DataFrame,
    col: str,
    expected_items: int | None = None,
    bits_per_item: int = 10,
    num_hashes: int = 7,
    max_bits: int = 1 << 27,
) -> BloomFilter:
    """Build a Bloom filter over ``df[col]`` (typically the small/batch
    side of an incremental join).

    ``expected_items`` sizes the filter (``num_bits`` = next power of
    two >= ``bits_per_item * expected_items``, capped at ``max_bits`` =
    16 MiB of words); when omitted, one ``count()`` job runs first —
    pass the batch row count when you already know it.  10 bits/item
    with k=7 gives ~1% false positives; an overfull filter degrades to
    more false positives, never to false negatives.
    """
    if expected_items is None:
        expected_items = df.count()
    num_bits = min(_pow2_at_least(bits_per_item * max(1, expected_items)),
                   max_bits)
    pos = F.explode(
        F.array(*_positions(F.col(col), num_bits, num_hashes))
    ).alias("pos")
    rows = (
        df.select(pos)
        .select(
            F.shiftright(F.col("pos"), 6).alias("word"),
            F.expr(
                "shiftleft(cast(1 as bigint), cast(pmod(pos, 64) as int))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    arr = bytearray(num_bits // 8)
    for r in rows:
        bits = r["bits"] & ((1 << 64) - 1)
        base = r["word"] * 8
        for k in range(8):
            byte = (bits >> (8 * k)) & 0xFF
            if byte:
                arr[base + k] = byte
    return BloomFilter(num_bits, num_hashes, bytes(arr))


def bloom_contains(bf: BloomFilter, col: Column) -> Column:
    """Membership predicate: true for every inserted value (no false
    negatives), true for a ~1% sliver of others.  Pure codegen
    arithmetic against one broadcast binary literal."""
    blob = F.lit(bytearray(bf.blob))
    cond = F.lit(True)
    for pos in _positions(col, bf.num_bits, bf.num_hashes):
        byte = F.conv(
            F.hex(
                F.call_function(
                    "substring",
                    blob,
                    (F.shiftright(pos, 3) + 1).cast("int"),
                    F.lit(1),
                )
            ),
            16,
            10,
        ).cast("int")
        bit = F.call_function(
            "shiftright", byte, F.pmod(pos, F.lit(8)).cast("int")
        ).bitwiseAND(F.lit(1))
        cond = cond & (bit == 1)
    return cond
