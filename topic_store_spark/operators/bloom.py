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

- **key**: first 7 md5 hex digits as a 28-bit integer
  (`hashing.shingle_keys` convention).  Collapsing keys to 28 bits adds
  a vanishing false-positive term (distinct keys collide with
  probability ~n²/2²⁹) and keeps every downstream multiply inside exact
  signed-64 arithmetic — ANSI-mode safe, no overflow wrap to reason
  about.
- **probe positions**: the `hashing.mix_constants` universal-hash family
  `((a_i*x + b_i) mod (2^31-1)) mod m` — k independent positions from
  one md5.
- **build**: explode k positions per key, map to (word=pos>>6,
  mask=1<<(pos&63)), one `bit_or` groupBy over at most m/64 word rows,
  collect the dense long[] (m=2^23 bits -> 128K longs = 1 MiB; bounded
  by the filter size, never by data size).
- **probe**: the long[] rides the plan as ONE array literal;
  membership = AND over k of `words[pos>>6] & (1<<(pos&63)) != 0` —
  whole-stage-codegen integer ops, no Python, no join.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from topic_store_spark.functions.hashing import MERSENNE31, mix_constants


@dataclass(frozen=True)
class BloomFilter:
    """Immutable built filter: ``num_bits`` is a power of two,
    ``words`` has exactly ``num_bits // 64`` entries."""

    num_bits: int
    num_hashes: int
    words: tuple[int, ...]


def _key28(col: Column) -> Column:
    """28-bit integer key (first 7 md5 hex digits) — shared convention
    with `hashing.shingle_keys` so multiplies never overflow."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 7), 16, 10).cast(
        "long"
    )


def _positions(col: Column, num_bits: int, num_hashes: int) -> list[Column]:
    key = _key28(col)
    m = F.lit(num_bits)
    return [
        F.pmod((key * F.lit(a) + F.lit(b)) % F.lit(MERSENNE31), m)
        for a, b in mix_constants(num_hashes)
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
    words = [0] * (num_bits // 64)
    for r in rows:
        words[r["word"]] = r["bits"]
    return BloomFilter(num_bits, num_hashes, tuple(words))


def bloom_contains(bf: BloomFilter, col: Column) -> Column:
    """Membership predicate: true for every inserted value (no false
    negatives), true for a ~1% sliver of others.  Pure codegen integer
    arithmetic against one broadcast array literal."""
    words = F.lit(list(bf.words))
    cond = F.lit(True)
    for pos in _positions(col, bf.num_bits, bf.num_hashes):
        word = F.element_at(words, (F.shiftright(pos, 6) + 1).cast("int"))
        mask = F.call_function(
            "shiftleft",
            F.lit(1).cast("bigint"),
            F.pmod(pos, F.lit(64)).cast("int"),
        )
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond
