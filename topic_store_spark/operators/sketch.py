"""Count-min-sketch-pruned EXACT heavy hitters.

The frequent-items problem at 100 TB: "which tokens / domains / user
ids occur at least T times" via a naive ``groupBy(col).count()`` builds
a hash table over EVERY distinct value — for web-scale token vocabularies
that is billions of keys through a full shuffle, even though only a few
thousand survive the HAVING.  The classic two-pass fix (Cormode &
Muthukrishnan 2005) bounds the first pass by SKETCH size instead of key
cardinality:

1. **sketch pass**: each row increments ``depth`` counters at
   md5-derived positions; the only shuffle carries at most
   ``depth x width`` partial-aggregated rows (a few thousand — constant,
   regardless of data size), collected to ~128 KB on the driver;
2. **prune + exact pass**: the counters ride the plan as literal arrays;
   a row is a candidate iff ALL its ``depth`` counters reach the
   threshold (the CMS min-estimate).  CMS only ever OVER-estimates, so
   every truly-heavy value is a candidate — the exact
   ``groupBy().count()`` then runs over a relation whose distinct-key
   cardinality is tiny (true heavies + a collision sliver), with
   map-side partial aggregation doing almost all of it.

The output is EXACT (identical to ``GROUP BY ... HAVING count >= T`` —
that plain SQL is the carrier's oracle); the sketch is pure pruning, the
same role the Bloom filter plays in `operators/bloom.py`.  Positions
use the `hashing.mix_constants` universal family over 28-bit md5 keys —
portable, ANSI-overflow-safe integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from topic_store_spark.functions.hashing import MERSENNE31, mix_constants


def _key28(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 7), 16, 10).cast(
        "long"
    )


def _positions_from_key(key: Column, width: int, depth: int) -> list[Column]:
    """``depth`` probe positions from a STAGED 28-bit key attribute —
    integer mixing only.  The md5 runs once per row in the projection
    that materialized the key, not once per position (the same staging
    contract as ``hashing.shingle_keys``)."""
    return [
        F.pmod((key * F.lit(a) + F.lit(b)) % F.lit(MERSENNE31), F.lit(width))
        for a, b in mix_constants(depth)
    ]


def _positions(col: Column, width: int, depth: int) -> list[Column]:
    return _positions_from_key(_key28(col), width, depth)


def heavy_hitters(
    df: DataFrame,
    col: str,
    min_count: int,
    width: int = 1 << 13,
    depth: int = 4,
) -> DataFrame:
    """Every value of ``df[col]`` occurring at least ``min_count``
    times, with its EXACT count: ``(value, n)``.  ``width`` trades
    collision slivers (extra candidates surviving to the exact pass)
    against sketch size; guarantees are one-sided, so the result set is
    exact for any width."""
    from topic_store_spark.operators.util import ensure_parallelism

    # stage the 28-bit key once per row; every position is then integer
    # mixing over the staged attribute (one md5/row/pass, not depth).
    # NULL coalesces to a sentinel BEFORE hashing so the NULL group is
    # counted like any other (SQL GROUP BY keeps a NULL group; an
    # unguarded md5(NULL)=NULL would three-value-logic the candidate
    # predicate to NULL and silently drop the group).  A real value
    # colliding with the sentinel merely shares a counter — CMS only
    # over-estimates, so the result stays exact.
    # ensure_parallelism: both passes are CPU-bound scans — a
    # single-file parquet input must not serialize them onto one core.
    keyed = ensure_parallelism(df).select(
        F.col(col).alias("value"),
        _key28(
            F.coalesce(F.col(col).cast("string"), F.lit("\x00__cms_null__"))
        ).alias("_k"),
    )
    pos = _positions_from_key(F.col("_k"), width, depth)
    counters_rows = (
        keyed.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("d"), p.alias("pos")
                        )
                        for i, p in enumerate(pos)
                    ]
                )
            ).alias("c")
        )
        .groupBy("c.d", "c.pos")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    # pack each row's counters as 4-byte big-endian words in ONE binary
    # literal: bytes cross py4j in a single transfer, where an
    # equal-size array literal costs one driver round-trip per element.
    # Counts cap at 2^31-1 — the candidate test is `>= min_count`, so
    # capping never creates a false negative.
    cap = (1 << 31) - 1
    tables = [bytearray(4 * width) for _ in range(depth)]
    for r in counters_rows:
        n = min(r["n"], cap)
        off = 4 * r["pos"]
        tables[r["d"]][off : off + 4] = n.to_bytes(4, "big")

    cand = F.lit(True)
    for i, p in enumerate(pos):
        cnt = F.conv(
            F.hex(
                F.call_function(
                    "substring",
                    F.lit(tables[i]),
                    (p * 4 + 1).cast("int"),
                    F.lit(4),
                )
            ),
            16,
            10,
        ).cast("long")
        cand = cand & (cnt >= F.lit(min_count))
    return (
        keyed.filter(cand)
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )
