"""Z-order (Morton) clustering for multi-column scan pruning.

Parquet pruning is only as good as the correlation between file/row-group
min-max ranges and the query predicate.  Sorting the corpus by ONE
column makes that column prunable and destroys locality on every other;
interleaving the bits of several normalized key columns into one Morton
code and range-partitioning on IT gives every participating column
partial locality — a filter on ANY of them skips most files (the
layout behind Delta's ``OPTIMIZE ZORDER BY`` and ClickHouse's
``mortonEncode``, rebuilt here on public DataFrame primitives).

Pieces:

- ``zvalue(cols, bits)`` — a pure JVM expression: bit ``i`` of
  normalized column ``j`` lands at interleaved position
  ``i * n_cols + j``.
- ``write_zordered(df, path, cols)`` — QUANTILE-normalizes each column
  (equal mass per code, robust under skew — min-max scaling would let
  one outlier collapse everything into a single code prefix): one
  ``approxQuantile`` pass computes ``2^bits - 1`` boundaries per column
  as driver scalars, the bucket lookup is a map-side fold over the
  boundary literal.  Then ``repartitionByRange(z)`` + in-partition sort
  + parquet write.  NO global window anywhere — the only shuffle is the
  range exchange itself.

Write cost: layout jobs are the textbook batch-maintenance trade — one
stats pass and one range shuffle, amortized over every later
multi-predicate scan.  ``test_zorder.py`` measures the effect straight
from parquet footers: per-file min-max spread on BOTH columns collapses
vs. a single-column sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: list[Column | str], bits: int = 8) -> Column:
    """Morton interleave of ``len(cols)`` ALREADY-NORMALIZED integer
    columns (each in ``[0, 2^bits)``): bit ``i`` of column ``j`` maps to
    output bit ``i * n + j``.  Pure shift/mask expression — codegen'd,
    no Python."""
    n = len(cols)
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    z = F.lit(0).cast("long")
    for j, c in enumerate(cs):
        for i in range(bits):
            z = z + (
                F.shiftleft(
                    F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1)),
                    i * n + j,
                )
            )
    return z


def quantile_bucket(col: Column, boundaries: list[float]) -> Column:
    """Map ``col`` to ``[0, len(boundaries)]`` by counting boundaries at
    or below it — a fold over one literal array (codegen; 2^bits - 1
    comparisons per row, no join, no window)."""
    return F.aggregate(
        F.lit([float(b) for b in boundaries]),
        F.lit(0).cast("long"),
        lambda acc, b: acc
        + F.when(col.cast("double") >= b, 1).otherwise(0).cast("long"),
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int = 16,
    relative_error: float = 0.001,
) -> None:
    """Quantile-normalize ``cols``, range-partition by their Morton code
    into ``num_files`` output files, sort within partitions, write
    parquet (see module doc for the cost model)."""
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    quantiles = df.approxQuantile(cols, probs, relative_error)
    z = zvalue(
        [quantile_bucket(F.col(c), qs) for c, qs in zip(cols, quantiles)],
        bits,
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
