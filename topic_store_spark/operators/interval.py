"""Binned interval (range) join: events against [start, end) windows.

The second temporal primitive Spark lacks as a built-in (sibling of
`operators/asof.py`): for every left "event" row, find the right
"interval" rows with the same key whose ``start <= ts < end`` —
promo-window attribution, session-window annotation, sensor-validity
lookup.  The reference engine has no join surface at all, so like the
as-of join this is a training-pipeline extension (SURVEY §2.4 J+).

100 TB plan — the naive formulations fail differently:

- a theta-join ``l.key = r.key AND l.ts >= r.start AND l.ts < r.end``
  degenerates to a per-key cross product (Spark plans BroadcastNestedLoop
  or a shuffled cartesian per key);
- per-row correlated subqueries don't exist in the DataFrame algebra.

This is the standard **bin-and-equi-join** decomposition instead: pick a
bin width ``w``, give every event its single bin ``floor(ts / w)``,
explode every interval to the bin range it overlaps, then one hash
equi-join on ``(key, bin)`` plus the exact residual range predicate.
Each matching (event, interval) pair meets in EXACTLY one bin — the
event's — so no post-join dedup is needed.  Cost: |left| + |right| ×
(interval_len / w + 1) rows through one shuffle; ``w`` near the median
interval length keeps the explode factor ~2 while a narrower ``w``
trims residual-filter misses.  ``bin_width=None`` measures the median
length with one tiny ``approx_percentile`` job over the interval table
(driver-side scalar, never per-row).

DuckDB plans the same query as an IEJoin (sort-based inequality join) —
an independent algorithm, which is what makes the carrier's oracle a
real check of the semantics rather than of the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_start: str = "start",
    right_end: str = "end",
    bin_width: float | None = None,
) -> DataFrame:
    """Inner join of events to every same-key interval containing them
    (``start <= ts < end``, the half-open convention).  ``left_ts``,
    ``right_start``, ``right_end`` must be numeric (cast timestamps to
    epoch seconds upstream; binning needs an algebra with division).

    Returns all left columns plus the interval's columns (start/end
    included).  Column-name collisions between the two sides (other
    than the keys) must be resolved upstream.
    """
    keys = [on] if isinstance(on, str) else list(on)

    if bin_width is None:
        med = right.select(
            F.expr(
                f"approx_percentile({right_end} - {right_start}, 0.5)"
            ).alias("m")
        ).first()["m"]
        bin_width = float(med) if med and med > 0 else 1.0

    w = F.lit(float(bin_width))
    # floor(end/w) is kept even when end sits exactly on the bin edge:
    # one spurious bin row per such interval, removed by the residual
    # predicate — cheaper than an exactness epsilon.
    binned_right = right.withColumn(
        "_iv_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(right_start) / w),
                F.floor(F.col(right_end) / w),
            )
        ),
    )
    binned_left = left.withColumn("_iv_bin", F.floor(F.col(left_ts) / w))
    return (
        binned_left.join(binned_right, [*keys, "_iv_bin"])
        .filter(
            (F.col(left_ts) >= F.col(right_start))
            & (F.col(left_ts) < F.col(right_end))
        )
        .drop("_iv_bin")
    )
