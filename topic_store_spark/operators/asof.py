"""As-of (backward-looking temporal) join.

The canonical telemetry/training-data primitive Spark lacks as a
built-in: for every left row, find the single right row with the
greatest ``right_ts <= left_ts`` within the same key — "the last sensor
reading / price quote / model snapshot known at event time".  The
reference has no join engine at all (its J1/J2 are id-set anti-joins),
so this is a pure training-pipeline extension in the spirit of
SURVEY §2.4.

100 TB plan: the naive formulations are a range join (``l.ts >= r.ts``
theta-join — a per-key cross product) or a per-row correlated subquery —
both scale-killers.  This implementation is the distributed merge-join
shape instead:

1. reduce the right side to ONE row per (key, ts) with a deterministic
   ``max_by`` tie-break (exactly what any sane quote stream needs
   anyway);
2. tag-union both sides into one relation — quotes sort BEFORE probes
   at equal timestamps, giving inclusive ``>=`` semantics;
3. one shuffle on the key, one sort, one running
   ``last(struct(ts, values...), ignorenulls=True)`` window pass
   carries the latest quote forward into each probe row — the whole
   quote as one struct, so a null VALUE on the matched quote stays
   null instead of falling through to an older quote's payload
   (matched-row semantics, the same rows DuckDB's native ASOF JOIN
   produces; differentially fuzzed in tests/test_temporal_fuzz.py).

Cost: a single exchange + sort over |left| + |right'| rows — no pair
explosion, no driver loop.  Skew on the key column is the same
AQE/salting story as any keyed aggregation.

DuckDB implements ``ASOF JOIN`` natively with a different algorithm
(partitioned binary search), which makes it a genuinely independent
oracle for the carrier query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    tie_col: str | None = None,
    tolerance: Column | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: each ``left`` row gains ``<prefix><v>`` for
    every ``v`` in ``value_cols`` (and ``<prefix><right_ts>``, the
    matched quote's timestamp), taken from the latest ``right`` row at
    or before its ``left_ts`` with equal ``on`` key(s); null when no
    quote precedes it.

    ``tie_col``: deterministic winner among quotes sharing (key, ts) —
    the one with the greatest ``tie_col`` (required when duplicates are
    possible and reproducibility matters).  ``tolerance``: a Column in
    the timestamp's own algebra (``F.expr("INTERVAL 10 MINUTES")`` for
    timestamps, ``F.lit(600.0)`` for numeric epochs); matches older
    than ``left_ts - tolerance`` null out.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]

    # OUTPUT names are part of the caller's schema contract, so a
    # collision with an existing left column cannot be auto-renamed
    # away (r11 ADVICE: withColumn would silently overwrite the left
    # payload and the final select would emit the name twice).  Refuse
    # loudly; the caller picks a different ``prefix``.
    out_names = [f"{prefix}{right_ts}"] + [f"{prefix}{v}" for v in value_cols]
    clash = sorted(set(out_names) & set(left.columns))
    if clash:
        raise ValueError(
            f"asof_join output column(s) {clash} collide with left "
            f"columns; pass a different prefix= (current: {prefix!r})"
        )
    dup = sorted({n for n in out_names if out_names.count(n) > 1})
    if dup:
        raise ValueError(
            f"asof_join output column(s) {dup} generated more than once "
            f"(value_cols + right_ts overlap under prefix {prefix!r})"
        )

    # internal column names must not shadow any caller column (r10
    # ADVICE: a left payload column literally named "_asof_match" was
    # silently overwritten and the final select emitted the internal
    # struct in its place) — grow a suffix until every temp name is free
    taken = set(left.columns) | set(right.columns)
    sfx = ""
    def _collides(s: str) -> bool:
        return (
            any(n + s in taken for n in ("_asof_event_ts", "_asof_side", "_asof_match"))
            or any(f"_q_{v}{s}" in taken for v in value_cols)
        )
    while _collides(sfx):
        sfx += "_"
    ev_ts, side, match = f"_asof_event_ts{sfx}", f"_asof_side{sfx}", f"_asof_match{sfx}"
    qcol = {v: f"_q_{v}{sfx}" for v in value_cols}

    # 1. unique quote per (key, ts), deterministic under duplicates
    if tie_col is not None:
        aggs = [
            F.max_by(F.col(f"`{v}`"), F.col(f"`{tie_col}`")).alias(v)
            for v in value_cols
        ]
    else:
        aggs = [F.max(F.col(f"`{v}`")).alias(v) for v in value_cols]
    # a null-ts quote is "at or before" nothing — drop before the union,
    # or it would sort first and its payload would match null-ts probes
    quotes = (
        right.filter(F.col(f"`{right_ts}`").isNotNull())
        .groupBy(*[F.col(f"`{k}`") for k in keys],
                 F.col(f"`{right_ts}`").alias(ev_ts))
        .agg(*aggs)
    )

    # 2. tag-union: quotes carry the payload, probes carry the left row.
    #    side 0 sorts before 1 at equal ts -> inclusive ">=".
    left_payload = [c for c in left.columns]
    probe = left.select(
        *[F.col(f"`{c}`") for c in left_payload],
        F.col(f"`{left_ts}`").alias(ev_ts),
        F.lit(1).alias(side),
        *[F.lit(None).cast(quotes.schema[v].dataType).alias(qcol[v])
          for v in value_cols],
    )
    quote = quotes.select(
        *[
            F.col(f"`{c}`") if c in keys
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_payload
        ],
        F.col(ev_ts),
        F.lit(0).alias(side),
        *[F.col(f"`{v}`").alias(qcol[v]) for v in value_cols],
    )
    unioned = probe.unionByName(quote)

    # 3. one keyed window pass carries the latest quote forward.  The
    #    whole quote rides in ONE struct: `when(side == 0, struct(...))`
    #    is non-null for every quote row even when every payload field
    #    is null, so a probe always takes the MATCHED quote's values —
    #    filling each value column independently with
    #    `last(ignorenulls)` would skip a quote whose value is null and
    #    stitch an older quote's payload onto the matched timestamp, an
    #    inconsistent row no real quote stream contained (caught by
    #    tests/test_temporal_fuzz.py against the brute-force reference).
    ts_out = f"{prefix}{right_ts}"
    w = (
        Window.partitionBy(*[F.col(f"`{k}`") for k in keys])
        .orderBy(ev_ts, side)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(
        F.when(
            F.col(side) == 0,
            F.struct(
                F.col(ev_ts).alias("_ts"),
                # struct-field access below is getField (literal name),
                # so dotted value_cols are safe end-to-end (r10 ADVICE)
                *[F.col(f"`{qcol[v]}`").alias(qcol[v]) for v in value_cols],
            ),
        ),
        ignorenulls=True,
    ).over(w)
    filled = unioned.withColumn(match, matched).withColumn(
        ts_out, F.col(match)["_ts"]
    )
    for v in value_cols:
        filled = filled.withColumn(f"{prefix}{v}", F.col(match)[qcol[v]])

    out = filled.filter(F.col(side) == 1)
    if tolerance is not None:
        in_range = F.col(f"`{ts_out}`") >= F.col(f"`{left_ts}`") - tolerance
        for v in value_cols:
            out = out.withColumn(
                f"{prefix}{v}", F.when(in_range, F.col(f"`{prefix}{v}`"))
            )
        out = out.withColumn(
            ts_out, F.when(in_range, F.col(f"`{ts_out}`"))
        )
    return out.select(
        *[F.col(f"`{c}`") for c in left_payload],
        F.col(f"`{ts_out}`"),
        *[F.col(f"`{prefix}{v}`") for v in value_cols],
    )
