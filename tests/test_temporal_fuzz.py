"""Differential fuzzer for the temporal join operators (`operators/
asof.py`, `operators/interval.py`): random event/quote/interval tables
— tied timestamps, duplicate quotes, null values, null timestamps,
zero-length and inverted intervals, negative coordinates — evaluated
by the real operators and by brute-force pure-Python references of the
documented semantics.

The as-of reference is MATCHED-ROW semantics: the probe takes the
latest at-or-before quote's value even when that value is NULL (the
row a `DuckDB ASOF JOIN` would produce); a fill that skips null values
would stitch one quote's timestamp to an older quote's payload — an
inconsistent row no real quote stream ever contained.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

_KEYS = ["k0", "k1", "k2"]


# -- as-of join ---------------------------------------------------------------


def _gen_asof(rng: random.Random):
    ts_pool = [float(t) for t in range(0, 40, 2)]
    left = []
    for i in range(80):
        left.append(
            (
                i,
                rng.choice(_KEYS),
                None if rng.random() < 0.05 else rng.choice(ts_pool) + rng.choice([0.0, 1.0]),
            )
        )
    right = []
    for j in range(60):
        right.append(
            (
                rng.choice(_KEYS),
                None if rng.random() < 0.05 else rng.choice(ts_pool),
                None if rng.random() < 0.25 else rng.randint(0, 9),
                None if rng.random() < 0.25 else rng.choice(["a", "bb", "z"]),
                j,  # unique tie-breaker
            )
        )
    return left, right


def _ref_asof(left, right, use_tie: bool, tol: float | None):
    # 1. one quote per (key, ts)
    groups: dict[tuple, list[tuple]] = {}
    for key, ts, vi, vs, tie in right:
        if ts is None:
            continue  # a null-ts quote precedes nothing
        groups.setdefault((key, ts), []).append((vi, vs, tie))
    quotes: dict[tuple, tuple] = {}
    for k, rows in groups.items():
        if use_tie:
            vi, vs, _ = max(rows, key=lambda r: r[2])
        else:
            vis = [r[0] for r in rows if r[0] is not None]
            vss = [r[1] for r in rows if r[1] is not None]
            vi = max(vis) if vis else None
            vs = max(vss) if vss else None
        quotes[k] = (vi, vs)

    out = {}
    for i, key, lts in left:
        cand = [
            ts for (k, ts) in quotes if k == key and lts is not None and ts <= lts
        ]
        if not cand:
            out[i] = (None, None, None)
            continue
        qts = max(cand)
        vi, vs = quotes[(key, qts)]
        if tol is not None and qts < lts - tol:
            out[i] = (None, None, None)
        else:
            out[i] = (qts, vi, vs)
    return out


def test_asof_join_matches_reference(spark):
    from topic_store_spark.operators.asof import asof_join

    rng = random.Random(0xA50F)
    left, right = _gen_asof(rng)
    ldf = spark.createDataFrame(left, "event_id long, key string, ts double")
    rdf = spark.createDataFrame(
        right, "key string, ts double, v_int int, v_str string, tie long"
    )

    failures: list[str] = []
    for use_tie, tol in [(True, None), (False, None), (True, 6.0)]:
        got = {
            r["event_id"]: (r["asof_ts"], r["asof_v_int"], r["asof_v_str"])
            for r in asof_join(
                ldf,
                rdf,
                on="key",
                value_cols=["v_int", "v_str"],
                tie_col="tie" if use_tie else None,
                tolerance=F.lit(tol) if tol is not None else None,
            ).collect()
        }
        want = _ref_asof(left, right, use_tie, tol)
        assert set(got) == set(want)
        for i in want:
            if got[i] != want[i]:
                failures.append(
                    f"tie={use_tie} tol={tol} event {i} "
                    f"(key={left[i][1]} ts={left[i][2]}): "
                    f"spark={got[i]} ref={want[i]}"
                )
    assert not failures, "\n".join(failures[:20])


# -- interval join ------------------------------------------------------------


def test_interval_join_matches_reference(spark):
    from topic_store_spark.operators.interval import interval_join

    rng = random.Random(0x17E4)
    events = []
    for i in range(120):
        events.append(
            (
                i,
                rng.choice(_KEYS),
                None
                if rng.random() < 0.04
                else round(rng.uniform(-20.0, 60.0), 2),
            )
        )
    intervals = []
    for j in range(70):
        start = round(rng.uniform(-25.0, 55.0), 2)
        r = rng.random()
        if r < 0.08:
            end = start  # zero-length: matches nothing (half-open)
        elif r < 0.14:
            end = start - rng.uniform(0.5, 5.0)  # inverted: matches nothing
        else:
            end = start + rng.uniform(0.1, 25.0)
        if rng.random() < 0.04:
            start = None
        if rng.random() < 0.04:
            end = None
        intervals.append((j, rng.choice(_KEYS), start, end))

    want = {
        (i, j)
        for i, ek, ts in events
        for j, ik, s, e in intervals
        if ts is not None
        and s is not None
        and e is not None
        and ek == ik
        and s <= ts < e
    }

    edf = spark.createDataFrame(events, "event_id long, key string, ts double")
    idf = spark.createDataFrame(
        intervals, "iv_id long, key string, start double, end double"
    )
    for bw in (None, 0.5, 3.0, 50.0):
        got = {
            (r["event_id"], r["iv_id"])
            for r in interval_join(edf, idf, on="key", bin_width=bw).collect()
        }
        assert got == want, (
            f"bin_width={bw}: extra={got - want} missing={want - got}"
        )
