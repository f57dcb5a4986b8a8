"""Differential test for NAMED-timezone date operators.

The engine localizes with the JVM's tzdb (`from_utc_timestamp` /
`to_utc_timestamp`); the oracle here is Python ``zoneinfo`` — an
independent implementation of the same IANA database.  Instants are
sampled randomly over four years PLUS a dense ±3 h scan around real
2021 DST transitions (spring gaps and fall overlaps), because that is
exactly where localization code silently diverges.

Resolution conventions both sides share (asserted, not assumed):

- spring-forward GAP: a nonexistent wall time resolves by the
  pre-transition offset, which lands past the gap (Java's standard
  resolution; Python ``fold=0`` computes the same UTC instant);
- fall-back OVERLAP: an ambiguous wall time takes the EARLIER offset
  (first occurrence; Python ``fold=0``).

Zones chosen for their edge cases: America/New_York (classic US DST),
Europe/London (UTC↔BST), Australia/Lord_Howe (+10:30/+11 — a
HALF-HOUR DST shift), Asia/Kolkata (+05:30 fixed, never DST),
America/Sao_Paulo (southern hemisphere; DST abolished 2019 — tests
historical-rule handling for 2018 instants).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone
from zoneinfo import ZoneInfo

from topic_store_spark.query.pipeline import apply_pipeline

ZONES = [
    "America/New_York",
    "Europe/London",
    "Australia/Lord_Howe",
    "Asia/Kolkata",
    "America/Sao_Paulo",
]

# 2021 transition instants (UTC) to scan densely around; Sao Paulo's
# last transition was 2018-11-04 (DST start, pre-abolition).
_TRANSITIONS_UTC = [
    datetime(2021, 3, 14, 7, 0),    # NY spring forward (02:00 EST)
    datetime(2021, 11, 7, 6, 0),    # NY fall back
    datetime(2021, 3, 28, 1, 0),    # London spring forward
    datetime(2021, 10, 31, 2, 0),   # London fall back
    datetime(2021, 4, 3, 15, 0),    # Lord Howe end of DST (+11 -> +10:30)
    datetime(2021, 10, 2, 16, 0),   # Lord Howe start of DST
    datetime(2018, 11, 4, 2, 0),    # Sao Paulo DST start (historical)
]


def _instants() -> list[datetime]:
    rng = random.Random(0xD57)
    base = datetime(2019, 1, 1)
    out = [
        base + timedelta(seconds=rng.randrange(4 * 365 * 86400))
        for _ in range(150)
    ]
    for t in _TRANSITIONS_UTC:
        for k in range(-6, 7):  # ±3 h in 30-min steps
            out.append(t + timedelta(minutes=30 * k))
    return out


def _expected(u_naive: datetime, zone: str) -> dict:
    tz = ZoneInfo(zone)
    u = u_naive.replace(tzinfo=timezone.utc)
    loc = u.astimezone(tz)
    wall = loc.replace(tzinfo=None)
    # $dateTrunc day: local midnight -> UTC (fold=0 = earlier offset)
    midnight = wall.replace(hour=0, minute=0, second=0, microsecond=0)
    trunc = (
        midnight.replace(tzinfo=tz, fold=0)
        .astimezone(timezone.utc)
        .replace(tzinfo=None)
    )
    # $dateAdd day 1: wall clock + 1 day -> UTC
    add1d = (
        (wall + timedelta(days=1))
        .replace(tzinfo=tz, fold=0)
        .astimezone(timezone.utc)
        .replace(tzinfo=None)
    )
    return {
        "hour": loc.hour,
        "minute": loc.minute,
        "day": loc.day,
        "month": loc.month,
        "year": loc.year,
        "str": wall.strftime("%Y-%m-%d %H:%M:%S"),
        "trunc": trunc,
        "add1d": add1d,
    }


def test_named_tz_ops_match_zoneinfo(spark):
    instants = _instants()
    df = spark.createDataFrame(
        [(i, t.strftime("%Y-%m-%dT%H:%M:%S")) for i, t in enumerate(instants)],
        "i int, t string",
    )
    proj: dict = {"i": 1}
    for zi, zone in enumerate(ZONES):
        d = {"date": "$ts", "timezone": zone}
        proj[f"h{zi}"] = {"$hour": d}
        proj[f"mi{zi}"] = {"$minute": d}
        proj[f"d{zi}"] = {"$dayOfMonth": d}
        proj[f"mo{zi}"] = {"$month": d}
        proj[f"y{zi}"] = {"$year": d}
        proj[f"s{zi}"] = {"$dateToString": {
            "date": "$ts", "format": "%Y-%m-%d %H:%M:%S", "timezone": zone}}
        proj[f"tr{zi}"] = {"$dateTrunc": {
            "date": "$ts", "unit": "day", "timezone": zone}}
        proj[f"a{zi}"] = {"$dateAdd": {
            "startDate": "$ts", "unit": "day", "amount": 1,
            "timezone": zone}}
        proj[f"p{zi}"] = {"$dateToParts": {"date": "$ts",
                                           "timezone": zone}}
    rows = apply_pipeline(
        df,
        [
            {"$addFields": {"ts": {"$dateFromString": {"dateString": "$t"}}}},
            {"$project": proj},
        ],
    ).collect()
    got = {r["i"]: r for r in rows}
    mismatches = []
    for i, t in enumerate(instants):
        r = got[i]
        for zi, zone in enumerate(ZONES):
            exp = _expected(t, zone)
            obs = {
                "hour": r[f"h{zi}"], "minute": r[f"mi{zi}"],
                "day": r[f"d{zi}"], "month": r[f"mo{zi}"],
                "year": r[f"y{zi}"], "str": r[f"s{zi}"],
                "trunc": r[f"tr{zi}"], "add1d": r[f"a{zi}"],
            }
            parts = r[f"p{zi}"].asDict()
            obs_parts = {
                k: parts[k] for k in ("year", "month", "hour", "minute")
            }
            obs_parts["day"] = parts["day"]
            exp_parts = {k: exp[k] for k in obs_parts}
            if obs != exp or obs_parts != exp_parts:
                mismatches.append((t.isoformat(), zone, exp, obs))
    assert not mismatches, mismatches[:5]
