"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row-count, column-name
set, and an order-insensitive canonical value hash (columns sorted by
name, rows sorted by their canonical string).

Usage:  python tools/validate_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as _dt
import decimal
import hashlib
import math
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _canon_strict(v) -> str:
    """Driver-faithful canonicalization: plain ``str()`` of whatever Python
    object the engine's pandas conversion hands back — NO numeric coercion.

    This is deliberately type-sensitive: a Spark ``Decimal('3.00')`` and a
    DuckDB HUGEINT/DECIMAL(38,2)-turned-``float64 3.0`` must NOT hash equal,
    because the driver's gate (CORRECTNESS_r01) distinguished exactly that.
    Only structural containers (numpy arrays vs lists) and null spellings
    are normalized, since those conversions are representation-neutral.
    """
    import numpy as np

    if v is None:
        return "\\N"
    if isinstance(v, (np.bool_, bool)):
        return "true" if bool(v) else "false"
    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, np.integer):
        v = int(v)
    if isinstance(v, float):
        return "nan" if math.isnan(v) else str(v)
    if isinstance(v, _dt.datetime):
        return str(v.replace(tzinfo=None))
    if isinstance(v, np.ndarray):
        return "[" + ",".join(_canon_strict(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_strict(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    try:  # pandas NaT / NA
        import pandas as pd

        if v is pd.NaT or v is pd.NA:
            return "\\N"
        if isinstance(v, pd.Timestamp):
            return str(v.tz_localize(None) if v.tzinfo else v)
    except Exception:  # noqa: BLE001
        pass
    return str(v)


def _hash_rows(cols, rows) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(lines), h


def _hash_pdf_strict(pdf) -> str:
    """Order-insensitive strict hash of a pandas DataFrame (cols sorted by
    name, rows sorted by canonical line) — mimics the driver's value gate."""
    cols = sorted(pdf.columns)
    it = (tuple(row) for row in pdf[cols].itertuples(index=False, name=None))
    lines = sorted("\x01".join(_canon_strict(v) for v in row) for row in it)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main() -> int:
    # CLI: [sf_dir] [query ...] with optional --sf DIR / --only a,b,c
    # flag forms.  Unknown flags abort: a typo'd invocation must never
    # report a vacuous "0 failures".
    args = sys.argv[1:]
    sf_dir, names = "/root/testdata/sf0.01", []
    positional: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif a == "--only":
            names.extend(args[i + 1].split(","))
            i += 2
        elif a.startswith("--"):
            print(f"unknown flag: {a}", file=sys.stderr)
            return 2
        else:
            positional.append(a)
            i += 1
    if positional:
        sf_dir = positional[0]
        names.extend(positional[1:])
    only = set(names)
    if not os.path.isdir(sf_dir):
        print(f"sf_dir does not exist: {sf_dir}", file=sys.stderr)
        return 2

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("validate")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    unknown = only - set(queries)
    if unknown:
        print(f"unknown query names: {sorted(unknown)}", file=sys.stderr)
        return 2
    from topic_store_spark.operators.util import cache_scope

    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            # scope tracked persists per query so 50 queries don't
            # accumulate stale pinned relations in one session (r11)
            with cache_scope():
                sdf = fn(spark, sf_dir)
                s_cols = list(sdf.columns)
                s_rows = [tuple(r) for r in sdf.collect()]
                s_n, s_h = _hash_rows(s_cols, s_rows)
                s_pdf = sdf.toPandas()
                s_hs = _hash_pdf_strict(s_pdf)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={s_n} (no oracle; rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
            d_n, d_h = _hash_rows(d_cols, d_rows)
            d_pdf = con.execute(oracles[name]).df()
            d_hs = _hash_pdf_strict(d_pdf)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        schema_ok = sorted(s_cols) == sorted(d_cols)
        if s_n == d_n and s_h == d_h and s_hs == d_hs and schema_ok:
            print(f"ok   {name}: rows={s_n} hash={s_h}/{s_hs} "
                  f"[{time.time()-t0:.1f}s]")
        else:
            why = []
            if s_h != d_h:
                why.append("lenient-hash")
            if s_hs != d_hs:
                why.append("STRICT-hash (driver-style pandas/str)")
            if not schema_ok:
                why.append("schema")
            if s_n != d_n:
                why.append("rows")
            print(
                f"FAIL {name} [{', '.join(why)}]: "
                f"spark(rows={s_n}, hash={s_h}/{s_hs}, cols={sorted(s_cols)})"
                f" vs duckdb(rows={d_n}, hash={d_h}/{d_hs}, cols={sorted(d_cols)})"
            )
            failures.append(name)

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
