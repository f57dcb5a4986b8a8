"""Dump ``df.explain("formatted")`` for declared queries to files.

Round-13 deliverable helper: writes ``plans/<tag>/<query>_<suffix>.txt``
for every requested query (default: all of ``queries()``), so the
before/after plan evidence for each optimization is committed verbatim.

Usage:
    python tools/dump_plans.py <tag> <suffix> [sf_dir] [query ...]
e.g.
    python tools/dump_plans.py r13 before /root/testdata/sf0.01
    python tools/dump_plans.py r13 after  /root/testdata/sf0.01 ann_pq
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    names = sys.argv[4:]

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod
    from tools.audit_plans import _plan_text

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dump-plans")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(_REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    queries = entry_mod.queries()
    if not names:
        names = list(queries)
    from topic_store_spark.operators.util import cache_scope

    for name in names:
        with cache_scope():
            try:
                df = queries[name](spark, sf_dir)
                text = _plan_text(df)
            except Exception as exc:  # noqa: BLE001 - record the failure
                text = f"ERROR building plan: {type(exc).__name__}: {exc}\n"
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(text)
            print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
