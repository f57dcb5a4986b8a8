"""Interleaved same-session A/B harness (r10 VERDICT next-round #1/#2).

Measures ONE query under two code variants toggled between executions in
one Spark session, interleaved A B A B ... with the cache cleared before
every execution — the only protocol under which a per-query delta on
this host means anything: the r10 closing bench's noise band (13.6%)
swallowed every sub-second claim made from separate runs.

The stamp rule: a verdict ("a_faster"/"b_faster") is recorded ONLY when
the median delta exceeds the larger variant's steady-state spread;
otherwise the result is "unresolved" and the JSON says so — prose must
not claim a win the error bar cannot support.

Default experiment: dedup_word_overlap with the PPJoin join-time cuts
ON (HEAD) vs OFF (pre-0ea8df7 candidate join), which the r10 review
flagged as unreconciled (commit claimed 6.1-6.3s -> 4.2-4.4s; every
committed HEAD sample was >= 6.87s).  Output row counts are asserted
equal across variants (the cuts are candidate-pruning only).

Writes BENCH_AB.json at the repo root; bench.py folds it into
BENCH_detail.json under "ab" so the receipt travels with the bench.

Usage: python tools/ab_bench.py [sf_dir] [rounds_per_variant] [experiment]

Experiments: ``ppjoin`` (default — PPJOIN_CUTS on/off) and ``aqefloor``
(``spark.sql.adaptive.coalescePartitions.minPartitionSize`` 64k vs the
1m default, flipped per execution via runtime conf — the r11 session
fix's own receipt).  ``ppjoin`` writes BENCH_AB.json (folded into
BENCH_detail.json by bench.py); other experiments write
BENCH_AB_<name>.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

QUERY = "dedup_word_overlap"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    experiment = sys.argv[3] if len(sys.argv) > 3 else "ppjoin"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod
    from topic_store_spark.operators import dedup
    from topic_store_spark.operators.util import cache_scope

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab_bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = entry_mod.queries()[QUERY]

    _FLOOR = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    experiments = {
        "ppjoin": {
            "label": "PPJoin join-time cuts (0ea8df7) on/off",
            "variants": {
                "ppjoin_on": lambda: setattr(dedup, "PPJOIN_CUTS", True),
                "ppjoin_off": lambda: setattr(dedup, "PPJOIN_CUTS", False),
            },
        },
        "aqefloor": {
            "label": f"{_FLOOR} 64k (r11 session default) vs 1m (Spark default)",
            "variants": {
                "floor_64k": lambda: spark.conf.set(_FLOOR, "64k"),
                "floor_1m": lambda: spark.conf.set(_FLOOR, "1m"),
            },
        },
    }
    exp = experiments[experiment]
    variants = exp["variants"]

    def run_once(setup) -> tuple[float, int]:
        setup()
        spark.catalog.clearCache()
        with cache_scope():
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            return time.time() - t0, n

    # one untimed warmup per variant (codegen/shuffle machinery)
    rows = {}
    for name, setup in variants.items():
        _, rows[name] = run_once(setup)
    assert len(set(rows.values())) == 1, f"variant outputs differ: {rows}"

    # alternate the within-round order (A,B then B,A ...): with a fixed
    # order, any monotone host drift (JIT/page-cache warming, load decay)
    # systematically biases whichever variant runs second — the first
    # r11 run of this harness showed exactly that artifact.
    samples: dict[str, list[float]] = {n: [] for n in variants}
    names = list(variants)
    for round_idx in range(n_rounds):
        order = names if round_idx % 2 == 0 else names[::-1]
        for name in order:
            sec, n = run_once(variants[name])
            assert n == rows[name]
            samples[name].append(round(sec, 3))
            print(f"# {name}: {sec:.2f}s", file=sys.stderr)
    # restore production defaults no matter which variant ran last
    dedup.PPJOIN_CUTS = True
    spark.conf.set(_FLOOR, "64k")

    def stats(s: list[float]) -> dict:
        steady = sorted(s)[:-1] if len(s) > 2 else sorted(s)
        return {
            "min": min(s),
            "median": round(statistics.median(s), 3),
            "spread_steady": round(max(steady) - min(steady), 3),
            "samples": s,
        }

    st = {n: stats(s) for n, s in samples.items()}
    a, b = names[0], names[1]
    delta = round(st[b]["median"] - st[a]["median"], 3)  # >0: A faster
    bar = max(st[a]["spread_steady"], st[b]["spread_steady"])
    if abs(delta) <= bar:
        verdict = "unresolved"
        note = (f"median delta {delta}s is within the steady-state spread "
                f"{bar}s — no claim stamped")
    else:
        verdict = f"{a if delta > 0 else b}_faster"
        note = (f"median delta {delta}s exceeds the steady-state spread "
                f"{bar}s")
    out = {
        "query": QUERY,
        "experiment": exp["label"],
        "protocol": (
            f"interleaved same-session, 1 untimed warmup + {n_rounds} "
            "timed rounds per variant, per-round order alternation, "
            "cache cleared per execution, output row counts asserted "
            "equal"
        ),
        "sf_dir": sf_dir,
        "rows": rows[a],
        "variants": st,
        f"median_delta_sec_{a}_minus_{b}": -delta,
        "verdict": verdict,
        "note": note,
    }
    fname = ("BENCH_AB.json" if experiment == "ppjoin"
             else f"BENCH_AB_{experiment}.json")
    with open(os.path.join(_REPO, fname), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({k: out[k] for k in
                      ("query", "verdict", "note", "rows")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
