"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed once to completion (foreach no-op sink — measures
full plan execution, not driver collect overhead, except aggregations
whose results are tiny and collected).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

HEADLINE = [
    "tpch_q1_pricing",
    "tpch_q3_topk",
    "region_revenue",
    "mongo_find_and_or",
    "mongo_pipeline_group",
    "mongo_pipeline_unwind",
    "mongo_pipeline_lookup",
    "mongo_pipeline_bucket",
    "json_props",
    "objectid_sessions",
    "flatten_dotted",
    "set_except",
    "anti_join_incremental",
    "session_summary",
    "sessionize",
    "latest_snapshot",
    "windowed_rates",
    # dedup_char_jaccard is oracle-checked at sf0.01 but excluded here:
    # the synthetic corpus has a ~50-word vocabulary, so char-5-gram
    # document frequencies hit 78% of the corpus and the exact all-pairs
    # variant degenerates to a 3x10^9-pair join by construction.  On real
    # prose (diverse n-grams) or with max_shingle_freq it is well-behaved.
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_topk",
    "ann_topk_partial",
    "ann_ivf",
    "text_quality",
    "text_stats",
    "text_fingerprints",
    # round 2: pipeline-dialect window/fill stages + corpus curation
    "mongo_window_fields",
    "mongo_fill_telemetry",
    "text_repetition",
    "pack_sequences",
    # round 3: PII redaction pass + incremental ingest dedup
    "pii_redact",
    "dedup_incremental",
    "contamination_ngram",
    "quality_funnel",
    "domain_topk",
    "mixture_sample",
    "dedup_semantic",
    "salient_terms",
    "merge_pairs",
    "length_percentiles",
    "split_report",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("topic-store-spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM (codegen, parquet reader, shuffle machinery) so timings
    # measure the engine, not first-query class loading.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    entry_mod.queries()["tpch_q1_pricing"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    queries = entry_mod.queries()
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    # Two interleaved rounds (AABB -> ABAB): a query's two samples land
    # minutes apart, so a transient host-load burst can spoil at most one
    # of them.  Per-query result is the min.  Every query is isolated in
    # try/except so one failure can never zero the whole bench (the r2
    # lesson): failures are recorded per-query and the JSON line is always
    # emitted.
    for round_idx in range(2):
        for name in HEADLINE:
            if name in errors:
                continue
            fn = queries[name]
            # drop blocks persisted by prior queries so each measurement
            # starts from storage, not from another query's cache
            spark.catalog.clearCache()
            t0 = time.time()
            try:
                df = fn(spark, sf_dir)
                # Execute the full plan; count() alone can prune work, so
                # write to a no-op sink.
                df.write.format("noop").mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001 - record, keep going
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                timings.pop(name, None)
                print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
                continue
            el = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, el), el)
            if round_idx:
                print(f"# {name}: {timings[name]:.2f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
