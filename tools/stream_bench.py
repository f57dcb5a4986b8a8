"""Structured-streaming throughput micro-bench — the rate evidence the
functional streaming tests don't give.

Drives the three stateful streaming stages with ``availableNow``
triggers over sf-scale data and records rows/s per stage in
``STREAMBENCH.md`` (+ one JSON line on stdout, the `bench.py`
convention).  Mirrors the reference's only performance artifact — its
FPSCounter rate readout (reference load_balancer.py:28-73) — but
measured over the whole micro-batch pipeline, not one counter.

Stages:

- ``rate_monitor_stream``: watermark + windowed count/hz per topic
  (shuffle-bound windowed aggregation);
- ``fps_counter_stream``: ``applyInPandasWithState`` sliding-interval
  rate (Arrow + per-key state, the custom-stateful-operator path);
- ``near_dedup_ingest_stream``: per-batch MinHash signing, LSH query
  against a standing parquet index, anti-join, store+index append —
  the full incremental-ingest shape.

Usage: python tools/stream_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _events_source_dir(spark, sf_dir: str, n_files: int = 8) -> tuple[str, int]:
    """Stage events into a temp dir the file-streaming source can list
    (micros timestamps; ``n_files`` splits so maxFilesPerTrigger can
    shape micro-batches)."""
    from topic_store_spark.tables import load_table

    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    # watermarks require TIMESTAMP (with zone), not the NTZ type the
    # nanos-workaround loader produces
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    n = ev.count()
    path = tempfile.mkdtemp(prefix="tss_stream_ev_")
    ev.repartition(n_files).write.mode("overwrite").parquet(path)
    return path, n


def bench_rate_monitor(spark, src: str, n_rows: int) -> dict:
    from topic_store_spark.streaming.monitor import rate_monitor_stream

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = rate_monitor_stream(
        stream, topic_col="event_type", ts_col="ts",
        window="60 seconds", watermark="120 seconds",
    )
    ckpt = tempfile.mkdtemp(prefix="tss_ck_rm_")
    t0 = time.monotonic()
    q = (
        out.writeStream.outputMode("append")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    el = time.monotonic() - t0
    return {"stage": "rate_monitor_stream", "rows": n_rows,
            "sec": round(el, 2), "rows_per_sec": round(n_rows / el)}


def bench_fps_counter(spark, src: str, n_rows: int) -> dict:
    from topic_store_spark.streaming.fps import fps_counter_stream

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = fps_counter_stream(stream, topic_col="event_type", ts_col="ts")
    ckpt = tempfile.mkdtemp(prefix="tss_ck_fps_")
    t0 = time.monotonic()
    q = (
        out.writeStream.outputMode("update")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    el = time.monotonic() - t0
    return {"stage": "fps_counter_stream", "rows": n_rows,
            "sec": round(el, 2), "rows_per_sec": round(n_rows / el)}


def bench_near_dedup_ingest(spark, sf_dir: str) -> dict:
    import topic_store_spark as ts
    from pyspark.sql import functions as F

    from topic_store_spark.operators.index import MinHashIndex
    from topic_store_spark.streaming.ingest import near_dedup_ingest_stream
    from topic_store_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    work = tempfile.mkdtemp(prefix="tss_ingest_")
    # default r6 config: 60-bit keyed shingles (3x smaller index IO) +
    # append_cached (survivors reuse the query's signatures, no
    # re-signing).  The hash-partitioned layout (partitions=16) is the
    # at-scale option — measured here it LOSES (~280 vs ~600 rows/s)
    # because this bench's batch is corpus-sized so pruning skips
    # nothing and the partitioned read/write overhead is pure cost; it
    # wins when batch << corpus (the production ratio).
    idx = MinHashIndex.build(docs, os.path.join(work, "idx"))
    store = ts.load(os.path.join(work, "store.parquet"), spark)

    # the batch: half near-dup clones of the corpus (must be dropped by
    # the index query), half novel docs (must survive) — the realistic
    # ingest mix, sized at the full corpus
    clones = docs.select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" qq ww")).alias("text"),
    ).filter(F.col("doc_id") % 2 == 0)
    novel = docs.select(
        (F.col("doc_id") + 400000).alias("doc_id"),
        F.concat(
            F.lit("novel "), F.col("doc_id").cast("string"), F.lit(" "),
            F.reverse(F.col("text")),
        ).alias("text"),
    ).filter(F.col("doc_id") % 2 == 1)
    batch = clones.unionByName(novel)
    n_in = batch.count()
    src = os.path.join(work, "src")
    batch.coalesce(4).write.mode("overwrite").json(src)

    counts: list[tuple[int, int]] = []
    timings: list[dict] = []
    stream = spark.readStream.schema("doc_id long, text string").json(src)
    t0 = time.monotonic()
    q = (
        near_dedup_ingest_stream(
            stream, store, idx,
            on_batch=lambda b, i, k: counts.append((i, k)),
            on_timing=lambda b, t: timings.append(t),
        )
        .option("checkpointLocation", os.path.join(work, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    el = time.monotonic() - t0
    n_kept = sum(k for _, k in counts)
    split = {
        "sign_query_sec": round(sum(t["query"] for t in timings), 2),
        "append_sec": round(sum(t["append"] for t in timings), 2),
    }
    return {"stage": "near_dedup_ingest_stream", "rows": n_in,
            "kept": n_kept, "sec": round(el, 2),
            "rows_per_sec": round(n_in / el), **split}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from topic_store_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    src, n = _events_source_dir(spark, sf_dir)
    results = [
        bench_rate_monitor(spark, src, n),
        bench_fps_counter(spark, src, n),
        bench_near_dedup_ingest(spark, sf_dir),
    ]
    for r in results:
        print(f"# {r['stage']}: {r['rows']} rows in {r['sec']}s "
              f"-> {r['rows_per_sec']} rows/s", file=sys.stderr)
    print(json.dumps({"metric": "streaming_rows_per_sec", "sf": sf_dir,
                      "stages": results}))

    sf = os.path.basename(sf_dir.rstrip("/"))
    lines = [
        "# Streaming throughput (availableNow micro-batches)",
        "",
        f"`python tools/stream_bench.py {sf_dir}` on local[32] — each "
        "stage consumes the full source via an availableNow trigger; "
        "rows/s = source rows / wall-clock from start() to "
        "termination (includes micro-batch planning, state store and "
        "sink costs — the honest end-to-end number, not a per-operator "
        "peak).  Reference analog: the FPSCounter rate readout "
        "(load_balancer.py:28-73), measured here over whole stages.",
        "",
        f"| stage | source ({sf}) | rows | sec | rows/s |",
        "|---|---|---|---|---|",
    ]
    src_names = {
        "rate_monitor_stream": "events",
        "fps_counter_stream": "events",
        "near_dedup_ingest_stream": "documents x1 (50% near-dup clones, 50% novel)",
    }
    for r in results:
        extra = f" (kept {r['kept']})" if "kept" in r else ""
        lines.append(
            f"| {r['stage']} | {src_names[r['stage']]} | {r['rows']}{extra} "
            f"| {r['sec']} | {r['rows_per_sec']} |"
        )
    ingest = results[-1]
    lines += [
        "",
        "near-dup ingest is the expensive stage by design: each batch "
        "is MinHash-signed, LSH-queried against the standing parquet "
        "index, anti-joined, and appended to both store and index.  "
        "Its cost scales with BATCH size (the index side is read, "
        "Bloom-row-filtered, never recomputed), which is the property "
        "that matters at a 100 TB standing corpus.  r6 changes: the "
        "index stores 60-bit shingle KEYS (3x smaller verify-side IO; "
        "append measured ~1.7s faster per batch), survivors append via "
        "`append_cached` (reusing the query's cached signatures instead "
        "of re-signing), and the sink releases every per-batch cache "
        "(the r5 version leaked one cached batch per micro-batch).  "
        "`MinHashIndex(partitions=N)` adds a hash-partitioned layout "
        "whose directory pruning wins when batch << corpus; at this "
        "bench's corpus-sized batch it prunes nothing and measured "
        "SLOWER (~280 vs ~600 rows/s same-session), so the bench runs "
        "the flat layout.  Per-batch stage split: "
        f"sign+query+anti-join {ingest['sign_query_sec']}s, "
        f"store/index append {ingest['append_sec']}s, remainder is "
        "micro-batch planning/source listing.",
        "",
    ]
    with open(os.path.join(_REPO, "STREAMBENCH.md"), "w") as f:
        f.write("\n".join(lines))
    print("wrote STREAMBENCH.md", file=sys.stderr)


if __name__ == "__main__":
    main()
