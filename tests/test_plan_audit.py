"""Plan-audit accounting: the executed-view stripper (r11).

The audit's shuffle columns must count PHYSICAL exchanges, not printed
ones: every AQE-planned cached relation prints its final AND its
superseded initial plan, so each cached Exchange got two ids and was
double-counted through r10.  These tests pin (a) the stripper's text
surgery on a synthetic plan, and (b) the ground truth — for the
perplexity carrier, the stripped static at-scale count equals the
number of distinct runtime ShuffleQueryStages (minus scalar 1-row
gathers) after actually executing the query.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from audit_plans import _executed_view  # noqa: E402

SYNTH = """\
AdaptiveSparkPlan (20)
+- HashAggregate (19)
   +- Exchange (18)
      +- InMemoryTableScan (1)
            +- InMemoryRelation (2)
                  +- AdaptiveSparkPlan (11)
                     +- == Final Plan ==
                        ResultQueryStage (8)
                        +- Exchange (5)
                           +- Scan parquet  (3)
                     +- == Initial Plan ==
                        Project (10)
                        +- Exchange (9)
                           +- Scan parquet  (3)


(18) Exchange
Arguments: hashpartitioning(k#1, 8), ENSURE_REQUIREMENTS

(5) Exchange
Arguments: hashpartitioning(doc#0L, 8), REPARTITION_BY_NUM

(9) Exchange
Arguments: hashpartitioning(doc#0L, 8), REPARTITION_BY_NUM

(3) Scan parquet
Arguments: x
"""


def test_executed_view_drops_initial_plan_copies():
    out = _executed_view(SYNTH)
    # the initial-plan copy (9) is gone from tree and detail blocks
    assert "Exchange (9)" not in out
    assert "(9) Exchange" not in out
    # the executed exchanges and shared scan survive
    assert "(18) Exchange" in out and "(5) Exchange" in out
    assert "(3) Scan parquet" in out
    # the outer tree after the cached section is intact
    assert "HashAggregate (19)" in out
    assert len(re.findall(r"\(\d+\) Exchange\b", out)) == 2


import pytest


@pytest.mark.parametrize(
    "query,at_scale_bar",
    [
        ("unigram_perplexity", 5),   # r13: explicit vocab broadcast
        #  keeps the streamed tf side hash(doc) -> the per-doc
        #  rollup exchange died (was 6 since r10)
        ("importance_resample", 4),  # r11 doc-partitioned tokenize pass
    ],
)
def test_static_count_matches_runtime(spark, query, at_scale_bar):
    """Ground truth for the r11 Exchange diet: stripped static count ==
    distinct runtime shuffle stages, and the at-scale count (minus
    scalar 1-row gathers) holds the carrier's documented bar."""
    import __spark_entry__ as e

    df = e.queries()[query](spark, "/root/testdata/sf0.001")
    plan = _executed_view(
        df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted")))
    static_ids = re.findall(r"\((\d+)\) Exchange\b", plan)
    scalar = len([
        b for b in plan.split("\n\n")
        if re.match(r"\(\d+\) Exchange\b", b)
        and "Arguments: SinglePartition" in b
    ])
    df.collect()
    post = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"))
    runtime = len(set(re.findall(r"ShuffleQueryStage (\d+)", post)))
    assert len(static_ids) == runtime, (static_ids, runtime)
    assert len(static_ids) - scalar <= at_scale_bar, (static_ids, scalar)


SYNTH_SIBLING = """\
AdaptiveSparkPlan (40)
+- Union (39)
   :- Project (38)
   :  +- InMemoryTableScan (1)
   :        +- InMemoryRelation (2)
   :              +- AdaptiveSparkPlan (11)
   :                 +- == Final Plan ==
   :                    ResultQueryStage (8)
   :                    +- Exchange (5)
   :                       +- Scan parquet  (3)
   :                 +- == Initial Plan ==
   :                    Project (10)
   :                    +- Exchange (9)
   :                       +- Scan parquet  (3)
   +- Exchange (31)
      +- Scan parquet  (30)


(5) Exchange
Arguments: hashpartitioning(doc#0L, 8), REPARTITION_BY_NUM

(9) Exchange
Arguments: hashpartitioning(doc#0L, 8), REPARTITION_BY_NUM

(31) Exchange
Arguments: hashpartitioning(k#1, 8), ENSURE_REQUIREMENTS
"""


def test_executed_view_keeps_same_indent_siblings():
    """r11 ADVICE: a final-plan line printed AFTER an Initial Plan
    section at the same lstrip(' :+-') indent as the marker (here
    `+- Exchange (31)`, whose lstripped indent equals the marker's)
    must survive the strip — the old raw-indent heuristic swallowed
    it, silently undercounting executed exchanges."""
    out = _executed_view(SYNTH_SIBLING)
    assert "Exchange (31)" in out and "(31) Exchange" in out
    assert "Scan parquet  (30)" in out
    assert "Exchange (9)" not in out and "(9) Exchange" not in out
    assert "Exchange (5)" in out
    assert len(re.findall(r"\(\d+\) Exchange\b", out)) == 2


def test_executed_view_nested_sections_inside_initial_stay_stripped():
    """A nested adaptive subtree INSIDE a superseded initial plan
    carries its own deeper == ... == headers; they must not terminate
    the outer skip (the whole initial subtree never executes)."""
    plan = """\
AdaptiveSparkPlan (50)
+- InMemoryTableScan (1)
      +- InMemoryRelation (2)
            +- AdaptiveSparkPlan (20)
               +- == Final Plan ==
                  ResultQueryStage (8)
                  +- Exchange (5)
               +- == Initial Plan ==
                  Project (10)
                  +- InMemoryRelation (12)
                        +- AdaptiveSparkPlan (13)
                           +- == Final Plan ==
                              Exchange (14)
                           +- == Initial Plan ==
                              Exchange (15)
                  +- Exchange (9)


(5) Exchange
Arguments: a

(9) Exchange
Arguments: b

(14) Exchange
Arguments: c

(15) Exchange
Arguments: d
"""
    out = _executed_view(plan)
    assert "(5) Exchange" in out
    for dead in ("Exchange (9)", "Exchange (14)", "Exchange (15)"):
        assert dead not in out
    assert len(re.findall(r"\(\d+\) Exchange\b", out)) == 1


@pytest.mark.parametrize(
    "query,at_scale_bar",
    [
        ("dedup_paragraph", 3),   # fp rollup, doc reassembly, totals join
        ("corpus_lengths", 2),    # histogram rollup + one percentile window
        ("salient_terms", 3),     # (doc,term) rollup, term pin, doc window
        ("dedup_semantic", 1),    # r14 argmax assignment: map-side, so
        #  the r13 assignment rollup exchange died — only the
        #  cluster-pinned repartition remains; pair joins and bucket
        #  audit all inherit hash(cluster) (was 7 at-scale unfused,
        #  2 in the r13 fused form)
    ],
)
def test_r12_diet_carriers_static_bounds_runtime(spark, query, at_scale_bar):
    """r12 Exchange-diet carriers: the stripped static count must BOUND
    the runtime ShuffleQueryStage count from above (static < runtime
    would mean the stripper swallowed executed-plan lines — the r11
    ADVICE failure mode) and the at-scale count (static minus scalar
    1-row gathers minus local-fixture round-robin repartitions) holds
    the carrier's documented bar.  Strict equality is not asserted
    here: on these plans AQE legitimately elides planned exchanges at
    runtime (broadcast conversions / scalar gathers folded into
    broadcast stages), unlike the two r11 carriers above whose plans
    AQE executes verbatim."""
    import __spark_entry__ as e
    from topic_store_spark.operators.util import cache_scope

    with cache_scope():
        df = e.queries()[query](spark, "/root/testdata/sf0.001")
        plan = _executed_view(
            df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")))
        static_ids = re.findall(r"\((\d+)\) Exchange\b", plan)
        blocks = [b for b in plan.split("\n\n")
                  if re.match(r"\(\d+\) Exchange\b", b)]
        scalar = len([b for b in blocks
                      if "Arguments: SinglePartition" in b])
        rr = len([b for b in blocks if "RoundRobinPartitioning" in b])
        df.collect()
        post = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("simple"))
        runtime = len(set(re.findall(r"ShuffleQueryStage (\d+)", post)))
    spark.catalog.clearCache()
    assert runtime <= len(static_ids), (static_ids, runtime)
    assert len(static_ids) - scalar - rr <= at_scale_bar, (
        static_ids, scalar, rr)


def test_expose_cached_partitioning_removes_downstream_exchange(spark):
    """r12: a hash_partition-pinned cache must, after the finalization
    probe, satisfy downstream clustered distributions with NO new
    exchange — including a SUPERSET group-by (hash(k) clusters
    (k, t)).  Without the probe Spark 4 reports the cached plan's
    partitioning as unknown and plans an ENSURE_REQUIREMENTS exchange
    (the r12 measurement that motivated the util)."""
    from pyspark.sql import functions as F

    from topic_store_spark.operators.util import (
        expose_cached_partitioning,
        hash_partition,
        persist_tracked,
        release_tracked_caches,
    )

    df = spark.range(500).select(
        (F.col("id") % 7).alias("k"), (F.col("id") % 13).alias("t"), "id"
    )
    pinned = persist_tracked(hash_partition(df, "k"))
    try:
        before = pinned.groupBy("k", "t").agg(F.sum("id"))._jdf \
            .queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("simple"))
        assert "ENSURE_REQUIREMENTS" in before, "probe-free baseline moved"
        expose_cached_partitioning(pinned)
        after = pinned.groupBy("k", "t").agg(F.sum("id"))._jdf \
            .queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("simple"))
        assert "ENSURE_REQUIREMENTS" not in after, after
    finally:
        release_tracked_caches()
        spark.catalog.clearCache()
