"""CMS-pruned exact heavy hitters: equality with the naive plan,
one-sided guarantee, and real pruning on skewed data."""

from pyspark.sql import functions as F

from topic_store_spark.operators.sketch import heavy_hitters


def _zipf_df(spark):
    # value v_k appears ~ 3000/k times for k in 1..50, plus a long tail
    # of singletons
    head = spark.range(50).selectExpr(
        "explode(sequence(1, cast(3000 / (id + 1) as int))) AS rep",
        "concat('v', id) AS value",
    ).select("value")
    tail = spark.range(5000).select(
        F.concat(F.lit("tail"), "id").alias("value")
    )
    return head.unionByName(tail)


def test_matches_naive_group_by_having(spark):
    df = _zipf_df(spark)
    got = {
        (r["value"], r["n"])
        for r in heavy_hitters(df, "value", min_count=100).collect()
    }
    want = {
        (r["value"], r["n"])
        for r in df.groupBy("value")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 100)
        .collect()
    }
    assert got == want and len(want) >= 20


def test_no_false_negatives_with_tiny_sketch(spark):
    # a deliberately saturated sketch: results must STILL be exact
    df = _zipf_df(spark)
    got = {
        (r["value"], r["n"])
        for r in heavy_hitters(df, "value", min_count=500, width=32, depth=2).collect()
    }
    want = {
        (r["value"], r["n"])
        for r in df.groupBy("value")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 500)
        .collect()
    }
    assert got == want


def test_sketch_actually_prunes(spark):
    """With an adequate sketch the candidate predicate must discard
    nearly the whole singleton tail before the exact groupBy — rebuild
    the operator's own counters and predicate and count survivors."""
    from topic_store_spark.operators.sketch import _positions

    df = _zipf_df(spark)
    width, depth, min_count = 1 << 13, 4, 100
    pos = _positions(F.col("value"), width, depth)
    rows = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(i).alias("d"), p.alias("pos"))
                        for i, p in enumerate(pos)
                    ]
                )
            ).alias("c")
        )
        .groupBy("c.d", "c.pos")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    tables = [bytearray(4 * width) for _ in range(depth)]
    for r in rows:
        off = 4 * r["pos"]
        tables[r["d"]][off : off + 4] = min(r["n"], (1 << 31) - 1).to_bytes(
            4, "big"
        )
    cand = F.lit(True)
    for i, p in enumerate(pos):
        cnt = F.conv(
            F.hex(
                F.call_function(
                    "substring", F.lit(tables[i]), (p * 4 + 1).cast("int"),
                    F.lit(4),
                )
            ),
            16,
            10,
        ).cast("long")
        cand = cand & (cnt >= min_count)
    n_cand = df.filter(cand).select("value").distinct().count()
    n_all = df.select("value").distinct().count()
    n_true = (
        df.groupBy("value")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .count()
    )
    assert n_all > 5000
    assert n_cand < n_true + 0.02 * n_all  # tail survives only as a sliver


def test_null_group_is_counted(spark):
    """SQL GROUP BY keeps a NULL group; the sketch candidate predicate
    must not three-value-logic NULL rows out of the result."""
    df = spark.range(300).selectExpr(
        "CASE WHEN id < 150 THEN NULL WHEN id < 280 THEN 'hot' "
        "ELSE concat('t', id) END AS value"
    )
    got = {
        (r["value"], r["n"])
        for r in heavy_hitters(df, "value", min_count=100).collect()
    }
    assert got == {(None, 150), ("hot", 130)}
