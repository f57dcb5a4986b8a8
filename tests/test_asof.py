"""As-of join: known-answer semantics + DuckDB ASOF JOIN cross-check."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def sides(spark):
    probes = spark.createDataFrame(
        [
            (1, 5, "p5"), (1, 2, "p2"), (1, 1, "p1"),
            (2, 10, "x"), (3, 7, "lonely"),
        ],
        "k long, t long, tag string",
    )
    quotes = spark.createDataFrame(
        [
            (1, 1, 10.0, 100), (1, 4, 40.0, 100), (1, 6, 60.0, 100),
            # duplicate (key, ts) pair — tie resolved by larger seq
            (2, 10, 7.0, 1), (2, 10, 9.0, 2),
        ],
        "k long, t long, v double, seq long",
    )
    return probes, quotes


def test_asof_join_backward_semantics(spark, sides):
    from topic_store_spark.operators.asof import asof_join

    probes, quotes = sides
    out = {
        (r["k"], r["t"]): (r["asof_t"], r["asof_v"])
        for r in asof_join(
            probes, quotes, on="k", left_ts="t", right_ts="t",
            value_cols=["v"], tie_col="seq",
        ).collect()
    }
    assert out[(1, 1)] == (1, 10.0)     # inclusive: quote AT probe ts wins
    assert out[(1, 2)] == (1, 10.0)
    assert out[(1, 5)] == (4, 40.0)     # t=6 quote is in the future
    assert out[(2, 10)] == (10, 9.0)    # (key, ts) tie -> max seq
    assert out[(3, 7)] == (None, None)  # no quotes for key 3


def test_asof_join_tolerance(spark, sides):
    from topic_store_spark.operators.asof import asof_join

    probes, quotes = sides
    out = {
        (r["k"], r["t"]): r["asof_v"]
        for r in asof_join(
            probes, quotes, on="k", left_ts="t", right_ts="t",
            value_cols=["v"], tie_col="seq", tolerance=F.lit(0),
        ).collect()
    }
    assert out[(1, 1)] == 10.0          # exact-ts match survives tol=0
    assert out[(1, 2)] is None          # quote at t=1 is 1 tick stale
    assert out[(1, 5)] is None          # quote at t=4 is stale too


def test_asof_join_internal_name_collision(spark):
    """r10 ADVICE: a left payload column named `_asof_match` (or any
    other internal temp name) must survive untouched, not be replaced by
    the internal match struct."""
    from topic_store_spark.operators.asof import asof_join

    probes = spark.createDataFrame(
        [(1, 5, "keepme", 9, 8)],
        "k long, t long, _asof_match string, _asof_side long, _asof_event_ts long",
    )
    quotes = spark.createDataFrame([(1, 4, 40.0)], "k long, t long, v double")
    row = asof_join(
        probes, quotes, on="k", left_ts="t", right_ts="t", value_cols=["v"]
    ).collect()[0]
    assert row["_asof_match"] == "keepme"
    assert row["_asof_side"] == 9
    assert row["_asof_event_ts"] == 8
    assert (row["asof_t"], row["asof_v"]) == (4, 40.0)


def test_asof_join_dotted_value_col(spark):
    """r10 ADVICE: value_cols containing dots must resolve as literal
    column names (getField access), not as struct paths."""
    from topic_store_spark.operators.asof import asof_join

    probes = spark.createDataFrame([(1, 5)], "k long, t long")
    quotes = (
        spark.createDataFrame([(1, 4, 40.0)], "k long, t long, v double")
        .withColumnRenamed("v", "px.mid")
    )
    row = asof_join(
        probes, quotes, on="k", left_ts="t", right_ts="t",
        value_cols=["px.mid"],
    ).collect()[0]
    assert row["asof_px.mid"] == 40.0
    assert row["asof_t"] == 4


def test_asof_join_matches_duckdb_asof(spark):
    """Cross-engine check on a bigger random-ish keyed series: Spark's
    union+window merge plan vs DuckDB's native partitioned-search ASOF."""
    from topic_store_spark.operators.asof import asof_join

    probes = [(i % 7, (i * 13) % 101, i) for i in range(300)]
    quotes = [(i % 7, (i * 29) % 97, float(i), i) for i in range(200)]
    pdf = spark.createDataFrame(probes, "k long, t long, pid long")
    qdf = spark.createDataFrame(quotes, "k long, t long, v double, seq long")
    got = {
        r["pid"]: (r["asof_t"], r["asof_v"])
        for r in asof_join(
            pdf, qdf, on="k", left_ts="t", right_ts="t",
            value_cols=["v"], tie_col="seq",
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE p(k BIGINT, t BIGINT, pid BIGINT)")
    con.execute("CREATE TABLE q(k BIGINT, t BIGINT, v DOUBLE, seq BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?, ?)", probes)
    con.executemany("INSERT INTO q VALUES (?, ?, ?, ?)", quotes)
    want = {
        pid: (t, v)
        for pid, t, v in con.execute(
            """
            SELECT p.pid, q.t, q.v
            FROM p ASOF LEFT JOIN
                 (SELECT k, t, max_by(v, seq) AS v FROM q GROUP BY 1, 2) q
              ON p.k = q.k AND p.t >= q.t
            """
        ).fetchall()
    }
    assert got == want


def test_asof_join_output_name_collision_raises(spark):
    """r11 ADVICE: prefix-derived OUTPUT names colliding with left
    columns must raise (not silently shadow the caller's data)."""
    import pytest

    from topic_store_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, 99.0)], "k long, ts long, asof_price double"
    )
    right = spark.createDataFrame([(1, 5, 1.0)], "k long, ts long, price double")
    with pytest.raises(ValueError, match="asof_price.*prefix"):
        asof_join(left, right, on="k", value_cols=["price"])
    # the matched-ts output name collides too
    left2 = spark.createDataFrame([(1, 10, 3)], "k long, ts long, asof_ts long")
    with pytest.raises(ValueError, match="asof_ts"):
        asof_join(left2, right, on="k", value_cols=["price"])
    # a different prefix resolves it
    out = asof_join(left, right, on="k", value_cols=["price"], prefix="q_")
    assert set(out.columns) == {"k", "ts", "asof_price", "q_ts", "q_price"}
