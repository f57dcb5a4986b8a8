"""Tests for the convert CLI, flatten_dotted, IVF ANN and $split/$project."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- CLI ----

def test_cli_copy_query_projection(spark, tmp_path, capsys):
    import topic_store_spark as ts
    from topic_store_spark.cli import main

    src = ts.load(str(tmp_path / "src.parquet"), spark)
    for i in range(6):
        src.insert_one({"n": i, "tag": "even" if i % 2 == 0 else "odd", "x": {"y": i}})

    rc = main(
        [
            "-i", str(tmp_path / "src.parquet"),
            "-o", str(tmp_path / "dst.parquet"),
            "-q", json.dumps({"tag": "even"}),
            "-p", json.dumps({"n": 1, "x.y": 1}),
        ]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["copied"] == 3

    dst = ts.load(str(tmp_path / "dst.parquet"), spark)
    rows = dst.find().collect()
    assert len(rows) == 3
    assert sorted(r["n"] for r in rows) == [0, 2, 4]
    # projection kept the nested path and the forced meta fields
    assert {"n", "x", "_id", "_ts_meta"} <= set(dst.to_df().columns)


def test_cli_count_and_sessions(spark, tmp_path, capsys):
    import topic_store_spark as ts
    from topic_store_spark.cli import main

    path = str(tmp_path / "c.parquet")
    store = ts.load(path, spark)
    for i in range(4):
        store.insert_one({"n": i})

    assert main(["-i", path, "--count", "-q", json.dumps({"n": {"$gte": 2}})]) == 0
    assert capsys.readouterr().out.strip() == "2"

    assert main(["-i", path, "--list-sessions"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 1  # one process session
    assert json.loads(lines[0])["count"] == 4


def test_cli_requires_output(spark, tmp_path):
    import topic_store_spark as ts
    from topic_store_spark.cli import main

    path = str(tmp_path / "d.parquet")
    ts.load(path, spark).insert_one({"n": 1})
    assert main(["-i", path]) == 2


# ------------------------------------------------------- flatten_dotted ----

def test_flatten_dotted_dataframe(spark):
    from topic_store_spark.query.projection import flatten_dotted

    df = spark.createDataFrame(
        [(1, ("a", (2.0, "z")))],
        "id int, s struct<name: string, inner: struct<v: double, w: string>>",
    )
    flat = flatten_dotted(df)
    assert flat.columns == ["id", "s.name", "s.inner.v", "s.inner.w"]
    row = flat.collect()[0]
    assert row["s.inner.v"] == 2.0 and row["s.name"] == "a"


# --------------------------------------------------------------- IVF ANN ----

@pytest.fixture(scope="module")
def emb(spark):
    from topic_store_spark.tables import load_table

    return load_table(spark, "/root/testdata/sf0.001", "embeddings")


def test_ivf_recall_against_exact(emb):
    from topic_store_spark.operators.similarity import (
        ivf_ann_neighbors,
        topk_neighbors,
    )

    queries = emb.filter(F.col("vec_id") < 10)
    exact = topk_neighbors(emb, queries, k=5).collect()
    approx = ivf_ann_neighbors(
        emb, queries, centroids=emb.filter(F.col("vec_id") < 8), k=5, nprobe=2
    ).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    # every query answered, deterministic ranks, reasonable recall
    assert {r["query_id"] for r in approx} == {r["query_id"] for r in exact}
    assert len(approx_set & exact_set) / len(exact_set) >= 0.3
    ranks = sorted(r["rank"] for r in approx if r["query_id"] == approx[0]["query_id"])
    assert ranks == list(range(1, len(ranks) + 1))


# ------------------------------------------------ $split / $project order ----

def test_pipeline_split_and_project_input_doc(spark):
    from topic_store_spark.query.pipeline import apply_pipeline

    df = spark.createDataFrame([(1, "a b a")], "id int, text string")
    out = apply_pipeline(
        df,
        [
            {"$project": {"id": 1, "tok": {"$split": ["$text", " "]}}},
            {"$unwind": "$tok"},
            {"$group": {"_id": {"w": "$tok"}, "n": {"$sum": 1}}},
            {"$sort": {"n": -1, "w": 1}},
        ],
    ).collect()
    assert [(r["w"], r["n"]) for r in out] == [("a", 2), ("b", 1)]


def test_pipeline_split_literal_delimiter(spark):
    from topic_store_spark.query.pipeline import apply_pipeline

    # regex metacharacter as delimiter must split literally
    df = spark.createDataFrame([("x.y.z",)], "s string")
    out = apply_pipeline(
        df, [{"$project": {"parts": {"$split": ["$s", "."]}}}]
    ).collect()
    assert out[0]["parts"] == ["x", "y", "z"]


def test_cli_maintenance_flags(spark, tmp_path, capsys):
    """--delete (query-matched), --distinct, --compact through the CLI."""
    import topic_store_spark as ts
    from topic_store_spark.cli import main

    path = str(tmp_path / "maint.parquet")
    store = ts.load(path, spark)
    for i in range(6):
        store.insert_one({"n": i, "grp": "even" if i % 2 == 0 else "odd"})

    rc = main(["-i", path, "--distinct", "grp"])
    assert rc == 0
    assert capsys.readouterr().out.splitlines() == ["even", "odd"]

    rc = main(["-i", path, "--delete", "-q", '{"grp": "odd"}'])
    assert rc == 0
    assert json.loads(capsys.readouterr().out) == {"deleted": 3}

    assert main(["-i", path, "--delete"]) == 2  # no filter: refused
    capsys.readouterr()

    rc = main(["-i", path, "--compact"])
    assert rc == 0
    assert json.loads(capsys.readouterr().out) == {"files": 1}
    assert sorted(r["n"] for r in ts.load(path, spark).find().collect()) == [0, 2, 4]
