"""Hashed-linear classifier inference: exactness, both weight modes,
and the no-shuffle plan contract."""

import hashlib

import pytest
from pyspark.sql import functions as F

from topic_store_spark.operators.classify import hashed_linear_score


def _py_bucket(feat: str, nb: int) -> int:
    return int(hashlib.md5(feat.encode()).hexdigest()[:7], 16) % nb


def _py_pseudo(bucket: int) -> int:
    return int(hashlib.md5(f"w:{bucket}".encode()).hexdigest()[:7], 16) % 2001 - 1000


def _score(spark, text, **kw):
    df = spark.createDataFrame([(text,)], "text string")
    tk = df.select(F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != "").alias("_tk"))
    return tk.select(hashed_linear_score(F.col("_tk"), **kw).alias("s")).first()["s"]


def test_pseudo_weights_match_reference_arithmetic(spark):
    text = "the quick brown fox"
    toks = text.split()
    feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    expect = sum(_py_pseudo(_py_bucket(f, 4096)) for f in feats) / len(feats)
    assert _score(spark, text) == pytest.approx(expect, abs=0)


def test_trained_weights_mode(spark):
    nb = 64
    weights = [(i * 37) % 200 - 100 for i in range(nb)]
    text = "alpha beta gamma"
    toks = text.split()
    feats = toks + ["alpha beta", "beta gamma"]
    expect = sum(weights[_py_bucket(f, nb)] for f in feats) / len(feats)
    got = _score(spark, text, num_buckets=nb, weights=weights)
    assert got == pytest.approx(expect, abs=0)
    with pytest.raises(ValueError):
        _score(spark, text, num_buckets=nb, weights=[1, 2, 3])


def test_unigram_only_and_empty_doc(spark):
    text = "solo"
    expect = float(_py_pseudo(_py_bucket("solo", 4096)))
    assert _score(spark, text, bigrams=False) == pytest.approx(expect, abs=0)
    assert _score(spark, "   ") is None


def test_plan_is_shuffle_free(spark):
    df = spark.createDataFrame([("a b c",), ("d e",)], "text string")
    tokens = F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != "")
    for kw in ({}, {"num_buckets": 64, "weights": list(range(-32, 32))}):
        out = df.select(hashed_linear_score(tokens, **kw).alias("s"))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "BatchEvalPython" not in plan
