"""End-to-end training-corpus build: funnel accounting, window shapes,
and a detokenization round-trip from the written shards."""

import pytest
from pyspark.sql import functions as F

from topic_store_spark.operators.build import build_training_corpus


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    from tests.conftest import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    # plant exact and near duplicates so every funnel stage bites
    exact_dup = docs.limit(10).select(
        (F.col("doc_id") + 50000).alias("doc_id"), "text", "lang"
    )
    near_dup = docs.limit(10).select(
        (F.col("doc_id") + 60000).alias("doc_id"),
        F.concat("text", F.lit(" qq ww")).alias("text"),
        "lang",
    )
    return docs.unionByName(exact_dup).unionByName(near_dup)


def test_full_build(spark, corpus, tmp_path):
    out = str(tmp_path / "shards")
    stats = build_training_corpus(
        corpus, out, min_quality=0.3, ctx=64, shards=4, n_merges=40,
    )
    # funnel decreases where duplicates were planted: the 10 exact
    # clones drop at the exact stage, the 10 near-clones at the near
    # stage (quality may or may not bite on synthetic text)
    assert stats["n_input"] >= stats["n_quality"]
    assert stats["n_exact_dedup"] <= stats["n_quality"] - 10
    assert stats["n_near_dedup"] <= stats["n_exact_dedup"] - 10
    assert stats["n_merges"] > 0 and stats["n_vocab"] > 0
    assert stats["n_windows"] > 0 and stats["n_tokens"] > 0

    shardsdf = spark.read.parquet(out)
    # every window holds exactly ctx ids except each shard's tail
    rows = shardsdf.collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) == 4
    for shard, ws in by_shard.items():
        sizes = [r["n_tokens"] for r in sorted(ws, key=lambda r: r["window_id"])]
        assert all(s == 64 for s in sizes[:-1])
        assert 0 < sizes[-1] <= 64
    # ids are within vocab range
    mx = shardsdf.select(F.max(F.array_max("token_ids"))).first()[0]
    assert mx < stats["n_vocab"]


def test_detokenization_roundtrip(spark, corpus, tmp_path):
    """Token ids written to shards decode back to the source text of a
    single-doc corpus (end_of_word markers reassemble words)."""
    from topic_store_spark.operators.bpe import END_OF_WORD, train_bpe

    one = corpus.filter(F.col("doc_id") == 3).select("doc_id", "text", "lang")
    text = one.first()["text"]
    out = str(tmp_path / "one")
    merges = train_bpe(one, n_merges=30)
    build_training_corpus(
        one, out, min_quality=-1.0, merges=merges, ctx=32, shards=1,
    )
    df = spark.read.parquet(out)
    # rebuild the vocab mapping exactly as the build did
    from topic_store_spark.operators.bpe import apply_bpe

    toks = apply_bpe(one, merges).first()["bpe_tokens"]
    vocab = sorted(set(toks))
    windows = sorted(df.collect(), key=lambda r: r["window_id"])
    decoded = [vocab[i] for r in windows for i in r["token_ids"]]
    assert decoded == toks
    words = "".join(decoded).split(END_OF_WORD)
    assert [w for w in words if w] == text.split()
