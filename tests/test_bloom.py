"""Bloom-filter prefilter: no false negatives, bounded false positives,
and bit-identical incremental-dedup results with the filter on or off."""

import pytest
from pyspark.sql import functions as F

from topic_store_spark.operators.bloom import (
    BloomFilter,
    bloom_build,
    bloom_contains,
)


@pytest.fixture(scope="module")
def keys_df(spark):
    # 2,000 inserted keys and 20,000 disjoint probe keys
    ins = spark.range(2000).select(F.concat(F.lit("in-"), "id").alias("k"))
    out = spark.range(20000).select(F.concat(F.lit("out-"), "id").alias("k"))
    return ins, out


def test_no_false_negatives(spark, keys_df):
    ins, _ = keys_df
    bf = bloom_build(ins, "k", expected_items=2000)
    n = ins.filter(bloom_contains(bf, F.col("k"))).count()
    assert n == 2000


def test_false_positive_rate_bounded(spark, keys_df):
    ins, out = keys_df
    bf = bloom_build(ins, "k", expected_items=2000)
    fp = out.filter(bloom_contains(bf, F.col("k"))).count()
    # 2000 keys round up to a 2^15-bit filter (~16 bits/key, k=7):
    # theoretical ~0.2%, measured 0.08% with the 56-bit split key.  The
    # 1% bound pins the key-width fix — a regression to a single 28-bit
    # key would reintroduce an n/2^28 collision floor on top.
    assert fp / 20000 < 0.01


def test_filter_shape_and_sizing(spark, keys_df):
    ins, _ = keys_df
    bf = bloom_build(ins, "k", expected_items=2000)
    assert isinstance(bf, BloomFilter)
    assert bf.num_bits & (bf.num_bits - 1) == 0  # power of two
    assert len(bf.blob) == bf.num_bits // 8
    assert bf.num_bits >= 10 * 2000
    # implicit count path sizes identically
    bf2 = bloom_build(ins, "k")
    assert bf2.num_bits == bf.num_bits


def test_overfull_filter_stays_correct(spark, keys_df):
    ins, _ = keys_df
    # force a tiny filter: still zero false negatives, just saturated
    bf = bloom_build(ins, "k", expected_items=10)
    assert ins.filter(bloom_contains(bf, F.col("k"))).count() == 2000


@pytest.fixture(scope="module")
def corpus_and_batch(spark, sf_dir):
    from tests.conftest import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    batch = docs.limit(40).select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    return docs, batch


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_exact_incremental_bloom_identical(spark, corpus_and_batch):
    from topic_store_spark.operators.dedup import exact_duplicates_incremental

    docs, batch = corpus_and_batch
    # exact collisions need identical text: re-ingest 25 corpus docs verbatim
    clone = docs.limit(25).select(
        (F.col("doc_id") + 900000).alias("doc_id"), "text"
    )
    plain = exact_duplicates_incremental(clone, docs)
    bloom = exact_duplicates_incremental(clone, docs, bloom_prefilter=True)
    assert _rows(plain) == _rows(bloom)
    assert plain.count() > 0


def test_minhash_incremental_bloom_identical(spark, corpus_and_batch):
    from topic_store_spark.operators.dedup import minhash_lsh_pairs_incremental

    docs, batch = corpus_and_batch
    plain = minhash_lsh_pairs_incremental(batch, docs)
    bloom = minhash_lsh_pairs_incremental(batch, docs, bloom_prefilter=True)
    assert _rows(plain) == _rows(bloom)
    assert plain.count() > 0


def test_no_false_negatives_property(spark):
    """Hypothesis sweep: arbitrary unicode keys, tiny to generous filter
    sizes — an inserted key NEVER tests negative."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=10, deadline=None)
    @given(
        keys=st.lists(
            st.text(min_size=0, max_size=24), min_size=1, max_size=50,
            unique=True,
        ),
        bits_per_item=st.sampled_from([2, 10]),
    )
    def check(keys, bits_per_item):
        df = spark.createDataFrame([(k,) for k in keys], "k string")
        bf = bloom_build(
            df, "k", expected_items=len(keys), bits_per_item=bits_per_item
        )
        assert df.filter(bloom_contains(bf, F.col("k"))).count() == len(keys)

    check()


def test_28bit_prefix_collision_is_not_forced_fp(spark):
    """'k15231' and 'k25525' share md5 hex prefix 9b9c797 (a 28-bit key
    collision).  With a single 28-bit key the second would be a
    GUARANTEED false positive — the n/2^28 FP floor; the 56-bit split
    key must distinguish them."""
    import hashlib

    a, b = "k15231", "k25525"
    assert hashlib.md5(a.encode()).hexdigest()[:7] == \
        hashlib.md5(b.encode()).hexdigest()[:7]
    bf = bloom_build(
        spark.createDataFrame([(a,)], "k string"), "k", expected_items=1
    )
    got = {
        r["k"]: r["hit"]
        for r in spark.createDataFrame([(a,), (b,)], "k string")
        .select("k", bloom_contains(bf, F.col("k")).alias("hit"))
        .collect()
    }
    assert got[a] is True and got[b] is False
