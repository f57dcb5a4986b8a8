"""Differential fuzzer for `hashed_linear_score`'s TRAINED-WEIGHTS
path (the production form — a packed binary weight blob looked up by
feature hash inside codegen).  The carrier oracle covers only the
deterministic pseudo-weight stub; this checks the blob pack/lookup
arithmetic against a pure-Python reference: md5 bucket hashing,
unigram+bigram feature streams (with duplicates — a repeated feature
votes repeatedly), exact integer sums, and the single final division,
bit-for-bit.  Negative weights exercise the 2^31 biasing.
"""

from __future__ import annotations

import hashlib
import random


def test_hashed_linear_score_weights_match_reference(spark):
    from pyspark.sql import functions as F

    from topic_store_spark.operators.classify import hashed_linear_score

    rng = random.Random(0xC1A5)
    num_buckets = rng.choice([64, 256])
    weights = [rng.randint(-(10**6), 10**6) for _ in range(num_buckets)]
    bigrams = rng.random() < 0.7
    vocab = ["a", "bb", "ccc", "dd", "β"]
    docs = []
    for i in range(80):
        n = rng.choice([0, 1, rng.randint(2, 25)])
        docs.append((i, [rng.choice(vocab) for _ in range(n)]))

    def ref(toks: list[str]):
        feats = list(toks)
        if bigrams and len(toks) >= 2:
            feats += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if not feats:
            return None
        total = sum(
            weights[int(hashlib.md5(f.encode()).hexdigest()[:7], 16) % num_buckets]
            for f in feats
        )
        return total / len(feats)

    df = spark.createDataFrame(docs, "doc_id long, tk array<string>")
    got = {
        r["doc_id"]: r["score"]
        for r in df.select(
            "doc_id",
            hashed_linear_score(
                F.col("tk"), num_buckets=num_buckets,
                weights=weights, bigrams=bigrams,
            ).alias("score"),
        ).collect()
    }
    want = {i: ref(t) for i, t in docs}
    assert got == want, (
        f"buckets={num_buckets} bigrams={bigrams}: "
        f"{ {k: (got[k], want[k]) for k in want if got[k] != want[k]} }"
    )
