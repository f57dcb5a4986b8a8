"""BPE trainer/tokenizer tests: the distributed trainer must reproduce
a pure-Python reference implementation of Sennrich-style BPE exactly
(merge order incl. tie-breaks), and the tokenizer must replay training
segmentation on the training corpus."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from tests.conftest import table
from topic_store_spark.operators.bpe import (
    END_OF_WORD,
    apply_bpe,
    segment_word,
    train_bpe,
    word_freq_table,
)


def ref_train_bpe(texts, n_merges, min_freq=2, end_of_word=END_OF_WORD):
    """Reference single-machine trainer: word-frequency table, argmax
    pair by (count desc, a asc, b asc), greedy left-to-right merge."""
    wf = Counter()
    for t in texts:
        for w in t.split():
            wf[w] += 1
    vocab = {w: list(w) + ([end_of_word] if end_of_word else []) for w in wf}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += wf[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if best[1] < min_freq:
            break
        a, b = best[0]
        merges.append((a, b))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new",
]


def test_trainer_matches_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    )
    got = train_bpe(df, n_merges=12, min_freq=2)
    want, _ = ref_train_bpe(CORPUS, n_merges=12, min_freq=2)
    assert got == want
    assert len(got) > 3  # the corpus supports a non-trivial merge table


def test_trainer_min_freq_stops(spark):
    df = spark.createDataFrame([(0, "a b c")], ["doc_id", "text"])
    # every pair occurs once -> min_freq=2 stops immediately
    assert train_bpe(df, n_merges=5, min_freq=2) == []


def test_word_freq_table_counts(spark):
    df = spark.createDataFrame([(0, "x y x"), (1, "x")], ["doc_id", "text"])
    rows = {r["word"]: r for r in word_freq_table(df).collect()}
    assert rows["x"]["freq"] == 3 and rows["y"]["freq"] == 1
    assert rows["x"]["syms"] == ["x", END_OF_WORD]


def test_apply_replays_training_segmentation(spark):
    """Tokenizing the training corpus with the learned table must give
    the trainer's own final word segmentations."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    )
    merges = train_bpe(df, n_merges=12, min_freq=2)
    _, ref_vocab = ref_train_bpe(CORPUS, n_merges=12, min_freq=2)
    out = {r["doc_id"]: r for r in apply_bpe(df, merges).collect()}
    for i, t in enumerate(CORPUS):
        want = [s for w in t.split() for s in ref_vocab[w]]
        assert out[i]["bpe_tokens"] == want
        assert out[i]["n_bpe"] == len(want)


def test_segment_word_unseen_word_falls_back_to_chars():
    merges = [("l", "o"), ("lo", "w")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert segment_word("low", ranks, END_OF_WORD) == ["low", END_OF_WORD]
    assert segment_word("zq", ranks, END_OF_WORD) == ["z", "q", END_OF_WORD]


def test_train_and_apply_on_real_corpus(spark, sf_dir):
    """End-to-end on the documents table: trained merges apply cleanly
    and compression is real (fewer BPE tokens than characters)."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text").limit(60)
    merges = train_bpe(docs, n_merges=20, min_freq=2)
    assert len(merges) == 20
    out = apply_bpe(docs, merges)
    joined = out.join(docs, "doc_id").select(
        "doc_id",
        "n_bpe",
        F.length(F.regexp_replace("text", r"\s+", "")).alias("n_chars"),
    )
    bad = joined.filter(F.col("n_bpe") > F.col("n_chars") + 200).count()
    assert bad == 0
    # at least some compression happened somewhere
    assert joined.filter(F.col("n_bpe") < F.col("n_chars")).count() > 0


def test_local_and_distributed_identical(spark):
    """The driver-local fast path must emit the IDENTICAL merge list to
    the distributed fold on the same corpus (same argmax tie-breaks,
    same greedy replacement, same min_freq stop)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    )
    local = train_bpe(df, n_merges=12, min_freq=2)  # fast path (default)
    dist = train_bpe(df, n_merges=12, min_freq=2, local_max_words=0)
    want, _ = ref_train_bpe(CORPUS, n_merges=12, min_freq=2)
    assert local == dist == want


def test_batched_distributed_identical_under_conflicts(spark):
    """The batch-k distributed fallback must emit the IDENTICAL merge
    list to the sequential reference on corpora engineered to CONFLICT
    (tiny alphabet -> consecutive top pairs share symbols, created pairs
    outrank later candidates), while actually batching >1 merge per
    iteration somewhere — i.e. the speedup is real, not vacuous."""
    import random

    import topic_store_spark.operators.bpe as bpe_mod

    rng = random.Random(0xBA7C4)
    # tiny alphabets force shared-symbol candidates; the digit-like one
    # mirrors the id-heavy corpora where the r7 relaxed conflict rule
    # (shared-first/shared-second pairs batch together) must stay exact
    alphabets = ["ab", "abc", "abcd", "abcdefgh", "0123456789"]
    batch_sizes: list[int] = []
    real_select = bpe_mod._select_merge_batch

    def spy(pairs, batch_k, min_freq, **kw):
        out = real_select(pairs, batch_k, min_freq, **kw)
        batch_sizes.append(len(out))
        return out

    bpe_mod._select_merge_batch = spy
    try:
        for trial in range(10):
            alpha = alphabets[trial % len(alphabets)]
            texts = [
                " ".join(
                    "".join(rng.choice(alpha) for _ in range(rng.randint(1, 6)))
                    for _ in range(rng.randint(3, 12))
                )
                for _ in range(20)
            ]
            df = spark.createDataFrame(
                [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
            )
            n_merges = 10
            got = train_bpe(
                df, n_merges=n_merges, min_freq=2, local_max_words=0, batch_k=8
            )
            want, _ = ref_train_bpe(texts, n_merges=n_merges, min_freq=2)
            assert got == want, f"trial {trial} (alphabet {alpha!r})"
    finally:
        bpe_mod._select_merge_batch = real_select
    # job-count evidence: a multi-merge iteration costs 2 jobs
    # (candidates + bounds), a single-merge one costs 1 (the bounds job
    # is skipped when the disjoint prefix is a single candidate) vs 1
    # job PER merge sequentially — so iterations < merges is the win
    total_merges = sum(batch_sizes)
    n_iters = len([b for b in batch_sizes if b > 0])
    assert max(batch_sizes) > 1, batch_sizes
    assert n_iters < total_merges, batch_sizes  # strictly fewer iterations
    print(
        f"batch sizes: {batch_sizes} -> {n_iters} iterations for "
        f"{total_merges} merges (sequential: {total_merges} iterations)"
    )


def test_local_fast_path_scales_to_production_merge_counts(spark, sf_dir):
    """500 merges over the real documents table completes in seconds —
    the r4 ceiling was one Spark job PER MERGE; the fast path runs the
    whole loop on one collected Zipf-small word table."""
    import time

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    t0 = time.monotonic()
    merges = train_bpe(docs, n_merges=500, min_freq=1)
    elapsed = time.monotonic() - t0
    # the sf0.001 vocabulary fully merges at ~105 ranks — the loop ran
    # to exhaustion, not to a job-latency ceiling
    assert len(merges) >= 100
    assert elapsed < 120  # generous CI bound; ~seconds in practice
