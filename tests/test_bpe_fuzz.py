"""Three-way differential fuzzer for the BPE trainer: random corpora
over deliberately tiny alphabets (maximum merge interaction — shared
symbols, chained merges, self-pairs) trained by

1. the in-driver pure-Python merge loop (`_train_bpe_local`, the
   reference — a heap of pair counts, strictly sequential),
2. the distributed loop with ``batch_k=1`` (one argmax job per merge,
   merges applied by the JVM `_merge_fold`), and
3. the batched distributed loop (``batch_k=8``: contiguous
   provably-sequential prefixes via the disjointness + created-pair
   bound of `_select_merge_batch`),

which must emit IDENTICAL ordered merge lists (the documented
invariant; the batching soundness argument is exactly the kind of
proof a fuzzer should be pointed at).  `apply_bpe` is then checked
against `segment_word` run driver-side on every distinct word.
"""

from __future__ import annotations

import random


def _corpus(rng: random.Random) -> list[tuple[int, str]]:
    alphabet = rng.choice(["ab", "abc", "abcd", "xyz"])
    # a small word pool with heavy reuse drives real frequency ties
    pool = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
        for _ in range(rng.randint(4, 15))
    ]
    docs = []
    for i in range(rng.randint(10, 25)):
        words = [rng.choice(pool) for _ in range(rng.randint(1, 12))]
        docs.append((i, " ".join(words)))
    return docs


def test_bpe_trainer_paths_identical(spark):
    from topic_store_spark.operators.bpe import apply_bpe, segment_word, train_bpe

    rng = random.Random(0xB9E5)
    docs = _corpus(rng)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    n_merges = rng.randint(5, 14)
    min_freq = rng.choice([1, 2, 3])

    local = train_bpe(df, n_merges=n_merges, min_freq=min_freq)
    seq = train_bpe(
        df, n_merges=n_merges, min_freq=min_freq,
        local_max_words=0, batch_k=1, checkpoint_every=4,
    )
    assert seq == local, (
        f"sequential-distributed diverged at merge "
        f"{next(i for i, (x, y) in enumerate(zip(seq, local)) if x != y) if any(x != y for x, y in zip(seq, local)) else min(len(seq), len(local))}: "
        f"seq={seq} local={local}"
    )
    batched = train_bpe(
        df, n_merges=n_merges, min_freq=min_freq,
        local_max_words=0, batch_k=8, checkpoint_every=4,
    )
    assert batched == local, f"batched diverged: batched={batched} local={local}"

    # application parity: Arrow-batched apply vs driver-side segment_word
    ranks = {p: i for i, p in enumerate(local)}
    want = {}
    for i, text in docs:
        toks: list[str] = []
        for w in text.split():
            toks.extend(segment_word(w, ranks, "</w>"))
        want[i] = toks
    got = {
        r["doc_id"]: (list(r["bpe_tokens"]), r["n_bpe"])
        for r in apply_bpe(df, local).collect()
    }
    assert got == {i: (t, len(t)) for i, t in want.items()}
