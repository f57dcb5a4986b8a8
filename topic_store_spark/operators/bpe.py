"""Distributed BPE tokenizer training and application.

Completes the tokenization story started by
``operators/corpus.merge_pair_counts`` (which computes the candidate
table of ONE merge iteration): a full byte-pair-encoding trainer loop
(Sennrich, Haddow & Birch, "Neural Machine Translation of Rare Words
with Subword Units", ACL 2016) and a vectorized tokenizer that applies
the learned merge table to a corpus.

Scale design (the part that matters at 100 TB):

- **The trainer never iterates over the corpus.**  The corpus is read
  ONCE to build the (word, freq) table — distinct whitespace words with
  corpus frequencies.  By Zipf's law that table is orders of magnitude
  smaller than the token stream, and every merge iteration runs against
  it alone.  This is exactly the classic single-machine optimization,
  and it distributes: the word table is hash-partitioned, each
  iteration is (a) an adjacent-pair rollup with map-side partials
  weighted by word frequency and (b) a 1-row ``TakeOrdered`` argmax —
  no full sort, no driver-side data beyond the winning pair.
- **Merge application inside the trainer is a JVM fold** — a greedy
  left-to-right non-overlapping pair replacement expressed with
  ``F.aggregate`` over the symbol array (no Python in the loop).
- **Lineage is truncated** every ``checkpoint_every`` iterations via
  ``materialize_iter`` (localCheckpoint / checkpoint), the same
  contract as the connected-components loop — without it iteration k
  replays iterations 1..k-1.
- **The tokenizer is an Arrow-batched Pandas UDF** with the (tiny)
  merge-rank table broadcast in the closure and a per-batch word cache:
  a batch's distinct words are segmented once each, then looked up —
  the classic whole-word memoization, amortized across every repeated
  word in the batch.

The trainer returns plain Python data (the merge list), which is the
natural shape: a merge table is a model artifact a pipeline persists
and ships, not a DataFrame.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from topic_store_spark.functions.text import tokens
from topic_store_spark.operators.util import (
    ensure_parallelism,
    explode_nonempty,
    materialize_iter,
)

END_OF_WORD = "</w>"


def word_freq_table(
    df: DataFrame, text_col: str = "text", end_of_word: str = END_OF_WORD
) -> DataFrame:
    """(word, freq, syms): distinct corpus words with frequencies and
    their initial character-level symbol arrays (+ end-of-word marker).
    One shuffle over the token stream; everything downstream of the
    trainer touches only this (Zipf-small) relation."""
    tk = ensure_parallelism(df).select(tokens(F.col(text_col)).alias("_tk"))
    words = explode_nonempty(tk, "_tk", "word")
    wf = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    # one element per character: split at every inter-character position
    # ((?=.) forbids the end-of-string match that Spark's limit=-1 would
    # otherwise keep as a trailing "" element)
    syms = F.split(F.col("word"), "(?!^)(?=.)")
    if end_of_word:
        syms = F.concat(syms, F.array(F.lit(end_of_word)))
    return wf.select("word", "freq", syms.alias("syms"))


def _merge_fold(syms, a: str, b: str):
    """Greedy left-to-right non-overlapping replacement of the adjacent
    symbol pair (a, b) with the merged symbol a+b, as a single JVM
    ``aggregate`` fold: merge whenever the accumulator's last element is
    ``a`` and the current symbol is ``b``.  Because the merged symbol
    ``a+b`` can never equal ``a`` (``b`` is non-empty), a freshly merged
    element never re-merges with the next ``b`` — exactly BPE's
    non-overlapping scan order."""
    ab = F.lit(a + b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(ab)
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


#: word-frequency tables at or under this row count train in-driver.
#: Zipf's law keeps the DISTINCT-word table ~10^7 rows even at 100 TB of
#: text, so in practice training virtually always takes the fast path;
#: the distributed fold remains for adversarial vocabularies.
LOCAL_TRAIN_MAX_WORDS = 1 << 20

#: ... and the collected payload is bounded too: a table just under the
#: row cap whose words are pathologically long could otherwise drive
#: driver memory to GBs.  2^26 total symbols is ~0.5-1 GiB of driver
#: heap (pointer-dominated; single-char strings are interned) — beyond
#: it the distributed fold takes over regardless of row count.
LOCAL_TRAIN_MAX_SYMS = 1 << 26


def _train_bpe_local(
    rows: list[tuple[int, list[str]]], n_merges: int, min_freq: int
) -> list[tuple[str, str]]:
    """In-driver merge loop over a collected (freq, syms) word table —
    the fast path of `train_bpe`.  Emits the IDENTICAL merge list as the
    distributed fold (same count-desc / pair-asc argmax, same greedy
    left-to-right non-overlapping replacement, same ``min_freq`` stop;
    proven by `tests/test_bpe.py::test_local_and_distributed_identical`)
    while costing zero Spark jobs per merge — a 32k-merge production
    vocabulary is 32k heap updates, not 32k sequential job launches."""
    from collections import Counter, defaultdict

    freqs = [int(f) for f, _ in rows]
    words = [list(s) for _, s in rows]
    pair_counts: Counter = Counter()
    where: dict[tuple[str, str], set[int]] = defaultdict(set)
    for i, syms in enumerate(words):
        f = freqs[i]
        for p in zip(syms, syms[1:]):
            pair_counts[p] += f
            where[p].add(i)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        (a, b), n = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if n < min_freq:
            break
        merges.append((a, b))
        for i in list(where[(a, b)]):
            syms, f = words[i], freqs[i]
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= f
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                where[p].discard(i)
            new, j = [], 0
            while j < len(syms):
                if j < len(syms) - 1 and syms[j] == a and syms[j + 1] == b:
                    new.append(a + b)
                    j += 2
                else:
                    new.append(syms[j])
                    j += 1
            words[i] = new
            for p in zip(new, new[1:]):
                pair_counts[p] += f
                where[p].add(i)
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_freq: int = 2,
    end_of_word: str = END_OF_WORD,
    checkpoint_every: int = 8,
    local_max_words: int = LOCAL_TRAIN_MAX_WORDS,
    batch_k: int = 16,
    stats: dict | None = None,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a corpus.  Returns the ordered
    merge list [(a, b), ...] (rank = list position).

    The corpus is read ONCE into the Zipf-small (word, freq) table; when
    that table has at most ``local_max_words`` rows (virtually always —
    see `LOCAL_TRAIN_MAX_WORDS`) the merge loop runs in-driver with a
    pair-count index, the mirror of `dedup.connected_components`' bounded
    union-find fast path.  Beyond the threshold, each distributed
    iteration is: weighted adjacent-pair counts over the word table
    (map-side partials), a deterministic argmax (count desc, pair asc —
    ties never depend on partitioning), then a JVM fold applies the
    merges to the symbol arrays.  The fallback batches up to ``batch_k``
    PROVABLY-SEQUENTIAL merges per iteration (`_select_merge_batch`'s
    disjointness + created-pair bound), cutting the job count for a 32k
    vocabulary from 32k sequential jobs toward 32k/E[batch]x2.  Both
    paths stop early when the best pair's corpus frequency drops below
    ``min_freq`` and emit identical merge lists.

    ``stats``, when given, is filled in place with the distributed
    path's measured shape: ``iterations``, ``batch_sizes`` (one entry
    per iteration), and ``bounds_jobs`` (iterations whose contiguous
    disjoint prefix exceeded 1, i.e. paid the second job) — the
    E[batch] evidence ``tools/bpe_bench.py`` records."""
    wf = word_freq_table(df, text_col, end_of_word)
    wf = materialize_iter(wf)
    # one agg sizes BOTH gates for the in-driver path: row count and the
    # total collected symbol payload (a near-cap table of pathologically
    # long words must not blow the driver heap — ADVICE r5)
    gate = wf.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.size("syms")), F.lit(0)).alias("syms"),
    ).collect()[0]
    if (
        local_max_words
        and gate["n"] <= local_max_words
        and gate["syms"] <= LOCAL_TRAIN_MAX_SYMS
    ):
        rows = [
            (r["freq"], list(r["syms"]))
            for r in wf.select("freq", "syms").collect()
        ]
        return _train_bpe_local(rows, n_merges, min_freq)
    merges: list[tuple[str, str]] = []
    if stats is not None:
        stats.update({"iterations": 0, "batch_sizes": [], "bounds_jobs": 0})
    iters = 0
    while len(merges) < n_merges:
        iters += 1
        staged = wf.select(
            "freq",
            F.zip_with(
                F.slice(F.col("syms"), 1, F.size("syms") - 1),
                F.slice(F.col("syms"), 2, F.size("syms") - 1),
                lambda x, y: F.struct(x.alias("a"), y.alias("b")),
            ).alias("_ps"),
        )
        pairs = explode_nonempty(staged, "_ps", "p", "freq").groupBy("p").agg(
            F.sum("freq").alias("n")
        )
        batch = _select_merge_batch(
            pairs, min(batch_k, n_merges - len(merges)), min_freq,
            stats=stats,
        )
        if not batch:
            break
        if stats is not None:
            stats["iterations"] = iters
            stats["batch_sizes"].append(len(batch))
        merges.extend(batch)
        syms = F.col("syms")
        for a, b in batch:  # symbol-disjoint: one fold pass applies all
            syms = _merge_fold(syms, a, b)
        wf = wf.select("word", "freq", syms.alias("syms"))
        if iters % checkpoint_every == 0:
            wf = materialize_iter(wf)
    return merges


def _select_merge_batch(
    pairs: DataFrame, batch_k: int, min_freq: int,
    stats: dict | None = None,
) -> list[tuple[str, str]]:
    """The largest CONTIGUOUS prefix of the (count desc, pair asc)-sorted
    candidate list provably equal to running that many sequential merges
    — the distributed fallback's batching step (one candidate job + one
    bound job instead of one job PER merge).

    Soundness of accepting candidate ``k_i`` after ``k_1..k_{i-1}``:

    - its own count is invariant (candidates are mutually symbol-disjoint
      — a merge only changes counts of pairs touching its symbols);
    - every pair ranked ABOVE it is an earlier candidate (contiguity),
      already merged to count 0;
    - pairs ranked BELOW it can only have lost count (they'd lose the
      argmax anyway; ties break (count desc, pair asc) — the sort order);
    - pairs CREATED by merge j are bounded by pre-batch counts: each
      occurrence of ``(x, a_j b_j)`` maps injectively to a pre-batch
      ``(·, a_j)`` adjacency and ``(a_j b_j, y)`` to a ``(b_j, ·)`` one,
      so ``c_j = max count over pairs ending in a_j or starting with
      b_j`` bounds every created pair; require ``n_i > max_{j<i} c_j``
      (strict — a tie could lose to a created pair's name).

    Stops at the first rejection (keeping contiguity), at a self-pair
    ``(a, a)`` (its created pairs are bounded only by itself), and below
    ``min_freq``.

    Conflict rule (r7 RELAXATION — the r6 rule rejected any shared
    symbol, which collapsed E[batch] to ~1.2 on hot-symbol corpora):
    candidate ``q=(a2,b2)`` interacts with accepted ``p=(a1,b1)`` ONLY
    when occurrences can overlap or the merged token collides —

    - ``a2 == b1`` (pattern "a1 b1 b2": merging p consumes the b1 that
      q needs as its first symbol) or ``b2 == a1`` ("a2 a1 b1");
    - ``a2`` or ``b2`` equals the merged string ``a1+b1`` (pairs
      touching that token can GAIN count);
    - sharing only the FIRST symbols (``a2 == a1, b2 != b1``) or only
      the SECOND (``b2 == b1, a2 != a1``) is SAFE: an ``a1`` followed by
      ``b2`` is by definition not followed by ``b1``, so the occurrence
      sets are disjoint, no token of one is consumed by the other, and
      both counts are invariant — these candidates batch together.

    Identical-output property vs the sequential loop is pinned by
    tests/test_bpe.py (conflict-engineered corpora incl. tiny and
    digit-like alphabets, compared against the pure-Python reference
    trainer)."""
    from pyspark import StorageLevel

    if batch_k <= 1:
        top = pairs.orderBy(
            F.col("n").desc(), F.col("p.a").asc(), F.col("p.b").asc()
        ).limit(1).collect()
        if not top or top[0]["n"] < min_freq:
            return []
        return [(top[0]["p"]["a"], top[0]["p"]["b"])]

    pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        top = pairs.orderBy(
            F.col("n").desc(), F.col("p.a").asc(), F.col("p.b").asc()
        ).limit(batch_k).collect()
        if not top or top[0]["n"] < min_freq:
            return []
        cand = [(r["p"]["a"], r["p"]["b"], int(r["n"])) for r in top]

        def conflicts(a, b, firsts, seconds, strings):
            return (
                a == b
                or a in seconds  # "… x a …" overlap: a is an accepted b1
                or b in firsts   # "… b y …" overlap: b is an accepted a1
                or a in strings
                or b in strings
            )

        # the interaction rule alone is decidable driver-side — when the
        # contiguous conflict-free prefix is a single candidate, skip
        # the bounds job: the iteration then costs exactly the
        # sequential path's one job
        pre: list[tuple[str, str]] = []
        pf: set[str] = set()
        ps: set[str] = set()
        pstr: set[str] = set()
        for a, b, n in cand:
            if n < min_freq or (pre and conflicts(a, b, pf, ps, pstr)):
                break
            pre.append((a, b))
            pf.add(a), ps.add(b), pstr.add(a + b)
            if a == b:
                break
        if len(pre) <= 1:
            return pre
        if stats is not None:
            stats["bounds_jobs"] += 1
        # one small job computes every bound at once (namespaced tags):
        #   A:<s> — max count of pairs ENDING in s (bounds created
        #           left-neighbor pairs of a merge whose a == s)
        #   B:<s> — max count of pairs STARTING with s (right-neighbor)
        #   C:<s> — the merged token STRING s pre-exists in some pair
        #           (pairs touching it can GAIN count — unbounded here)
        a_syms = list({a for a, _, _ in cand})
        b_syms = list({b for _, b, _ in cand})
        concats = list({a + b for a, b, _ in cand})
        tags = F.array_compact(
            F.array(
                F.when(F.col("p.b").isin(a_syms), F.concat(F.lit("A:"), F.col("p.b"))),
                F.when(F.col("p.a").isin(b_syms), F.concat(F.lit("B:"), F.col("p.a"))),
                F.when(F.col("p.a").isin(concats), F.concat(F.lit("C:"), F.col("p.a"))),
                F.when(F.col("p.b").isin(concats), F.concat(F.lit("C:"), F.col("p.b"))),
            )
        )
        bound_rows = (
            pairs.select(F.explode(tags).alias("t"), "n")
            .groupBy("t")
            .agg(F.max("n").alias("m"))
            .collect()
        )
        bound = {r["t"]: int(r["m"]) for r in bound_rows}
        batch: list[tuple[str, str]] = []
        bf: set[str] = set()
        bs: set[str] = set()
        bstr: set[str] = set()
        created_bound = -1
        for a, b, n in cand:
            if n < min_freq:
                break
            if batch and (
                conflicts(a, b, bf, bs, bstr) or n <= created_bound
            ):
                break
            batch.append((a, b))
            bf.add(a), bs.add(b), bstr.add(a + b)
            if a == b or ("C:" + a + b) in bound:
                # created pairs bounded only by n itself (self-pair), or
                # the merged string pre-exists as a symbol — no later
                # candidate can be validated against this merge
                break
            created_bound = max(
                created_bound, bound.get("A:" + a, 0), bound.get("B:" + b, 0)
            )
        return batch
    finally:
        pairs.unpersist()


def segment_word(word: str, ranks: dict[tuple[str, str], int], end_of_word: str) -> list[str]:
    """Reference greedy BPE segmentation of one word: repeatedly merge
    the lowest-rank adjacent pair until none applies.  Matches the
    trainer's fold exactly (left-to-right non-overlapping within a
    rank's pass, ranks applied best-first)."""
    syms = list(word)
    if end_of_word:
        syms.append(end_of_word)
    while len(syms) > 1:
        best_rank, best_idx = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_idx = r, i
        if best_rank is None:
            break
        a, b = syms[best_idx], syms[best_idx + 1]
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
    end_of_word: str = END_OF_WORD,
) -> DataFrame:
    """Tokenize a corpus with a learned merge table: whitespace words,
    each segmented by greedy rank-order BPE, concatenated back into one
    ``array<string>`` per document (plus an ``n_bpe`` count column).

    Arrow-batched ``mapInPandas``; the merge table rides the closure
    (broadcast, tiny) and a per-batch dict memoizes distinct words, so
    the per-row cost is a hash lookup for every repeated word."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    out_fields = [f for f in df.schema.fields if f.name in (id_col,)]
    schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_fields)
        + f", {out_col} array<string>, n_bpe int"
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def seg(word: str) -> list[str]:
            got = cache.get(word)
            if got is None:
                got = cache[word] = segment_word(word, ranks, end_of_word)
            return got

        for pdf in batches:
            toks, counts = [], []
            for text in pdf[text_col]:
                doc: list[str] = []
                for w in (text or "").split():
                    doc.extend(seg(w))
                toks.append(doc)
                counts.append(len(doc))
            out = pd.DataFrame({id_col: pdf[id_col], out_col: toks, "n_bpe": counts})
            yield out

    return ensure_parallelism(df).select(id_col, text_col).mapInPandas(run, schema)
