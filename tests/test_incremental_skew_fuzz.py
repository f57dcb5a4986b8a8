"""Differential fuzzer for the incremental-ingest dedup operators and
the salting helpers:

- `exact_duplicates_incremental` / `minhash_lsh_pairs_incremental` vs
  pure-Python references over a corpus/batch split with cross-side
  duplicates — run with the Bloom prefilter OFF and ON, which must be
  bit-identical (the filter's no-false-negative contract, exercised
  end-to-end through the operators rather than in isolation);
- `salted_aggregate` / `salted_join_left` vs plain Python references
  (sum/count/min/max over skewed keys; join row multisets) at several
  salt_buckets — salting must never change results, only physical
  distribution.
"""

from __future__ import annotations

import hashlib
import random
from collections import Counter

from tests.test_dedup_fuzz import _corpus, _norm, _word_shingle_set
from tests.test_hash_dedup_fuzz import _M31, _mix_constants


def _split(rng: random.Random):
    docs = _corpus(rng, 55)
    return docs[:40], docs[40:]


def test_incremental_exact_matches_reference(spark):
    from topic_store_spark.operators.dedup import exact_duplicates_incremental

    rng = random.Random(0x17C)
    corpus, new = _split(rng)
    fp = {
        i: hashlib.md5(_norm(t).encode()).hexdigest()
        for i, t in corpus + new
    }
    groups: dict[str, list[int]] = {}
    for i, _t in corpus + new:
        groups.setdefault(fp[i], []).append(i)
    want = {}
    for i, _t in new:
        g = groups[fp[i]]
        if len(g) > 1:
            want[i] = (min(g), fp[i], i == min(g))

    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    ndf = spark.createDataFrame(new, "doc_id long, text string")
    for bloom in (False, True):
        got = {
            r["doc_id"]: (r["keep_id"], r["fp"], r["is_keeper"])
            for r in exact_duplicates_incremental(
                ndf, cdf, bloom_prefilter=bloom
            ).collect()
        }
        assert got == want, f"bloom={bloom}: {got} != {want}"


def test_incremental_minhash_matches_reference(spark):
    from topic_store_spark.operators.dedup import minhash_lsh_pairs_incremental

    rng = random.Random(0x17D)
    corpus, new = _split(rng)
    n, num_perm, bands = rng.choice([2, 3]), 12, rng.choice([3, 4])
    tn, td = rng.choice([(1, 2), (7, 10)])
    rows = num_perm // bands
    consts = _mix_constants(num_perm)

    sets = {i: _word_shingle_set(t, n) for i, t in corpus + new}
    bandkeys: dict[int, set[str]] = {}
    for i, shs in sets.items():
        if not shs:
            continue
        keys = [int(hashlib.md5(s.encode()).hexdigest()[:7], 16) for s in shs]
        sig = [min((a * x + b) % _M31 for x in keys) for a, b in consts]
        bandkeys[i] = {
            f"{b}|" + ",".join(str(sig[b * rows + r]) for r in range(rows))
            for b in range(bands)
        }
    new_ids = {i for i, _t in new}
    want = {}
    for x in new_ids:
        if x not in bandkeys:
            continue
        for y, bk in bandkeys.items():
            if y == x or not (bandkeys[x] & bk):
                continue
            a, b = min(x, y), max(x, y)
            if (a, b) in want:
                continue
            common = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - common
            if common * td >= tn * union:
                want[(a, b)] = (common, union, common / union)

    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    ndf = spark.createDataFrame(new, "doc_id long, text string")
    try:
        for bloom in (False, True):
            got = {
                (r["a_doc"], r["b_doc"]): (r["common"], r["union_sz"], r["jaccard"])
                for r in minhash_lsh_pairs_incremental(
                    ndf, cdf, n=n, num_perm=num_perm, bands=bands,
                    threshold_num=tn, threshold_den=td,
                    bloom_prefilter=bloom,
                ).collect()
            }
            assert got == want, (
                f"bloom={bloom} n={n} bands={bands}: "
                f"extra={set(got) - set(want)} missing={set(want) - set(got)}"
            )
    finally:
        spark.catalog.clearCache()


def test_salted_aggregate_matches_reference(spark):
    from topic_store_spark.operators.skew import salted_aggregate

    rng = random.Random(0x5A17)
    rows = []
    for _ in range(600):
        key = "hot" if rng.random() < 0.5 else f"k{rng.randint(0, 20)}"
        rows.append(
            (key, rng.randint(-50, 50), None if rng.random() < 0.1 else rng.randint(0, 9))
        )
    want: dict[str, list] = {}
    for k, v, w in rows:
        e = want.setdefault(k, [0, 0, None, None, 0])
        e[0] += v                      # sum(v)
        e[1] += 1                      # count(*)
        e[2] = v if e[2] is None else min(e[2], v)
        e[3] = v if e[3] is None else max(e[3], v)
        e[4] += w is not None          # count(w) skips nulls
    df = spark.createDataFrame(rows, "key string, v long, w int")
    for buckets in (1, 8, 32):
        got = {
            r["key"]: [r["total"], r["n"], r["lo"], r["hi"], r["nw"]]
            for r in salted_aggregate(
                df, ["key"],
                {
                    "total": ("sum", "v"), "n": ("count", "*"),
                    "lo": ("min", "v"), "hi": ("max", "v"),
                    "nw": ("count", "w"),
                },
                salt_buckets=buckets,
            ).collect()
        }
        assert got == want, f"salt_buckets={buckets}"


def test_salted_join_matches_reference(spark):
    from topic_store_spark.operators.skew import salted_join_left

    rng = random.Random(0x5A18)
    left = [
        ("hot" if rng.random() < 0.5 else f"k{rng.randint(0, 10)}", i)
        for i in range(400)
    ]
    right = [(f"k{i}", f"dim{i}") for i in range(8)] + [("hot", "dimhot")]
    if rng.random() < 0.5:
        right.append(("hot", "dimhot2"))  # duplicate right key: fan-out

    want = Counter(
        (lk, i, rv) for lk, i in left for rk, rv in right if lk == rk
    )
    ldf = spark.createDataFrame(left, "key string, event_id long")
    rdf = spark.createDataFrame(right, "key string, dim string")
    for buckets in (1, 4):
        got = Counter(
            (r["key"], r["event_id"], r["dim"])
            for r in salted_join_left(ldf, rdf, "key", salt_buckets=buckets).collect()
        )
        assert got == want, f"salt_buckets={buckets}"
