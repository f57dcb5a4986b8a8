"""Corpus-curation operator tests: contamination, quality funnel,
domain balancing, token histogram, containment — known-answer fixtures
plus invariants on the real testdata tables."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import table
from topic_store_spark.operators.corpus import (
    domain_topk,
    ngram_contamination,
    quality_filter_funnel,
    token_histogram,
)
from topic_store_spark.operators.dedup import containment_pairs


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return table(spark, sf_dir, "documents")


def test_contamination_known_answer(spark):
    """Eval doc 1 copies train doc 0 verbatim -> contamination 1.0;
    eval doc 3 shares nothing -> 0.0; eval doc 5 shares a prefix."""
    train = spark.createDataFrame(
        [(0, "a b c d e f"), (2, "x y z w v u")], ["doc_id", "text"]
    )
    ev = spark.createDataFrame(
        [
            (1, "a b c d e f"),          # identical to train doc 0
            (3, "p q r s t"),            # disjoint
            (5, "a b c zz yy xx"),       # shares exactly one 3-gram: "a b c"
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["eval_doc"]: r
        for r in ngram_contamination(train, ev, n=3).collect()
    }
    assert rows[1]["contamination"] == 1.0
    assert rows[3]["n_contaminated"] == 0 and rows[3]["contamination"] == 0.0
    assert rows[5]["n_contaminated"] == 1
    assert rows[5]["n_shingles"] == 4
    assert rows[5]["contamination"] == 0.25


def test_contamination_self_train_is_total(docs):
    """Every doc's shingles are fully contained in a train set that
    includes the doc itself."""
    sample = docs.limit(30).select("doc_id", "text")
    out = ngram_contamination(sample, sample, n=3)
    assert out.filter(F.col("contamination") < 1.0).count() == 0


def test_quality_funnel_nests(docs):
    """Funnel stages must be monotonically non-increasing, and the
    keeper stage must remove exactly the constructed duplicates."""
    clone = docs.withColumn("doc_id", F.col("doc_id") + 100000)
    corpus = docs.unionByName(clone)
    out = quality_filter_funnel(corpus, min_quality=0.0).collect()
    assert len(out) > 0
    for r in out:
        assert r["n_total"] >= r["n_lang_ok"] >= r["n_quality_ok"] >= r["n_survivors"]
        # min_quality=0 disables the quality gate, so survivors are the
        # lang-ok docs minus their exact clones (keep-first halves them)
        assert r["n_survivors"] * 2 == r["n_quality_ok"]


def test_domain_topk_cap_and_tiebreak(docs):
    out = domain_topk(docs, domain_col="source", k=3).collect()
    by_domain = {}
    for r in out:
        by_domain.setdefault(r["domain"], []).append(r)
    for domain, rows in by_domain.items():
        assert len(rows) <= 3
        rows.sort(key=lambda r: r["rank"])
        # rank order must agree with (quality desc, doc_id asc)
        keys = [(-r["quality"], r["doc_id"]) for r in rows]
        assert keys == sorted(keys)


def test_token_histogram_totals(docs):
    out = token_histogram(docs, bucket_width=8)
    assert out.agg(F.sum("n_docs")).first()[0] == docs.count()
    bad = out.filter((F.col("bucket_lo") % 8 != 0) | (F.col("bucket_lo") < 0))
    assert bad.count() == 0


def test_containment_catches_subset(spark):
    """A quoted paragraph inside a longer page: low Jaccard, full
    containment."""
    page = "intro words here " + "the quick brown fox jumps over the lazy dog" + " outro trailing words down below the fold"
    quote = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [(1, page), (2, quote), (3, "completely unrelated content words")],
        ["doc_id", "text"],
    )
    rows = containment_pairs(df, n=3, threshold_num=9, threshold_den=10).collect()
    assert [(r["a_doc"], r["b_doc"]) for r in rows] == [(1, 2)]
    assert rows[0]["containment"] == 1.0


def test_repetition_known_answer(spark):
    from topic_store_spark.operators.corpus import repetition_stats

    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "x"), (3, "p q r")], ["doc_id", "text"]
    )
    rows = {r["doc"]: r for r in repetition_stats(df, n=2).collect()}
    # "a b a b a b" -> 2-grams [ab, ba, ab, ba, ab]: 5 total, 2 distinct, top 3
    assert rows[1]["n_grams"] == 5 and rows[1]["n_distinct"] == 2
    assert rows[1]["top_freq"] == 3
    assert rows[1]["dup_frac"] == 1.0 - 2 / 5
    assert rows[1]["top_frac"] == 3 / 5
    assert rows[2]["n_grams"] == 0 and rows[2]["dup_frac"] == 0.0
    assert rows[3]["dup_frac"] == 0.0 and rows[3]["top_frac"] == 0.5


def test_line_and_run_stats_known_answer(spark):
    """Gopher line/run signal primitives: line_array trims (spaces only)
    and drops empties across LF/CRLF; sorted_run_stats counts runs,
    distincts, and char coverage in one pass."""
    from topic_store_spark.functions.text import line_array, sorted_run_stats

    df = spark.createDataFrame(
        [(1, "foo\r\n- bar\nfoo\n\n  baz...\nfoo"), (2, ""), (3, None)],
        ["id", "t"],
    )
    out = df.select(
        "id", F.array_sort(line_array(F.col("t"))).alias("_l")
    ).select("id", F.col("_l").alias("lines"), sorted_run_stats(F.col("_l")).alias("r"))
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["lines"] == ["- bar", "baz...", "foo", "foo", "foo"]
    r1 = rows[1]["r"]
    # foo x3 -> top run 3, 9 duplicated chars; totals 3+3+3+5+6
    assert (r1["n_distinct"], r1["top_freq"], r1["top_chars"]) == (3, 3, 9)
    assert (r1["dup_chars"], r1["tot_chars"]) == (9, 20)
    r2 = rows[2]["r"]
    assert (r2["n_distinct"], r2["top_freq"], r2["tot_chars"]) == (0, 0, 0)
    assert rows[3]["r"] is None  # null text propagates, never errors


def test_mixture_sample_deterministic_and_weighted(docs):
    from topic_store_spark.operators.corpus import mixture_sample

    weights = {"src0": 1.0, "src1": 0.0, "src2": 0.5}
    kept = mixture_sample(docs, weights).select("doc_id", "source")
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(r["doc_id"] for r in kept.collect())
    assert a == b  # reproducible
    by_src = {r["source"] for r in kept.collect()}
    assert "src1" not in by_src and "src3" not in by_src  # 0 / unknown drop
    n_src0 = kept.filter(F.col("source") == "src0").count()
    assert n_src0 == docs.filter(F.col("source") == "src0").count()
    n_src2 = kept.filter(F.col("source") == "src2").count()
    total_src2 = docs.filter(F.col("source") == "src2").count()
    assert 0 < n_src2 < total_src2  # a strict, hash-chosen subset


def test_pack_sequences_known_answer(spark):
    from topic_store_spark.operators.corpus import pack_sequences

    df = spark.createDataFrame(
        [(i, "t t t") for i in range(4)], ["doc_id", "text"]
    )
    rows = {
        (r["shard"], r["window_id"]): r
        for r in pack_sequences(df, ctx=4, shards=1).collect()
    }
    # cumulative-before: 0,3,6,9 -> windows 0,0,1,2
    assert rows[(0, 0)]["n_docs"] == 2 and rows[(0, 0)]["first_doc"] == 0
    assert rows[(0, 1)]["n_docs"] == 1 and rows[(0, 1)]["first_doc"] == 2
    assert rows[(0, 2)]["n_docs"] == 1


def test_pack_sequences_conservation(docs):
    from topic_store_spark.operators.corpus import pack_sequences
    from topic_store_spark.functions.text import token_count

    out = pack_sequences(docs, ctx=128, shards=16)
    total = docs.select(F.sum(token_count(F.col("text")))).first()[0]
    assert out.agg(F.sum("tokens_started")).first()[0] == total
    assert out.agg(F.sum("n_docs")).first()[0] == docs.count()


def test_stratified_split_partitions_corpus(docs):
    from topic_store_spark.operators.corpus import stratified_split

    out = stratified_split(docs, val_permille=100, test_permille=100)
    rows = out.collect()
    assert {r["split"] for r in rows} == {"train", "val", "test"}
    assert sum(r["n_docs"] for r in rows) == docs.count()
    # deterministic: identical on re-run
    again = {(r["strata"], r["split"]): r["n_docs"] for r in out.collect()}
    assert {(r["strata"], r["split"]): r["n_docs"] for r in rows} == again
    # roughly 10% each for val/test (hash uniformity, wide tolerance)
    n = docs.count()
    for split in ("val", "test"):
        got = sum(r["n_docs"] for r in rows if r["split"] == split)
        assert 0.05 * n < got < 0.15 * n


def test_salient_terms_prefers_rare_terms(spark):
    from topic_store_spark.operators.corpus import salient_terms

    df = spark.createDataFrame(
        [
            (0, "common common rare rare other"),
            (1, "common x y z"),
            (2, "common p q r"),
        ],
        ["doc_id", "text"],
    )
    out = {
        (r["doc"], r["rank"]): r for r in salient_terms(df, k=2).collect()
    }
    # doc 0: 'rare' (tf=2, df=1) outranks 'common' (tf=2, df=3)
    top = out[(0, 1)]
    assert top["term"] == "rare" and top["tf"] == 2 and top["df_docs"] == 1
    assert top["salience"] == 2 * (3 / 1)
    assert out[(0, 2)]["term"] == "common"


def test_merge_pair_counts_known_answer(spark):
    from topic_store_spark.operators.corpus import merge_pair_counts

    df = spark.createDataFrame(
        [(0, "a b a b c"), (1, "a b")], ["doc_id", "text"]
    )
    rows = merge_pair_counts(df, k=2).collect()
    # pairs: doc0 -> (a b),(b a),(a b),(b c); doc1 -> (a b)
    assert (rows[0]["pair"], rows[0]["n_occurrences"]) == ("a b", 3)
    assert rows[1]["n_occurrences"] == 1 and rows[1]["pair"] == "b a"


def test_length_percentiles_known_answer(spark):
    from topic_store_spark.operators.corpus import length_percentiles

    df = spark.createDataFrame(
        [(i, "a", i) for i in range(1, 11)] + [(99, "b", 7)],
        ["doc_id", "lang", "n_chars"],
    )
    out = {r["strata"]: r for r in length_percentiles(df).collect()}
    a = out["a"]
    # values 1..10: p50 = rank ceil(5.0) = 5, p90 = rank 9, p99 = rank 10
    assert (a["p50"], a["p90"], a["p99"]) == (5, 9, 10)
    assert a["n_docs"] == 10
    b = out["b"]
    assert (b["p50"], b["p90"], b["p99"]) == (7, 7, 7)


def test_unigram_logprob_known_answer(spark):
    """Two-doc corpus: 'a a b' + 'a c'.  Vocab: a=3, b=1, c=1, N=5.
    lp_milli(a)=round(ln(3/5)*1000)=-511, lp(b)=lp(c)=round(ln(1/5)*1000)
    =-1609.  Doc 0 nll = 2*511+1609 = 2631; doc 1 = 511+1609 = 2120."""
    import math

    from topic_store_spark.operators.corpus import unigram_logprob

    df = spark.createDataFrame([(0, "a a b"), (1, "a c")], ["doc_id", "text"])
    out = {r["doc"]: r for r in unigram_logprob(df).collect()}
    lp_a = round(math.log(3 / 5) * 1000)  # -511
    lp_rare = round(math.log(1 / 5) * 1000)  # -1609
    assert out[0]["n_tokens"] == 3
    assert out[0]["nll_milli"] == -(2 * lp_a + lp_rare)
    assert out[1]["nll_milli"] == -(lp_a + lp_rare)
    assert out[0]["mean_nll_milli"] == out[0]["nll_milli"] // 3
    assert out[0]["ppl_bucket"] == out[0]["mean_nll_milli"] // 500


def test_unigram_logprob_rare_scores_worse(docs):
    """A gibberish-token doc must land in a strictly higher perplexity
    bucket than the corpus it was appended to (rare tokens -> high NLL)."""
    from topic_store_spark.operators.corpus import unigram_logprob

    base = docs.limit(50).select("doc_id", "text")
    spark = base.sparkSession
    noise = spark.createDataFrame(
        [(999999, "zzqx1 zzqx2 zzqx3 zzqx4 zzqx5")], ["doc_id", "text"]
    )
    out = unigram_logprob(base.unionByName(noise))
    noise_row = out.filter(F.col("doc") == 999999).collect()[0]
    avg_rest = out.filter(F.col("doc") != 999999).agg(
        F.avg("mean_nll_milli")
    ).collect()[0][0]
    assert noise_row["mean_nll_milli"] > avg_rest


def test_importance_resample_favors_target_like_docs(spark):
    """Docs drawn from the target's vocabulary must carry higher average
    log-ratios than docs from a disjoint vocabulary, and every
    target-like doc with avg_ratio >= 0 must be accepted."""
    from topic_store_spark.operators.corpus import importance_resample

    tgt_docs = [(i, "alpha beta gamma delta " * 3) for i in range(10)]
    off_docs = [(100 + i, "omega sigma theta kappa " * 3) for i in range(10)]
    raw = spark.createDataFrame(tgt_docs + off_docs, ["doc_id", "text"])
    target = spark.createDataFrame(tgt_docs, ["doc_id", "text"])
    out = {r["doc"]: r for r in importance_resample(raw, target).collect()}
    tgt_avg = sum(out[i]["avg_ratio_milli"] for i in range(10)) / 10
    off_avg = sum(out[100 + i]["avg_ratio_milli"] for i in range(10)) / 10
    assert tgt_avg > off_avg
    for i in range(10):
        if out[i]["avg_ratio_milli"] >= 0:
            assert out[i]["accept"]


def test_importance_resample_deterministic(docs):
    """Re-running the operator yields byte-identical decisions (no RNG
    state anywhere)."""
    from topic_store_spark.operators.corpus import importance_resample

    base = docs.limit(80).select("doc_id", "text")
    target = base.filter(F.col("doc_id") % 10 == 1)
    a = sorted(importance_resample(base, target).collect())
    b = sorted(importance_resample(base, target).collect())
    assert a == b


def test_temperature_sample_flattens_toward_smallest(spark):
    """alpha=1/2 flattening: the smallest stratum keeps everything,
    larger strata keep ~sqrt(n_min/n_s) of their docs, decisions are
    deterministic and integer-exact (no float pow in the predicate)."""
    from topic_store_spark.operators.corpus import temperature_sample

    rows = (
        [("big", i) for i in range(1000)]
        + [("mid", 10_000 + i) for i in range(250)]
        + [("small", 20_000 + i) for i in range(40)]
    )
    df = spark.createDataFrame(rows, "source string, doc_id long")
    got = {
        r["source"]: r["n"]
        for r in temperature_sample(df)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got["small"] == 40  # rate 1: nothing dropped
    # expected ~ n * sqrt(40/n): big ~200, mid ~100 (hash noise ~+-15%)
    assert 150 <= got["big"] <= 260
    assert 70 <= got["mid"] <= 130
    again = temperature_sample(df).count()
    assert again == sum(got.values())


def test_chunk_documents_layout_and_overlap(spark):
    """150 tokens at chunk=64/overlap=16 -> stride 48 -> chunks of
    64/64/54; a doc of exactly one chunk emits exactly one; a short doc
    still emits chunk 0; fingerprints differ across chunks of the same
    doc (the slices differ) and repeat across identical docs."""
    from topic_store_spark.operators.corpus import chunk_documents

    long_text = " ".join(f"t{i}" for i in range(150))
    df = spark.createDataFrame(
        [(1, long_text), (2, "a b"), (3, " ".join(f"x{i}" for i in range(64))),
         (4, long_text)],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk=64, overlap=16)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    assert [rows[(1, i)]["n_tokens"] for i in range(3)] == [64, 64, 54]
    assert rows[(2, 0)]["n_tokens"] == 2 and (2, 1) not in rows
    assert rows[(3, 0)]["n_tokens"] == 64 and (3, 1) not in rows
    fps = [rows[(1, i)]["chunk_fp"] for i in range(3)]
    assert len(set(fps)) == 3
    assert [rows[(4, i)]["chunk_fp"] for i in range(3)] == fps
    # overlap: chunk 1 starts at token 48, so tokens 48..63 are in both
    import pytest

    with pytest.raises(ValueError):
        chunk_documents(df, chunk=16, overlap=16)


def test_bigram_logprob_backoff_accounting(spark):
    """LM on a reference slice, scored corpus: seen bigrams use
    ln(c12/c1); unseen bigrams of seen words back off; unseen words hit
    the floor.  Hand-checked milli-nat arithmetic."""
    import math

    from topic_store_spark.operators.corpus import bigram_logprob

    lm = spark.createDataFrame(
        [(1, "a b a b c")], "doc_id long, text string"
    )
    score = spark.createDataFrame(
        [(10, "a b c"), (11, "b a"), (12, "z q")],
        "doc_id long, text string",
    )
    out = {r["doc"]: r for r in bigram_logprob(score, lm).collect()}
    # LM: bigrams [a b, b a, b c]; c12: ab=2, ba=1, bc=1; c1: a=2, b=2
    # unigrams: a=2 b=2 c=1, total=5
    m = lambda x: round(math.log(x) * 1000)
    # doc 10 = [a b, b c]: ln(2/2) + ln(1/2); no backoff
    assert out[10]["n_backoff"] == 0
    assert out[10]["nll_milli"] == -(m(2 / 2) + m(1 / 2))
    # doc 11 = [b a]: seen, ln(1/2)
    assert out[11]["nll_milli"] == -m(1 / 2)
    # doc 12 = [z q]: unseen bigram of unseen word -> floor ln(0.4/5)
    assert out[12]["n_backoff"] == 1
    assert out[12]["nll_milli"] == -m(0.4 / 5)
    # backoff to a SEEN unigram: "c a" -> ln(0.4 * 2/5)
    out2 = {
        r["doc"]: r
        for r in bigram_logprob(
            spark.createDataFrame([(20, "c a")], "doc_id long, text string"),
            lm,
        ).collect()
    }
    assert out2[20]["n_backoff"] == 1
    assert out2[20]["nll_milli"] == -m(0.4 * 2 / 5)


def test_compression_ratio_separates_tails(spark):
    """Prose compresses moderately, repeated boilerplate compresses
    extremely, random hex barely compresses; empty docs report 1000."""
    import hashlib

    from topic_store_spark.operators.corpus import compression_ratio

    rand = " ".join(
        hashlib.md5(str(i).encode()).hexdigest() for i in range(60)
    )
    prose = (
        "the quick brown fox jumps over the lazy dog and then wanders "
        "slowly through the quiet forest looking for something new to "
        "see while the evening light fades over the hills beyond "
    ) * 5
    boiler = "all rights reserved " * 100
    df = spark.createDataFrame(
        [(1, prose), (2, boiler), (3, rand), (4, "")],
        "doc_id long, text string",
    )
    out = {r["doc"]: r for r in compression_ratio(df).collect()}
    assert out[2]["ratio_milli"] < out[1]["ratio_milli"] < out[3]["ratio_milli"]
    assert out[3]["ratio_milli"] > 500  # random hex: poor compression
    assert out[2]["ratio_milli"] < 100  # boilerplate: extreme compression
    assert out[4]["ratio_milli"] == 1000 and out[4]["n_bytes"] == 0
    # deterministic across runs
    again = {r["doc"]: r["ratio_milli"] for r in compression_ratio(df).collect()}
    assert again == {d: r["ratio_milli"] for d, r in out.items()}


def test_bm25_known_answer(spark):
    """Hand-computed Okapi BM25 (Lucene +1 idf) in milli-units."""
    import math

    from topic_store_spark.operators.corpus import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "cat dog cat"),          # dl 3
            (2, "dog bird"),             # dl 2
            (3, "fish fish fish fish"),  # dl 4
        ],
        "doc_id long, text string",
    )
    out = {r["doc"]: r for r in bm25_scores(docs, ["cat", "dog"]).collect()}
    n, avgdl, k1, b = 3, 3.0, 1.2, 0.75

    def contrib(tf, df, dl):
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        tfp = (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        return round(idf * tfp * 1000)

    assert 3 not in out  # matches no query term
    assert out[1]["n_terms_matched"] == 2
    assert out[1]["bm25_milli"] == contrib(2, 1, 3) + contrib(1, 2, 3)
    assert out[2]["n_terms_matched"] == 1
    assert out[2]["bm25_milli"] == contrib(1, 2, 2)
    # rarer term ("cat") outscores the common one at equal tf
    assert contrib(1, 1, 3) > contrib(1, 2, 3)


def test_bm25_duplicate_query_terms_dedupe(spark):
    """r10 ADVICE: a repeated query term must not double-count in
    n_terms_matched / bm25_milli (the old explode+isin plan dedup'd
    implicitly; the map-side array-filter plan must do it explicitly)."""
    from topic_store_spark.operators.corpus import bm25_scores

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "cherry banana"), (3, "kiwi")],
        "doc_id long, text string",
    )
    once = sorted(tuple(r) for r in bm25_scores(docs, ["apple", "banana"]).collect())
    twice = sorted(
        tuple(r)
        for r in bm25_scores(
            docs, ["apple", "banana", "apple", "apple"]
        ).collect()
    )
    assert once == twice


def _formatted_plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_salient_terms_df_via_aggregate_not_window(spark):
    """r10 ADVICE: document frequency must attach via a term-keyed
    AGGREGATE + JOIN (map-side partials + AQE-skew-splittable), not a
    `count over (partition by term)` window — under Zipf the hottest
    term would put ~n_docs rows into ONE window task with no partials
    and no skew splitting.  Exactly one Window survives: the per-doc
    top-k."""
    import re

    from topic_store_spark.operators.corpus import salient_terms

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b"), (3, "a")], "doc_id long, text string"
    )
    plan = _formatted_plan(salient_terms(docs))
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1, plan


def test_lm_logprob_operators_build_lazily(spark):
    """r10 ADVICE: constructing unigram/bigram logprob plans must run
    NO job (r9 ran an eager full-corpus .first() for the token total —
    explain/audit became a full scan).  A scan that raises on execution
    proves it: construction succeeds, collection raises."""
    from topic_store_spark.operators.corpus import bigram_logprob, unigram_logprob

    poison = F.when(
        F.length(F.raise_error(F.concat(F.lit("poisoned-scan-"),
                                        F.col("id").cast("string")))) < 0,
        F.lit("x"),
    ).otherwise(F.lit("y z"))
    docs = spark.range(3).select(F.col("id").alias("doc_id"),
                                 poison.alias("text"))
    uni = unigram_logprob(docs)  # must not raise / run anything
    bi = bigram_logprob(docs, docs)
    with pytest.raises(Exception, match="poisoned-scan"):
        uni.collect()
    with pytest.raises(Exception, match="poisoned-scan"):
        bi.collect()


def test_lm_logprob_pretokenized_matches_text_input(spark):
    """r10: passing a pre-tokenized array<string> column (the shared
    persisted relation the perplexity composite builds) must give
    byte-identical results to tokenizing inside the operator."""
    from topic_store_spark.functions.text import tokens
    from topic_store_spark.operators.corpus import bigram_logprob, unigram_logprob

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat"),
            (3, "a cat and a dog and a bird"),
            (4, "completely unseen tokens here"),
        ],
        "doc_id long, text string",
    )
    tk = docs.select("doc_id", tokens(F.col("text")).alias("text"))
    lm = docs.filter(F.col("doc_id") <= 2)
    lm_tk = tk.filter(F.col("doc_id") <= 2)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(unigram_logprob(docs)) == rows(unigram_logprob(tk))
    assert rows(bigram_logprob(docs, lm)) == rows(bigram_logprob(tk, lm_tk))


def test_sampling_report_matches_composed_operators(spark):
    """r12 fused sampling_report == the union of mixture_sample,
    stratified_split, temperature_sample rollups, row for row —
    including a null-source row (mixture/temperature drop it, split
    keeps it under its own stratum) and a null-lang stratum."""
    from pyspark.sql import functions as F

    from topic_store_spark.operators.corpus import (
        mixture_sample,
        sampling_report,
        stratified_split,
        temperature_sample,
    )

    rows = [
        (i, ["a", "b", None][i % 3], ["en", "de", None, "fr"][i % 4])
        for i in range(400)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, lang string")
    weights = {"a": 0.8, "b": 0.3}

    fused = sampling_report(docs, weights, val_permille=150, test_permille=50)

    def rollup(kind, df_in, strata_col):
        return (
            df_in.groupBy(F.col(strata_col).alias("strata"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.min("doc_id").alias("min_doc"),
                F.max("doc_id").alias("max_doc"),
            )
            .select(
                F.lit(kind).alias("kind"), "strata",
                F.lit("kept").alias("subkey"), "n_docs", "min_doc", "max_doc",
            )
        )

    composed = (
        rollup("mixture", mixture_sample(docs, weights), "source")
        .unionByName(
            stratified_split(docs, val_permille=150, test_permille=50).select(
                F.lit("split").alias("kind"), "strata",
                F.col("split").alias("subkey"), "n_docs", "min_doc", "max_doc",
            )
        )
        .unionByName(
            rollup("temperature", temperature_sample(docs, strata_col="source"),
                   "source")
        )
    )
    key = lambda r: (r["kind"], r["strata"], r["subkey"])  # noqa: E731
    a = sorted((tuple(r) for r in fused.collect()), key=str)
    b = sorted((tuple(r) for r in composed.collect()), key=str)
    assert a == b and len(a) > 5


def test_sampling_report_integer_strata_canonicalized_to_string(spark):
    """r12 ADVICE: the report canonicalizes strata/subkey to string;
    composing the operators on a NON-STRING strata column must match
    after the documented cast-to-string on each rollup's strata key."""
    from pyspark.sql import functions as F

    from topic_store_spark.operators.corpus import (
        mixture_sample,
        sampling_report,
        stratified_split,
        temperature_sample,
    )

    rows = [(i, [10, 20, 30][i % 3], i % 4) for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, src_id int, lang_id int")
    weights = {10: 0.9, 30: 0.4}  # weights key on the NATIVE domain values
    fused = sampling_report(
        docs, weights, domain_col="src_id", split_strata_col="lang_id")
    assert dict(fused.dtypes)["strata"] == "string"
    assert dict(fused.dtypes)["subkey"] == "string"

    def rollup(kind, df_in, strata_col):
        return (
            df_in.groupBy(F.col(strata_col).cast("string").alias("strata"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.min("doc_id").alias("min_doc"),
                F.max("doc_id").alias("max_doc"),
            )
            .select(
                F.lit(kind).alias("kind"), "strata",
                F.lit("kept").alias("subkey"), "n_docs", "min_doc", "max_doc",
            )
        )

    composed = (
        rollup("mixture", mixture_sample(docs, weights, domain_col="src_id"),
               "src_id")
        .unionByName(
            stratified_split(docs, strata_col="lang_id").select(
                F.lit("split").alias("kind"),
                F.col("strata").cast("string").alias("strata"),
                F.col("split").alias("subkey"), "n_docs", "min_doc", "max_doc",
            )
        )
        .unionByName(
            rollup("temperature",
                   temperature_sample(docs, strata_col="src_id"), "src_id")
        )
    )
    a = sorted((tuple(r) for r in fused.collect()), key=str)
    b = sorted((tuple(r) for r in composed.collect()), key=str)
    assert a == b and len(a) > 5
