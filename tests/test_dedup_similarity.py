"""Dedup + similarity operator tests, including cross-engine (DuckDB)
portability checks of the md5-based hashing primitives."""

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import table
from topic_store_spark.functions.hashing import (
    md5_fingerprint,
    minhash_signature,
    simhash_bits,
)
from topic_store_spark.functions.text import tokens, word_shingles
from topic_store_spark.operators.dedup import (
    embedding_dup_pairs,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from topic_store_spark.operators.similarity import lsh_ann_neighbors, topk_neighbors


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def docs_with_dups(docs):
    clone = docs.withColumn("doc_id", F.col("doc_id") + 100000)
    return docs.unionByName(clone)


def test_exact_duplicates(docs, docs_with_dups):
    assert exact_duplicates(docs).count() == 0  # corpus is unique
    groups = exact_duplicates(docs_with_dups)
    n_docs = docs.count()
    rows = groups.collect()
    assert len(rows) == n_docs
    for r in rows[:5]:
        assert r["n_docs"] == 2
        assert r["keep_id"] == min(r["doc_ids"])


def test_minhash_matches_duckdb(spark, docs):
    """The MinHash signature must be bit-identical to the DuckDB-SQL
    formulation — the whole point of md5-based hashing."""
    sdf = (
        docs.limit(50)
        .select(
            "doc_id",
            minhash_signature(
                F.array_distinct(word_shingles(F.col("text"), 3)), 4
            ).alias("sig"),
        )
        .collect()
    )
    spark_sigs = {r["doc_id"]: list(r["sig"]) for r in sdf}
    con = duckdb.connect()
    sql = f"""
        WITH tok AS (
          SELECT doc_id,
                 list_distinct([array_to_string(tk[i:i+2], ' ')
                   for i in range(1, len(tk) - 1)]) AS sh
          FROM (SELECT doc_id,
                       list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                   x -> x <> '') AS tk
                FROM '/root/testdata/sf0.001/documents.parquet') t
          WHERE len(tk) >= 3
        )
        SELECT doc_id,
               [list_min(list_transform(sh, s -> md5(i || ':' || s)))
                for i in range(0, 4)] AS sig
        FROM tok ORDER BY doc_id LIMIT 50
    """
    for doc_id, sig in con.execute(sql).fetchall():
        assert spark_sigs[doc_id] == sig, f"doc {doc_id} signature mismatch"


def test_simhash_matches_duckdb(spark, docs):
    sdf = (
        docs.limit(30)
        .select("doc_id", simhash_bits(tokens(F.col("text")), 16).alias("sim"))
        .collect()
    )
    spark_sims = {r["doc_id"]: r["sim"] for r in sdf}
    con = duckdb.connect()
    sql = """
        WITH tok AS (
          SELECT doc_id,
                 list_transform(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                            x -> x <> ''), t -> md5(t)) AS hs,
                 len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                 x -> x <> '')) AS n
          FROM '/root/testdata/sf0.001/documents.parquet')
        SELECT doc_id,
               array_to_string([CASE WHEN 2 * len(list_filter(hs,
                   h -> strpos('13579bdf', h[i]) > 0)) > n
                 THEN '1' ELSE '0' END for i in range(1, 17)], '') AS sim
        FROM tok ORDER BY doc_id LIMIT 30
    """
    for doc_id, sim in con.execute(sql).fetchall():
        assert spark_sims[doc_id] == sim, f"doc {doc_id} simhash mismatch"


def test_exact_jaccard_pairs(spark):
    rows = [
        (1, "a b c d e f"),
        (2, "a b c d e f"),        # identical -> jaccard 1.0
        (3, "a b c d e g"),        # shares 3 of 4+4-3=5 shingles with 1
        (4, "x y z w q v"),        # disjoint
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = ngram_jaccard_pairs(df, n=3, threshold_num=1, threshold_den=2).collect()
    got = {(r["a_doc"], r["b_doc"]): r["jaccard"] for r in pairs}
    assert got[(1, 2)] == 1.0
    assert got[(1, 3)] == 0.6 and got[(2, 3)] == 0.6
    assert (1, 4) not in got and (3, 4) not in got


def test_word_overlap_pairs_both_metrics(spark):
    """One shingle join yields BOTH screens: a near-subset pair passes
    containment but not jaccard; an identical pair passes both."""
    from topic_store_spark.operators.dedup import word_overlap_pairs

    rows = [
        (1, "a b c d e f g h i j"),
        (2, "a b c d e f g h i j"),   # identical: jaccard=containment=1
        (3, "a b c d e"),             # subset of 1: containment 1, low jaccard
        (4, "q w r t y u o p s k"),   # disjoint
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        (r["a_doc"], r["b_doc"]): r
        for r in word_overlap_pairs(
            df, n=3, jaccard_num=8, jaccard_den=10,
            containment_num=9, containment_den=10,
        ).collect()
    }
    assert out[(1, 2)]["jaccard_hit"] and out[(1, 2)]["containment_hit"]
    assert out[(1, 2)]["jaccard"] == 1.0 and out[(1, 2)]["containment"] == 1.0
    # doc 3's 3 shingles are all inside doc 1's 8 -> containment 1.0,
    # jaccard 3/8 — containment-only hit
    assert out[(1, 3)]["containment_hit"] and not out[(1, 3)]["jaccard_hit"]
    assert (1, 4) not in out


def test_shingle_freq_cap_filters_universe(spark):
    """max_shingle_freq drops stop-shingles from BOTH numerator and
    denominator: a pair identical except for ubiquitous shingles still
    scores 1.0 in the filtered universe, and the hot shingle generates
    no candidate pairs on its own."""
    from topic_store_spark.operators.dedup import ngram_jaccard_pairs

    # "z z z" appears in every doc (the stop-shingle); docs 1/2 are
    # otherwise identical, docs 3/4 share ONLY the stop-shingle
    rows = [
        (1, "z z z a b c d e"),
        (2, "z z z a b c d e"),
        (3, "z z z m n o p q"),
        (4, "z z z u v w x y"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    capped = ngram_jaccard_pairs(
        df, n=3, threshold_num=8, threshold_den=10, max_shingle_freq=2
    ).collect()
    got = {(r["a_doc"], r["b_doc"]): r["jaccard"] for r in capped}
    assert got == {(1, 2): 1.0}  # 3/4 pair never materializes


def test_minhash_lsh_finds_exact_dups(docs_with_dups):
    pairs = minhash_lsh_pairs(
        docs_with_dups, num_perm=8, bands=4, threshold_num=9, threshold_den=10
    )
    found = pairs.filter(F.col("b_doc") - F.col("a_doc") == 100000).count()
    n = docs_with_dups.count() // 2
    # identical docs minhash-collide on every band -> all recovered
    assert found == n


def test_simhash_finds_exact_dups(docs_with_dups):
    pairs = simhash_pairs(docs_with_dups, bits=32, band_bits=8, max_hamming=0)
    found = pairs.filter(F.col("b_doc") - F.col("a_doc") == 100000).count()
    assert found == docs_with_dups.count() // 2


def test_embedding_dup_pairs_self_union(embeddings):
    clone = embeddings.withColumn("vec_id", F.col("vec_id") + 100000)
    both = embeddings.unionByName(clone)
    pairs = embedding_dup_pairs(both, threshold_num=999, threshold_den=1000)
    exact = pairs.filter(F.col("b_id") - F.col("a_id") == 100000)
    assert exact.count() == embeddings.count()
    assert exact.agg(F.min("cosine_q")).first()[0] > 0.999


def test_topk_neighbors(embeddings):
    queries = embeddings.filter(F.col("vec_id") < 3)
    out = topk_neighbors(embeddings, queries, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rows in by_q.items():
        assert [r["rank"] for r in sorted(rows, key=lambda x: x["rank"])] == [1, 2, 3, 4, 5]
        cosines = [r["cosine_q"] for r in sorted(rows, key=lambda x: x["rank"])]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r["neighbor_id"] != q for r in rows)


def test_lsh_ann_recall(embeddings):
    queries = embeddings.filter(F.col("vec_id") < 10)
    exact = topk_neighbors(embeddings, queries, k=3).collect()
    approx = lsh_ann_neighbors(embeddings, queries, k=3, planes=4).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    # ANN with 4 planes over 64-dim unit vectors: expect meaningful recall
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.2, f"suspiciously low ANN recall {recall}"
    # approx results must be a subset of the same-bucket candidates, and
    # every query still gets rows
    assert {r["query_id"] for r in approx} == set(range(10))


def test_embedding_lsh_dup_pairs_match_brute_force(embeddings):
    from topic_store_spark.operators.dedup import (
        embedding_dup_pairs,
        embedding_dup_pairs_lsh,
    )
    from pyspark.sql import functions as F

    clone = embeddings.select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    both = embeddings.select("vec_id", "embedding").unionByName(clone)
    brute = {(r["a_id"], r["b_id"]) for r in embedding_dup_pairs(both).collect()}
    lsh = {(r["a_id"], r["b_id"]) for r in embedding_dup_pairs_lsh(both).collect()}
    # candidates are a subset of the exact pair space...
    assert lsh <= brute
    # ...and identical vectors always share a bucket -> full recall on clones
    clone_pairs = {p for p in brute if p[1] - p[0] == 100000}
    assert clone_pairs <= lsh


def test_topk_partial_matches_window_topk_at_large_q(embeddings):
    """Partial top-k aggregation returns EXACTLY the window variant's
    results — with every corpus vector as a query (large-Q regime) — and
    its plan contains no Window over the scored pairs: the first
    aggregate completes map-side (group key includes the partition id),
    so only q x partitions x k candidate rows shuffle."""
    from topic_store_spark.operators.similarity import topk_neighbors_partial

    queries = embeddings  # Q == corpus size: the regime windows fall over in
    window_rows = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], round(r["cosine_q"], 9))
        for r in topk_neighbors(embeddings, queries, k=3).collect()
    }
    partial = topk_neighbors_partial(embeddings, queries, k=3)
    partial_rows = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], round(r["cosine_q"], 9))
        for r in partial.collect()
    }
    assert partial_rows == window_rows

    plan = partial._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # no per-query global sort of scored pairs


@pytest.mark.parametrize("dme", [0, 1 << 20])
def test_connected_components_chain_and_islands(spark, dme):
    """Min-label propagation: a 4-node chain collapses to one component
    even though no pair spans it directly; disjoint pairs stay separate;
    every node labels with the minimum reachable id.  Runs both the
    distributed star-contraction path (dme=0) and the bounded driver
    union-find fast path (dme=2^20)."""
    from topic_store_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],
        "a_doc long, b_doc long",
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(pairs, driver_max_edges=dme).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


@pytest.mark.parametrize("dme", [0, 1 << 20])
def test_connected_components_long_chain(spark, dme):
    """r2 verdict item 7: a 10k-node chain is the worst case for
    label propagation (diameter = n); large-star/small-star contraction
    must converge in O(log n) rounds and label every node with the true
    minimum (0)."""
    from topic_store_spark.operators.dedup import connected_components

    n = 10_000
    pairs = spark.range(n - 1).selectExpr("id AS a_doc", "id + 1 AS b_doc")
    labels = connected_components(pairs, driver_max_edges=dme)
    agg = labels.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("component").alias("n_comp"),
        F.max("component").alias("max_comp"),
    ).first()
    assert (agg["n"], agg["n_comp"], agg["max_comp"]) == (n, 1, 0)


def test_connected_components_probe_gate_parity_and_boundary(spark):
    """r13 optimization: the single-probe driver gate (CC_PROBE_GATE)
    must label identically to the r12 three-job gate, on BOTH sides of
    the ``driver_max_edges`` boundary (probe == K rows -> fast path;
    probe == K+1 rows -> distributed rounds), including exactly-at-K."""
    from topic_store_spark.operators import dedup as dedup_mod
    from topic_store_spark.operators.dedup import connected_components

    # 5 distinct canonical edges: chain 1-2-3 + pair (10,11) + (20,21),
    # with a duplicate and a self-loop that must not count toward K
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20), (9, 9)],
        "a_doc long, b_doc long",
    )
    want = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 9: 9}
    orig = dedup_mod.CC_PROBE_GATE
    orig_local = dedup_mod.CC_LOCAL_RESULT
    try:
        for local in (True, False):
            dedup_mod.CC_LOCAL_RESULT = local
            for gate in (True, False):
                dedup_mod.CC_PROBE_GATE = gate
                # dme 4/5/6 straddle the 5 distinct canonical edges
                # (r13 probe tier); 6/7/8 straddle the 7 RAW pair rows
                # (r14 local tier — dup + self-loop DO count toward its
                # bound, so dme=6 overflows it into the r13 tiers)
                for dme in (4, 5, 6, 7, 8):
                    got = {
                        r["node"]: r["component"]
                        for r in connected_components(
                            pairs, driver_max_edges=dme
                        ).collect()
                    }
                    assert got == want, (local, gate, dme)
    finally:
        dedup_mod.CC_PROBE_GATE = orig
        dedup_mod.CC_LOCAL_RESULT = orig_local


def test_connected_components_giant_star_and_selfloop(spark):
    """A giant star (hub = max id, the shape label propagation handles
    worst when the hub is NOT the min) plus a self-loop-only node."""
    from topic_store_spark.operators.dedup import connected_components

    hub = 5_000
    rows = [(hub, leaf) for leaf in range(3, 1000)] + [(7777, 7777)]
    pairs = spark.createDataFrame(rows, "a_doc long, b_doc long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(pairs, driver_max_edges=0).collect()
    }
    assert got[hub] == 3 and got[999] == 3 and got[3] == 3
    assert got[7777] == 7777  # self-loop node labels itself
    assert len(got) == (1000 - 3) + 2


def test_semantic_cluster_dedup_matches_brute_within_cluster(spark, sf_dir):
    """Every within-cluster pair found by brute force appears in the
    clustered output with an identical cosine, and everything the
    clustered path reports is a true >=0.95 pair."""
    from tests.conftest import table
    from topic_store_spark.operators.dedup import (
        embedding_dup_pairs,
        semantic_cluster_dedup,
    )

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    clone = emb.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    both = emb.unionByName(clone)
    sem = semantic_cluster_dedup(both, centroids=emb.filter(F.col("vec_id") < 8))
    brute = embedding_dup_pairs(both)
    sem_pairs = {(r["a_id"], r["b_id"]): r["cosine_q"] for r in sem.collect()}
    brute_pairs = {(r["a_id"], r["b_id"]): r["cosine_q"] for r in brute.collect()}
    # soundness: clustered output is a subset of the brute-force truth
    for pair, cos in sem_pairs.items():
        assert brute_pairs[pair] == cos
    # recall on this corpus: near-identical vectors co-cluster
    assert len(sem_pairs) / len(brute_pairs) >= 0.9


def test_semantic_dedup_multiprobe_recovers_boundary_pairs(spark):
    """A near-identical pair straddling the bisector of two centroids is
    MISSED by single-assignment (each member lands in a different
    cluster) and RECOVERED by n_probe=2, whose epsilon near-tie rule
    also assigns boundary vectors to the runner-up centroid.  Interior
    pairs are unaffected and the multi-probe pair set stays deduplicated."""
    from topic_store_spark.operators.dedup import semantic_cluster_dedup

    cen = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], ["vec_id", "embedding"]
    )
    vecs = spark.createDataFrame(
        [
            # boundary pair: nearly identical, opposite sides of the bisector
            (10, [0.71, 0.70]),
            (11, [0.70, 0.71]),
            # interior pair: both clearly in cluster 0
            (20, [1.0, 0.01]),
            (21, [1.0, 0.012]),
            # a lone far vector in cluster 1
            (30, [0.1, 0.9]),
        ],
        ["vec_id", "embedding"],
    )
    single = semantic_cluster_dedup(vecs, cen)
    probed = semantic_cluster_dedup(vecs, cen, n_probe=2, probe_eps=0.05)
    single_pairs = {(r["a_id"], r["b_id"]) for r in single.collect()}
    probed_rows = probed.collect()
    probed_pairs = [(r["a_id"], r["b_id"]) for r in probed_rows]
    assert (10, 11) not in single_pairs          # the single-probe miss
    assert (20, 21) in single_pairs
    assert (10, 11) in probed_pairs              # recovered
    assert (20, 21) in probed_pairs
    assert len(probed_pairs) == len(set(probed_pairs))  # deduplicated


def test_kmeans_centroids_recovers_blobs(spark):
    """Distributed Lloyd's on 3 well-separated blobs: k dense ids, each
    learned centroid lands on a true blob mean, assignment is stable."""
    import numpy as np

    from topic_store_spark.operators.similarity import kmeans_centroids

    rng = np.random.default_rng(11)
    means = np.array([[0.0, 0.0, 0.0], [10.0, 10.0, 10.0], [-10.0, 5.0, 0.0]])
    rows = []
    for i in range(90):
        m = means[i % 3]
        rows.append((i, (m + rng.normal(0, 0.05, 3)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cen = kmeans_centroids(df, k=3, max_iter=15).collect()
    assert sorted(r["cen_id"] for r in cen) == [0, 1, 2]
    got = np.array(sorted([r["embedding"] for r in cen]))
    want = np.array(sorted(means.tolist()))
    assert np.abs(got - want).max() < 0.1


def test_kmeans_centroids_feeds_ivf(spark, sf_dir):
    """End-to-end IVF build: train centroids on the embeddings table,
    then probe them — the FAISS train-then-search shape."""
    from tests.conftest import table
    from topic_store_spark.operators.similarity import (
        ivf_ann_neighbors,
        kmeans_centroids,
    )

    emb = table(spark, sf_dir, "embeddings")
    cen = kmeans_centroids(emb, k=4, max_iter=3).withColumnRenamed(
        "cen_id", "vec_id"
    )
    out = ivf_ann_neighbors(
        emb, queries=emb.filter(F.col("vec_id") < 5), centroids=cen, k=3, nprobe=2
    )
    assert out.count() == 15  # 5 queries x top-3
    assert out.filter(F.col("cosine_q").isNull()).count() == 0


def test_exact_duplicates_incremental(spark):
    from topic_store_spark.operators.dedup import exact_duplicates_incremental

    corpus = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [(10, "alpha beta"),   # dup of corpus doc 1
         (11, "fresh text"),   # genuinely new
         (12, "fresh text"),   # intra-batch dup of 11
         (0, "gamma delta")],  # dup of corpus doc 2 — but NEW id sorts first
        ["doc_id", "text"],
    )
    rows = exact_duplicates_incremental(new, corpus).collect()
    got = {r["doc_id"]: (r["keep_id"], r["is_keeper"]) for r in rows}
    # keeper = min id across corpus+batch; the new doc that IS the keeper
    # is still reported (is_keeper=True) so the caller can evict the
    # corpus-side copy instead of silently keeping both.
    assert got == {10: (1, False), 11: (11, True), 12: (11, False), 0: (0, True)}


def test_minhash_incremental_excludes_corpus_pairs(docs):
    """Incremental pairs = full-union pairs that touch the new batch;
    pure corpus-corpus pairs never appear (the whole point)."""
    from topic_store_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_incremental,
    )

    corpus = docs.select("doc_id", "text").limit(200)
    new = corpus.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" qq ww")).alias("text"),
    )
    inc = {
        (r["a_doc"], r["b_doc"])
        for r in minhash_lsh_pairs_incremental(new, corpus).collect()
    }
    full = {
        (r["a_doc"], r["b_doc"])
        for r in minhash_lsh_pairs(corpus.unionByName(new)).collect()
    }
    assert inc == {p for p in full if p[0] >= 100000 or p[1] >= 100000}
    assert all(b >= 100000 or a >= 100000 for a, b in inc)
    # every clone is recovered against its original
    clone_pairs = {p for p in inc if p[1] - p[0] == 100000}
    assert len(clone_pairs) >= 190  # near-dup threshold recovers ~all


def test_duplicated_spans_suffix_clone(spark):
    """A clone sharing only a token suffix yields ONE merged span per
    side with exact 0-based [start, end) token offsets."""
    from topic_store_spark.operators.dedup import duplicated_spans

    t0 = " ".join(f"a{i}" for i in range(30))
    t1 = " ".join(f"a{i}" for i in range(5, 30))  # suffix of t0
    t2 = " ".join(f"b{i}" for i in range(30))  # unrelated
    df = spark.createDataFrame(
        [(0, t0), (1, t1), (2, t2)], ["doc_id", "text"]
    )
    rows = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["n_windows"])
        for r in duplicated_spans(df, window=10).collect()
    }
    # shared content = tokens a5..a29: doc 0 positions 5..20 (16 windows
    # of width 10 covering [5, 30)), doc 1 fully covered [0, 25)
    assert rows == {0: (5, 30, 16), 1: (0, 25, 16)}


def test_duplicated_spans_intra_doc_repeat(spark):
    """ExactSubstr counts total occurrences: a window repeated WITHIN one
    document is duplicated even with no cross-doc match, and two
    disjoint duplicated regions stay two spans."""
    from topic_store_spark.operators.dedup import duplicated_spans

    rep = " ".join(f"r{i % 5}" for i in range(10))  # r0..r4 r0..r4
    # doc: 5 unique tokens, the 10-token repeat block, 5 unique, the
    # same block again -> the two blocks duplicate each other
    text = (
        " ".join(f"u{i}" for i in range(5))
        + " " + rep + " "
        + " ".join(f"v{i}" for i in range(5))
        + " " + rep
    )
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    spans = sorted(
        (r["span_start"], r["span_end"])
        for r in duplicated_spans(df, window=5).collect()
    )
    # every 5-window inside each block matches the other block (the
    # repeat period is 5) -> two disjoint spans, one per block
    assert len(spans) == 2
    (s0, e0), (s1, e1) = spans
    assert e0 <= s1  # disjoint
    assert s0 == 5 and e1 == 30


def test_duplicated_spans_short_docs_empty(spark):
    from topic_store_spark.operators.dedup import duplicated_spans

    df = spark.createDataFrame(
        [(0, "too short"), (1, "too short")], ["doc_id", "text"]
    )
    # both docs identical but shorter than the window -> no windows at all
    assert duplicated_spans(df, window=20).count() == 0


def test_paragraph_dedup_keep_first_and_reassemble(spark):
    from topic_store_spark.operators.dedup import paragraph_dedup

    rows = [
        (0, "alpha beta\n\nshared footer"),
        (1, "alpha beta\n\nunique para\n\nshared footer"),
        (2, "shared footer"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["clean_text"])
        for r in paragraph_dedup(df).collect()
    }
    assert got == {
        0: (2, 2, "alpha beta\n\nshared footer"),
        1: (3, 1, "unique para"),
        2: (1, 0, ""),
    }


def test_paragraph_dedup_normalized_fingerprint(spark):
    """Whitespace/case variants of a paragraph are the SAME paragraph
    (normalized fingerprint), and intra-doc repeats collapse too."""
    from topic_store_spark.operators.dedup import paragraph_dedup

    rows = [
        (0, "Alpha  Beta\n\nalpha beta"),  # same para twice, variant forms
        (1, "ALPHA BETA"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["clean_text"])
        for r in paragraph_dedup(df).collect()
    }
    # first occurrence (doc 0, pos 0) survives in its ORIGINAL form
    assert got == {0: (2, 1, "Alpha  Beta"), 1: (1, 0, "")}


def test_ivf_pq_exact_when_corpus_is_codebook(spark, embeddings):
    """Lossless-encoding limit: when every corpus vector IS a codebook
    source, each vector encodes to its own code (sub-slice distance 0)
    and ADC equals the exact quantized L2^2 — so IVF-PQ with nprobe =
    |lists| must reproduce brute-force integer L2 ranking exactly."""
    from pyspark.sql import functions as F

    from topic_store_spark.functions.vectors import quantize_vector
    from topic_store_spark.operators.similarity import (
        ivf_pq_ann_neighbors,
        pq_codebooks,
    )

    corpus = embeddings.filter(F.col("vec_id") < 16)
    queries = corpus.filter(F.col("vec_id") < 4)
    cen = corpus.filter(F.col("vec_id") < 4)
    books = pq_codebooks(corpus, m=8)
    got = ivf_pq_ann_neighbors(
        corpus, queries, cen, books, k=3, nprobe=4
    ).collect()

    # brute-force exact quantized L2^2 reference, same tie-break
    qv = quantize_vector(F.col("embedding"))
    rows = corpus.select(F.col("vec_id").alias("id"), qv.alias("qv")).collect()
    vecs = {r["id"]: r["qv"] for r in rows}

    def l2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    for q_id in (0, 1, 2, 3):
        want = sorted(
            ((l2(vecs[q_id], vecs[c]), c) for c in vecs if c != q_id)
        )[:3]
        mine = sorted(
            (r["adc_dist"], r["neighbor_id"])
            for r in got
            if r["query_id"] == q_id
        )
        assert mine == want, (q_id, mine, want)


def test_ivf_pq_shape_and_order(spark, embeddings):
    from pyspark.sql import functions as F

    from topic_store_spark.operators.similarity import (
        ivf_pq_ann_neighbors,
        pq_codebooks,
    )

    queries = embeddings.filter(F.col("vec_id") < 10)
    cen = embeddings.filter(F.col("vec_id") < 8)
    books = pq_codebooks(embeddings.filter(F.col("vec_id") < 16), m=8)
    rows = ivf_pq_ann_neighbors(
        embeddings, queries, cen, books, k=5, nprobe=2
    ).collect()
    assert len(rows) == 50
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q_id, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == [1, 2, 3, 4, 5]
        dists = [r["adc_dist"] for r in rs]
        assert dists == sorted(dists)


def test_ivf_pq_residual_exact_when_residuals_are_codebook(spark, embeddings):
    """Residual-IVFPQ lossless limit: when every corpus RESIDUAL is a
    codebook source, encoding is exact, and residual ADC
    ||(q - cen) - (c - cen)||^2 telescopes to the true ||q - c||^2 — so
    nprobe = |lists| must reproduce brute-force integer L2 exactly."""
    from pyspark.sql import functions as F

    from topic_store_spark.functions.vectors import quantize_vector
    from topic_store_spark.operators.similarity import (
        ivf_pq_ann_neighbors,
        ivf_residual_vectors,
        pq_codebooks,
    )

    corpus = embeddings.filter(F.col("vec_id") < 16)
    queries = corpus.filter(F.col("vec_id") < 4)
    cen = corpus.filter(F.col("vec_id") < 4)
    src = ivf_residual_vectors(corpus, cen)
    books = pq_codebooks(src, m=8)
    got = ivf_pq_ann_neighbors(
        corpus, queries, cen, books, k=3, nprobe=4, residual=True
    ).collect()

    qv = quantize_vector(F.col("embedding"))
    rows = corpus.select(F.col("vec_id").alias("id"), qv.alias("qv")).collect()
    vecs = {r["id"]: r["qv"] for r in rows}

    def l2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    for q_id in (0, 1, 2, 3):
        want = sorted(
            ((l2(vecs[q_id], vecs[c]), c) for c in vecs if c != q_id)
        )[:3]
        mine = sorted(
            (r["adc_dist"], r["neighbor_id"])
            for r in got
            if r["query_id"] == q_id
        )
        assert mine == want, (q_id, mine, want)


def test_ivf_pq_residual_beats_raw_on_clustered_corpus(spark):
    """The point of residual encoding: on CLUSTERED vectors (residuals
    much smaller than raw vectors, so the same code budget quantizes
    them finer) residual-trained IVF-PQ must recall strictly more of the
    exact top-10 than raw-vector IVF-PQ at the same nprobe.  Fully
    seeded — deterministic, not flaky."""
    import math
    import random

    from pyspark.sql import functions as F

    from topic_store_spark.operators.similarity import (
        ivf_pq_ann_neighbors,
        ivf_residual_vectors,
        kmeans_centroids,
        topk_neighbors,
        train_pq_codebooks,
    )

    rng = random.Random(7)
    DIM, NCLUS, N = 64, 8, 600

    def norm(v):
        s = math.sqrt(sum(x * x for x in v)) or 1.0
        return [x / s for x in v]

    cents = [norm([rng.gauss(0, 1) for _ in range(DIM)]) for _ in range(NCLUS)]
    rows = [
        (i, norm([x + rng.gauss(0, 0.15) for x in cents[i % NCLUS]]))
        for i in range(N)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") < 20)

    def truth_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    truth = truth_sets(topk_neighbors(emb, queries, k=10))
    centroids = kmeans_centroids(emb, 8, max_iter=4).select(
        F.col("cen_id").alias("vec_id"), "embedding"
    )
    res = ivf_residual_vectors(emb, centroids)

    def recall(df):
        got = truth_sets(df)
        return sum(
            len(got.get(q, set()) & hits) / 10 for q, hits in truth.items()
        ) / len(truth)

    raw_books = train_pq_codebooks(emb, m=4, k=16, max_iter=3)
    res_books = train_pq_codebooks(res, m=4, k=16, max_iter=3)
    r_raw = recall(
        ivf_pq_ann_neighbors(emb, queries, centroids, raw_books, k=10, nprobe=2)
    )
    r_res = recall(
        ivf_pq_ann_neighbors(
            emb, queries, centroids, res_books, k=10, nprobe=2, residual=True
        )
    )
    assert r_res > r_raw, (r_res, r_raw)


def test_train_pq_codebooks_shapes(spark, embeddings):
    from pyspark.sql import functions as F

    from topic_store_spark.operators.similarity import (
        ivf_pq_ann_neighbors,
        train_pq_codebooks,
    )

    small = embeddings.filter(F.col("vec_id") < 60)
    books = train_pq_codebooks(small, m=4, k=4, max_iter=2)
    assert len(books) == 4
    assert all(len(b) == 4 for b in books)
    assert all(len(code) == 16 for b in books for code in b)
    # trained books drive the full ADC pipeline end-to-end
    queries = small.filter(F.col("vec_id") < 3)
    cen = small.filter(F.col("vec_id") < 4)
    out = ivf_pq_ann_neighbors(small, queries, cen, books, k=3, nprobe=2)
    assert out.count() == 9


def test_minhash_universal_family_matches_duckdb(spark, docs):
    """The universal-hash MinHash family (one md5-derived key per
    shingle + integer multiply-mod permutations) must be bit-identical
    to its DuckDB formulation with the same mix_constants literals."""
    import duckdb as _duck

    from topic_store_spark.functions.hashing import (
        MERSENNE31,
        minhash_signature_from_keys,
        mix_constants,
        shingle_keys,
    )

    staged = docs.limit(50).select(
        "doc_id",
        shingle_keys(
            F.array_distinct(word_shingles(F.col("text"), 3))
        ).alias("_keys"),
    )
    sdf = staged.select(
        "doc_id", minhash_signature_from_keys(F.col("_keys"), 4).alias("sig")
    ).collect()
    spark_sigs = {r["doc_id"]: list(r["sig"]) for r in sdf}
    perms = ", ".join(
        f"list_min(list_transform(ks, x -> (x * {a} + {b}) % {MERSENNE31}))"
        for a, b in mix_constants(4)
    )
    duck_sql = f"""
        WITH tok AS (
          SELECT doc_id,
                 list_distinct([array_to_string(tk[i:i+2], ' ')
                   for i in range(1, len(tk) - 1)]) AS sh
          FROM (SELECT doc_id,
                       list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                   x -> x <> '') AS tk
                FROM '/root/testdata/sf0.001/documents.parquet') t
          WHERE len(tk) >= 3
        ),
        keyed AS (
          SELECT doc_id,
                 list_transform(sh,
                   s -> CAST(('0x' || substr(md5(s), 1, 7)) AS BIGINT)) AS ks
          FROM tok WHERE len(sh) > 0
        )
        SELECT doc_id, [{perms}] AS sig FROM keyed
        WHERE doc_id IN (SELECT doc_id FROM
          (SELECT doc_id FROM '/root/testdata/sf0.001/documents.parquet'
           ORDER BY doc_id LIMIT 50))
    """
    duck_sigs = {
        r[0]: list(r[1]) for r in _duck.connect().execute(duck_sql).fetchall()
    }
    checked = 0
    for doc, sig in spark_sigs.items():
        if doc in duck_sigs:
            assert sig == duck_sigs[doc], doc
            checked += 1
    assert checked >= 30


@pytest.mark.parametrize("tnum,tden", [(8, 10), (9, 10), (7, 10)])
def test_prefix_filter_identical_to_full_join(spark, sf_dir, tnum, tden):
    """PPJoin prefix filtering returns bit-identical pairs to the full
    shingle self-join at several thresholds, capped and uncapped."""
    from topic_store_spark.operators.dedup import ngram_jaccard_pairs

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.limit(30).select(
            (F.col("doc_id") + 70000).alias("doc_id"),
            F.concat("text", F.lit(" qq ww")).alias("text"),
        )
    )
    for cap in (None, 64):
        full = ngram_jaccard_pairs(
            corpus, threshold_num=tnum, threshold_den=tden,
            max_shingle_freq=cap,
        )
        fast = ngram_jaccard_pairs(
            corpus, threshold_num=tnum, threshold_den=tden,
            max_shingle_freq=cap, prefix_filter=True,
        )
        f_rows = sorted(tuple(r) for r in full.collect())
        p_rows = sorted(tuple(r) for r in fast.collect())
        assert f_rows == p_rows
        assert len(f_rows) > 0


def test_prefix_filter_prunes_candidates(spark, sf_dir):
    """The prefix relation the candidates join on is a small fraction of
    the full shingle relation (t=0.8 -> ~20% of each doc indexed)."""
    from topic_store_spark.functions.hashing import shingle_key60
    from topic_store_spark.operators.dedup import (
        _prefix_filtered_pairs,
        _shingle_arrays,
    )
    from topic_store_spark.operators.util import explode_nonempty

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    sh = _shingle_arrays(docs, "text", "doc_id", 3)
    n_full = explode_nonempty(sh, "shs", "shingle", "doc").count()
    flat = explode_nonempty(sh, "shs", "shingle", "doc").select(
        "doc", shingle_key60(F.col("shingle")).alias("shingle")
    )
    freq = flat.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    surv = flat.join(freq, "shingle")
    ordered = surv.groupBy("doc").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("df"), F.col("shingle")))
        ).alias("_ord")
    ).select("doc", F.size("_ord").alias("sz"), "_ord")
    plen = F.col("sz") - F.expr("(sz * 8 + 9) div 10") + 1
    n_prefix = ordered.select(
        F.explode(
            F.slice(F.transform("_ord", lambda x: x["shingle"]), 1, plen)
        )
    ).count()
    assert n_prefix < 0.3 * n_full


@pytest.mark.parametrize("jn,jd,cn,cd", [(8, 10, 9, 10), (7, 10, 8, 10)])
def test_word_overlap_prefix_filter_identical(spark, sf_dir, jn, jd, cn, cd):
    """The OR-of-thresholds prefix plan (Jaccard prefix x prefix UNION
    containment smaller-prefix x full) is bit-identical to the plain
    capped self-join — including near-SUBSET pairs that only the
    containment branch can find."""
    from topic_store_spark.operators.dedup import word_overlap_pairs

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    tk = docs.select("doc_id", F.split(F.trim("text"), r"\s+").alias("_tk"))
    clones = docs.limit(25).select(
        (F.col("doc_id") + 70000).alias("doc_id"),
        F.concat("text", F.lit(" qq ww")).alias("text"),
    )
    # containment-only pairs: heavy-suffix extensions keep containment
    # ~1.0 while diluting Jaccard below its threshold
    subsets = tk.limit(25).select(
        (F.col("doc_id") + 90000).alias("doc_id"),
        F.concat(
            F.array_join("_tk", " "),
            F.lit(" "),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.size("_tk")),
                    lambda i: F.concat(F.lit("pad"), i.cast("string")),
                ),
                " ",
            ),
        ).alias("text"),
    )
    corpus = docs.unionByName(clones).unionByName(subsets)
    for cap in (None, 64):
        kw = dict(
            n=3, jaccard_num=jn, jaccard_den=jd,
            containment_num=cn, containment_den=cd, max_shingle_freq=cap,
        )
        plain = sorted(
            tuple(r) for r in word_overlap_pairs(corpus, **kw).collect()
        )
        fast = sorted(
            tuple(r)
            for r in word_overlap_pairs(
                corpus, prefix_filter=True, **kw
            ).collect()
        )
        assert plain == fast and len(plain) > 0
        # the construction really exercises the containment-only branch
        c_only = [
            r for r in plain if r[8] and not r[7]  # containment_hit, not jaccard_hit
        ]
        assert c_only


def test_containment_prefix_filter_identical(spark, sf_dir):
    from topic_store_spark.operators.dedup import containment_pairs

    docs = table(spark, sf_dir, "documents").select("doc_id", "text").limit(120)
    tk = docs.select("doc_id", F.split(F.trim("text"), r"\s+").alias("_tk"))
    subsets = tk.limit(20).select(
        (F.col("doc_id") + 90000).alias("doc_id"),
        F.concat(
            F.array_join("_tk", " "), F.lit(" "),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.size("_tk")),
                    lambda i: F.concat(F.lit("pad"), i.cast("string")),
                ), " ",
            ),
        ).alias("text"),
    )
    corpus = docs.unionByName(subsets)
    for cap in (None, 64):
        plain = sorted(tuple(r) for r in containment_pairs(
            corpus, max_shingle_freq=cap).collect())
        fast = sorted(tuple(r) for r in containment_pairs(
            corpus, max_shingle_freq=cap, prefix_filter=True).collect())
        assert plain == fast and len(plain) >= 20


def test_variance_balanced_permutation_opq_lite(spark, embeddings):
    """r8 OPQ-lite: the variance-balanced dimension permutation is an
    exactly-orthogonal rotation on the integer grid — IVF results are
    invariant under it (orthogonality), the permutation itself is
    data-derived and non-trivial, and permute_vectors is exact
    (pure element shuffle, no float arithmetic)."""
    from topic_store_spark.operators.similarity import (
        ivf_ann_neighbors,
        ivf_residual_vectors,
        permute_vectors,
        variance_balanced_permutation,
    )

    emb = embeddings
    cen = emb.filter(F.col("vec_id") < 8)
    src = ivf_residual_vectors(emb.filter(F.col("vec_id") < 16), cen)
    perm = variance_balanced_permutation(src)
    assert sorted(perm) == list(range(64))  # a true permutation
    assert perm != list(range(64))          # and a non-trivial one

    # permute_vectors is an exact element shuffle
    row = emb.orderBy("vec_id").limit(1).collect()[0]
    prow = (
        permute_vectors(emb.orderBy("vec_id").limit(1), perm)
        .collect()[0]
    )
    assert prow["embedding"] == [row["embedding"][i] for i in perm]

    # orthogonality: coarse search results are permutation-invariant
    queries = emb.filter(F.col("vec_id") < 5)
    base = ivf_ann_neighbors(emb, queries, cen, k=3, nprobe=2)
    emb_p = permute_vectors(emb, perm)
    rot = ivf_ann_neighbors(
        emb_p,
        permute_vectors(queries, perm),
        permute_vectors(cen, perm),
        k=3,
        nprobe=2,
    )
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    b = {key(r): r["neighbor_id"] for r in base.collect()}
    p = {key(r): r["neighbor_id"] for r in rot.collect()}
    assert b == p


def test_pair_cache_scope_isolates_release(spark):
    """r10 ADVICE: release_pair_caches() must not unpersist relations a
    concurrent computation pinned — scoped pins belong to their scope."""
    from topic_store_spark.operators.dedup import (
        _persist_tracked,
        pair_cache_scope,
        release_pair_caches,
    )

    outer = _persist_tracked(spark.range(5))
    with pair_cache_scope() as scope:
        inner = _persist_tracked(spark.range(3))
        assert inner.storageLevel.useMemory
        release_pair_caches()  # drains ONLY the unscoped global list
        assert inner.storageLevel.useMemory, "scoped pin must survive"
        assert not outer.storageLevel.useMemory
    assert not inner.storageLevel.useMemory, "scope exit releases its pins"
    assert scope._dfs == []


def test_pair_cache_scope_thread_isolated(spark):
    """r11 ADVICE (medium): the scope stack must be thread-local — a
    scope entered on thread A must never capture (and later release)
    pins made by a concurrent computation on thread B.  Two threads
    each enter a scope, pin a relation, rendezvous while BOTH scopes
    are active, then exit; each relation must survive the OTHER
    thread's scope exit and die only with its own."""
    import threading

    from topic_store_spark.operators.dedup import (
        _persist_tracked,
        pair_cache_scope,
    )

    pinned = {}
    inside = threading.Barrier(2, timeout=30)
    hold = threading.Barrier(2, timeout=30)
    errors = []

    def worker(name, rng):
        try:
            with pair_cache_scope() as scope:
                pinned[name] = _persist_tracked(spark.range(rng))
                inside.wait()  # both scopes active, both pins made
                assert pinned[name] in scope._dfs, "pin routed cross-thread"
                hold.wait()
            # own scope exited: own pin released
            assert not pinned[name].storageLevel.useMemory
        except Exception as exc:  # noqa: BLE001 - surface in main thread
            errors.append((name, exc))

    threads = [
        threading.Thread(target=worker, args=("a", 7)),
        threading.Thread(target=worker, args=("b", 11)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert not errors, errors
    assert set(pinned) == {"a", "b"}


def test_ppjoin_cuts_flag_output_equality(spark):
    """r11 A/B knob: PPJOIN_CUTS=False (pre-0ea8df7 candidate join) must
    produce the identical pair set — the cuts prune only candidates the
    exact verify rejects."""
    from topic_store_spark.operators import dedup
    from topic_store_spark.operators.dedup import (
        ngram_jaccard_pairs,
        release_pair_caches,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + k) % 23}" for k in range(12)))
         for i in range(40)]
        + [(100, "a b c d e f g h"), (101, "a b c d e f g x")],
        "doc_id long, text string",
    )

    def pairs():
        out = sorted(
            (r["a_doc"], r["b_doc"], r["jaccard"])
            for r in ngram_jaccard_pairs(
                docs, n=2, threshold_num=1, threshold_den=3
            ).collect()
        )
        release_pair_caches()
        spark.catalog.clearCache()
        return out

    assert dedup.PPJOIN_CUTS is True  # production default
    on = pairs()
    dedup.PPJOIN_CUTS = False
    try:
        off = pairs()
    finally:
        dedup.PPJOIN_CUTS = True
    assert on == off and len(on) > 0


def test_semantic_dedup_max_cluster_size_valve(spark):
    """r12 scale valve (LSH-sign sub-buckets): (a) no-op when the cap
    covers every cluster, (b) under a tight cap the output is a SUBSET
    of the uncapped pairs, deterministic across runs, (c) a near-dup
    pair constructed to STRADDLE hyperplane 0 is dropped while a
    co-bucketed pair survives — the exact recall trade the docstring
    states."""
    import hashlib

    import numpy as np

    from topic_store_spark.operators.dedup import (
        release_pair_caches,
        semantic_cluster_dedup,
    )

    dim = 8
    w0 = np.array([
        int(hashlib.md5(f"0:{i}".encode()).hexdigest()[:4], 16) / 65536.0 - 0.5
        for i in range(dim)
    ])
    w0n = w0 / np.linalg.norm(w0)
    z = np.ones(dim)
    u = z - (z @ w0n) * w0n
    u = u / np.linalg.norm(u)
    eps = 0.15
    v_plus = u + eps * w0n   # proj onto w0 > 0
    v_minus = u - eps * w0n  # proj onto w0 < 0
    # cosine(v_plus, v_minus) = (1 - eps^2)/(1 + eps^2) ~= 0.956 >= 0.95
    rows = [(0, [float(x) for x in v_plus]),
            (1, [float(x) for x in v_minus])]
    # fillers: same side of plane 0 as v_plus, mutually near-identical
    for j in range(6):
        f = v_plus + 1e-3 * j * u
        rows.append((10 + j, [float(x) for x in f]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cen = spark.createDataFrame(
        [(0, [float(x) for x in u])], "vec_id long, embedding array<float>"
    )

    def pairs(**kw):
        out = sorted(
            (r["a_id"], r["b_id"])
            for r in semantic_cluster_dedup(emb, cen, **kw).collect()
        )
        release_pair_caches()
        spark.catalog.clearCache()
        return out

    full = pairs()
    assert (0, 1) in full                      # the straddling pair is real
    assert (10, 11) in full                    # filler pairs are real
    assert pairs(max_cluster_size=100) == full  # cap above sizes: no-op
    # 8 vectors, cap 4 -> n_sub=2 -> b=1 bit: plane-0 sign splits 0 from 1
    capped = pairs(max_cluster_size=4)
    assert set(capped) <= set(full)
    assert (0, 1) not in capped, "straddling pair must be the recall cost"
    assert (10, 11) in capped, "co-bucketed pair must survive"
    assert pairs(max_cluster_size=4) == capped  # deterministic re-run


def test_semantic_dedup_report_matches_composed(spark):
    """r13 fused semantic_dedup_report == union of
    semantic_cluster_dedup (uncapped), semantic_cluster_dedup (capped)
    and semantic_bucket_audit, row for row — one assignment pass
    instead of three."""
    import hashlib

    import numpy as np
    from pyspark.sql import functions as F

    from topic_store_spark.operators.dedup import (
        release_pair_caches,
        semantic_bucket_audit,
        semantic_cluster_dedup,
        semantic_dedup_report,
    )

    rng = np.random.RandomState(7)
    rows = []
    for i in range(60):
        base = rng.randn(8)
        rows.append((i, [float(x) for x in base]))
        if i % 3 == 0:  # a close partner => real near-dup pairs
            rows.append((1000 + i, [float(x) for x in base + 1e-3]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cen = emb.filter(F.col("vec_id") < 3)

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    try:
        fused = canon(
            semantic_dedup_report(emb, cen, max_cluster_size=8)
        )
        nul = [
            F.lit(None).cast("string").alias("sub"),
            F.lit(None).cast("long").alias("n_vec"),
        ]
        full = semantic_cluster_dedup(emb, cen)
        capped = semantic_cluster_dedup(emb, cen, max_cluster_size=8)
        audit = semantic_bucket_audit(emb, cen, max_cluster_size=8)
        composed = canon(
            full.select(F.lit("uncapped").alias("variant"), "*", *nul)
            .unionByName(
                capped.select(F.lit("capped").alias("variant"), "*", *nul)
            )
            .unionByName(
                audit.select(
                    F.lit("bucket_audit").alias("variant"),
                    "cluster_id",
                    F.lit(None).cast("long").alias("a_id"),
                    F.lit(None).cast("long").alias("b_id"),
                    F.lit(None).cast("double").alias("cosine_q"),
                    "sub",
                    F.col("n_vec").cast("long").alias("n_vec"),
                )
            )
        )
    finally:
        release_pair_caches()
        spark.catalog.clearCache()
    assert fused == composed and len(fused) > 20


def test_semantic_argmax_assignment_parity(spark):
    """r14: the per-row argmax assignment (ARGMAX_ASSIGN: map-side
    expression over collected centroid literals) must produce the
    row-identical report to the r13 crossJoin+groupBy shape — the
    affinity arithmetic and (aff desc, cen_id asc) tie-break are the
    same ops, so every pair, cosine and audit count matches bit for
    bit.  Covers the valve-on sub-split (whose sign-bit inputs ride
    the assignment's c_qv) and the empty-centroid degenerate path."""
    import numpy as np
    from pyspark.sql import functions as F

    from topic_store_spark.operators import dedup as dedup_mod
    from topic_store_spark.operators.dedup import (
        release_pair_caches,
        semantic_dedup_report,
    )

    rng = np.random.RandomState(11)
    rows = []
    for i in range(60):
        base = rng.randn(8)
        rows.append((i, [float(x) for x in base]))
        if i % 3 == 0:
            rows.append((1000 + i, [float(x) for x in base + 1e-3]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cen = emb.filter(F.col("vec_id") < 3)
    empty_cen = emb.filter(F.lit(False))

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    orig = dedup_mod.ARGMAX_ASSIGN
    got = {}
    try:
        for mode in (True, False):
            dedup_mod.ARGMAX_ASSIGN = mode
            got[mode] = canon(
                semantic_dedup_report(emb, cen, max_cluster_size=8)
            )
            release_pair_caches()
            spark.catalog.clearCache()
            assert (
                semantic_dedup_report(
                    emb, empty_cen, max_cluster_size=8
                ).count()
                == 0
            ), mode
            release_pair_caches()
            spark.catalog.clearCache()
    finally:
        dedup_mod.ARGMAX_ASSIGN = orig
        release_pair_caches()
        spark.catalog.clearCache()
    assert got[True] == got[False] and len(got[True]) > 20


def test_arrow_pair_dot_parity(spark, embeddings):
    """r14 VERDICT item 1: the Arrow-vectorized pair-verify dot
    (ARROW_PAIR_DOT pandas UDF, numpy int64) must be bit-identical to
    the interpreted aggregate(zip_with) fold on both pair-verify
    carriers (semantic report + embedding LSH pairs) — int64 dot of
    quantized components never leaves the exact range."""
    from pyspark.sql import functions as F

    from topic_store_spark.operators import dedup as dedup_mod
    from topic_store_spark.operators.dedup import (
        embedding_dup_pairs_lsh,
        release_pair_caches,
        semantic_dedup_report,
    )

    emb = embeddings.select("vec_id", "embedding")
    clone = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    both = emb.unionByName(clone)
    cen = emb.filter(F.col("vec_id") < 8)

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    orig = dedup_mod.ARROW_PAIR_DOT
    got = {}
    try:
        for mode in (True, False):
            dedup_mod.ARROW_PAIR_DOT = mode
            got[mode] = (
                canon(semantic_dedup_report(both, cen, max_cluster_size=32)),
                canon(embedding_dup_pairs_lsh(both)),
            )
            release_pair_caches()
            spark.catalog.clearCache()
    finally:
        dedup_mod.ARROW_PAIR_DOT = orig
        release_pair_caches()
        spark.catalog.clearCache()
    assert got[True][0] == got[False][0] and len(got[True][0]) > 0
    assert got[True][1] == got[False][1] and len(got[True][1]) > 0


def test_ivf_argmax_assignment_parity(spark, embeddings):
    """r14: ARGMAX_ASSIGN's per-row argmax must reproduce the r13
    crossJoin+groupBy shape row for row on BOTH IVF primitives —
    assign_to_lists (assignment relation) and ivf_residual_vectors
    (residual floats, whose winning-centroid vector rides the struct)
    — including empty-centroid degenerate output."""
    from pyspark.sql import functions as F

    from topic_store_spark.operators import similarity as sim_mod
    from topic_store_spark.operators.similarity import (
        assign_to_lists,
        ivf_residual_vectors,
    )

    cen = embeddings.filter(F.col("vec_id") < 8)
    empty_cen = embeddings.filter(F.lit(False))

    def canon(df):
        return sorted(
            tuple(tuple(v) if isinstance(v, list) else v for v in r)
            for r in df.collect()
        )

    orig = sim_mod.ARGMAX_ASSIGN
    got_a, got_r = {}, {}
    try:
        for mode in (True, False):
            sim_mod.ARGMAX_ASSIGN = mode
            got_a[mode] = canon(assign_to_lists(embeddings, cen))
            got_r[mode] = canon(ivf_residual_vectors(embeddings, cen))
            assert assign_to_lists(embeddings, empty_cen).count() == 0
            assert ivf_residual_vectors(embeddings, empty_cen).count() == 0
    finally:
        sim_mod.ARGMAX_ASSIGN = orig
    assert got_a[True] == got_a[False] and len(got_a[True]) > 0
    assert got_r[True] == got_r[False] and len(got_r[True]) > 0


def test_semantic_dedup_valve_empty_centroids(spark):
    """r12 ADVICE: with max_cluster_size set, an EMPTY centroid
    relation must degrade to the same empty pair set as the uncapped
    path — not TypeError on the first()->None dim probe."""
    from topic_store_spark.operators.dedup import (
        release_pair_caches,
        semantic_cluster_dedup,
    )

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    cen = spark.createDataFrame([], "vec_id long, embedding array<float>")
    try:
        uncapped = semantic_cluster_dedup(emb, cen).collect()
        capped = semantic_cluster_dedup(emb, cen, max_cluster_size=4).collect()
    finally:
        release_pair_caches()
        spark.catalog.clearCache()
    assert uncapped == [] and capped == []


def test_opq_fused_codebooks_equal_composed(spark, embeddings):
    """r13 fused OPQ derivation (`opq_permuted_codebooks`, ONE bounded
    collect) must reproduce the composed pipeline it replaced EXACTLY:
    variance_balanced_permutation -> permute_vectors -> re-derived
    residuals -> pq_codebooks.  This is the equality q_ann_pq's oracle
    identity rides on (the permutation commutes with per-element
    quantization and integer-exact IVF assignment)."""
    from pyspark.sql import functions as F

    from topic_store_spark.operators.similarity import (
        ivf_residual_vectors,
        opq_permuted_codebooks,
        permute_vectors,
        pq_codebooks,
        variance_balanced_permutation,
    )

    emb = embeddings
    cen = emb.filter(F.col("vec_id") < 8)
    src = ivf_residual_vectors(emb.filter(F.col("vec_id") < 16), cen)

    # composed (the pre-r13 q_ann_pq build path)
    perm_c = variance_balanced_permutation(src)
    emb_p = permute_vectors(emb, perm_c)
    cen_p = emb_p.filter(F.col("vec_id") < 8)
    src_p = ivf_residual_vectors(emb_p.filter(F.col("vec_id") < 16), cen_p)
    books_c = pq_codebooks(src_p, m=32)

    perm_f, books_f = opq_permuted_codebooks(src, m=32)

    assert perm_f == perm_c
    assert books_f == books_c
