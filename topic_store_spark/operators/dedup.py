"""Deduplication operators for large-scale training-data pipelines.

Five strategies over a ``documents``-shaped table (id + text) or an
``embeddings``-shaped table (id + vector):

- ``exact_duplicates``        hash-groupBy on a normalized fingerprint
- ``ngram_jaccard_pairs``     exact n-gram Jaccard via shingle self-join
- ``minhash_lsh_pairs``       MinHash signatures -> LSH bands -> verify
- ``simhash_pairs``           SimHash bands -> Hamming verify
- ``embedding_dup_pairs``     quantized-cosine near-dup pairs

Scale design: every strategy is a shuffle-on-key plan with no driver
loops.  Jaccard/minhash self-joins key on shingle/band — the classic
hot-key hazard is a shingle shared by half the corpus, so both take a
``max_shingle_freq`` cap that drops degenerate keys before the join
(standard LSH practice; the cap is on *join fan-out*, not on recall of
confirmed pairs above the threshold for non-degenerate shingles).
Thresholds compare cross-multiplied integers (``common * den >= num *
union``) — exact, no FP boundary flakiness, and identical in the SQL
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from topic_store_spark.functions.hashing import (
    hamming_distance,
    lsh_band_keys,
    md5_fingerprint,
    minhash_signature,
    simhash_band_keys,
    simhash_bits,
)
from topic_store_spark.functions.text import tokens, word_shingles
from topic_store_spark.functions.vectors import int_self_dot, quantize_vector


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup groups: one row per duplicated fingerprint with the
    deterministic keeper (min id), group size, and member ids."""
    return (
        df.select(
            md5_fingerprint(F.col(text_col)).alias("fingerprint"),
            F.col(id_col).alias("_doc"),
        )
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("_doc").alias("keep_id"),
            F.array_sort(F.collect_list("_doc")).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def _distinct_shingles(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), n))).alias(
            "shingle"
        ),
    )


def _verify_jaccard(
    shingles: DataFrame,
    candidates: DataFrame | None,
    threshold_num: int,
    threshold_den: int,
    max_shingle_freq: int | None,
) -> DataFrame:
    """Exact Jaccard over distinct shingles.  ``candidates`` (a_doc, b_doc)
    restricts the pair space (LSH path); None means all co-shingled pairs."""
    sizes = shingles.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))

    joinable = shingles
    if max_shingle_freq is not None:
        freq = shingles.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        joinable = shingles.join(
            freq.filter(F.col("df") <= max_shingle_freq).select("shingle"),
            "shingle",
        )

    left = joinable.select(F.col("doc").alias("a_doc"), "shingle")
    right = joinable.select(F.col("doc").alias("b_doc"), "shingle")
    common = (
        left.join(right, "shingle")
        .filter(F.col("a_doc") < F.col("b_doc"))
        .groupBy("a_doc", "b_doc")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    if candidates is not None:
        common = common.join(candidates, ["a_doc", "b_doc"], "left_semi")
    out = (
        common.join(sizes.withColumnsRenamed({"doc": "a_doc", "sz": "a_sz"}), "a_doc")
        .join(sizes.withColumnsRenamed({"doc": "b_doc", "sz": "b_sz"}), "b_doc")
        .withColumn("union_sz", F.col("a_sz") + F.col("b_sz") - F.col("common"))
        .filter(
            F.col("common") * threshold_den >= threshold_num * F.col("union_sz")
        )
        .select(
            "a_doc",
            "b_doc",
            "common",
            "union_sz",
            (F.col("common") / F.col("union_sz")).alias("jaccard"),
        )
    )
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold_num: int = 8,
    threshold_den: int = 10,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """All pairs with exact n-gram Jaccard >= threshold_num/threshold_den."""
    shingles = _distinct_shingles(df, text_col, id_col, n)
    return _verify_jaccard(
        shingles, None, threshold_num, threshold_den, max_shingle_freq
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 12,
    bands: int = 4,
    threshold_num: int = 8,
    threshold_den: int = 10,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """MinHash + LSH banding, then exact-Jaccard verification.

    Scale path vs ``ngram_jaccard_pairs``: the shingle self-join is
    replaced by a band-bucket join whose fan-out is O(collisions), so the
    candidate set — not the full co-shingle pair space — pays the shuffle.
    """
    rows = num_perm // bands
    sig = df.select(
        F.col(id_col).alias("doc"),
        minhash_signature(
            F.array_distinct(word_shingles(F.col(text_col), n)), num_perm
        ).alias("sig"),
    ).filter(~F.exists("sig", lambda x: x.isNull()))

    banded = sig.select(
        "doc", F.explode(lsh_band_keys(F.col("sig"), bands, rows)).alias("band")
    )
    cands = (
        banded.alias("x")
        .join(banded.alias("y"), "band")
        .filter(F.col("x.doc") < F.col("y.doc"))
        .select(F.col("x.doc").alias("a_doc"), F.col("y.doc").alias("b_doc"))
        .distinct()
    )
    shingles = _distinct_shingles(df, text_col, id_col, n)
    return _verify_jaccard(
        shingles, cands, threshold_num, threshold_den, max_shingle_freq
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    band_bits: int = 8,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs: band-bucket candidates, Hamming-verified.
    A pair within ``max_hamming`` is found iff it collides on >= 1 band
    (guaranteed when max_hamming < bits/band_bits by pigeonhole)."""
    sigs = df.select(
        F.col(id_col).alias("doc"),
        simhash_bits(tokens(F.col(text_col)), bits).alias("sim"),
    )
    banded = sigs.select(
        "doc", "sim", F.explode(simhash_band_keys(F.col("sim"), bits, band_bits)).alias("band")
    )
    return (
        banded.alias("x")
        .join(banded.alias("y"), "band")
        .filter(F.col("x.doc") < F.col("y.doc"))
        .select(
            F.col("x.doc").alias("a_doc"),
            F.col("y.doc").alias("b_doc"),
            F.col("x.sim").alias("a_sim"),
            F.col("y.sim").alias("b_sim"),
        )
        .distinct()
        .withColumn(
            "hamming", hamming_distance(F.col("a_sim"), F.col("b_sim"), bits)
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("a_doc", "b_doc", "hamming")
    )


def embedding_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold_num: int = 95,
    threshold_den: int = 100,
) -> DataFrame:
    """Near-duplicate pairs by quantized cosine >= num/den.

    Quantized components make dot/norms exact longs; the threshold test is
    the cross-multiplied ``den^2 * dot^2 >= num^2 * n_a * n_b`` in
    DECIMAL(38,0) — no FP summation-order hazard, oracle-identical.
    Brute-force O(n^2) pair space: correct baseline at verification scale;
    the bucketed scale path is ``similarity.lsh_ann_neighbors``.
    """
    q = df.select(
        F.col(id_col).alias("vid"),
        quantize_vector(F.col(vec_col)).alias("qv"),
    ).withColumn("nrm", int_self_dot(F.col("qv")))
    left = q.select(
        F.col("vid").alias("a_id"), F.col("qv").alias("a_qv"), F.col("nrm").alias("a_n")
    )
    right = q.select(
        F.col("vid").alias("b_id"), F.col("qv").alias("b_qv"), F.col("nrm").alias("b_n")
    )
    dot = F.aggregate(
        F.zip_with(F.col("a_qv"), F.col("b_qv"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    dec = "decimal(38,0)"
    pairs = (
        left.crossJoin(right)
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("dot", dot)
        .filter(
            (F.col("dot") > 0)
            & (
                F.col("dot").cast(dec) * F.col("dot").cast(dec) * (threshold_den**2)
                >= F.col("a_n").cast(dec) * F.col("b_n").cast(dec) * (threshold_num**2)
            )
        )
        .select(
            "a_id",
            "b_id",
            (
                F.col("dot")
                / F.sqrt((F.col("a_n") * F.col("b_n")).cast("double"))
            ).alias("cosine_q"),
        )
    )
    return pairs
