"""End-to-end training-corpus build: the capstone composition.

Every stage exists as an audited operator; this module wires them into
the pipeline a pretraining data build actually runs, proving the pieces
compose:

1. **quality gate** — `text.quality_score` threshold (+ optional
   language filter);
2. **exact dedup** — `dedup.deduplicate_exact` keep-first
   materialization;
3. **near dedup** — `dedup.minhash_lsh_pairs` -> `connected_components`
   -> keep the minimum id of every duplicate cluster;
4. **tokenize** — `bpe.train_bpe` on the surviving corpus (or a
   provided merge table) + `bpe.apply_bpe`;
5. **pack** — token streams concatenated in id order within hash
   shards and cut into ``ctx``-token windows of VOCABULARY IDS;
6. **write** — one parquet directory partitioned by shard.

Scale shape: each stage keeps its own contract (documented at its
definition); the composition adds only the vocabulary-id assignment —
a distinct-token rollup (vocab is closed over the merge table: tiny)
joined back broadcast — and the final shard-keyed window pack, which
shuffles each token once.  Returned stats come from one ``count()``
per stage boundary: a handful of driver actions on a batch build job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_training_corpus(
    docs: DataFrame,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    langs: list[str] | None = None,
    lang_col: str = "lang",
    merges: list[tuple[str, str]] | None = None,
    n_merges: int = 200,
    ctx: int = 256,
    shards: int = 8,
    jaccard_num: int = 8,
    jaccard_den: int = 10,
) -> dict:
    """Run the full build; returns the funnel stats dict and writes
    ``(shard, window_id, token_ids array<int>, n_tokens)`` parquet
    partitioned by shard to ``out_dir``.  See module doc."""
    from topic_store_spark.functions.text import quality_score
    from topic_store_spark.operators.bpe import apply_bpe, train_bpe
    from topic_store_spark.operators.dedup import (
        connected_components,
        deduplicate_exact,
        minhash_lsh_pairs,
    )

    stats: dict = {"n_input": docs.count()}

    gated = docs.filter(quality_score(F.col(text_col)) >= min_quality)
    if langs is not None:
        gated = gated.filter(F.col(lang_col).isin(langs))
    stats["n_quality"] = gated.count()

    exact = deduplicate_exact(gated, text_col=text_col, id_col=id_col)
    stats["n_exact_dedup"] = exact.count()

    pairs = minhash_lsh_pairs(
        exact, text_col=text_col, id_col=id_col,
        threshold_num=jaccard_num, threshold_den=jaccard_den,
    )
    labels = connected_components(pairs)
    losers = labels.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    near = exact.join(losers, id_col, "left_anti")
    stats["n_near_dedup"] = near.count()

    if merges is None:
        merges = train_bpe(near, text_col=text_col, n_merges=n_merges)
    stats["n_merges"] = len(merges)

    tokenized = apply_bpe(near, merges, text_col=text_col, id_col=id_col)

    # vocabulary: distinct surviving symbols, dense ids in sort order
    vocab = (
        tokenized.select(F.explode("bpe_tokens").alias("tok"))
        .distinct()
        .withColumn(
            "tok_id",
            F.row_number().over(Window.orderBy("tok")).cast("int") - 1,
        )
    )
    stats["n_vocab"] = vocab.count()

    flat = tokenized.select(
        (F.col(id_col) % shards).alias("shard"),
        F.col(id_col).alias("doc"),
        F.posexplode("bpe_tokens").alias("pos", "tok"),
    ).join(F.broadcast(vocab), "tok")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc", "pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = flat.withColumn(
        "gpos", F.count(F.lit(1)).over(w) - 1
    ).withColumn("window_id", F.floor(F.col("gpos") / ctx))
    packed = (
        placed.groupBy("shard", "window_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("gpos", "tok_id"))
                ),
                lambda x: x["tok_id"],
            ).alias("token_ids")
        )
        .withColumn("n_tokens", F.size("token_ids"))
    )
    packed.write.mode("overwrite").partitionBy("shard").parquet(out_dir)
    out = packed.sparkSession.read.parquet(out_dir)
    stats["n_windows"] = out.count()
    stats["n_tokens"] = out.agg(F.sum("n_tokens")).first()[0]
    return stats
