"""Corpus-curation operators for large-scale training-data pipelines:
contamination detection, quality-filter funnels, per-domain balancing,
and token-length histograms.

These are the pipeline steps that sit BETWEEN dedup (operators/dedup.py)
and similarity search (operators/similarity.py) in a real pretraining
data build: decide what leaks from eval sets, what survives quality
gates, and how much of each domain to keep.

Scale design notes (the plans below are written for a 1000-executor
cluster reading the train side at ~100 TB):

- ``ngram_contamination`` treats the EVAL side as small (benchmark
  suites are MBs, not TBs) and broadcasts its shingle set; the train
  corpus is scanned once, shingled map-side, and only MATCHED
  (eval_doc, shingle) pairs ever enter a shuffle (count_distinct does
  its dedup in partial aggregates).  The train side never shuffles its
  full shingle relation anywhere.
- ``quality_filter_funnel`` computes every per-doc flag in one
  projection and needs exactly one shuffle (the fingerprint window for
  the keep-first dedup stage); the final per-language rollup rides a
  partial aggregate.
- ``domain_topk`` is a per-domain window top-k: one shuffle on the
  domain key.  With millions of domains the key space is wide and this
  is the right plan; a single mega-domain is the classic skew case —
  cap it upstream (``max_rows_per_key``-style) or salt via
  operators/skew.py.
- ``token_histogram`` is a pure two-key rollup — partial aggregates,
  one small shuffle.

All expressions are JVM-side (no Python UDFs) and every formula has an
exact DuckDB twin in ``__spark_entry__.oracle_sql`` (integer-exact
counts; ratios are double divisions of exact integers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from topic_store_spark.functions.hashing import md5_fingerprint
from topic_store_spark.functions.text import (
    language_id,
    quality_score,
    shingles_from_tokens,
    sorted_run_stats,
    token_count,
    tokens,
)
from topic_store_spark.operators.util import (
    ensure_parallelism,
    explode_nonempty,
    hash_partition,
    persist_tracked,
)


def _doc_shingles(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(doc, shs): distinct word-n-gram shingles per doc, tokens staged
    through their own projection (perf contract of shingles_from_tokens)."""
    tk = ensure_parallelism(df).select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("_tk")
    )
    return tk.select(
        "doc", F.array_distinct(shingles_from_tokens(F.col("_tk"), n)).alias("shs")
    )


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Train/eval n-gram overlap (decontamination report): for every eval
    document, the fraction of its distinct word-``n``-grams that occur
    anywhere in the training corpus.

    The asymmetric-size plan: eval shingles are broadcast; the train
    corpus is scanned once and shingled map-side (exploded, NOT
    deduplicated — deduplicating the train shingle relation would cost a
    full shuffle of the big side for nothing, since ``count_distinct``
    on the joined output dedups in partial aggregates over the much
    smaller match set).

    Returns (eval_doc, n_shingles, n_contaminated, contamination).
    """
    ev = _doc_shingles(eval_df, text_col, id_col, n)
    ev_sh = explode_nonempty(ev, "shs", "shingle", "doc").withColumnRenamed(
        "doc", "eval_doc"
    )
    ev_sz = ev.select(
        F.col("doc").alias("eval_doc"), F.size("shs").alias("n_shingles")
    )

    tr_sh = explode_nonempty(
        _doc_shingles(train, text_col, id_col, n), "shs", "shingle"
    )
    hits = (
        tr_sh.join(F.broadcast(ev_sh), "shingle")
        .groupBy("eval_doc")
        .agg(F.count_distinct("shingle").alias("n_contaminated"))
    )
    # hits is bounded by the (small) eval side — broadcast the final
    # attach so the report assembly never sort-merges
    return (
        ev_sz.join(F.broadcast(hits), "eval_doc", "left")
        .select(
            "eval_doc",
            "n_shingles",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            F.when(F.col("n_shingles") == 0, F.lit(0.0))
            .otherwise(
                F.coalesce("n_contaminated", F.lit(0)) / F.col("n_shingles")
            )
            .alias("contamination"),
        )
    )


def quality_filter_funnel(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
) -> DataFrame:
    """Per-language survival funnel through the canonical cleaning
    stages: total -> language-ID agrees with declared metadata ->
    quality score >= threshold -> exact-dedup keeper (lowest id per
    fingerprint).  Stages nest (each counts docs that passed ALL
    previous stages), which is what makes the numbers read as a funnel.

    One projection computes every per-doc flag.  The keeper (lowest id
    per fingerprint) comes from a ``min(struct(doc, ...))`` ROLLUP on
    the fingerprint, not `min over (partition by _fp)`: a boilerplate
    page exact-duplicated millions of times at web scale would land its
    whole group in one window task (windows get no partials and no AQE
    skew splitting — SKEW.md), while the rollup partial-aggregates each
    map partition down to one struct per fingerprint.  The totals
    branch groups straight by language (partials collapse it to
    |langs| rows per task), and Catalyst prunes the md5 off that
    branch entirely — the price is one extra pass of the cheap flag
    expressions, never a corpus-sized sort.
    """
    flagged = ensure_parallelism(df).select(
        F.col(lang_col).alias("lang"),
        F.col(id_col).alias("_doc"),
        md5_fingerprint(F.col(text_col)).alias("_fp"),
        (language_id(F.col(text_col)) == F.col(lang_col)).alias("_lang_ok"),
        (quality_score(F.col(text_col)) >= min_quality).alias("_q_ok"),
    )
    n = F.lit(1)
    totals = flagged.groupBy("lang").agg(
        F.count(n).alias("n_total"),
        F.sum(F.when(F.col("_lang_ok"), 1).otherwise(0))
        .cast("long")
        .alias("n_lang_ok"),
        F.sum(F.when(F.col("_lang_ok") & F.col("_q_ok"), 1).otherwise(0))
        .cast("long")
        .alias("n_quality_ok"),
    )
    # one struct per fingerprint: doc id leads, so min() picks the
    # lowest-id doc and carries ITS language and flags
    keepers = flagged.groupBy("_fp").agg(
        F.min(F.struct("_doc", "lang", "_lang_ok", "_q_ok")).alias("_k")
    )
    survivors = (
        keepers.filter(F.col("_k._lang_ok") & F.col("_k._q_ok"))
        .groupBy(F.col("_k.lang").alias("lang"))
        .agg(F.count(n).cast("long").alias("n_survivors"))
    )
    return totals.join(survivors, "lang", "left").select(
        "lang",
        "n_total",
        "n_lang_ok",
        "n_quality_ok",
        F.coalesce("n_survivors", F.lit(0).cast("long")).alias("n_survivors"),
    )


def domain_topk(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Domain balancing: keep the top-``k`` documents per domain by
    quality score (deterministic tie-break on id).  The per-domain cap
    every web-scale corpus applies so no single crawl source dominates.

    One shuffle on the domain key; ranking is a window ``row_number``.
    Skew note (measured, SKEW.md): because the rank filter is visible
    to Catalyst, Spark inserts map-side ``WindowGroupLimit`` partial
    top-k nodes below the exchange — a mega-domain (half the corpus
    from one host) reaches the window task already pruned to
    ``<= map_partitions * k`` rows, so this plan is natively
    skew-resistant (a hand-rolled salted top-k measured STRICTLY worse
    on uniform data and no better under skew, and was removed).  The
    window aggregates WITHOUT a pushable limit (``count over
    (partition by key)``) are the ones that cliff — see SKEW.md and
    the salient_terms agg+join plan note.
    """
    scored = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"),
        F.col(domain_col).alias("domain"),
        quality_score(F.col(text_col)).alias("quality"),
    )
    w = Window.partitionBy("domain").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("domain", "rank", "doc_id", "quality")
    )


def token_histogram(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    bucket_width: int = 8,
) -> DataFrame:
    """Token-length distribution per language: fixed-width buckets over
    the whitespace token count.  Pure rollup — partial aggregates, one
    small shuffle on (lang, bucket)."""
    bucket = (
        F.floor(token_count(F.col(text_col)) / bucket_width) * bucket_width
    ).cast("long")
    return (
        df.select(F.col(lang_col).alias("lang"), bucket.alias("bucket_lo"))
        .groupBy("lang", "bucket_lo")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Intra-document repetition signals (the Gopher-rules family):
    duplicate word-``n``-gram fraction and most-frequent-``n``-gram
    fraction per document.  High values flag boilerplate / degenerate
    repetition that per-corpus dedup can't see.

    Plan: ZERO shuffles.  The statistic is per-document, so it is a row
    expression: sort the gram array once, then one linear run-length
    aggregate pass (``sorted_run_stats``).  Until r10 this compiled to
    explode + two doc-keyed exchanges + a join — shuffle volume of ~one
    row per corpus TOKEN, which at 100 TB is the whole query; now the
    cost is O(doc tokens · log) per row on the scan's own partitioning.
    """
    tk = ensure_parallelism(df).select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("_tk")
    )
    grams = tk.select(
        "doc", shingles_from_tokens(F.col("_tk"), n).alias("_g")
    )
    srt = grams.select("doc", F.array_sort("_g").alias("_s"))
    stats = srt.select(
        "doc",
        F.coalesce(F.size("_s").cast("long"), F.lit(0)).alias("n_grams"),
        sorted_run_stats(F.col("_s")).alias("_r"),
    )
    return stats.select(
        "doc",
        "n_grams",
        F.coalesce(F.col("_r")["n_distinct"], F.lit(0)).alias("n_distinct"),
        F.coalesce(F.col("_r")["top_freq"], F.lit(0)).alias("top_freq"),
        F.when(F.col("n_grams") == 0, F.lit(0.0))
        .otherwise(
            1.0 - F.coalesce(F.col("_r")["n_distinct"], F.lit(0)) / F.col("n_grams")
        )
        .alias("dup_frac"),
        F.when(F.col("n_grams") == 0, F.lit(0.0))
        .otherwise(F.coalesce(F.col("_r")["top_freq"], F.lit(0)) / F.col("n_grams"))
        .alias("top_frac"),
    )


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    domain_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic hash-based mixture sampling: keep a document iff
    ``md5_bucket(id) < weight[domain] * 10000`` (bucket in [0, 10000)).
    The standard way a pretraining mix up/down-weights sources while
    staying reproducible run-to-run — no RNG state, no shuffle at all:
    the decision is a map-side predicate on each row.

    Unknown domains default to weight 0 (dropped).  Weights > 1 clamp to
    keep-everything (use duplication factors upstream for true
    oversampling).
    """
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 10000
    )
    rate = F.lit(0.0)
    for domain, w in sorted(weights.items()):
        rate = F.when(F.col(domain_col) == domain, F.lit(float(w))).otherwise(rate)
    return df.filter(bucket < rate * 10000)


def stratified_split(
    df: DataFrame,
    id_col: str = "doc_id",
    strata_col: str = "lang",
    val_permille: int = 100,
    test_permille: int = 100,
) -> DataFrame:
    """Deterministic train/val/test assignment report: each document's
    split comes from a hash bucket of its id (``md5 % 1000``), so the
    split is reproducible run-to-run, stable under corpus growth
    (existing docs never migrate), and needs NO coordination — the
    decision is a map-side expression, the only shuffle is the tiny
    (strata, split) rollup.

    Returns one row per (strata, split) with counts and id bounds —
    the audit table a data build publishes alongside the split.
    """
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 1000
    )
    split = (
        F.when(bucket < val_permille, F.lit("val"))
        .when(bucket < val_permille + test_permille, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return (
        df.select(
            F.col(strata_col).alias("strata"),
            split.alias("split"),
            F.col(id_col).alias("_doc"),
        )
        .groupBy("strata", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("_doc").alias("min_doc"),
            F.max("_doc").alias("max_doc"),
        )
    )


def temperature_sample(
    df: DataFrame,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based mixture flattening (alpha = 1/2): every stratum
    is deterministically down-sampled toward the SMALLEST stratum with
    keep rate ``sqrt(n_min / n_s)`` — the multilingual-pretraining
    rebalance (XLM-R's temperature sampling) that halves the log-scale
    spread between head and tail sources instead of truncating the head
    to the tail's size.

    Exactness: the keep decision ``hash/2^28 < sqrt(n_min/n_s)`` is
    evaluated in SQUARED integer form ``hash^2 * n_s < 2^56 * n_min``
    (decimal(38,0) arithmetic, values < 10^29) — no float ``sqrt`` or
    ``pow`` whose last-ulp could differ between engines, so any engine
    reproduces the exact kept set.  No RNG state: re-runs and late
    shards make identical choices (same property as ``mixture_sample``).

    Plan: one tiny stratum rollup; the global min attaches via an
    unpartitioned WINDOW over that stratum-count relation
    (``with_global_agg`` — bounded by the number of strata, a
    constant-sized barrier; the old ``crossJoin(broadcast(agg))``
    diamond recomputed the rollup's corpus scan a second time, r9),
    then a map-side predicate on the corpus scan — the corpus itself
    never shuffles.
    """
    from topic_store_spark.operators.util import with_global_agg

    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 7), 16, 10
    ).cast("long")
    counts = df.groupBy(F.col(strata_col).alias("_ts_strata")).agg(
        F.count(F.lit(1)).alias("_ts_n")
    )
    rates = F.broadcast(with_global_agg(counts, _ts_nmin=F.min("_ts_n")))
    dec = "decimal(38,0)"
    keep = (
        F.col("_h").cast(dec) * F.col("_h").cast(dec) * F.col("_ts_n").cast(dec)
        < F.lit(1 << 56).cast(dec) * F.col("_ts_nmin").cast(dec)
    )
    return (
        df.withColumn("_h", h)
        .join(rates, F.col(strata_col) == F.col("_ts_strata"))
        .filter(keep)
        .drop("_h", "_ts_strata", "_ts_n", "_ts_nmin")
    )


def sampling_report(
    df: DataFrame,
    weights: dict[str, float],
    domain_col: str = "source",
    split_strata_col: str = "lang",
    id_col: str = "doc_id",
    val_permille: int = 100,
    test_permille: int = 100,
) -> DataFrame:
    """The full deterministic-sampling audit table in MINIMAL passes:
    the union of :func:`mixture_sample`'s per-domain kept-rollup,
    :func:`stratified_split`'s (strata, split) audit, and
    :func:`temperature_sample`'s per-stratum kept-rollup — row-for-row
    identical to composing the three operators and unioning their
    rollups, which is exactly how the driver oracle states it.

    ``strata`` and ``subkey`` are canonicalized to STRING in the output
    (r12 ADVICE): the report mixes ``domain_col`` and
    ``split_strata_col`` strata in one column, so a single common type
    is required — and string is the only one that is well-defined for
    every input pairing.  When composing the three operators yourself
    for comparison, cast each rollup's strata key to string before the
    union (a non-string strata, e.g. an integer lang id, otherwise
    yields a long column where this operator yields its string form).
    Pinned for an integer strata column in
    tests/test_corpus_curation.py.

    Scale shape (r12 Exchange diet): composing the three operators
    scans the corpus FOUR times (mixture, split, temperature's stratum
    counts, temperature's filter) and shuffles four rollups; all three
    decisions are map-side hash predicates on the same row, so one
    pass computes them together.  Pass 1 is temperature's stratum
    count rollup (the only decision with a data dependency) broadcast
    back via ``with_global_agg``; pass 2 tags each row with up to
    three (kind, strata, subkey) memberships via an inline
    struct-array filter+explode and feeds ONE rollup keyed on the tag.
    Two corpus scans, two data exchanges (stratum counts + final
    rollup) and one bounded scalar window — down from four and four.
    Per-branch semantics are pinned term-for-term to the three source
    operators (same md5 prefixes, same decimal(38,0) squared-rate
    temperature predicate); equality is asserted against the composed
    form in tests/test_corpus_curation.py.
    """
    from topic_store_spark.operators.util import with_global_agg

    id_str = F.col(id_col).cast("string")
    b10000 = F.conv(F.substring(F.md5(id_str), 1, 8), 16, 10).cast("long") % 10000
    rate = F.lit(0.0)
    for domain, w in sorted(weights.items()):
        rate = F.when(F.col(domain_col) == domain, F.lit(float(w))).otherwise(rate)
    mix_keep = b10000 < rate * 10000

    b1000 = b10000 % 1000  # same md5 8-hex prefix, mod 1000 == stratified_split
    split = (
        F.when(b1000 < val_permille, F.lit("val"))
        .when(b1000 < val_permille + test_permille, F.lit("test"))
        .otherwise(F.lit("train"))
    )

    h = F.conv(F.substring(F.md5(id_str), 1, 7), 16, 10).cast("long")
    counts = df.groupBy(F.col(domain_col).alias("_ts_strata")).agg(
        F.count(F.lit(1)).alias("_ts_n")
    )
    rates = F.broadcast(with_global_agg(counts, _ts_nmin=F.min("_ts_n")))
    dec = "decimal(38,0)"
    temp_keep = (
        h.cast(dec) * h.cast(dec) * F.col("_ts_n").cast(dec)
        < F.lit(1 << 56).cast(dec) * F.col("_ts_nmin").cast(dec)
    )

    def _tag(kind: str, strata, subkey):
        return F.struct(
            F.lit(kind).alias("kind"),
            strata.cast("string").alias("strata"),
            subkey.cast("string").alias("subkey"),
        )

    tags = F.filter(
        F.array(
            F.when(mix_keep, _tag("mixture", F.col(domain_col), F.lit("kept"))),
            _tag("split", F.col(split_strata_col), split),
            F.when(
                temp_keep, _tag("temperature", F.col(domain_col), F.lit("kept"))
            ),
        ),
        lambda t: t.isNotNull(),
    )
    tagged = (
        df.join(rates, F.col(domain_col) == F.col("_ts_strata"), "left")
        .select(F.col(id_col).alias("_doc"), F.explode(tags).alias("_t"))
        .select("_doc", "_t.kind", "_t.strata", "_t.subkey")
    )
    return tagged.groupBy("kind", "strata", "subkey").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("_doc").alias("min_doc"),
        F.max("_doc").alias("max_doc"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Overlapping token-window chunking — the retrieval/RAG layout
    (each document becomes ``ceil((n_tok - overlap) / stride)`` windows
    of ``chunk`` tokens advancing by ``stride = chunk - overlap``), as
    opposed to ``pack_sequences``' boundary-free pretraining layout.

    Returns one row per chunk: ``(doc_id, chunk_id, n_tokens,
    chunk_fp)`` where ``chunk_fp`` is the md5 of the space-joined token
    slice (the form a downstream embedder or chunk-level dedup keys on).
    Documents shorter than one stride still produce chunk 0.

    Plan: tokens are materialized once per document in a staged
    projection, the chunk index explodes map-side (fan-out
    ~n_tok/stride), and every per-chunk value is a JVM array-slice
    expression — no shuffle at all; whatever rollup follows brings its
    own.
    """
    if overlap >= chunk:
        raise ValueError("overlap must be < chunk")
    stride = chunk - overlap
    tk = ensure_parallelism(df).select(
        F.col(id_col), tokens(F.col(text_col)).alias("_tk")
    )
    n_chunks = F.greatest(
        F.lit(1),
        F.floor((F.size("_tk") - overlap + stride - 1) / stride).cast("int"),
    )
    chunked = tk.select(
        F.col(id_col),
        "_tk",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    piece = F.slice(F.col("_tk"), F.col("chunk_id") * stride + 1, chunk)
    return chunked.select(
        F.col(id_col),
        "chunk_id",
        F.size(piece).alias("n_tokens"),
        F.md5(F.array_join(piece, " ")).alias("chunk_fp"),
    )


def salient_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Per-document top-``k`` salient terms, TF-IDF family: rank terms
    by (term frequency desc, document frequency asc, term asc) — the
    integer-exact ordering equivalent in spirit to tf·idf — and report
    ``salience = tf * (N / df)`` for the survivors.

    Plan (r10, reverting one r9 move): one explode + (doc, term)
    rollup for TF, then DF attaches via a TERM-KEYED AGGREGATE + JOIN
    — not the r9 ``count over (partition by term)`` window, which put
    every document containing the hottest term into ONE window
    partition/task; under Zipf a stopword-grade term appears in most
    documents, so that task held ~n_docs rows with no map-side
    partials and no AQE skew splitting (windows get neither) — a
    scalability cliff at 100 TB.  The aggregate has map-side partials
    (the hot term collapses per-partition before the shuffle).  Then a
    per-doc window top-k.  The corpus-size scalar rides a broadcast
    cross join of a 1-row source count (metadata-cheap, no tokenize).

    r12 Exchange diet: the tf relation is PINNED (persist_tracked)
    hash-partitioned on the TERM after its (doc, term) rollup, and the
    pin's AQE plan is finalized (``expose_cached_partitioning``) so
    the partitioning is visible to planning.  In the r10 plan tf
    appeared in two un-shared branches (tokenize + explode + rollup
    ran twice) and the DF attach-join re-shuffled the tf side on the
    term a second time; with the pinned term-partitioned cache, the DF
    rollup AND both join sides inherit the same partitioning — the
    tokenize pass runs once and at-scale exchanges fall to three
    ((doc, term) rollup, term repartition of the collapsed tf rows,
    per-doc window), pinned static==runtime in tests/test_plan_audit.
    """
    from .util import expose_cached_partitioning

    tk = ensure_parallelism(df).select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("_tk")
    )
    terms = explode_nonempty(tk, "_tk", "term", "doc")
    tf = expose_cached_partitioning(persist_tracked(hash_partition(
        terms.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf")),
        "term",
    )))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
    tf = tf.join(dfreq, "term")
    total = df.select(F.count(F.lit(1)).alias("n_total"))
    w = Window.partitionBy("doc").orderBy(
        F.col("tf").desc(), F.col("df_docs").asc(), F.col("term").asc()
    )
    return (
        tf.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc",
            "rank",
            "term",
            "tf",
            "df_docs",
            (F.col("tf") * (F.col("n_total") / F.col("df_docs"))).alias(
                "salience"
            ),
        )
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    precision: int = 1000,
) -> DataFrame:
    """Okapi BM25 document scores for one query — the retrieval ranking
    a contamination check or eval-set retriever runs corpus-wide
    (Lucene's +1 idf form: ``ln((N - df + 0.5)/(df + 0.5) + 1)``).

    Determinism contract of ``unigram_logprob``: each matched term's
    contribution ``idf * tf*(k1+1)/(tf + k1*(1 - b + b*dl/avgdl))`` is
    one chain of IEEE ops on identical doubles in any engine, rounded
    to a milli-unit BIGINT, and the per-doc total is an exact integer
    sum — no float-summation-order wobble.

    Plan (r9 shuffle diet — 9 Exchanges down to 2, zero joins): the
    query is a FIXED SMALL term list by contract, so per-doc term
    frequencies compute MAP-SIDE as array-filter counts over the token
    array (no explode, no (doc, term) shuffle), and the corpus stats
    the scoring needs — per-term document frequencies, doc count, token
    total — collapse into ONE 1-row aggregate that broadcasts back via
    cross join.  The per-doc term-frequency relation is PINNED
    (persist_tracked, r12) so the tokenize pass runs ONCE and both its
    consumers — the stats aggregate and the scoring projection — read
    the cache; the pinned relation is one narrow row per document
    (id, length, |query| tf columns), not the corpus text.  The old
    r9 plan ran the tokenize lineage twice (and the pre-r9 plan
    exploded it four times across join branches).  One single-row
    exchange; scoring stays a map-side expression.  Duplicate entries
    in ``query_terms`` are deduplicated (order-preserving) — the old
    explode+isin plan did this implicitly, and a repeated term must
    not double-count in ``n_terms_matched``/``bm25_milli`` (r10,
    ADVICE).  Returns ``(doc, n_terms_matched, bm25_milli)`` for every
    doc matching >= 1 term.
    """
    qts = list(dict.fromkeys(query_terms))
    tk = ensure_parallelism(df).select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("_tk")
    )

    def term_tf(t: str):
        return F.size(F.filter(F.col("_tk"), lambda e: e == F.lit(t)))

    tfs = persist_tracked(tk.select(
        "doc",
        F.size("_tk").alias("dl"),
        *[term_tf(t).alias(f"_tf_{i}") for i, t in enumerate(qts)],
    ))
    stats = tfs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").cast("long").alias("tok_total"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("long")).alias(f"_df_{i}")
            for i in range(len(qts))
        ],
    )
    avgdl = F.col("tok_total") / F.col("n_docs")

    def contrib(i: int):
        tf_c = F.col(f"_tf_{i}")
        df_c = F.col(f"_df_{i}")
        idf = F.log(
            (F.col("n_docs") - df_c + 0.5) / (df_c + 0.5) + 1.0
        )
        tf_part = (tf_c * (k1 + 1.0)) / (
            tf_c + k1 * (1.0 - b + b * F.col("dl") / avgdl)
        )
        milli = F.round(idf * tf_part * precision).cast("long")
        return F.when(tf_c > 0, milli).otherwise(F.lit(0))

    matched = sum(
        ((F.col(f"_tf_{i}") > 0).cast("long") for i in range(len(qts))),
        F.lit(0),
    )
    return (
        tfs.crossJoin(F.broadcast(stats))
        .select(
            "doc",
            matched.alias("n_terms_matched"),
            sum(
                (contrib(i) for i in range(len(qts))), F.lit(0)
            ).cast("long").alias("bm25_milli"),
        )
        .filter(F.col("n_terms_matched") > 0)
    )


def merge_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
) -> DataFrame:
    """Corpus-wide adjacent-token-pair counts, top-``k`` — exactly the
    counting step of one BPE merge iteration (the candidate table a
    tokenizer trainer reduces to its argmax).

    Plan: token 2-grams explode WITH duplicates map-side, one keyed
    rollup with partial aggregation (the corpus never shuffles raw
    grams — partials collapse each partition's counts first), then a
    global top-k that Spark executes as TakeOrdered: per-partition
    partial top-k, no full sort, no single-partition window.  Ties
    break on the pair string so the reported set is deterministic.
    """
    tk = ensure_parallelism(df).select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("_tk")
    )
    grams = explode_nonempty(
        tk.select("doc", shingles_from_tokens(F.col("_tk"), 2).alias("_shs")),
        "_shs",
        "pair",
    )
    return (
        grams.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("pair").asc())
        .limit(k)
    )


def length_percentiles(
    df: DataFrame,
    value_col: str = "n_chars",
    strata_col: str = "lang",
    id_col: str = "doc_id",
    percentiles: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """Exact discrete percentiles of ``value_col`` per stratum: the
    value at rank ``ceil(p/100 * n)`` under a total order
    (value, id) — integer-exact, engine-unambiguous (no interpolation
    arithmetic to diverge between engines).

    Plan: one shuffle on the stratum key, an in-partition sort for the
    rank window, and a per-stratum rollup.  The skew case is a single
    giant stratum serializing its sort — at that scale switch to
    ``percentile_approx`` (t-digest sketch, map-side mergeable) and keep
    this exact form for the verification sample.
    """
    w_rank = Window.partitionBy("strata").orderBy(
        F.col("value").asc(), F.col("_doc").asc()
    )
    w_all = Window.partitionBy("strata")
    ranked = df.select(
        F.col(strata_col).alias("strata"),
        F.col(value_col).alias("value"),
        F.col(id_col).alias("_doc"),
    ).select(
        "strata",
        "value",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    aggs = [F.max("n").alias("n_docs")]
    for p in percentiles:
        target = F.expr(f"({p} * n + 99) div 100")
        aggs.append(
            F.max(F.when(F.col("rn") == target, F.col("value"))).alias(f"p{p}")
        )
    return ranked.groupBy("strata").agg(*aggs)


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ctx: int = 256,
    shards: int = 32,
) -> DataFrame:
    """Concat-and-chunk sequence packing report: documents are
    concatenated in id order WITHIN a shard and chunked into
    ``ctx``-token context windows (documents may straddle windows —
    exactly how pretraining packs with document concatenation).  Returns
    one row per (shard, window) with occupancy stats for the windows
    where documents start.

    Plan: one shuffle on the shard key + an in-partition sort — packing
    is embarrassingly parallel across shards, never a global sort.  The
    running token prefix-sum is a window aggregation with map-side
    ordering, and the final rollup rides the same partitioning.
    """
    shard = (F.col(id_col) % shards).alias("shard")
    tk = ensure_parallelism(df).select(
        shard, F.col(id_col).alias("doc"), token_count(F.col(text_col)).alias("n_tok")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = tk.withColumn(
        "window_id",
        F.floor(F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / ctx).cast("long"),
    )
    return placed.groupBy("shard", "window_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc").alias("first_doc"),
        F.sum("n_tok").cast("long").alias("tokens_started"),
    )


def _maybe_tokens(df: DataFrame, text_col: str):
    """``tokens(text_col)`` — or the column itself when the caller
    already tokenized (``array<string>`` input).  Lets a composite
    tokenize ONCE, persist the token relation, and share it across
    several LM operators (unigram + bigram perplexity score the same
    corpus; re-tokenizing 100 TB per branch is the single biggest
    avoidable cost in the union plan)."""
    from pyspark.sql import types as T

    try:
        dt = df.schema[text_col].dataType
    except Exception:
        dt = None
    if isinstance(dt, T.ArrayType):
        return F.col(text_col)
    return tokens(F.col(text_col))


def _md5_bucket(col, mod: int):
    """Deterministic cross-engine hash bucket in [0, mod): integer value
    of the first 8 md5 hex digits, mod ``mod``.  Identical in DuckDB:
    ``CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT) % mod``."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")
        % mod
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    precision: int = 1000,
    bucket_width_milli: int = 500,
) -> DataFrame:
    """Per-document negative log-likelihood under the corpus's own
    unigram LM — the CCNet-style perplexity quality signal (Wenzek et
    al., "CCNet: Extracting High Quality Monolingual Datasets from Web
    Crawl Data"): well-formed prose lands near the corpus distribution
    (low NLL); boilerplate, gibberish and rare-token soup land in the
    high-NLL tail that a quality funnel drops or down-weights.

    Determinism across engines: every token's log-probability is rounded
    to a fixed-point integer (``round(ln(tf_corpus / total) * precision)``
    as BIGINT) *before* any summation, so per-doc totals are exact
    integer sums — immune to the float-summation order differences that
    would otherwise make a distributed sum unreproducible (and break the
    DuckDB oracle).  The one ``ln`` call per *distinct vocabulary term*
    operates on an identical double in both engines.

    Plan at 100 TB (r9 shuffle diet, r10 made the total LAZY again):
    the corpus TOTAL is a lazy 1-row aggregate (``sum(size(tokens))``
    — equal to the exploded-token count because ``tokens()`` never
    yields null/empty elements) broadcast-cross-joined onto the SMALL
    vocabulary relation, never onto the (doc, term) tf relation — so
    the r9 diamond (Catalyst recomputing the whole tf lineage per
    consumer of the cross join) stays dead, while the r9 *eager*
    ``.first()`` is gone: building/explaining the operator no longer
    runs a full-corpus job, and because both the total and the counts
    derive from the SAME logical scan relation inside ONE job, a
    source that gains shards between plan construction and execution
    can never yield ``cnt > n_total`` (positive log-probs) the way the
    two-job eager variant could.  The vocabulary rollup DERIVES from
    the (doc, term) tf relation (r11 — sum(tf) == token count, so the
    exploded token stream is aggregated once, not twice); then: a
    term-keyed join to attach log-probs (AQE broadcasts a small vocab;
    a web-scale vocab shuffle-joins with AQE skew splitting — correct
    either way), and a per-doc rollup.  When the input arrives
    hash-partitioned by the id column (see the perplexity carrier's
    ``hash_partition``), the tf rollup and the per-doc rollup need NO
    exchange at all — hash(doc) satisfies both clustered
    distributions through the broadcast join.  No Python anywhere.

    ``text_col`` may already be ``array<string>`` (pre-tokenized) — a
    composite that scores the same corpus under several LMs should
    tokenize once, persist, and pass the token relation in (see
    ``_maybe_tokens``); that collapses the scan+tokenize passes the
    unigram/bigram union would otherwise each rebuild.

    Returns (doc, n_tokens, nll_milli, mean_nll_milli, ppl_bucket):
    ``nll_milli``   = -sum over tokens of logprob_milli (exact integer),
    ``mean_nll_milli`` = nll_milli div n_tokens (integer division),
    ``ppl_bucket``  = mean_nll_milli div bucket_width_milli — the
    fixed-width histogram bucket a CCNet-style head/middle/tail split
    thresholds on.
    """
    src = ensure_parallelism(
        df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("_txt"))
    )
    tk = src.select("doc", _maybe_tokens(src, "_txt").alias("_tk"))
    terms = explode_nonempty(tk, "_tk", "term", "doc")
    tf = terms.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    # lazy 1-row scalar off the same scan relation (one cheap
    # tokenize-and-sum branch, no explode, no eager job)
    total = tk.agg(
        F.sum(F.coalesce(F.size("_tk"), F.lit(0)))
        .cast("long")
        .alias("_n_total")
    )
    # vocabulary counts DERIVE from the tf relation (r11 — the r10 plan
    # re-aggregated the exploded token stream a second time): sum(tf)
    # over docs == count over tokens, so the term rollup shuffles
    # (term, partial) rows aggregated off tf instead of token-scale
    # partials.  When tf itself needs a shuffle (input not already
    # doc-clustered), its exchange subtree is identical in both
    # consumers and AQE reuses the stage; when the input arrives
    # hash-partitioned by doc (the perplexity carrier), tf needs NO
    # exchange at all and this rollup is the branch's only shuffle.
    vocab = tf.groupBy("term").agg(F.sum("tf").cast("long").alias("cnt"))
    lp = vocab.crossJoin(F.broadcast(total)).select(
        "term",
        F.round(F.log(F.col("cnt") / F.col("_n_total")) * precision)
        .cast("long")
        .alias("lp_milli"),
    )
    # EXPLICIT broadcast of the vocabulary side (r13): left to its own
    # stats the static planner picked BuildLeft — broadcasting the
    # CORPUS-SIZED (doc, term) tf relation and streaming the vocab —
    # which is backwards at any real scale AND makes the streamed
    # side's hash(term) partitioning reach the per-doc rollup, costing
    # a doc exchange the cached hash(doc) input had already paid for.
    # lp is bounded by the vocabulary; if a web-scale vocabulary
    # outgrows broadcast, drop the hint and accept the term-keyed
    # shuffle join plus the per-doc exchange — that regime pays two
    # exchanges no matter the build side.
    return (
        tf.join(F.broadcast(lp), "term")
        .groupBy("doc")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            (-F.sum(F.col("tf") * F.col("lp_milli"))).cast("long").alias("nll_milli"),
        )
        .select(
            "doc",
            "n_tokens",
            "nll_milli",
            F.expr("nll_milli div n_tokens").alias("mean_nll_milli"),
            F.expr(f"(nll_milli div n_tokens) div {bucket_width_milli}").alias(
                "ppl_bucket"
            ),
        )
    )


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio — the classic cheap
    gibberish/boilerplate detector (cited in the Gopher and RefinedWeb
    curation discussions): natural prose compresses to ~0.3-0.5 of its
    size, base64/random-token soup barely compresses (ratio near 1),
    and template boilerplate compresses extremely (ratio near 0).
    Filter both tails.

    This is the package's one deliberate PYTHON-path text operator: no
    SQL engine exposes a compressor, so it runs as Arrow-batched
    ``mapInPandas`` (same plumbing contract as the multimodal decoders —
    batch in, batch out, per-partition parallelism, never per-row
    Python).  Cost is one pass over the text bytes; the deterministic
    output (fixed zlib level) is reproducible across runs but has no
    DuckDB twin — pytest carries the contract instead of an oracle.

    Returns ``(doc, n_bytes, n_compressed, ratio_milli)`` with
    ``ratio_milli = n_compressed * 1000 // n_bytes`` (exact integers;
    empty documents report ratio_milli = 1000).
    """
    import pandas as pd

    out_schema = "doc long, n_bytes long, n_compressed long, ratio_milli long"
    src = ensure_parallelism(df).select(
        F.col(id_col).alias("doc"), F.col(text_col).alias("_txt")
    )

    def compress(batches):
        import zlib

        for pdf in batches:
            raw = pdf["_txt"].fillna("").str.encode("utf-8")
            n_bytes = raw.str.len().astype("int64")
            n_comp = raw.map(
                lambda b: len(zlib.compress(b, level))
            ).astype("int64")
            yield pd.DataFrame(
                {
                    "doc": pdf["doc"],
                    "n_bytes": n_bytes,
                    "n_compressed": n_comp,
                    "ratio_milli": (
                        n_comp * 1000 // n_bytes.where(n_bytes > 0, 1)
                    ).where(n_bytes > 0, 1000),
                }
            )

    return src.mapInPandas(compress, schema=out_schema)


def bigram_logprob(
    df: DataFrame,
    lm_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    precision: int = 1000,
    alpha_num: int = 4,
    alpha_den: int = 10,
    bucket_width_milli: int = 500,
) -> DataFrame:
    """Per-document NLL under a BIGRAM LM with stupid backoff (Brants et
    al. 2007, "Large Language Models in Machine Translation") — the
    next-order sibling of ``unigram_logprob`` and the closer analog of
    CCNet's KenLM scoring: the LM trains on a REFERENCE slice (``lm_df``,
    e.g. the curated/wiki-like subset) and scores the full corpus, so
    unseen bigrams genuinely occur and back off as
    ``alpha * P_unigram(w2)``; unseen unigrams hit the ``alpha / total``
    floor.  (Scoring a corpus with an LM trained on ITSELF never backs
    off — every observed n-gram has count >= 1 — which is why the
    reference-slice asymmetry is the operative shape.)

    Determinism contract of ``unigram_logprob``: each event's
    log-probability is ONE ``ln`` on an identical double in any engine
    — ``ln(c12/c1)``, ``ln(alpha*c2/total)`` or ``ln(alpha/total)`` —
    rounded to a milli-nat BIGINT before the per-doc sum, so totals are
    exact integer sums.

    Plan at 100 TB (r9 shuffle diet, r10 made the total LAZY again):
    the LM total is a lazy 1-row aggregate (``sum(size(tokens))`` over
    the LM slice) broadcast onto the scored relation — the broadcast
    branch re-reads only the SMALL LM slice, never the scored corpus,
    so the r9 diamond (the old derivation from ``uni`` recomputed the
    whole unigram rollup per consumer) stays dead while plan
    construction no longer runs an eager full-slice job, and the total
    is read in the same job as the counts (late shards can never make
    ``c2 > n_total``).  ``text_col`` may be pre-tokenized
    ``array<string>`` (see ``unigram_logprob``) so a perplexity
    composite shares one persisted token relation across both LM
    branches.  The prefix counts ``c1`` DERIVE from the aggregated
    ``c12`` relation (r11: ``sum(c12) group by first word`` — a
    vocabulary-sized AQE-splittable rollup+join, never a window on the
    maximally-Zipf first word, SKEW.md's 3.81x cliff; and never a
    second rollup over the exploded bigram stream — the bg Exchange is
    reused, so the LM slice is exploded exactly once).  The scored
    side rolls up per-doc bigram tf once and attaches counts via two
    keyed left joins (AQE broadcasts small LMs); per-doc rollup.

    Returns ``(doc, n_events, n_backoff, nll_milli, mean_nll_milli,
    ppl_bucket)``; documents with fewer than two tokens have no bigram
    events and are absent.
    """
    if lm_df is None:
        lm_df = df
    alpha = alpha_num / alpha_den

    def _bigrams(src: DataFrame, with_id: bool) -> DataFrame:
        cols = [F.col(id_col).alias("doc")] if with_id else []
        wide = ensure_parallelism(src.select(*cols, F.col(text_col).alias("_txt")))
        tk = wide.select(
            *(["doc"] if with_id else []),
            _maybe_tokens(wide, "_txt").alias("_tk"),
        )
        bg = tk.select(
            *(["doc"] if with_id else []),
            shingles_from_tokens(F.col("_tk"), 2).alias("_bg"),
        )
        return explode_nonempty(bg, "_bg", "bg", *(["doc"] if with_id else []))

    bg_flat = _bigrams(lm_df, with_id=False)
    # first-word totals DERIVE from the aggregated bigram counts (r11 —
    # the r10 plan re-aggregated the exploded bigram stream a second
    # time): sum(c12) grouped by first word == count of bigram events
    # by first word, so the _w1 rollup shuffles vocabulary-sized
    # aggregate rows instead of token-scale partials.  The shared
    # aggregate is persist_tracked: its two consumers (the c1 rollup
    # and the join-back) would otherwise each re-explode the LM slice —
    # AQE exchange reuse does NOT fire across cached-relation scans
    # (canonicalization), so the pin is the only way the LM corpus is
    # exploded and bg-shuffled exactly once.  Release via
    # operators.util.release_tracked_caches / cache_scope.
    c12_counts = persist_tracked(
        bg_flat.groupBy("bg")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
        .withColumn("_w1", F.split(F.col("bg"), " ").getItem(0))
    )
    c1s = c12_counts.groupBy("_w1").agg(
        F.sum("c12").cast("long").alias("c1")
    )
    c12 = c12_counts.join(c1s, "_w1").drop("_w1")
    lm_wide = ensure_parallelism(lm_df.select(F.col(text_col).alias("_txt")))
    lm_tk = lm_wide.select(_maybe_tokens(lm_wide, "_txt").alias("_tk"))
    uni = (
        explode_nonempty(lm_tk, "_tk", "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("c2"))
    )
    # lazy 1-row scalar (== sum of c2: tokens() yields no null/empty
    # elements) off the same LM scan relation — building the operator
    # runs no job, and counts can never outrun the total (r10)
    total = lm_tk.agg(
        F.sum(F.coalesce(F.size("_tk"), F.lit(0)))
        .cast("long")
        .alias("_n_total")
    )

    d_bg = (
        _bigrams(df, with_id=True)
        .groupBy("doc", "bg")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .withColumn("w2", F.split(F.col("bg"), " ").getItem(1))
    )
    scored = (
        d_bg.join(c12, "bg", "left")
        .join(uni.withColumnRenamed("term", "w2"), "w2", "left")
        .crossJoin(F.broadcast(total))
    )
    lp = (
        F.when(
            F.col("c12").isNotNull(),
            F.round(F.log(F.col("c12") / F.col("c1")) * precision),
        )
        .when(
            F.col("c2").isNotNull(),
            F.round(
                F.log(F.lit(alpha) * F.col("c2") / F.col("_n_total"))
                * precision
            ),
        )
        .otherwise(
            F.round(F.log(F.lit(alpha) / F.col("_n_total")) * precision)
        )
        .cast("long")
    )
    return (
        scored.withColumn("lp_milli", lp)
        .groupBy("doc")
        .agg(
            F.sum("tf").cast("long").alias("n_events"),
            F.sum(F.when(F.col("c12").isNull(), F.col("tf")).otherwise(0))
            .cast("long")
            .alias("n_backoff"),
            (-F.sum(F.col("tf") * F.col("lp_milli")))
            .cast("long")
            .alias("nll_milli"),
        )
        .select(
            "doc",
            "n_events",
            "n_backoff",
            "nll_milli",
            F.expr("nll_milli div n_events").alias("mean_nll_milli"),
            F.expr(f"(nll_milli div n_events) div {bucket_width_milli}").alias(
                "ppl_bucket"
            ),
        )
    )


def importance_resample(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    precision: int = 1000,
) -> DataFrame:
    """DSIR-shaped data selection (Xie et al., "Data Selection for
    Language Models via Importance Resampling"): score every raw
    document by how much its hashed-unigram feature distribution looks
    like a (small, curated) ``target`` corpus rather than the raw corpus
    itself, then accept documents by deterministic hash-thresholded
    importance resampling.

    Features are hashed buckets (md5 of the term mod ``n_buckets``) so
    the feature tables are tiny and fixed-width no matter how large the
    vocabulary grows — both distributions broadcast.  Per-bucket
    log-ratios use Laplace (+1) smoothing and are rounded to fixed-point
    integers before any per-document summation (same cross-engine
    determinism contract as ``unigram_logprob``).

    Acceptance: a document with per-token average log-ratio ``r`` is
    kept iff ``md5_bucket(id)/10000 < exp(min(r, 0))`` — i.e. documents
    that look *more* target-like than raw are always kept, others are
    kept with probability exp(avg log-ratio), reproducibly (no RNG
    state; re-runs and late-arriving shards make identical decisions).

    Plan at 100 TB (r9 shuffle diet — 16 Exchanges down to 8, one lazy
    job): the per-bucket distributions roll up DIRECTLY off each token
    stream (one map-side-combined 64-row rollup per side — the old
    derivation through the (doc, bucket) tf relation dragged that
    expensive exchange into the counts branch, and the
    ``crossJoin(broadcast(tot))`` diamond then recomputed the whole raw
    lineage twice more).  The totals attach to the 64-row joined
    relation via an unpartitioned WINDOW — bounded by ``n_buckets``
    rows, so the single-partition barrier is constant-sized — instead
    of a second aggregation branch.  The raw corpus is tokenized twice
    (counts + scoring) and never more; every branch's lineage appears
    exactly once, and all branches overlap inside one job.  The accept
    decision is a map-side expression.  Nothing large ever joins
    anything large.

    ``text_col`` may already be ``array<string>`` (pre-tokenized — see
    ``_maybe_tokens``): the carrier tokenizes ONCE into a persisted
    relation hash-partitioned by doc id (r11), which both collapses the
    raw-corpus scan+tokenize passes (bucket counts + scored side) into
    one and makes hash(doc) satisfy the (doc, bucket) and per-doc
    rollups' distributions — neither needs an exchange.

    Returns (doc, n_tokens, weight_milli, avg_ratio_milli, accept).
    """
    from pyspark.sql import Window as W

    def _bucket_counts(frame: DataFrame, out: str) -> DataFrame:
        wide = ensure_parallelism(
            frame.select(F.col(text_col).alias("_txt"))
        )
        tk = wide.select(_maybe_tokens(wide, "_txt").alias("_tk"))
        terms = explode_nonempty(tk, "_tk", "term")
        return terms.groupBy(
            _md5_bucket(F.col("term"), n_buckets).alias("bucket")
        ).agg(F.count(F.lit(1)).cast("long").alias(out))

    tgt_counts = _bucket_counts(target, "t_cnt")
    raw_counts = _bucket_counts(df, "s_cnt")
    # dense bucket spine so +1-smoothed ratios exist for unseen buckets
    spine = df.sparkSession.range(n_buckets).select(
        F.col("id").cast("long").alias("bucket")
    )
    from topic_store_spark.operators.util import with_global_agg

    joined = with_global_agg(
        # n_buckets rows: a constant-sized barrier
        spine.join(F.broadcast(tgt_counts), "bucket", "left")
        .join(F.broadcast(raw_counts), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("t_cnt", F.lit(0)).alias("t_cnt"),
            F.coalesce("s_cnt", F.lit(0)).alias("s_cnt"),
        ),
        t_total=F.sum("t_cnt"),
        s_total=F.sum("s_cnt"),
    )
    ratios = joined.select(
        "bucket",
        F.round(
            (
                F.log(
                    ((F.col("t_cnt") + 1) / (F.col("t_total") + n_buckets))
                    / ((F.col("s_cnt") + 1) / (F.col("s_total") + n_buckets))
                )
            )
            * precision
        )
        .cast("long")
        .alias("ratio_milli"),
    )
    src = ensure_parallelism(
        df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("_txt"))
    )
    tk = src.select("doc", _maybe_tokens(src, "_txt").alias("_tk"))
    terms = explode_nonempty(tk, "_tk", "term", "doc")
    raw_tf = (
        terms.select(
            "doc", _md5_bucket(F.col("term"), n_buckets).alias("bucket")
        )
        .groupBy("doc", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    scored = (
        raw_tf.join(F.broadcast(ratios), "bucket")
        .groupBy("doc")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("ratio_milli"))
            .cast("long")
            .alias("weight_milli"),
        )
        .select(
            "doc",
            "n_tokens",
            "weight_milli",
            F.expr("weight_milli div n_tokens").alias("avg_ratio_milli"),
        )
    )
    accept_p = F.exp(
        F.least(F.col("avg_ratio_milli"), F.lit(0)).cast("double") / precision
    )
    return scored.select(
        "doc",
        "n_tokens",
        "weight_milli",
        "avg_ratio_milli",
        (_md5_bucket(F.col("doc"), 10000) / 10000.0 < accept_p).alias("accept"),
    )
