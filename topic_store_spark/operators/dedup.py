"""Deduplication operators for large-scale training-data pipelines.

Five strategies over a ``documents``-shaped table (id + text) or an
``embeddings``-shaped table (id + vector):

- ``exact_duplicates``        hash-groupBy on a normalized fingerprint
- ``ngram_jaccard_pairs``     exact n-gram Jaccard via shingle self-join
- ``minhash_lsh_pairs``       MinHash signatures -> LSH bands -> verify
- ``simhash_pairs``           SimHash bands -> Hamming verify
- ``embedding_dup_pairs``     quantized-cosine near-dup pairs

Scale design: every strategy is a shuffle-on-key plan with no driver
loops.  Three deliberate physical-plan choices (measured ~100x on the
bench corpus, and the difference between "works" and "doesn't" at 100 TB):

1. Expensive per-row expressions (regex tokenization, md5 arrays) are
   **staged through their own projections** so each evaluates once.
   Higher-order-function lambdas are interpreted with no subexpression
   elimination — inlining ``tokens(text)`` into a ``transform`` lambda
   re-runs the regex split per array element, O(len^2) per row.
2. Inputs are **repartitioned up to the cluster's parallelism** before
   CPU-bound signature computation (a handful of small input files must
   not serialize hashing onto a handful of cores).
3. LSH candidate pairs are verified by joining the candidate list to
   per-doc shingle *arrays* and intersecting (``array_intersect``) —
   never by re-running the full shingle self-join and filtering after,
   which would cost more than the brute-force path it replaces.

Jaccard/minhash self-joins key on shingle/band — the classic hot-key
hazard is a shingle shared by half the corpus, so the exact path takes a
``max_shingle_freq`` cap that drops degenerate keys before the join
(standard LSH practice; the cap is on *join fan-out*, not on recall of
confirmed pairs above the threshold for non-degenerate shingles).
Thresholds compare cross-multiplied integers (``common * den >= num *
union``) — exact, no FP boundary flakiness, and identical in the SQL
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from topic_store_spark.functions.hashing import (
    md5_fingerprint,
    simhash_long_band_keys,
    simhash_long_from_hashes,
    token_md5s,
)
from topic_store_spark.functions.text import (
    normalize_text,
    shingles_from_tokens,
    tokens,
)
from topic_store_spark.functions.vectors import int_self_dot, quantize_vector
from topic_store_spark.operators.util import (
    cache_scope as pair_cache_scope,
    ensure_parallelism,
    explode_nonempty,
    expose_cached_partitioning,
    hash_partition,
    persist_tracked as _persist_tracked,
    project_once,
    release_tracked_caches as release_pair_caches,
)


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


def deduplicate_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Materialized exact dedup: the corpus with duplicates REMOVED —
    the lowest-id document survives per normalized-text fingerprint.
    This is the application step (``exact_duplicates`` is the report).

    One shuffle on the fingerprint; ``min_by`` keeps map-side partials
    (no window sort), then a semi-join-free select of the surviving rows
    would need the full row — so the keeper id comes from the aggregate
    and the original rows re-attach by id (broadcast-able when the
    keeper set is small; AQE decides otherwise)."""
    keep = (
        df.select(
            md5_fingerprint(F.col(text_col)).alias("fingerprint"),
            F.col(id_col).alias("_doc"),
        )
        .groupBy("fingerprint")
        .agg(F.min("_doc").alias("keep_id"))
    )
    return df.join(
        keep.select(F.col("keep_id").alias(id_col)), id_col, "left_semi"
    )


def _shingle_arrays(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(doc, shs): distinct word-n-gram shingle array per doc.  Tokens and
    shingles each materialize in their own projection (perf contract of
    shingles_from_tokens)."""
    tk = ensure_parallelism(df).select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("_tk")
    )
    return tk.select(
        "doc", F.array_distinct(shingles_from_tokens(F.col("_tk"), n)).alias("shs")
    )


def _pair_jaccard(sh: DataFrame, candidates: DataFrame) -> DataFrame:
    """Exact Jaccard for an explicit (a_doc, b_doc) candidate list by
    intersecting the two docs' shingle arrays — per-candidate work only,
    no shingle self-join."""
    a = sh.select(
        F.col("doc").alias("a_doc"),
        F.col("shs").alias("a_shs"),
        F.size("shs").alias("a_sz"),
    )
    b = sh.select(
        F.col("doc").alias("b_doc"),
        F.col("shs").alias("b_shs"),
        F.size("shs").alias("b_sz"),
    )
    joined = candidates.join(a, "a_doc").join(b, "b_doc")
    # project_once: the threshold filter downstream would otherwise be
    # pushed into the join condition with the array_intersect inlined
    # 3x per candidate pair (r13 plan audit)
    return project_once(
        joined, common=F.size(F.array_intersect("a_shs", "b_shs"))
    ).withColumn("union_sz", F.col("a_sz") + F.col("b_sz") - F.col("common"))


def _jaccard_out(pairs: DataFrame, threshold_num: int, threshold_den: int) -> DataFrame:
    return pairs.filter(
        F.col("common") * threshold_den >= threshold_num * F.col("union_sz")
    ).select(
        "a_doc",
        "b_doc",
        "common",
        "union_sz",
        (F.col("common") / F.col("union_sz")).alias("jaccard"),
    )


# tracked persists (r11: shared machinery in operators/util.py, aliased
# at the top of this module — the same scope/release contract now also
# covers corpus.py's LM caches): `release_pair_caches()` drains every
# unscoped tracked intermediate (the overlap plans' cap-filtered
# shingles, ordered arrays, MinHash shingle/band relations, SimHash
# signature groups) once the pair output is materialized;
# `pair_cache_scope` scopes one computation's pins so concurrent
# computations can't release each other's caches (r10 ADVICE).  NOTE:
# `spark.catalog.clearCache()` does NOT drain the tracked list — use
# the scope/release API.


def _cooccurring_pairs(sh: DataFrame, max_shingle_freq: int | None) -> DataFrame:
    """Shared skeleton of the exact overlap family: shingle-keyed
    self-join -> per-pair common count + both set sizes.

    ``sh`` is (doc, shs array).  Keying on shingle IS the pair pruning —
    pairs sharing no shingle can never pass a positive threshold.
    ``max_shingle_freq`` drops shingles appearing in more than that many
    docs before the self-join: one stop-shingle shared by d docs alone
    contributes d^2/2 candidate pairs, so an uncapped join is the
    canonical 100x scale-killer.  When the cap is active, set sizes are
    recomputed over the SURVIVING shingles too, so the metrics are exact
    Jaccard/containment in the stop-shingle-filtered universe — a true
    dup pair keeps its score (both members lose the same hot shingles)
    instead of being diluted by a full-size denominator.

    The join runs on a 60-bit md5-derived integer key per shingle, not
    the shingle string: the self-join shuffles longs instead of 20-40
    byte grams (~25% faster measured at sf0.1, linearly more at wider
    grams).  Two distinct shingles sharing a key would inflate one
    pair's ``common`` by 1, but 60-bit collisions over even a
    billion-shingle vocabulary are ~3e-4 expected occurrences — and the
    key is a pure function of the shingle, so any engine mirroring the
    derivation (md5 is bit-identical everywhere) reproduces the exact
    output."""
    from topic_store_spark.functions.hashing import shingle_key60

    shingles = explode_nonempty(sh, "shs", "shingle", "doc").select(
        "doc", shingle_key60(F.col("shingle")).alias("shingle")
    )

    joinable = shingles
    if max_shingle_freq is not None:
        freq = shingles.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        # drop-side ANTI-join, not keep-side inner join: the KEEP set is
        # nearly the whole vocabulary (never broadcastable at scale, so
        # an inner join would shuffle the corpus-sized flat relation by
        # shingle — with exactly the hot keys the cap exists to tame);
        # the DROP set is the handful of stop-shingles over the cap —
        # tiny by definition, broadcast at any corpus size, zero corpus
        # shuffle.  The flat relation itself is deliberately RECOMPUTED
        # map-side per pass rather than cached: its lineage is a
        # stateless scan+explode, and recomputing that beats writing+
        # reading a corpus-sized cache (measured both ways at sf0.1).
        hot = freq.filter(F.col("df") > max_shingle_freq).select("shingle")
        joinable = shingles.join(F.broadcast(hot), "shingle", "left_anti")
        # three consumers (join left/right + sizes) would each re-derive
        # the shingle scan AND the anti-join — materialize once (tracked;
        # see release_pair_caches)
        joinable = _persist_tracked(joinable)
        sizes = joinable.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    else:
        sizes = sh.select("doc", F.size("shs").alias("sz"))

    left = joinable.select(F.col("doc").alias("a_doc"), "shingle")
    right = joinable.select(F.col("doc").alias("b_doc"), "shingle")
    common = (
        left.join(right, "shingle")
        .filter(F.col("a_doc") < F.col("b_doc"))
        .groupBy("a_doc", "b_doc")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.join(sizes.withColumnsRenamed({"doc": "a_doc", "sz": "a_sz"}), "a_doc")
        .join(sizes.withColumnsRenamed({"doc": "b_doc", "sz": "b_sz"}), "b_doc")
    )


def _prefix_filtered_pairs(
    sh: DataFrame,
    threshold_num: int,
    threshold_den: int,
    max_shingle_freq: int | None,
) -> DataFrame:
    """AllPairs/PPJoin-style prefix filtering (Bayardo et al. 2007,
    "Scaling Up All Pairs Similarity Search") for the exact-Jaccard
    self-join: under one GLOBAL shingle order (document frequency
    ascending, key ascending — rarest first), any pair with
    ``J(A, B) >= t`` must share a shingle within each side's first
    ``|X| - ceil(t * |X|) + 1`` ordered shingles, so only that PREFIX is
    indexed and self-joined.  At t = 0.8 the prefix is ~20% of each doc
    — candidate pairs fall to ~4% of the full shingle self-join's, and
    the prefix skews toward RARE shingles (tiny buckets), so the win at
    web scale is substantially larger than the ratio suggests.

    Candidates are verified with the exact intersection of the FULL
    (cap-filtered) shingle sets, so results are bit-identical to
    ``_cooccurring_pairs`` + threshold: same ``(a_doc, b_doc, common,
    a_sz, b_sz)`` relation restricted to pairs that can pass ``t``
    (proven by equality tests at several thresholds).

    ``max_shingle_freq`` composes exactly as in ``_cooccurring_pairs``:
    stop-shingles leave the universe before sizes, ordering, prefixes
    and verification.  Cost shape: the global df rollup (needed for the
    cap anyway), ONE doc-keyed shuffle to assemble each doc's ordered
    shingle array, the (small) prefix self-join, and per-candidate
    array intersections.
    """
    docs = _ordered_docs(sh, max_shingle_freq)
    cands = _jaccard_prefix_cands(docs, threshold_num, threshold_den)
    return _verify_candidates(docs, cands)


def _ordered_docs(sh: DataFrame, max_shingle_freq: int | None) -> DataFrame:
    """Persisted (doc, ss, sz): each doc's cap-filtered shingle keys as
    ONE array under the global (df asc, key asc) order — the relation
    every prefix scheme slices and every verification intersects.
    Tracked for :func:`release_pair_caches`."""
    from topic_store_spark.functions.hashing import shingle_key60

    flat = explode_nonempty(sh, "shs", "shingle", "doc").select(
        "doc", shingle_key60(F.col("shingle")).alias("shingle")
    )
    # document frequency as a keyed rollup + join-back, NOT a window
    # count: shingle df is Zipf-distributed, and `count over (partition
    # by shingle)` puts the hottest shingle's entire df in ONE window
    # task (no map-side partials, no AQE splitting for windows) — the
    # measured 3.81x skew cliff of SKEW.md, the same reason r10
    # reverted salient_terms' window form.  The rollup gets partial
    # aggregation; with the cap applied BEFORE the join-back, capped-out
    # hot shingles never join at all, so per-key join fan-out is
    # <= max_shingle_freq by construction (skew-safe even without AQE).
    # Local cost of the second exchange at sf0.1: ~0.2s on this carrier
    # — the scale story wins.
    df_counts = flat.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    if max_shingle_freq is not None:
        df_counts = df_counts.filter(F.col("df") <= max_shingle_freq)
    surv = flat.join(df_counts, "shingle")

    # one doc-keyed rollup: globally-ordered shingle array per doc
    ordered = surv.groupBy("doc").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("df"), F.col("shingle")))
        ).alias("_ord")
    )
    docs = ordered.select(
        "doc",
        F.transform(F.col("_ord"), lambda x: x["shingle"]).alias("ss"),
        F.size("_ord").alias("sz"),
    )
    return _persist_tracked(docs)


#: A/B instrumentation knob (r11): when False, the prefix candidate
#: joins skip the PPJoin positional/size-ratio join-time cuts (revert to
#: the pre-0ea8df7 shape) WITHOUT changing the output pair set — the
#: exact verify rejects everything the cuts would have pruned.  Flipped
#: only by tools/ab_bench.py to measure the cuts' real effect
#: interleaved in one session.  Production default True is EVIDENCED
#: (r12, re-stamped under the codegen-cache-fixed protocol): on the
#: near-dup-rich replica corpus — high candidate density, where prefix
#: filtering is supposed to pay — the interleaved A/B stamped
#: ppjoin_on_faster (median 10.13s vs 11.27s, delta 1.14s above the
#: 1.08s steady spread; BENCH_AB_ppjoin_neardup.json; the pre-fix run
#: stamped the same verdict at 8.92 vs 9.87).  On the sparse registry
#: fixture the delta stays inside noise (BENCH_AB.json: unresolved),
#: i.e. the cuts cost nothing there.
PPJOIN_CUTS = True

#: r13 optimization-round toggle (`tools/ab_bench.py
#: reportfuse:dedup_semantic`): True derives the fused report's capped
#: pair set by FILTERING the uncapped self-join's output on matching
#: sub-bucket keys (one corpus-scale pair join, pinned pair-sized);
#: False restores the r12 two-join shape whose capped join re-evaluated
#: the per-pair dot fold over its whole candidate subset.  Outputs are
#: identical (same-cluster AND same-sub == the capped join keys;
#: threshold predicate unchanged) — oracle-checked.
FUSED_REPORT_PAIRS = True

#: r13 optimization-round toggle (`tools/ab_bench.py ccprobe:<query>`):
#: True gates :func:`connected_components`' driver fast path with ONE
#: eager ``limit(driver_max_edges+1)`` collect off the e-checkpoint —
#: when the edge set fits, the probe IS the complete edge set, so the
#: reference shape's three eager jobs (checkpoint(edges) + count() +
#: collect()) and the checkpoint write collapse into one job.  False
#: restores the r12 materialize+count+collect gate.  Outputs identical:
#: union-find labels are order-independent (min reachable id), and the
#: distributed path is byte-identical either way — oracle-checked
#: (dedup_clusters).
CC_PROBE_GATE = True

#: r14 optimization-round toggle (`tools/ab_bench.py cclocal:<query>`):
#: True probes the RAW pair projection with ONE ``limit(K+1)`` collect
#: BEFORE any checkpoint — when the raw pair multiset fits the driver
#: budget it contains the complete edge AND node sets, so the label
#: relation is computed entirely on the driver and returned as a local
#: relation: one eager job total, no checkpoint write, and the returned
#: plan does no distributed work beyond scanning the local rows (the
#: r13 shape still paid an e-checkpoint materialization per execution
#: plus a distributed node-set distinct + label join in the returned
#: plan).  On overflow (raw pairs > K, which also covers every case the
#: r13 distinct-edge probe would overflow, plus the rare raw>K>distinct
#: band) it falls through to the r13/r12 checkpointed tiers unchanged.
#: False restores the r13 shape.  Outputs identical: same union-find,
#: same label fixpoint, self-loop/null handling matched to the
#: distributed path's semantics — oracle-checked (dedup_clusters).
CC_LOCAL_RESULT = True

#: r14 optimization-round toggle (`tools/ab_bench.py argmax:<query>`):
#: True computes the single-probe centroid assignment as a PER-ROW
#: argmax expression over the (bounded, centroid-count-sized) collected
#: quantized centroid literals — ``array_max(array(struct(aff, -cen_id,
#: cen_id), ...))`` — so the assignment is MAP-SIDE: the r13 shape's
#: corpus-scale ``crossJoin(broadcast(cen)) + groupBy(c_id).agg(max(
#: struct(...)))`` exchange (which carried the full 64-long quantized
#: vector payload per row, ~550 B) disappears from the plan (guide
#: §2.3/§2.4: shuffle fewer bytes / remove shuffles outright).  The
#: struct comparison fields and every arithmetic op are identical —
#: same fold dots over the same quantized longs, same
#: ``dot / SQRT(CAST(n AS DOUBLE))`` affinity, same (aff desc, cen_id
#: asc) tie-break — so the assignment, and every downstream pair/audit
#: row, is bit-identical (oracle-checked: dedup_semantic).  False
#: restores the r13 crossJoin+groupBy shape.
ARGMAX_ASSIGN = True

#: r14 experiment toggle (`tools/ab_bench.py arrowdot:<query>`): True
#: computes the pair-verify integer dot through a VECTORIZED Arrow
#: pandas UDF (numpy int64 row-wise dot — exact: every product/sum of
#: quantized components is far inside int64, so the longs are
#: bit-identical to the JVM fold's) instead of the interpreted
#: ``aggregate(zip_with(...))`` higher-order fold, which is
#: CodegenFallback (one lambda frame per element per candidate pair).
#: The r13 alternatives to the fold (full unroll, sequence-fold) were
#: measured dead ends; this is guide §4.2's sanctioned boundary — hand
#: whole Arrow batches to numpy.  The UDF is marked non-deterministic
#: so the threshold filter cannot duplicate it (guide §4.4).  Default
#: decided by the interleaved A/B receipt
#: (BENCH_AB_arrowdot_dedup_semantic.json).
ARROW_PAIR_DOT = False


def _arrow_pair_dot(a: str, b: str):
    """Row-wise integer dot of two array<bigint> columns as a
    vectorized Arrow pandas UDF: batches cross the boundary columnar,
    numpy does one int64 einsum per batch.  Exact (int64 throughout,
    no float round-trip), so results are bit-identical to
    :func:`similarity._int_dot`'s fold."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # `from __future__ import annotations` stringifies the hints below;
    # pandas_udf resolves them against THIS module's globals, so the
    # lazily-imported pd must be visible there (module-level pandas
    # import deliberately avoided — only this experiment needs it)
    globals().setdefault("pd", pd)

    @pandas_udf("long")
    def _dot(xa: pd.Series, xb: pd.Series) -> pd.Series:
        import numpy as np

        if len(xa) == 0:
            return pd.Series([], dtype="int64")
        va = np.vstack(xa.to_numpy()).astype(np.int64, copy=False)
        vb = np.vstack(xb.to_numpy()).astype(np.int64, copy=False)
        return pd.Series(np.einsum("ij,ij->i", va, vb))

    return _dot.asNondeterministic()(F.col(a), F.col(b))


def _prefix_len(threshold_num: int, threshold_den: int):
    """Prefix length |X| - ceil(t*|X|) + 1 (integer ceil via div)."""
    return (
        F.col("sz")
        - F.expr(f"(sz * {threshold_num} + {threshold_den} - 1) div {threshold_den}")
        + 1
    )


def _jaccard_prefix_cands(
    docs: DataFrame, threshold_num: int, threshold_den: int,
    distinct: bool = True,
) -> DataFrame:
    """Candidate (a_doc, b_doc) pairs that can pass the Jaccard
    threshold: prefix x prefix self-join (both sides' bounds are valid
    because J >= t lower-bounds the overlap by t*|X| for EACH side),
    tightened by the two sound PPJoin-paper cuts (Xiao et al. 2008)
    applied as join-time predicates BEFORE the distinct + verify:

    - size ratio: J >= t forces min*den >= num*max (else even a full
      overlap of the smaller set cannot reach t);
    - positional upper bound: a join on prefix position p can still
      share at most ``1 + min(|A|-pa, |B|-pb)`` elements (the arrays
      share one global order), which must reach the overlap floor
      ``num*(|A|+|B|) / (num+den)``.

    Both only REMOVE candidates that exact verification would reject,
    so the output pair set is unchanged (equality-pinned in
    test_dedup_similarity); at sf0.1 they cut candidates ~2x before
    the expensive array-intersect verify."""
    num, den = threshold_num, threshold_den
    plen = _prefix_len(num, den)
    prefix = docs.select(
        "doc",
        "sz",
        F.posexplode(F.slice(F.col("ss"), 1, plen)).alias("pos", "shingle"),
    )
    ubound = 1 + F.least(
        F.col("x.sz") - F.col("x.pos") - 1, F.col("y.sz") - F.col("y.pos") - 1
    )
    out = (
        prefix.alias("x")
        .join(prefix.alias("y"), "shingle")
        .filter(F.col("x.doc") < F.col("y.doc"))
    )
    if PPJOIN_CUTS:
        out = out.filter(
            F.least("x.sz", "y.sz") * den >= F.greatest("x.sz", "y.sz") * num
        ).filter(ubound * (num + den) >= (F.col("x.sz") + F.col("y.sz")) * num)
    out = out.select(
        F.col("x.doc").alias("a_doc"), F.col("y.doc").alias("b_doc")
    )
    # ``distinct=False`` (r14): a caller that UNIONs several candidate
    # sources and dedups ONCE after the union skips this source-local
    # exchange — the union-level distinct's map-side partial aggregate
    # collapses the duplicates anyway, so one shuffle replaces two
    # (guide §2.4); the pair set is unchanged.
    return out.distinct() if distinct else out


def _containment_prefix_cands(
    docs: DataFrame, threshold_num: int, threshold_den: int,
    distinct: bool = True,
) -> DataFrame:
    """Candidate pairs that can pass the containment threshold
    ``common >= t * min(|A|, |B|)``.  The overlap bound is relative to
    the SMALLER side only, so the prefix principle holds only for it:
    index the smaller doc's prefix against the larger doc's FULL list
    (prefix x prefix would be unsound — the larger side's own-size
    prefix can legally miss the intersection).  Asymmetric-join cost:
    sum over shingles of prefix_df * df, still far below the full
    self-join's df^2 and skewed toward rare shingles.

    Tightened by the PPJoin positional upper bound (sound — see
    `_jaccard_prefix_cands`): a pair joined at positions (px, py) of
    the globally-ordered arrays can still share at most
    ``1 + min(|X|-px, |Y|-py)`` elements, which must reach the
    containment floor ``num * |X| / den`` (X is the smaller side)."""
    num, den = threshold_num, threshold_den
    plen = _prefix_len(num, den)
    prefix = docs.select(
        "doc", "sz",
        F.posexplode(F.slice(F.col("ss"), 1, plen)).alias("pos", "shingle"),
    )
    full = docs.select(
        "doc", "sz", F.posexplode(F.col("ss")).alias("pos", "shingle")
    )
    ubound = 1 + F.least(
        F.col("x.sz") - F.col("x.pos") - 1, F.col("y.sz") - F.col("y.pos") - 1
    )
    out = (
        prefix.alias("x")
        .join(full.alias("y"), "shingle")
        .filter(
            (F.col("x.sz") < F.col("y.sz"))
            | ((F.col("x.sz") == F.col("y.sz")) & (F.col("x.doc") != F.col("y.doc")))
        )
    )
    if PPJOIN_CUTS:
        out = out.filter(ubound * den >= F.col("x.sz") * num)
    out = out.select(
        F.least("x.doc", "y.doc").alias("a_doc"),
        F.greatest("x.doc", "y.doc").alias("b_doc"),
    )
    # see _jaccard_prefix_cands: union-level dedup skips this exchange
    return out.distinct() if distinct else out


def _verify_candidates(docs: DataFrame, cands: DataFrame) -> DataFrame:
    """Exact (common, a_sz, b_sz) for candidate pairs via full-array
    intersection — the shared verification step of every prefix plan."""
    a = docs.select(
        F.col("doc").alias("a_doc"),
        F.col("ss").alias("a_ss"),
        F.col("sz").alias("a_sz"),
    )
    b = docs.select(
        F.col("doc").alias("b_doc"),
        F.col("ss").alias("b_ss"),
        F.col("sz").alias("b_sz"),
    )
    joined = cands.join(a, "a_doc").join(b, "b_doc")
    # project_once: keep the downstream threshold filter from inlining
    # the intersection into the join condition (3x per pair otherwise)
    return project_once(
        joined, common=F.size(F.array_intersect("a_ss", "b_ss"))
    ).select("a_doc", "b_doc", "common", "a_sz", "b_sz")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold_num: int = 8,
    threshold_den: int = 10,
    max_shingle_freq: int | None = None,
    prefix_filter: bool = False,
) -> DataFrame:
    """All pairs with exact n-gram Jaccard >= threshold_num/threshold_den.

    Brute-exact path: co-shingled pairs via shingle-key self-join (pairs
    that share no shingle can never pass a positive threshold, so keying
    on shingle IS the pair pruning).  ``prefix_filter=True`` switches to
    the AllPairs/PPJoin prefix-filtered plan — identical output, ~(1-t)^2
    of the candidates (see ``_prefix_filtered_pairs``)."""
    sh = _shingle_arrays(df, text_col, id_col, n)
    if prefix_filter:
        pairs = _prefix_filtered_pairs(
            sh, threshold_num, threshold_den, max_shingle_freq
        )
    else:
        pairs = _cooccurring_pairs(sh, max_shingle_freq)
    pairs = pairs.withColumn(
        "union_sz", F.col("a_sz") + F.col("b_sz") - F.col("common")
    )
    return _jaccard_out(pairs, threshold_num, threshold_den)


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold_num: int = 9,
    threshold_den: int = 10,
    max_shingle_freq: int | None = None,
    prefix_filter: bool = False,
) -> DataFrame:
    """All pairs where the SMALLER document's n-gram set is >= threshold
    contained in the union — containment = common / min(|A|, |B|).

    Jaccard misses near-subset duplication (a paragraph quoted inside a
    much longer page scores low Jaccard but containment ~1); this is the
    standard asymmetric complement.  Identical keyed self-join plan to
    ``ngram_jaccard_pairs`` — only the final threshold differs, and it
    stays an exact cross-multiplied integer test.

    ``prefix_filter=True`` uses the containment-sound asymmetric prefix
    plan — the smaller doc's prefix indexed against full lists
    (`_containment_prefix_cands`); bit-identical output."""
    sh = _shingle_arrays(df, text_col, id_col, n)
    if prefix_filter:
        docs = _ordered_docs(sh, max_shingle_freq)
        pairs = _verify_candidates(
            docs, _containment_prefix_cands(docs, threshold_num, threshold_den)
        )
    else:
        pairs = _cooccurring_pairs(sh, max_shingle_freq)
    pairs = pairs.withColumn(
        "min_sz", F.least("a_sz", "b_sz")
    )
    return pairs.filter(
        F.col("common") * threshold_den >= threshold_num * F.col("min_sz")
    ).select(
        "a_doc",
        "b_doc",
        "common",
        "min_sz",
        (F.col("common") / F.col("min_sz")).alias("containment"),
    )


def word_overlap_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    jaccard_num: int = 8,
    jaccard_den: int = 10,
    containment_num: int = 9,
    containment_den: int = 10,
    max_shingle_freq: int | None = None,
    prefix_filter: bool = False,
) -> DataFrame:
    """Jaccard AND containment in ONE shingle self-join: pairs passing
    either threshold, with both metrics and per-metric hit flags.

    Running ``ngram_jaccard_pairs`` and ``containment_pairs`` separately
    scans + shuffles the shingle relation twice for the same candidate
    set; this computes both screens from one per-pair (common, |A|, |B|)
    triple — the production shape when a curation pipeline applies
    multiple overlap rules.

    ``prefix_filter=True`` replaces the full shingle self-join with the
    UNION of two prefix-filtered candidate sets — the Jaccard
    prefix x prefix join plus the containment smaller-prefix x full
    join (see `_containment_prefix_cands` for why containment needs the
    asymmetric form) — then verifies both metrics exactly on the full
    cap-filtered sets.  A pair passing the Jaccard threshold is found
    by the first branch, one passing containment by the second, so the
    OR-of-thresholds output is bit-identical to the plain plan
    (equality-tested across thresholds in test_dedup_similarity)."""
    sh = _shingle_arrays(df, text_col, id_col, n)
    if prefix_filter:
        docs = _ordered_docs(sh, max_shingle_freq)
        # r14: dedup the candidate union ONCE — the source-local
        # distincts were redundant under the union-level distinct (their
        # duplicates collapse in its map-side partial aggregate), so the
        # three candidate exchanges become one (guide §2.4); the pair
        # set is unchanged (equality-pinned vs the plain self-join in
        # test_dedup_similarity).
        cands = (
            _jaccard_prefix_cands(
                docs, jaccard_num, jaccard_den, distinct=False
            )
            .unionByName(
                _containment_prefix_cands(
                    docs, containment_num, containment_den,
                    distinct=False,
                )
            )
            .distinct()
        )
        pairs = _verify_candidates(docs, cands)
    else:
        pairs = _cooccurring_pairs(sh, max_shingle_freq)
    pairs = pairs.withColumns(
        {
            "union_sz": F.col("a_sz") + F.col("b_sz") - F.col("common"),
            "min_sz": F.least("a_sz", "b_sz"),
        }
    )
    jac_hit = F.col("common") * jaccard_den >= jaccard_num * F.col("union_sz")
    con_hit = F.col("common") * containment_den >= containment_num * F.col("min_sz")
    return pairs.filter(jac_hit | con_hit).select(
        "a_doc",
        "b_doc",
        "common",
        "union_sz",
        "min_sz",
        (F.col("common") / F.col("union_sz")).alias("jaccard"),
        (F.col("common") / F.col("min_sz")).alias("containment"),
        jac_hit.alias("jaccard_hit"),
        con_hit.alias("containment_hit"),
    )


def char_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold_num: int = 8,
    threshold_den: int = 10,
    max_shingle_freq: int | None = None,
    prefix_filter: bool = False,
) -> DataFrame:
    """All pairs with exact character-n-gram Jaccard >= threshold —
    catches near-dups whitespace/word shingling misses (insertions inside
    words, punctuation edits).  Shingle alphabet is char n-grams of
    whitespace-normalized lowercase text.

    ``prefix_filter=True`` swaps the full shingle self-join for the
    AllPairs/PPJoin prefix-filtered plan (``_prefix_filtered_pairs``) —
    bit-identical output, candidate pairs cut to ~(1-t)^2 and skewed
    toward rare shingles.  The scale path for high thresholds."""
    from topic_store_spark.functions.text import char_shingles_from_norm, normalize_text

    norm = ensure_parallelism(df).select(
        F.col(id_col).alias("doc"), normalize_text(F.col(text_col)).alias("_nt")
    )
    sh = norm.select(
        "doc", F.array_distinct(char_shingles_from_norm(F.col("_nt"), n)).alias("shs")
    )
    if prefix_filter:
        pairs = _prefix_filtered_pairs(
            sh, threshold_num, threshold_den, max_shingle_freq
        )
    else:
        pairs = _cooccurring_pairs(sh, max_shingle_freq)
    pairs = pairs.withColumn(
        "union_sz", F.col("a_sz") + F.col("b_sz") - F.col("common")
    )
    return _jaccard_out(pairs, threshold_num, threshold_den)


def _minhash_banded(sh: DataFrame, num_perm: int, bands: int) -> DataFrame:
    """(doc, band) LSH band-key relation from a (doc, shs) shingle-array
    relation, in the scale-canonical flat formulation: explode shingles,
    one codegen'd md5 per shingle reduced to a 28-bit key, then every
    permutation ``min((a_i*x+b_i) mod 2^31-1)`` as a map-side-partial
    aggregate — the only shuffle moves ``num_perm`` longs per document.
    Band key = '<band>|<comma-joined row minima>', identical values to
    ``hashing.minhash_signature_from_keys`` + ``lsh_band_keys_int`` (and
    to the DuckDB oracle), just a cheaper plan."""
    from topic_store_spark.functions.hashing import MERSENNE31, mix_constants

    rows = num_perm // bands
    flat = explode_nonempty(sh.filter(F.size("shs") > 0), "shs", "shingle", "doc")
    x = F.conv(F.substring(F.md5("shingle"), 1, 7), 16, 10).cast("long")
    keyed = flat.select("doc", x.alias("_x"))
    aggs = [
        F.min((F.col("_x") * F.lit(a) + F.lit(b)) % F.lit(MERSENNE31)).alias(
            f"_h{i}"
        )
        for i, (a, b) in enumerate(mix_constants(num_perm))
    ]
    sig = keyed.groupBy("doc").agg(*aggs)
    band_keys = F.array(
        *[
            F.concat(
                F.lit(f"{b}|"),
                F.concat_ws(
                    ",", *[F.col(f"_h{b * rows + r}") for r in range(rows)]
                ),
            )
            for b in range(bands)
        ]
    )
    return explode_nonempty(
        sig.select("doc", band_keys.alias("_bands")), "_bands", "band", "doc"
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
    persist: bool = True,
) -> DataFrame:
    """MinHash + LSH banding, then exact-Jaccard verification.

    Scale path vs ``ngram_jaccard_pairs``: the shingle self-join is
    replaced by a band-bucket join whose fan-out is O(collisions); the
    verify step pays per-candidate array intersection, nothing global.

    ``persist`` caches the shingle arrays and signatures
    (MEMORY_AND_DISK) because both feed two downstream branches (band
    self-join; pair verify) — without it each branch recomputes
    tokenize+shingle+hash.  Standard MinHash practice at any scale; pass
    False to keep the plan fully lazy.

    Signature family: universal-hash mixing over one md5-derived 28-bit
    key per shingle — the md5 cost is paid once, the ``num_perm``
    permutations are integer multiply-mods (~num_perm× cheaper than the
    md5-per-permutation family, same banding guarantees).  Computed in
    the flat formulation (``_minhash_banded``): explode shingles, hash
    the flat column inside whole-stage codegen, and reduce each
    permutation as a map-side-partial ``min`` — the per-doc shuffle
    moves ``num_perm`` longs per document, and no interpreted
    higher-order function ever runs per shingle (measured 3× faster
    than the array-HOF form at sf0.1).
    """
    sh = _shingle_arrays(df, text_col, id_col, n)
    if persist:
        sh = _persist_tracked(sh)
    banded = _minhash_banded(sh, num_perm, bands)
    cands = (
        banded.alias("x")
        .join(banded.alias("y"), "band")
        .filter(F.col("x.doc") < F.col("y.doc"))
        .select(F.col("x.doc").alias("a_doc"), F.col("y.doc").alias("b_doc"))
        .distinct()
    )
    return _jaccard_out(_pair_jaccard(sh, cands), threshold_num, threshold_den)


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
    hs = ensure_parallelism(df).select(
        F.col(id_col).alias("doc"),
        token_md5s(tokens(F.col(text_col))).alias("_hs"),
    )
    sigs = hs.select(
        "doc", simhash_long_from_hashes(F.col("_hs"), bits).alias("sim")
    )
    # Work at the *distinct signature* level: duplicate-heavy corpora (the
    # whole point of dedup) collapse to far fewer sims than docs, so the
    # band self-join fans out over unique sims — narrow longs — and the
    # Hamming filter runs BEFORE pairs expand back to documents.  A doc
    # pair appears exactly once: same sim -> intra group, else via its
    # unique (a_sim < b_sim) candidate pair.
    groups = _persist_tracked(
        sigs.groupBy("sim").agg(F.collect_list("doc").alias("docs"))
    )
    banded = explode_nonempty(
        groups.select(
            "sim",
            simhash_long_band_keys(F.col("sim"), bits, band_bits).alias("_bands"),
        ),
        "_bands",
        "band",
        "sim",
    )
    cand_sims = (
        banded.alias("x")
        .join(banded.alias("y"), "band")
        .filter(F.col("x.sim") < F.col("y.sim"))
        .select(F.col("x.sim").alias("a_sim"), F.col("y.sim").alias("b_sim"))
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.col("a_sim").bitwiseXOR(F.col("b_sim")))
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    inter = (
        cand_sims.join(
            groups.select(F.col("sim").alias("a_sim"), F.col("docs").alias("a_docs")),
            "a_sim",
        )
        .join(
            groups.select(F.col("sim").alias("b_sim"), F.col("docs").alias("b_docs")),
            "b_sim",
        )
        .select(F.explode("a_docs").alias("da"), "b_docs", "hamming")
        .select("da", F.explode("b_docs").alias("db"), "hamming")
        .select(
            F.least("da", "db").alias("a_doc"),
            F.greatest("da", "db").alias("b_doc"),
            "hamming",
        )
    )
    intra = (
        groups.filter(F.size("docs") > 1)
        .select(F.explode("docs").alias("a_doc"), F.col("docs"))
        .select("a_doc", F.explode("docs").alias("b_doc"))
        .filter(F.col("a_doc") < F.col("b_doc"))
        .withColumn("hamming", F.lit(0))
    )
    return inter.unionByName(intra)


def embedding_dup_pairs_lsh(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold_num: int = 95,
    threshold_den: int = 100,
    planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Embedding near-dup pairs at scale: random-hyperplane buckets
    generate candidates (pair space ~ n^2 / 2^planes instead of n^2),
    then the exact cross-multiplied cosine threshold verifies each.

    High-cosine pairs collide with probability (1 - theta/pi)^planes —
    near-dups (theta ~ 0.3 rad for cos >= 0.95) survive 8 planes with
    ~45%+ per-bucket odds and in practice are caught by the bucket their
    near-identical vectors share; exact recall needs multiple tables
    (call with different plane seeds and union).  Everything is
    deterministic md5-derived, so the SQL oracle reproduces the exact
    pair set."""
    from topic_store_spark.operators.similarity import (
        FAST_EXPR,
        lsh_bucket_key,
        lsh_bucket_key_sql,
    )

    if FAST_EXPR:
        # r13: single-SQL-string builds of quantize / self-dot /
        # sign pattern (the identical HOF folds — see
        # functions/vectors.py); qv staged once instead of the inline
        # form's three quantize evaluations per row
        from topic_store_spark.functions.vectors import (
            int_dot_sql,
            int_self_dot_sql,
            quantize_sql,
        )

        q = ensure_parallelism(df).select(
            F.col(id_col).alias("vid"),
            F.expr(quantize_sql(f"`{vec_col}`")).alias("qv"),
            F.expr(lsh_bucket_key_sql(f"`{vec_col}`", planes, dim)).alias(
                "bucket"
            ),
        ).withColumn("nrm", F.expr(int_self_dot_sql("`qv`")))
        dot = F.expr(int_dot_sql("`a_qv`", "`b_qv`"))
    else:
        q = ensure_parallelism(df).select(
            F.col(id_col).alias("vid"),
            quantize_vector(F.col(vec_col)).alias("qv"),
            lsh_bucket_key(F.col(vec_col), planes, dim).alias("bucket"),
        ).withColumn("nrm", int_self_dot(F.col("qv")))
        dot = F.aggregate(
            F.zip_with(F.col("a_qv"), F.col("b_qv"), lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
    left = q.select(
        F.col("vid").alias("a_id"), F.col("qv").alias("a_qv"),
        F.col("nrm").alias("a_n"), "bucket",
    )
    right = q.select(
        F.col("vid").alias("b_id"), F.col("qv").alias("b_qv"),
        F.col("nrm").alias("b_n"), "bucket",
    )
    dec = "decimal(38,0)"
    joined = left.join(right, "bucket").filter(F.col("a_id") < F.col("b_id"))
    if ARROW_PAIR_DOT:
        staged = joined.withColumn("dot", _arrow_pair_dot("a_qv", "b_qv"))
    else:
        staged = project_once(joined, dot=dot)
    return (
        staged
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
        # each vector hashes to exactly one bucket, so every (a,b) pair
        # appears at most once — no dedup shuffle needed
    )


#: ``embedding_dup_pairs`` refuses inputs past this size — the crossJoin
#: pair space (n^2/2) stops being a "verification baseline" around here.
EMBEDDING_EXACT_MAX_ROWS = 50_000


def embedding_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold_num: int = 95,
    threshold_den: int = 100,
    max_rows: int | None = EMBEDDING_EXACT_MAX_ROWS,
) -> DataFrame:
    """Near-duplicate pairs by quantized cosine >= num/den.

    Quantized components make dot/norms exact longs; the threshold test is
    the cross-multiplied ``den^2 * dot^2 >= num^2 * n_a * n_b`` in
    DECIMAL(38,0) — no FP summation-order hazard, oracle-identical.
    Brute-force O(n^2) pair space: correct VERIFICATION BASELINE only —
    guarded by ``max_rows`` (default 50k vectors; pass ``None`` to bypass
    deliberately).  The scale path is ``embedding_dup_pairs_lsh`` /
    ``similarity.lsh_ann_neighbors``.
    """
    if max_rows is not None:
        n = df.count()
        if n > max_rows:
            raise ValueError(
                f"embedding_dup_pairs is the O(n^2) verification baseline: "
                f"{n} input vectors > max_rows={max_rows}. Use "
                f"embedding_dup_pairs_lsh (bucketed scale path) or pass "
                f"max_rows=None to force."
            )
    q = ensure_parallelism(df).select(
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
        project_once(
            left.crossJoin(right).filter(F.col("a_id") < F.col("b_id")),
            dot=dot,
        )
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


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_doc",
    b_col: str = "b_doc",
    max_iter: int = 50,
    driver_max_edges: int = 1 << 20,
) -> DataFrame:
    """Connected components over a duplicate-pair relation — the
    clustering step that turns pairwise near-dup hits into "keep one doc
    per group": every document is labeled with the minimum doc id
    reachable through dup edges.  Returns ``(node, component)`` for every
    document that appears in a pair; singletons are their own implicit
    components.

    Algorithm: alternating large-star / small-star contraction (Kiveris
    et al., "Connected Components in MapReduce and Beyond", 2014) —
    O(log n) rounds on ANY graph shape, unlike min-label propagation
    whose round count is the diameter of the largest cluster (a 10k-node
    chain of borderline near-dups would need 10k propagation rounds and
    silently return unconverged labels at any fixed bound; star
    contraction finishes it in ~15).

    - large-star: every node's strictly-larger neighbors re-point to the
      minimum of its closed neighborhood;
    - small-star: every node and its smaller neighbors re-point to the
      minimum of its smaller neighbors.

    Both are one groupBy-min + one join over the PAIR graph (orders of
    magnitude smaller than the corpus).  Each round is materialized
    (``materialize_iter``: checkpoint under a configured checkpoint dir,
    else localCheckpoint), so lineage stays flat; convergence is an exact
    edge-set comparison (count equality + one anti-join).  Raises if the
    bound is hit unconverged — wrong cluster labels must never ship
    silently.

    **Driver fast path** (default, ``CC_LOCAL_RESULT``): the verified
    pair graph is typically minuscule next to the corpus.  ONE eager
    ``limit(driver_max_edges+1).collect()`` of the raw ``(u, v)`` pair
    projection both gates the fast path and fetches its input: when the
    raw pair multiset fits the budget it contains the complete node and
    edge sets, so union-find AND the label relation are computed on the
    driver and returned as a local relation — no checkpoint, no
    distributed node join, one job total (the same bounded-collect
    logic as a broadcast join).  Driver memory envelope: at the default
    ``driver_max_edges`` = 2^20 the probe transiently holds ≤ 2^20+1
    two-field Rows (~hundreds of MB of Python objects worst-case,
    released after the union-find; the label local relation is ≤ 2 longs
    per distinct node).  Callers needing a smaller envelope pass a
    smaller ``driver_max_edges``.  On overflow the probe rows are
    discarded and the checkpointed tiers below run: the r13
    ``CC_PROBE_GATE`` distinct-edge probe (A/B fallback), then the
    distributed star-contraction rounds unchanged.
    """
    from topic_store_spark.operators.util import materialize_iter

    if CC_LOCAL_RESULT:
        # tier 1: probe the RAW pair projection (no checkpoint — this is
        # the only action that consumes it when the probe fits).  limit
        # below the bound returns every row, so the probe IS the
        # complete pair multiset; union-find labels are min-reachable-id
        # under any union order, so row order/duplicates are irrelevant.
        raw = (
            pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
            .limit(driver_max_edges + 1)
            .collect()
        )
        if len(raw) <= driver_max_edges:
            parent: dict = {}

            def find(x):
                r = x
                while parent.get(r, r) != r:
                    r = parent[r]
                while parent.get(x, x) != r:  # path compression
                    parent[x], x = r, parent[x]
                return r

            seen = set()
            for row in raw:
                u, v = row[0], row[1]
                seen.add(u)
                seen.add(v)
                # null endpoints carry no connectivity (the distributed
                # path's ``u != v`` filter is null-rejecting); self-loops
                # label themselves via ``seen``
                if u is None or v is None or u == v:
                    continue
                ru, rv = find(u), find(v)
                if ru != rv:
                    if rv < ru:
                        ru, rv = rv, ru
                    parent[rv] = ru
            labels = [(x, find(x)) for x in seen]
            spark = pairs.sparkSession
            node_type = pairs.schema[a_col].dataType
            lab_schema = StructType(
                [
                    StructField("node", node_type, True),
                    StructField("component", node_type, True),
                ]
            )
            return spark.createDataFrame(labels, lab_schema)
        # overflow: fall through to the checkpointed tiers (the K+1
        # probe rows are an arbitrary subset, never used as input)

    # materialize the raw pair projection once: every later reference
    # (node set, initial edges) reads the checkpoint instead of re-running
    # the candidate-generation pipeline that produced the pairs
    e = materialize_iter(
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
    )
    # canonical undirected edge: (bigger, smaller); self-loops carry no
    # connectivity (their nodes still label themselves via ``nodes``)
    edges_df = (
        e.filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
    )

    if CC_PROBE_GATE:
        # One eager job gates the fast path AND fetches its input: a
        # ``limit(K+1)`` collect off the e-checkpoint.  When the edge
        # set fits the driver budget the probe IS the complete edge set
        # (limit below the bound returns every row of the distinct;
        # row order is irrelevant to union-find — labels are min
        # reachable id under any union order), so the old shape's
        # [checkpoint(edges), count(), collect()] three eager jobs —
        # plus the checkpoint write — collapse into this one.  Past the
        # bound the probe rows are discarded and the distributed path
        # pays one (cheap, same-shuffle-class-as-the-old-count) gate
        # job before materializing exactly as before.
        probe = edges_df.limit(driver_max_edges + 1).collect()
        n_edges = len(probe)
    else:
        # r13 A/B reference shape: materialize + count + (maybe) collect
        edges = materialize_iter(edges_df)
        n_edges = edges.count()
        probe = None
    if n_edges == 0:
        return nodes.select("node", F.col("node").alias("component"))

    if n_edges <= driver_max_edges:
        collected = probe if probe is not None else edges.collect()
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for row in collected:
            ru, rv = find(row[0]), find(row[1])
            if ru != rv:
                # union by value: the smaller id becomes the root, which
                # IS the component label the distributed path converges to
                if rv < ru:
                    ru, rv = rv, ru
                parent[rv] = ru
        labels = [(x, find(x)) for x in parent]
        spark = pairs.sparkSession
        node_type = edges_df.schema["u"].dataType
        lab_schema = StructType(
            [
                StructField("node", node_type, False),
                StructField("component", node_type, False),
            ]
        )
        lab = spark.createDataFrame(labels, lab_schema)
        return nodes.join(lab, "node", "left").select(
            "node", F.coalesce("component", "node").alias("component")
        )

    if probe is not None:
        # probe overflowed the driver budget: materialize the edge
        # relation for the iterative rounds exactly as the reference
        # shape does (the K+1 probe rows are discarded — they are an
        # arbitrary subset, never used as the edge set)
        edges = materialize_iter(edges_df)
        n_edges = edges.count()

    for _ in range(max_iter):
        # -- large-star: group the symmetrized graph by u; neighbors v > u
        #    re-point to min({u} ∪ Γ(u)).
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            sym.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # -- small-star: edges already point big -> small; u and its
        #    smaller neighbors re-point to min(Γ_small(u)).
        small_mins = large.groupBy("u").agg(F.min("v").alias("m"))
        new_edges = materialize_iter(
            large.join(small_mins, "u")
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("u").alias("u"), F.col("m").alias("v")),
                        F.struct(F.col("v").alias("u"), F.col("m").alias("v")),
                    )
                ).alias("edge")
            )
            .select("edge.u", "edge.v")
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        new_count = new_edges.count()
        if new_count == n_edges and new_edges.exceptAll(edges).isEmpty():
            edges = new_edges
            break
        edges, n_edges = new_edges, new_count
    else:
        raise RuntimeError(
            f"connected_components: not converged after {max_iter} "
            "large-star/small-star rounds"
        )

    # converged: edges form stars (node -> component root); roots and
    # isolated nodes label themselves
    return nodes.join(
        edges.select(F.col("u").alias("node"), F.col("v").alias("root")),
        "node",
        "left",
    ).select("node", F.coalesce("root", "node").alias("component"))


def _semantic_assignment(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str,
    id_col: str,
    n_probe: int,
    probe_eps: float,
    max_cluster_size: int | None,
    dim: int | None = None,
):
    """Shared centroid-assignment relation for the semantic-dedup
    family: quantize, broadcast-assign each vector to its best centroid
    (or ``n_probe`` near-tie centroids), persist, and — when the
    ``max_cluster_size`` valve is on — attach the deterministic
    hyperplane-sign sub-bucket key.  Returns ``(assigned, join_keys)``
    where ``assigned`` has columns ``c_id, c_qv, c_n, cluster_id``
    (plus ``_sub`` when sub-split) and ``join_keys`` is the pair-join
    key list.  Factored out of :func:`semantic_cluster_dedup` (r13) so
    :func:`semantic_bucket_audit` exposes the exact same sub-bucket
    assignment the pair join uses."""
    from topic_store_spark.operators.similarity import _int_dot, _quantized

    cen = _quantized(centroids, id_col, vec_col, "cen")
    c = _quantized(ensure_parallelism(df), id_col, vec_col, "c")

    if n_probe <= 1 and ARGMAX_ASSIGN:
        # r14: per-row argmax over the collected quantized centroid
        # literals — map-side assignment, no corpus-scale exchange (the
        # groupBy form shuffled every row WITH its 64-long vector
        # payload just to pick a max over |centroids| candidates).  The
        # collect is bounded by the centroid count — the same budget as
        # the ANN codebook collects — and replaces the broadcast-build
        # job the crossJoin form paid anyway.  Affinity arithmetic and
        # tie-break are IDENTICAL to the groupBy form (same fold dot
        # over the same JVM-quantized longs, same double division by
        # SQRT(CAST(n AS DOUBLE)), struct-ordered (aff, -cen_id)), so
        # every assignment bit matches — equality pinned in
        # tests/test_dedup_similarity.py and by the oracle.
        from topic_store_spark.operators.similarity import argmax_best_sql

        cen_rows = cen.collect()
        if not cen_rows:
            ctype = cen.schema["cen_id"].dataType
            assigned = (
                c.select(
                    "c_id", "c_qv", "c_n",
                    F.lit(None).cast(ctype).alias("cluster_id"),
                )
                .filter(F.lit(False))
            )
        else:
            # project_once barrier (the ann_ivf lesson): the pair join's
            # inferred isnotnull(cluster_id) predicate would otherwise
            # push below this projection and re-run the whole argmax
            best_sql = argmax_best_sql(cen_rows, "c_qv")
            assigned = project_once(
                c, cluster_id=F.expr(f"({best_sql}).cen_id")
            ).select("c_id", "c_qv", "c_n", "cluster_id")
    elif n_probe <= 1:
        # r13 A/B reference shape (`ab_bench.py argmax:<query>` off):
        # broadcast crossJoin + corpus-scale groupBy argmax
        aff = _int_dot("c_qv", "cen_qv") / F.sqrt(
            F.col("cen_n").cast("double")
        )
        scored = c.crossJoin(F.broadcast(cen)).withColumn("aff", aff)
        # argmax via max(struct) instead of a row_number window: the
        # partial aggregate reduces each vector's |centroids| candidate
        # rows to one BEFORE the exchange, so the assignment shuffle
        # moves n rows, not n x |centroids|, and needs no sort.  max over
        # (aff, -cen_id) == "affinity desc, cen_id asc" — same
        # deterministic tie-break as the oracle's row_number.
        best = F.max(
            F.struct(
                F.col("aff"),
                (-F.col("cen_id")).alias("neg_cen"),
                F.col("cen_id"),
                F.col("c_qv"),
                F.col("c_n"),
            )
        ).alias("best")
        assigned = (
            scored.groupBy("c_id")
            .agg(best)
            .select(
                "c_id",
                F.col("best.c_qv").alias("c_qv"),
                F.col("best.c_n").alias("c_n"),
                F.col("best.cen_id").alias("cluster_id"),
            )
        )
    else:
        # multi-probe: rank the (small, constant) centroid list per
        # vector and keep probe 1 unconditionally plus probes 2..n_probe
        # whose affinity is within probe_eps (relative) of the best
        aff = _int_dot("c_qv", "cen_qv") / F.sqrt(
            F.col("cen_n").cast("double")
        )
        scored = c.crossJoin(F.broadcast(cen)).withColumn("aff", aff)
        probes = F.slice(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("aff"),
                        (-F.col("cen_id")).alias("neg_cen"),
                        F.col("cen_id"),
                        F.col("c_qv"),
                        F.col("c_n"),
                    )
                ),
                asc=False,
            ),
            1,
            n_probe,
        )
        grouped = scored.groupBy("c_id").agg(probes.alias("probes"))
        best_aff = F.col("probes")[0]["aff"]
        near_tie = (best_aff - F.col("p.aff")) <= probe_eps * F.greatest(
            F.abs(best_aff), F.lit(1.0)
        )
        assigned = (
            grouped.select("c_id", "probes", F.posexplode("probes").alias("pos", "p"))
            .filter((F.col("pos") == 0) | near_tie)
            .select(
                "c_id",
                F.col("p.c_qv").alias("c_qv"),
                F.col("p.c_n").alias("c_n"),
                F.col("p.cen_id").alias("cluster_id"),
            )
        )
    join_keys = ["cluster_id"]
    if max_cluster_size is not None:
        # the size rollup and the dim probe both read the raw
        # assignment before the sub-split reshapes it — pin it (same
        # tracked lifecycle as minhash_lsh_pairs' persist; see
        # release_pair_caches)
        assigned = _persist_tracked(assigned)
        # sub-split oversized clusters: bucket count from the cluster's
        # own size (a tiny per-centroid rollup off the pinned
        # assignment, broadcast back); bucket id = the first
        # ceil(log2(n_sub)) SIGN BITS of the deterministic hyperplane
        # projections (near-parallel pairs co-bucket with ~0.9/bit,
        # see docstring) — same vector, same bucket on every
        # run/engine, so capped runs are reproducible.  16 planes cap
        # the split at 65536 buckets per cluster.
        from topic_store_spark.operators.similarity import lsh_bucket_key

        # r12 ADVICE: an empty centroid relation means an empty
        # assignment — skip the sub-split (the dim probe would be
        # first() -> None) so the capped path degrades to the same
        # empty pair set the uncapped path returns.  r13: a caller-pinned
        # ``dim`` skips the eager first() probe outright (one less
        # driver job in the build path); empty centroids then degrade
        # through the size rollup instead (no cluster -> no sub-split).
        if dim is not None:
            vdim = dim
        else:
            dim_row = centroids.select(vec_col).first()
            vdim = len(dim_row[0]) if dim_row and dim_row[0] is not None else 0
        if vdim > 0:
            sizes = assigned.groupBy("cluster_id").agg(
                F.count(F.lit(1)).alias("_csize")
            )
            # r13: each sign bit is a 16-fold higher-order projection
            # PER ROW — compute only the planes any cluster can use.
            # The size rollup is bounded by the centroid count (same
            # budget as the centroid collects), so the driver reads it
            # once off the pinned assignment: max_bits =
            # ceil(log2(ceil(max|c|/cap))), clamped to the 16-plane /
            # 65536-bucket ceiling.  Prefixes are unchanged (plane p's
            # bit never depends on the plane count), so capped outputs
            # are identical to the all-16-planes form — measured r13:
            # the capped sf0.1 carrier branch 3.7s -> ~2s.
            size_rows = sizes.collect()
            max_sub = max(
                (
                    max(-(-r["_csize"] // max_cluster_size), 1)
                    for r in size_rows
                ),
                default=1,
            )
            max_bits = min((max_sub - 1).bit_length(), 16)
            if max_bits > 0:
                n_sub = F.greatest(
                    F.ceil(F.col("_csize") / max_cluster_size), F.lit(1)
                ).cast("double")
                b_bits = F.least(
                    F.ceil(F.log2(n_sub)).cast("int"), F.lit(16)
                )
                # r14: ``size_rows`` is already on the driver (the
                # max_bits gate above collected it) — attach ``_csize``
                # as a LITERAL MAP LOOKUP instead of re-joining the
                # rollup: the r13 broadcast join re-ran the sizes
                # aggregation (its own exchange + broadcast build)
                # inside the final cache's materialization.  Every
                # downstream op (n_sub / b_bits / substring) is the
                # identical JVM expression over the identical exact
                # counts, so sub-bucket keys are unchanged; every
                # assigned cluster_id appears in size_rows by
                # construction, matching the inner join's row set.
                csize_map = F.create_map(
                    *[
                        lit
                        for r in size_rows
                        for lit in (
                            F.lit(r["cluster_id"]), F.lit(r["_csize"])
                        )
                    ]
                )
                assigned = (
                    assigned.withColumn(
                        "_csize", F.element_at(csize_map, F.col("cluster_id"))
                    )
                    .withColumn(
                        # string-form column ref -> the fold-form SQL
                        # sign-pattern under FAST_EXPR (same bits)
                        "_bits", lsh_bucket_key("c_qv", max_bits, vdim)
                    )
                    .withColumn("_sub", F.substring("_bits", F.lit(1), b_bits))
                    .drop("_bits", "_csize")
                )
                join_keys = ["cluster_id", "_sub"]
    # r13: the FINAL assignment (post-sub-split) is pinned
    # HASH-PARTITIONED BY CLUSTER with its AQE plan finalized — both
    # sides of every pair self-join (hash(cluster) is a subset of the
    # (cluster, _sub) join keys, the same rule doc-keyed rollups ride)
    # and the bucket-audit rollup then inherit the partitioning with
    # NO further exchange.  One corpus-scale repartition buys every
    # downstream consumer; without it each pair join shuffled BOTH
    # sides per branch (measured in the r13 fused-report plan: 7
    # at-scale exchanges -> 3).  Sign bits are computed once into the
    # cache, not once per consumer.
    assigned = expose_cached_partitioning(
        _persist_tracked(hash_partition(assigned, "cluster_id"))
    )
    return assigned, join_keys


def semantic_cluster_dedup(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold_num: int = 95,
    threshold_den: int = 100,
    n_probe: int = 1,
    probe_eps: float = 0.05,
    max_cluster_size: int | None = None,
    dim: int | None = None,
) -> DataFrame:
    """SemDeDup-shaped semantic deduplication: broadcast centroid
    assignment partitions the corpus into clusters, near-dup pairs are
    generated ONLY within a cluster (cluster-keyed equi-join), and each
    candidate is verified with the exact cross-multiplied
    quantized-cosine threshold.

    The 100 TB shape of semantic dedup: pair space falls from n^2 to
    sum(|cluster|^2), assignment is one broadcast pass (centroid count is
    small by construction), and the only shuffle keys on cluster id.

    That pair space is quadratic IN THE CLUSTER SIZE, so the centroid
    count must grow with the corpus (SemDeDup's own regime: k ~ n /
    target_cluster_size).  Measured on the r12 sf1 fixture: holding
    k=8 fixed while the corpus grew 10x took the carrier from 1.5s to
    56s — the sum(|c|^2) blowup, not an engine defect.  When the
    centroid set CANNOT scale (it is often a fixed model artifact),
    ``max_cluster_size`` is the safety valve: clusters above the cap
    are deterministically sub-split into ~ceil(|c|/cap) buckets (next
    power of two) and pairs generate within a (cluster, bucket), so
    per-bucket pair space shrinks ~quadratically and the job degrades
    gracefully instead of melting.  The bucket key is NOT a content
    hash — a hash sends a 0.95-cosine pair to the same bucket with
    probability only 1/n_sub — but the first ``b = ceil(log2(n_sub))``
    sign bits of the deterministic hyperplane projections shared with
    ``lsh_ann_neighbors``: near-parallel vectors agree per plane with
    p ~= 1 - theta/pi (~0.90 at the 0.95 threshold), so a true
    near-dup pair lands together with ~0.9^b instead of 1/2^b — the
    standard cosine-LSH argument.  Trades, stated honestly: recall is
    probabilistic (P(miss) ~= 1 - 0.9^b per near-dup pair in an
    oversized cluster), and the bound is expected-case (sign buckets
    are uneven; a cluster of IDENTICAL vectors stays one bucket — run
    exact dedup first, its pairs are inherently quadratic).  The same
    honest knob as the text family's ``max_shingle_freq``:
    correctness-exact runs leave it None, web-scale runs with frozen
    centroids set it to the largest size one task's pair scan absorbs.
    Setting it runs one eager driver probe of the SMALL centroid
    relation (vector dimension for the plane weights).

    Recall caveat of ``n_probe=1`` (any single-assignment scheme): a
    near-dup pair split across two clusters is missed — near-identical
    vectors have near-identical centroid affinities, so the failure mode
    is an affinity near-tie at a cluster boundary.  ``n_probe=2`` is the
    standard fix: a vector is ALSO assigned to its runner-up centroid
    when that affinity is within ``probe_eps`` (relative) of the best,
    and the pair set is deduplicated (a pair found in two shared
    clusters reports its smallest discovering cluster).  Cost: the
    assignment aggregate carries the per-vector centroid list through
    the shuffle (n x |centroids| rows instead of n) plus boundary
    vectors joining in two clusters — pay it when boundary recall
    matters more than the pair-space saving.

    Deterministic end-to-end (md5-free: affinity ranking uses exact
    integer dots with ``cen_id`` tie-break), so the SQL oracle reproduces
    the exact pair set.
    """
    assigned, join_keys = _semantic_assignment(
        df, centroids, vec_col, id_col, n_probe, probe_eps, max_cluster_size,
        dim,
    )
    return _pairs_within(
        assigned, join_keys, threshold_num, threshold_den, n_probe
    )


def _pairs_within(
    assigned: DataFrame,
    join_keys: list[str],
    threshold_num: int,
    threshold_den: int,
    n_probe: int = 1,
    carry: list[str] | None = None,
) -> DataFrame:
    """Within-group near-dup pairs off a (persisted) assignment
    relation: self-join on ``join_keys``, exact cross-multiplied
    quantized-cosine threshold.  Factored out of
    :func:`semantic_cluster_dedup` (r13) so
    :func:`semantic_dedup_report` generates both the capped and the
    uncapped pair sets from ONE assignment pass.

    ``carry`` (r13 optimization round): extra assignment columns
    carried through BOTH sides of the join as ``a<col>``/``b<col>``
    output columns (e.g. ``carry=["_sub"]`` -> ``a_sub``/``b_sub``) —
    this is how the fused report derives the CAPPED pair set from the
    uncapped join with a filter instead of a second corpus-scale
    self-join (a pair is within the same (cluster, sub-bucket) iff it
    is within the same cluster AND both ends carry the same sub key).
    Only meaningful for single-assignment relations (n_probe == 1)."""
    if carry and n_probe > 1:
        raise ValueError("_pairs_within: carry requires n_probe == 1")
    carry = carry or []
    left = assigned.select(
        F.col("c_id").alias("a_id"), F.col("c_qv").alias("a_qv"),
        F.col("c_n").alias("a_n"), *join_keys,
        *[F.col(k).alias(f"a{k}") for k in carry],
    )
    right = assigned.select(
        F.col("c_id").alias("b_id"), F.col("c_qv").alias("b_qv"),
        F.col("c_n").alias("b_n"), *join_keys,
        *[F.col(k).alias(f"b{k}") for k in carry],
    )
    # the pair-verify dot runs once per CANDIDATE PAIR — the hottest
    # expression in the semantic family; staged through project_once so
    # the threshold filter cannot inline it into the join condition
    # (the before-plan evaluated the fold 4x per pair)
    from topic_store_spark.operators.similarity import _int_dot

    joined = left.join(right, join_keys).filter(F.col("a_id") < F.col("b_id"))
    if ARROW_PAIR_DOT:
        # r14 Arrow experiment: vectorized numpy dot, single evaluation
        # guaranteed by the non-deterministic marking instead of the
        # Generate barrier (a Python UDF cannot ride the generator)
        staged = joined.withColumn("dot", _arrow_pair_dot("a_qv", "b_qv"))
    else:
        staged = project_once(joined, dot=_int_dot("a_qv", "b_qv"))
    dec = "decimal(38,0)"
    pairs = (
        staged
        .filter(
            (F.col("dot") > 0)
            & (
                F.col("dot").cast(dec) * F.col("dot").cast(dec) * (threshold_den**2)
                >= F.col("a_n").cast(dec) * F.col("b_n").cast(dec) * (threshold_num**2)
            )
        )
        .select(
            "cluster_id",
            "a_id",
            "b_id",
            (
                F.col("dot")
                / F.sqrt((F.col("a_n") * F.col("b_n")).cast("double"))
            ).alias("cosine_q"),
            *[F.col(f"a{k}") for k in carry],
            *[F.col(f"b{k}") for k in carry],
        )
    )
    if n_probe > 1:
        # a pair co-assigned to two shared clusters is found twice —
        # dedupe on the ids, reporting the smallest discovering cluster
        pairs = pairs.groupBy("a_id", "b_id").agg(
            F.min("cluster_id").alias("cluster_id"),
            F.first("cosine_q").alias("cosine_q"),
        ).select("cluster_id", "a_id", "b_id", "cosine_q")
    return pairs


def semantic_dedup_report(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold_num: int = 95,
    threshold_den: int = 100,
    max_cluster_size: int = 32,
    dim: int | None = None,
) -> DataFrame:
    """Fused semantic-dedup audit: ONE centroid assignment pass feeds
    (a) the exact ``uncapped`` within-cluster pair set, (b) the
    ``capped`` pair set under the ``max_cluster_size`` hyperplane
    sub-split valve, and (c) the ``bucket_audit`` per-(cluster, sub)
    occupancy histogram — row-identical to composing
    :func:`semantic_cluster_dedup` (with and without the cap) and
    :func:`semantic_bucket_audit`, which is how the driver oracle
    states it (equality pinned in tests/test_dedup_similarity.py).

    Scale shape (r13): the composed form pays THREE corpus-scale
    assignment aggregations (one per operator call — each is a
    map-collapsed n-row exchange); all three branches here read the
    SAME persisted, sub-bucketed assignment, so the corpus is
    assigned and shuffled once.  The uncapped branch simply ignores
    the ``_sub`` key.  Sub-bucket prefix semantics and the recall
    trade are documented on :func:`semantic_cluster_dedup`.
    """
    assigned, join_keys = _semantic_assignment(
        df, centroids, vec_col, id_col, 1, 0.05, max_cluster_size, dim
    )
    out_cols = ["cluster_id", "a_id", "b_id", "cosine_q"]
    if not FUSED_REPORT_PAIRS:
        # r12 shape, kept for `ab_bench.py reportfuse:dedup_semantic`
        # interleaved receipts: two independent self-joins (the capped
        # one re-evaluating the pair dot over its whole candidate set)
        full = _pairs_within(
            assigned, ["cluster_id"], threshold_num, threshold_den
        )
        capped = _pairs_within(assigned, join_keys, threshold_num, threshold_den)
    elif "_sub" in assigned.columns:
        # r13: ONE corpus-scale pair self-join serves both branches —
        # a pair is within the same (cluster, sub-bucket) iff it is
        # within the same cluster AND both ends carry the same sub key,
        # so the capped set is a FILTER of the uncapped join (the
        # capped candidates are a subset; the threshold predicate is
        # identical).  The former second self-join re-ran the per-pair
        # dot fold over that whole subset.  The shared pair relation is
        # pair-count-sized (post-threshold), so pinning it costs
        # nothing next to re-running the join per branch.
        both = _persist_tracked(
            _pairs_within(
                assigned, ["cluster_id"], threshold_num, threshold_den,
                carry=["_sub"],
            )
        )
        full = both.select(*out_cols)
        capped = both.filter(F.col("a_sub") == F.col("b_sub")).select(*out_cols)
    else:
        # valve idle: the capped join keys degenerate to ["cluster_id"]
        # — both branches ARE the same relation; compute it once.
        both = _persist_tracked(
            _pairs_within(assigned, ["cluster_id"], threshold_num, threshold_den)
        )
        full = both.select(*out_cols)
        capped = both.select(*out_cols)
    sub = F.col("_sub") if "_sub" in assigned.columns else F.lit("")
    audit = (
        assigned.groupBy("cluster_id", sub.alias("sub"))
        .agg(F.count(F.lit(1)).alias("n_vec"))
    )
    nul = [
        F.lit(None).cast("string").alias("sub"),
        F.lit(None).cast("long").alias("n_vec"),
    ]
    return (
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


def semantic_bucket_audit(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_probe: int = 1,
    probe_eps: float = 0.05,
    max_cluster_size: int | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Per-(cluster, sub-bucket) occupancy rollup of the EXACT
    assignment relation :func:`semantic_cluster_dedup` joins pairs on —
    same :func:`_semantic_assignment`, same persisted relation shape.

    Why it exists (r13): the ``max_cluster_size`` sub-split is
    deterministic (hyperplane sign bits over the quantized vector), so
    an external engine can recompute every vector's bucket — but the
    pair output alone cannot certify the bucket keys when the only
    surviving near-dup pairs are identical vectors (identical vectors
    co-bucket under ANY sign function).  This audit exposes the full
    occupancy histogram: one wrong sign bit anywhere moves a vector
    between buckets and shifts two counts.  Returns
    ``(cluster_id, sub, n_vec)`` with ``sub = ''`` when the valve is
    off or no cluster exceeds the cap.
    """
    assigned, join_keys = _semantic_assignment(
        df, centroids, vec_col, id_col, n_probe, probe_eps, max_cluster_size,
        dim,
    )
    sub = F.col("_sub") if "_sub" in assigned.columns else F.lit("")
    return (
        assigned.groupBy("cluster_id", sub.alias("sub"))
        .agg(F.count(F.lit(1)).alias("n_vec"))
    )


def exact_duplicates_incremental(
    new_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bloom_prefilter: bool = False,
) -> DataFrame:
    """Exact dedup of a NEW batch against an existing corpus (plus
    within-batch): returns one row per new document that collides,
    with the keeper (minimum id across corpus+batch for its
    fingerprint) and ``is_keeper`` flagging the case where the new doc
    itself sorts first — the caller must then evict the corpus copy
    rather than drop the new one.  The production ingest shape — the
    corpus side contributes only its fingerprint column, never
    re-pairs itself.

    ``bloom_prefilter=True`` builds a Bloom filter over the BATCH
    fingerprints (~10 bits/doc, one extra job over the small side) and
    drops corpus rows map-side before the keeper shuffle: at 100 TB the
    corpus scan then feeds the shuffle only its actual collisions plus a
    ~1% false-positive sliver, instead of every corpus fingerprint.
    Results are bit-identical either way — Bloom filters have no false
    negatives, and false positives match nothing in the exact groupBy
    (`operators/bloom.py`).
    """
    fp_corpus = ensure_parallelism(corpus_df).select(
        md5_fingerprint(F.col(text_col)).alias("fp"),
        F.col(id_col).alias("doc"),
    )
    fp_new = ensure_parallelism(new_df).select(
        md5_fingerprint(F.col(text_col)).alias("fp"),
        F.col(id_col).alias("doc"),
    )
    if bloom_prefilter:
        from pyspark import StorageLevel

        from topic_store_spark.operators.bloom import bloom_build, bloom_contains

        fp_new = fp_new.persist(StorageLevel.MEMORY_AND_DISK)
        bf = bloom_build(fp_new, "fp")
        fp_corpus = fp_corpus.filter(bloom_contains(bf, F.col("fp")))
    keepers = (
        fp_corpus.unionByName(fp_new)
        .groupBy("fp")
        .agg(F.min("doc").alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
    )
    return (
        fp_new.join(keepers, "fp")
        .filter(F.col("n_docs") > 1)
        .select(
            F.col("doc").alias("doc_id"),
            "keep_id",
            "fp",
            (F.col("doc") == F.col("keep_id")).alias("is_keeper"),
        )
    )


def duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 20,
    min_occurrences: int = 2,
) -> DataFrame:
    """Cross-document exact-substring duplication (the ExactSubstr family
    of Lee et al. 2021, "Deduplicating Training Data Makes Language
    Models Better"): every ``window``-token sliding window is
    fingerprinted; windows whose exact content occurs ``min_occurrences``
    or more times ANYWHERE in the corpus (another document or a repeat
    within the same one) mark their token range as duplicated, and
    overlapping marked ranges merge into maximal spans per document.

    Returns one row per maximal duplicated span: ``(doc_id, span_start,
    span_end, n_dup_tokens, n_windows)`` with 0-based token offsets,
    ``span_end`` exclusive.  Callers remove or clip the spans (the
    paper's treatment) or threshold on the per-doc duplicated fraction.

    Scale shape — the reference engine has no analog (single-node suffix
    arrays don't distribute); this is the Spark-native equivalent:

    - window fingerprints are md5 of the space-joined token slice —
      content-exact, engine-portable (the SQL oracle reproduces them),
      and computed in a staged projection (perf contract of
      ``shingles_from_tokens``);
    - the only corpus-wide shuffle is the fingerprint frequency count,
      which partial-aggregates map-side; duplicated fingerprints attach
      back via a LEFT SEMI join — fan-out 1, so a boilerplate window
      shared by millions of documents costs its row count, never a
      pair-space blowup (contrast the capped Jaccard self-joins);
    - span merging is gaps-and-islands per document: with a fixed window
      width the positions are sorted per doc and a new island starts
      exactly when ``pos > prev_pos + window``; the per-doc sort is
      bounded by document length, never corpus size.
    """
    tk = ensure_parallelism(df).select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("_tk")
    )
    grams = tk.select(
        "doc", shingles_from_tokens(F.col("_tk"), window).alias("_grams")
    )
    wins = grams.select(
        "doc", F.posexplode_outer("_grams").alias("pos", "_gram")
    ).filter(F.col("_gram").isNotNull()).select(
        "doc", F.col("pos").cast("long").alias("pos"), F.md5("_gram").alias("fp")
    )
    dup_fps = (
        wins.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") >= min_occurrences)
        .select("fp")
    )
    dup_wins = wins.join(dup_fps, "fp", "left_semi")
    w = Window.partitionBy("doc").orderBy("pos")
    prev = F.lag("pos").over(w)
    flagged = dup_wins.withColumn(
        "_new", F.when(prev.isNull() | (F.col("pos") > prev + window), 1).otherwise(0)
    ).withColumn(
        "_island",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        flagged.groupBy(F.col("doc").alias("doc_id"), "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + window).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("n_dup_tokens"),
            "n_windows",
        )
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep_pattern: str = r"\n{2,}",
    join_sep: str = "\n\n",
) -> DataFrame:
    """Corpus-level paragraph deduplication (the FineWeb / RefinedWeb
    recipe): documents split into paragraphs, each paragraph kept only at
    its FIRST corpus occurrence (minimum ``(doc, pos)`` over its
    normalized fingerprint — boilerplate headers/footers repeated across
    a crawl survive exactly once), and every document reassembled from
    its surviving paragraphs in original order.

    Returns ``(doc_id, n_paras, n_kept, clean_text)`` — one row per
    input document, ``clean_text`` empty when every paragraph was seen
    earlier elsewhere.

    Scale shape (r12 — one join and one exchange fewer): the keeper's
    TEXT rides inside the fingerprint aggregate itself —
    ``min(struct(doc, pos, para))`` picks the first-occurrence row AND
    carries its paragraph, because (doc, pos) is unique per occurrence
    so the struct order never reaches the third field.  That deletes
    the r11 attach-join (keepers back onto the paragraph relation),
    whose LEFT side re-shuffled the full paragraph relation on the
    fingerprint a second time, and with it the second run of the
    explode+md5 lineage.  The aggregate has map-side partials, so a
    crawl-wide boilerplate footer collapses to one row per map
    partition before the shuffle — no window sort, no hot task.
    Reassembly is one shuffle on the document id with a bounded
    per-doc sort; per-doc paragraph TOTALS come map-side from the
    source's split array (r9: ``size(filter(split(...)))``).  At-scale
    exchanges: fingerprint rollup, doc reassembly, totals join — three.
    """
    src = ensure_parallelism(
        df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("_txt"))
    )
    paras = (
        src.select(
            "doc",
            F.posexplode_outer(
                F.filter(F.split(F.col("_txt"), sep_pattern), lambda p: p != "")
            ).alias("pos", "para"),
        )
        .filter(F.col("para").isNotNull())
        .select("doc", F.col("pos").cast("long").alias("pos"), "para")
    )
    paras = paras.withColumn("fp", F.md5(normalize_text(F.col("para"))))
    kept = (
        paras.groupBy("fp")
        .agg(F.min(F.struct("doc", "pos", "para")).alias("_k"))
        .select(
            F.col("_k.doc").alias("doc"),
            F.col("_k.pos").alias("pos"),
            F.col("_k.para").alias("para"),
        )
    )
    # same doc set as the old paras.groupBy(doc): docs whose text is
    # null or splits to no non-empty paragraph contribute no rows
    totals = src.select(
        "doc",
        F.size(
            F.filter(F.split(F.col("_txt"), sep_pattern), lambda p: p != "")
        ).cast("long").alias("n_paras"),
    ).filter(F.col("n_paras") > 0)
    rebuilt = kept.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            join_sep,
        ).alias("clean_text"),
    )
    return (
        totals.join(rebuilt, "doc", "left")
        .select(
            F.col("doc").alias("doc_id"),
            "n_paras",
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


def minhash_lsh_pairs_incremental(
    new_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 12,
    bands: int = 4,
    threshold_num: int = 8,
    threshold_den: int = 10,
    persist: bool = True,
    bloom_prefilter: bool = False,
) -> DataFrame:
    """MinHash-LSH near-dup pairs where at least one side is in the NEW
    batch: (new x corpus) and (new x new) candidates only — the corpus
    NEVER self-joins, so incremental ingest cost is proportional to the
    batch's band collisions, not the corpus pair space.

    Scale shape: in a standing pipeline the corpus's banded signatures
    are the persisted index (compute once, append per batch); here they
    are derived in-line from ``corpus_df``.  The band join keys
    (batch side) against (corpus+batch) bands; candidates canonicalize
    to (smaller, larger) and verify with exact per-pair Jaccard, same as
    ``minhash_lsh_pairs``.

    ``bloom_prefilter=True`` additionally builds a Bloom filter over the
    BATCH band keys and applies it map-side to the corpus+batch band
    relation before the candidate join: corpus bands that cannot collide
    with the batch never reach the join's shuffle.  Identical results
    (no false negatives; a false positive's band still equi-matches
    nothing) — see `operators/bloom.py` for the cost model.
    """
    all_df = corpus_df.select(F.col(id_col), F.col(text_col)).unionByName(
        new_df.select(F.col(id_col), F.col(text_col))
    )
    sh = _shingle_arrays(all_df, text_col, id_col, n)
    if persist:
        sh = _persist_tracked(sh)
    banded_all = _minhash_banded(sh, num_perm, bands)
    if persist:
        banded_all = _persist_tracked(banded_all)
    new_ids = new_df.select(F.col(id_col).alias("doc"))
    banded_new = banded_all.join(new_ids, "doc", "left_semi")
    banded_rhs = banded_all
    if bloom_prefilter:
        from topic_store_spark.operators.bloom import bloom_build, bloom_contains

        bf = bloom_build(banded_new, "band")
        banded_rhs = banded_all.filter(bloom_contains(bf, F.col("band")))
    cands = (
        banded_new.alias("x")
        .join(banded_rhs.alias("y"), "band")
        .filter(F.col("x.doc") != F.col("y.doc"))
        .select(
            F.least("x.doc", "y.doc").alias("a_doc"),
            F.greatest("x.doc", "y.doc").alias("b_doc"),
        )
        .distinct()
    )
    return _jaccard_out(_pair_jaccard(sh, cands), threshold_num, threshold_den)
