"""Similarity search over embedding columns.

- ``topk_neighbors``      exact top-k by quantized inner product
  (embeddings here are unit-norm, so inner product == cosine ranking);
  broadcast the query side, rank with a per-query window.  The
  oracle-checkable baseline.
- ``lsh_ann_neighbors``   random-hyperplane LSH bucketing: the 100 TB
  scale path — each vector lands in a handful of buckets, candidate
  generation is a bucket-key join instead of a cross join.  Hyperplanes
  are deterministic pseudo-randoms derived from md5, so results are
  reproducible run-to-run and machine-to-machine.
- ``train_opq_rotation`` / ``rotate_vectors``   OPQ (Ge et al. 2013):
  a learned orthogonal rotation that redistributes variance across the
  PQ subspaces before encoding — trained driver-side on a bounded
  sample, applied JVM-side as one SQL-literal matvec.  Measured on an
  anisotropic mixed corpus: ~70% quantization-MSE reduction and
  1.38x/1.13x recall@10 at m=16/32 (RECALL.md OPQ section,
  tests/test_recall.py).
"""

from __future__ import annotations

import functools as _functools

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from topic_store_spark.functions.vectors import (
    int_dot_sql,
    int_self_dot_sql,
    int_self_dot,
    quantize_sql,
    quantize_vector,
)

#: r13 optimization-round switch for the SQL-string expression builds
#: (one F.expr/py4j round trip per composite vector expression instead
#: of dozens of Column calls — build-time only, the parsed tree is the
#: identical HOF fold) and the staged evaluate-once projections that
#: ride them (quantize computed 1x per row instead of 3x).  OFF
#: restores the r12 inline-Column plans — the toggle exists for
#: `tools/ab_bench.py` interleaved A/B receipts (the PPJOIN_CUTS
#: pattern).  Results are identical either way (same expressions;
#: oracle-checked).
FAST_EXPR = True

#: r13 optimization-round toggle (`tools/ab_bench.py opqfuse:ann_pq`):
#: True lets q_ann_pq derive the OPQ permutation AND the PQ codebooks
#: from ONE bounded collect (:func:`opq_permuted_codebooks`); False
#: restores the r12 composed build (variance_balanced_permutation +
#: a second residual pipeline + pq_codebooks = two eager driver jobs
#: per DataFrame build).  Same permutation, same codebooks, bit-equal
#: results (pinned by tests/test_dedup_similarity.py
#: ::test_opq_fused_codebooks_equal_composed).
FUSED_OPQ = True

#: r14 optimization-round toggle (`tools/ab_bench.py argmax:<query>`
#: sets this together with dedup.ARGMAX_ASSIGN): True computes
#: centroid assignments (:func:`assign_to_lists`,
#: :func:`ivf_residual_vectors`) as a PER-ROW argmax expression over
#: the collected quantized centroid literals — map-side, removing the
#: corpus-scale ``crossJoin(broadcast) + groupBy(c_id).agg(max(
#: struct))`` exchange that carried the full quantized-vector payload
#: per row (guide §2.3/§2.4).  The centroid collect is bounded by the
#: centroid count (same budget class as the PQ codebook collects).
#: Affinity arithmetic and tie-break are identical ops on identical
#: operands, so every assignment bit matches — oracle-checked
#: (ann_ivf / ann_pq / dedup_semantic).  False restores the r13
#: crossJoin+groupBy shape.
#:
#: DEFAULT False for the IVF family — receipt-decided (r14):
#: `argmax:ann_pq` stamped **argmax_off_faster** at sf0.1 (3.09 vs
#: 4.28s median, delta 1.19 > spread 0.87) and `argmax:ann_ivf` leaned
#: the same way — the ``with_vec`` form materializes the 8 literal
#: 64-long centroid arrays PER ROW inside the interpreted argmax,
#: which costs more at this fixture than the n-row exchange it
#: removes.  The semantic-dedup family's toggle (dedup.ARGMAX_ASSIGN)
#: stays True: there the assignment feeds a persisted relation and its
#: argmax carries no vector literals — `argmax:dedup_semantic` stamped
#: **argmax_on_faster** (3.35 vs 3.85s, delta 0.51 > spread 0.25).
#: At 100 TB the exchange-removal argument favors True here too
#: (exchange bytes scale with the corpus; the per-row literal cost is
#: constant per row) — a production conf flip, measurable per round
#: via `ab_bench.py argmax:<query>`.
ARGMAX_ASSIGN = False


def _q(name: str) -> str:
    """Backtick-quote a column name for the SQL-string builders."""
    return f"`{name}`"


def argmax_best_sql(cen_rows, vec_sql: str, with_vec: bool = False) -> str:
    """``array_max(array(named_struct(...), ...))`` — the best-centroid
    struct for one row, as a Spark-SQL string over the collected
    quantized centroid rows (``cen_id``/``cen_qv``/``cen_n``).  Struct
    fields are ``(aff, neg_cen, cen_id[, cen_qv])`` compared in order —
    the same ``(aff desc, cen_id asc)`` deterministic tie-break as the
    crossJoin+groupBy ``max(struct(...))`` form (``neg_cen`` is unique,
    so later fields never decide), and the affinity is the identical
    ``fold-dot / SQRT(CAST(n AS DOUBLE))`` double.  ``with_vec`` adds
    the winning centroid's quantized vector as a literal field (for
    residual computation)."""
    structs = []
    for r in cen_rows:
        lits = ",".join(f"{int(x)}L" for x in r["cen_qv"])
        cid = int(r["cen_id"])
        aff = (
            f"({int_dot_sql(vec_sql, f'array({lits})')}) "
            f"/ SQRT(CAST({int(r['cen_n'])}L AS DOUBLE))"
        )
        fields = (
            f"'aff', {aff}, 'neg_cen', {-cid}L, 'cen_id', {cid}L"
        )
        if with_vec:
            fields += f", 'cen_qv', array({lits})"
        structs.append(f"named_struct({fields})")
    return f"array_max(array({', '.join(structs)}))"


def _quantized(
    df: DataFrame, id_col: str, vec_col: str, prefix: str
) -> DataFrame:
    """``(id, qv, n)`` quantized view.  With FAST_EXPR the quantized
    array is STAGED in its own projection and the self-dot reads the
    staged column — the inline form re-evaluates the quantize transform
    three times per row (once for qv, twice inside the self-dot fold)
    because higher-order functions get no subexpression elimination and
    CollapseProject happily inlines the alias.  (Staging holds: the
    alias is referenced 3x and the transform is non-cheap, so the two
    Projects do NOT collapse.)"""
    if not FAST_EXPR:
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            quantize_vector(F.col(vec_col)).alias(f"{prefix}_qv"),
            int_self_dot(quantize_vector(F.col(vec_col))).alias(f"{prefix}_n"),
        )
    staged = df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        F.expr(quantize_sql(_q(vec_col))).alias(f"{prefix}_qv"),
    )
    return staged.select(
        f"{prefix}_id",
        f"{prefix}_qv",
        F.expr(int_self_dot_sql(_q(f"{prefix}_qv"))).alias(f"{prefix}_n"),
    )


def topk_neighbors(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by integer dot product, deterministic tie-break on
    neighbor id.  The query side is broadcast (it's the small dim side);
    the corpus never shuffles — the plan is scan + broadcast join +
    per-query TopK, which survives any corpus size."""
    q = _quantized(queries, id_col, vec_col, "q")
    c = _quantized(corpus, id_col, vec_col, "c")
    dot = _int_dot("q_qv", "c_qv")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn("dot", dot)
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("dot").desc(), F.col("c_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            F.col("rank"),
            (F.col("dot") / F.sqrt((F.col("q_n") * F.col("c_n")).cast("double"))).alias(
                "cosine_q"
            ),
        )
    )


def topk_neighbors_partial(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k for LARGE query sets: partial top-k aggregation.

    ``topk_neighbors``'s per-query window shuffles every scored pair
    (corpus x Q rows) by ``q_id`` — fine at Q~10, a shuffle-volume wall
    when Q grows.  Here each scan partition reduces its scored pairs to a
    local top-k per query FIRST (map-side: the group key includes
    ``spark_partition_id()``, so the aggregate completes before the
    exchange), and only Q x partitions x k candidate rows ever move.
    The merge then takes the global top-k of the local winners.

    Ranking struct is ``(dot, -neighbor_id)`` sorted descending ==
    ``dot DESC, neighbor_id ASC`` — identical ordering and results to
    ``topk_neighbors``.
    """
    q = _quantized(queries, id_col, vec_col, "q")
    c = _quantized(corpus, id_col, vec_col, "c")
    dot = _int_dot("q_qv", "c_qv")
    cand = F.struct(
        F.col("dot"),
        (-F.col("c_id")).alias("neg_id"),
        F.col("c_id"),
        F.col("q_n"),
        F.col("c_n"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn("dot", dot)
    )
    local = scored.groupBy(
        "q_id", F.spark_partition_id().alias("_pid")
    ).agg(
        F.slice(F.sort_array(F.collect_list(cand), asc=False), 1, k).alias("top")
    )
    merged = (
        local.select("q_id", F.explode("top").alias("cand"))
        .groupBy("q_id")
        .agg(
            F.slice(
                F.sort_array(F.collect_list("cand"), asc=False), 1, k
            ).alias("top")
        )
    )
    return merged.select(
        "q_id", F.posexplode("top").alias("pos", "cand")
    ).select(
        F.col("q_id").alias("query_id"),
        F.col("cand.c_id").alias("neighbor_id"),
        (F.col("pos") + 1).alias("rank"),
        (
            F.col("cand.dot")
            / F.sqrt((F.col("cand.q_n") * F.col("cand.c_n")).cast("double"))
        ).alias("cosine_q"),
    )


def _int_dot(a: str, b: str):
    if FAST_EXPR:
        return F.expr(int_dot_sql(_q(a), _q(b)))
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def assign_to_lists(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Inverted-list assignment: each corpus vector to its nearest
    centroid.  Returns ``(c_id, c_qv, c_n, list_id)`` — the relation an
    IVF index persists (`operators/index.py` IVFIndex) and
    ``search_lists`` probes.

    r14 (``ARGMAX_ASSIGN``, default): the assignment is a PER-ROW
    argmax expression over the collected quantized centroid literals —
    map-side, no corpus-scale exchange.  The r13 fallback shape
    (argmax via max(struct), same rationale and tie-break as
    semantic_cluster_dedup) reduced each vector's |centroids| candidate
    rows to one BEFORE the exchange, but still shuffled n rows WITH
    their quantized-vector payload.
    """
    cen = _quantized(centroids, id_col, vec_col, "cen")
    c = _quantized(corpus, id_col, vec_col, "c")
    if ARGMAX_ASSIGN:
        cen_rows = cen.collect()
        if not cen_rows:
            # no centroids: the crossJoin form yields an empty relation
            ctype = cen.schema["cen_id"].dataType
            return c.select(
                "c_id", "c_qv", "c_n",
                F.lit(None).cast(ctype).alias("list_id"),
            ).filter(F.lit(False))
        # project_once barrier: without it the join's inferred
        # isnotnull(list_id) predicate pushes below the projection and
        # re-evaluates the FULL argmax (and the quantize feeding it)
        # per row — measured 0.96 -> 1.56s on ann_ivf before the
        # barrier (BENCH_AB_argmax_ann_ivf.json, first stamp)
        from topic_store_spark.operators.util import project_once

        best = argmax_best_sql(cen_rows, "c_qv")
        return project_once(
            c, list_id=F.expr(f"({best}).cen_id")
        ).select("c_id", "c_qv", "c_n", "list_id")
    aff = _int_dot("c_qv", "cen_qv") / F.sqrt(F.col("cen_n").cast("double"))
    best = F.max(
        F.struct(
            F.col("aff"),
            (-F.col("cen_id")).alias("neg_cen"),
            F.col("cen_id"),
            F.col("c_qv"),
            F.col("c_n"),
        )
    ).alias("best")
    return (
        c.crossJoin(F.broadcast(cen))
        .withColumn("aff", aff)
        .groupBy("c_id")
        .agg(best)
        .select(
            "c_id",
            F.col("best.c_qv").alias("c_qv"),
            F.col("best.c_n").alias("c_n"),
            F.col("best.cen_id").alias("list_id"),
        )
    )


def search_lists(
    assigned: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe an inverted-list relation (``assign_to_lists`` output, live
    or re-read from a persisted index) with a query set — the search
    half of ``ivf_ann_neighbors``."""
    cen = _quantized(centroids, id_col, vec_col, "cen")
    q = _quantized(queries, id_col, vec_col, "q")

    # probe side is query-count-sized — the window is over Q x |centroids|
    # rows, never corpus-scale
    q_aff = _int_dot("q_qv", "cen_qv") / F.sqrt(F.col("cen_n").cast("double"))
    w_probe = Window.partitionBy("q_id").orderBy(
        F.col("aff").desc(), F.col("cen_id").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(cen))
        .withColumn("aff", q_aff)
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= nprobe)
        .select("q_id", "q_qv", "q_n", F.col("cen_id").alias("list_id"))
    )

    scored = (
        assigned.join(F.broadcast(probes), "list_id")
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn("dot", _int_dot("q_qv", "c_qv"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("dot").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            F.col("rank"),
            (F.col("dot") / F.sqrt((F.col("q_n") * F.col("c_n")).cast("double"))).alias(
                "cosine_q"
            ),
        )
    )


def ivf_ann_neighbors(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: corpus vectors are partitioned into
    inverted lists by nearest centroid; a query probes only its ``nprobe``
    closest lists.

    The 100 TB shape: assignment is one broadcast pass over the corpus
    (centroid count is small by construction), the search join is
    equi-keyed on list id — candidate fan-out is corpus/|lists| * nprobe
    per query instead of the whole corpus.  Affinity ranking uses
    ``dot / sqrt(centroid_norm)`` on exact integer dots — IEEE ops on
    identical operands, so assignment is reproducible engine-to-engine.
    Composition of ``assign_to_lists`` + ``search_lists`` (split so the
    assignment relation can be persisted as a standing index —
    `operators/index.py`).
    """
    assigned = assign_to_lists(corpus, centroids, id_col, vec_col)
    return search_lists(
        assigned, queries, centroids, k, nprobe, id_col, vec_col
    )


@_functools.lru_cache(maxsize=4096)
def _plane_weights(plane: int, dim: int) -> tuple[float, ...]:
    """Deterministic hyperplane weights, cached: weight_i =
    hexint(md5("p:i")[0:4])/65536 - 0.5 — exact binary fractions, so the
    doubles match the SQL oracle bit-for-bit."""
    import hashlib

    return tuple(
        int(hashlib.md5(f"{plane}:{i}".encode()).hexdigest()[:4], 16) / 65536.0
        - 0.5
        for i in range(dim)
    )


def _proj_sql(vec_sql: str, plane: int, dim: int) -> str:
    """<v, h_plane> as one Spark-SQL string: the identical
    ``aggregate(zip_with(...))`` left-fold as :func:`_hyperplane_proj`
    (same weights as ``D``-suffixed double literals, same operand
    order, bit-identical doubles), built in ONE py4j round trip
    instead of O(dim) Column calls.  See functions/vectors.py for the
    r13 build-vs-exec rationale."""
    weights = ", ".join(
        f"{w!r}D" for w in _plane_weights(plane, dim)
    )
    return (
        f"aggregate(zip_with({vec_sql}, array({weights}), "
        "(x, w) -> CAST(x AS DOUBLE) * w), 0.0D, (acc, v) -> acc + v)"
    )


def _sign_sql(vec_sql: str, plane: int, dim: int) -> str:
    """'1'/'0' sign bit of the plane projection, as Spark SQL."""
    return f"(CASE WHEN {_proj_sql(vec_sql, plane, dim)} >= 0.0D THEN '1' ELSE '0' END)"


def lsh_bucket_key_sql(vec_sql: str, planes: int = 8, dim: int = 64) -> str:
    """`planes`-bit sign-pattern bucket id, as one Spark-SQL string."""
    return "concat(" + ", ".join(
        _sign_sql(vec_sql, p, dim) for p in range(planes)
    ) + ")"


def _hyperplane_proj(vec_col, plane: int, dim: int):
    """<v, h_plane> where h_plane[i] is a deterministic pseudo-random in
    [-0.5, 0.5): (md5("p:i") first 4 hex as int)/65536 - 0.5.

    The weights are pure constants, but Catalyst does not constant-fold
    higher-order functions — an in-plan ``transform(sequence(...), md5)``
    formulation re-hashed dim x planes md5s PER ROW.  So the weights are
    computed driver-side with the byte-identical formula (hashlib md5;
    /65536 and -0.5 are exact binary ops, so the doubles match the SQL
    oracle bit-for-bit) and emitted as a literal array; the projection
    stays the same left-fold over the same operand order.

    Column-input compatibility form; the hot paths use
    :func:`_proj_sql` (identical operand order, codegen-able)."""
    ws = _plane_weights(plane, dim)
    weights = F.array(*[F.lit(w) for w in ws])
    return F.aggregate(
        F.zip_with(vec_col, weights, lambda x, w: x.cast("double") * w),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _hyperplane_sign(vec_col, plane: int, dim: int):
    """'1'/'0' sign bit of the plane projection (see _hyperplane_proj)."""
    proj = _hyperplane_proj(vec_col, plane, dim)
    return F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0"))


def lsh_bucket_key(vec_col, planes: int = 8, dim: int = 64):
    """Random-hyperplane LSH bucket id: `planes`-bit sign pattern.

    ``vec_col`` may be a Column (r12 HOF form) or a column-NAME string —
    the string form (with FAST_EXPR) emits the SAME fold-form HOF
    expression as one SQL string (one py4j round trip; the unrolled
    codegen draft was measured 2-20x WORSE and rejected — see
    OPTIMIZATION_r13.md), identical doubles and sign bits (same
    operand order)."""
    if isinstance(vec_col, str):
        if FAST_EXPR:
            return F.expr(lsh_bucket_key_sql(_q(vec_col), planes, dim))
        vec_col = F.col(vec_col)
    return F.concat(*[_hyperplane_sign(vec_col, p, dim) for p in range(planes)])


def lsh_ann_neighbors(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probes: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket.

    At scale: corpus bucketing is a one-pass map; the join is
    bucket-key-equi (shuffle on bucket, or broadcast of bucketed queries),
    pair fan-out ~ n/2^planes per query instead of n.

    ``probes > 1`` enables QUALITY-AWARE MULTI-PROBE (Lu et al. 2007,
    "Multi-Probe LSH"): beyond its own bucket, each query also probes the
    ``probes - 1`` buckets reached by flipping its SMALLEST-MARGIN sign
    bits (a vector near hyperplane p likely has true neighbors on p's
    other side).  Candidates grow ~linearly in ``probes`` while recall
    recovers most of what each added plane halves — the standard way to
    keep buckets small (cheap joins) without the recall cliff.  Only the
    probe-side fan-out changes; the corpus is still bucketed once."""

    def _bucketed(df: DataFrame, prefix: str) -> DataFrame:
        # (id, qv, n, bucket); with FAST_EXPR the quantize / self-dot /
        # sign-pattern arithmetic is the unrolled codegen form — same
        # operand order, identical values (see functions/vectors.py)
        if FAST_EXPR:
            staged = df.select(
                F.col(id_col).alias(f"{prefix}_id"),
                F.expr(quantize_sql(_q(vec_col))).alias(f"{prefix}_qv"),
                F.expr(lsh_bucket_key_sql(_q(vec_col), planes, dim)).alias(
                    "bucket"
                ),
            )
            return staged.select(
                f"{prefix}_id",
                f"{prefix}_qv",
                F.expr(int_self_dot_sql(_q(f"{prefix}_qv"))).alias(
                    f"{prefix}_n"
                ),
                "bucket",
            )
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            quantize_vector(F.col(vec_col)).alias(f"{prefix}_qv"),
            int_self_dot(quantize_vector(F.col(vec_col))).alias(f"{prefix}_n"),
            lsh_bucket_key(F.col(vec_col), planes, dim).alias("bucket"),
        )

    c = _bucketed(corpus, "c")
    if probes <= 1:
        q_bucketed = _bucketed(queries, "q")
    else:
        # stage the per-plane projections ONCE (HOF folds get no CSE),
        # then derive signs, the margin order, and every probe key from
        # the staged columns
        if FAST_EXPR:
            staged0 = queries.select(
                F.col(id_col).alias("q_id"),
                F.expr(quantize_sql(_q(vec_col))).alias("q_qv"),
                *[
                    F.expr(_proj_sql(_q(vec_col), p, dim)).alias(f"_pr{p}")
                    for p in range(planes)
                ],
            )
            staged = staged0.select(
                "q_id",
                "q_qv",
                F.expr(int_self_dot_sql(_q("q_qv"))).alias("q_n"),
                *[f"_pr{p}" for p in range(planes)],
            )
        else:
            staged = queries.select(
                F.col(id_col).alias("q_id"),
                quantize_vector(F.col(vec_col)).alias("q_qv"),
                int_self_dot(quantize_vector(F.col(vec_col))).alias("q_n"),
                *[
                    _hyperplane_proj(F.col(vec_col), p, dim).alias(f"_pr{p}")
                    for p in range(planes)
                ],
            )
        signs = F.array(
            *[
                F.when(F.col(f"_pr{p}") >= 0, F.lit("1")).otherwise(F.lit("0"))
                for p in range(planes)
            ]
        )
        margin_order = F.array_sort(
            F.array(
                *[
                    F.struct(
                        F.abs(F.col(f"_pr{p}")).alias("m"),
                        F.lit(p).alias("p"),
                    )
                    for p in range(planes)
                ]
            )
        )
        staged = staged.select(
            "q_id", "q_qv", "q_n",
            signs.alias("_signs"), margin_order.alias("_order"),
        )
        keys = [F.array_join(F.col("_signs"), "")]
        for i in range(min(probes - 1, planes)):
            fp = F.element_at(F.col("_order"), i + 1)["p"]
            flipped = F.zip_with(
                F.col("_signs"),
                F.sequence(F.lit(0), F.lit(planes - 1)),
                lambda b, idx: F.when(
                    idx == fp,
                    F.when(b == "1", F.lit("0")).otherwise(F.lit("1")),
                ).otherwise(b),
            )
            keys.append(F.array_join(flipped, ""))
        q_bucketed = staged.select(
            "q_id", "q_qv", "q_n",
            F.explode(F.array(*keys)).alias("bucket"),
        )
    dot = _int_dot("q_qv", "c_qv")
    scored = c.join(F.broadcast(q_bucketed), "bucket").filter(
        F.col("q_id") != F.col("c_id")
    )
    if probes > 1:
        # a (query, candidate) pair can arrive via several probe buckets
        scored = scored.dropDuplicates(["q_id", "c_id"])
    scored = scored.withColumn("dot", dot)
    w = Window.partitionBy("q_id").orderBy(F.col("dot").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            F.col("rank"),
            (F.col("dot") / F.sqrt((F.col("q_n") * F.col("c_n")).cast("double"))).alias(
                "cosine_q"
            ),
        )
    )


def pq_codebooks(
    sources: DataFrame,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[int]]]:
    """Per-subspace product-quantization codebooks from an explicit
    source-vector table: codebook ``s`` code ``j`` is the ``s``-th
    sub-slice of the ``j``-th source vector (ordered by id — fully
    deterministic, SQL-reproducible).  Sources are codebook-sized by
    construction (k vectors, like the IVF centroid table), so the
    driver-side collect is O(k * dim) — dimension-sized, never corpus.

    Returns ``codebooks[s][j] = quantized int sub-vector`` for use as
    literals in :func:`ivf_pq_ann_neighbors`.
    """
    rows = (
        sources.select(
            F.col(id_col).alias("_id"),
            quantize_vector(F.col(vec_col)).alias("_qv"),
        )
        .orderBy("_id")
        .collect()
    )
    if not rows:
        raise ValueError("pq_codebooks: empty source table")
    dim = len(rows[0]["_qv"])
    if dim % m != 0:
        raise ValueError(f"pq_codebooks: dim {dim} not divisible by m={m}")
    sub = dim // m
    return [
        [list(r["_qv"][s * sub : (s + 1) * sub]) for r in rows]
        for s in range(m)
    ]


def train_pq_codebooks(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[int]]]:
    """Train PQ codebooks the FAISS way: an independent k-means per
    subspace over the corpus's sub-vectors (m distributed Lloyd runs via
    :func:`kmeans_centroids`); centroid means are quantized to the same
    integer grid the ADC arithmetic uses.  Only k*dim/m cells per
    subspace ever reach the driver."""
    dim_row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if dim_row is None:
        raise ValueError("train_pq_codebooks: empty input")
    dim = dim_row["d"]
    if dim % m != 0:
        raise ValueError(f"train_pq_codebooks: dim {dim} not divisible by m={m}")
    sub = dim // m
    books: list[list[list[int]]] = []
    for s in range(m):
        sliced = df.select(
            F.col(id_col), F.slice(F.col(vec_col), s * sub + 1, sub).alias("_sub")
        )
        cen = kmeans_centroids(
            sliced, k, max_iter=max_iter, id_col=id_col, vec_col="_sub"
        ).orderBy("cen_id").collect()
        books.append(
            [[int(round(x * 1000)) for x in r["embedding"]] for r in cen]
        )
    return books


class PQCoder:
    """Shared product-quantization expression builder: encodes vectors
    to per-subspace argmin codes and builds per-query ADC lookup tables
    against a fixed codebook set.  Used by both the in-line
    :func:`ivf_pq_ann_neighbors` and the persistent
    `operators.index.IVFPQIndex`.

    The per-subspace expressions are built as SQL STRINGS (one F.expr
    per subspace), not as Column trees: the Column form costs thousands
    of py4j round-trips for the m*k codebook literals and their
    zip_with/aggregate lambdas — ~2s of pure driver time per invocation
    at m=8, k=16, versus one JVM-side parse of a ~2 KB string here.
    Sub-vector slices are STAGED as plain attributes before the
    per-code lambdas reference them (HOFs are interpreted with no
    subexpression elimination, so an inline slice() would re-slice once
    per code — measured ~2x on the whole query at sf0.1)."""

    def __init__(self, codebooks: list[list[list[int]]]) -> None:
        if not codebooks:
            raise ValueError("PQCoder: empty codebooks")
        self.codebooks = codebooks
        self.m = len(codebooks)
        self.sub = len(codebooks[0][0])

    @staticmethod
    def _book_sql(book: list[list[int]]) -> str:
        return (
            "array("
            + ",".join(
                "array(" + ",".join(f"{int(v)}L" for v in code) + ")"
                for code in book
            )
            + ")"
        )

    def _stage_subs(self, df: DataFrame, vec_name: str, keep: list[str]) -> DataFrame:
        return df.select(
            *keep,
            *[
                F.slice(F.col(vec_name), s * self.sub + 1, self.sub).alias(
                    f"_sub{s}"
                )
                for s in range(self.m)
            ],
        )

    def _stage_dists(self, df: DataFrame, keep: list[str]) -> DataFrame:
        """Stage the per-subspace distance arrays (_d0.._dm-1): exact
        integer L2^2 from the staged sub-slice to every code.  Staging
        means the downstream argmin (codes) reads a materialized array
        instead of re-evaluating the 16-way distance transform twice."""
        return df.select(
            *keep,
            *[
                F.expr(
                    f"transform({self._book_sql(self.codebooks[s])}, cb -> "
                    f"aggregate(zip_with(_sub{s}, cb, "
                    "(x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v))"
                ).alias(f"_d{s}")
                for s in range(self.m)
            ],
        )

    def _staged(self, df: DataFrame, vec_name: str, keep: list[str]) -> DataFrame:
        """The ``keep + (_d0 .. _dm-1)`` relation both outputs read.

        Always the staged slice + transform-over-codebook SQL form: an
        r13 draft unrolled the per-code distance folds into flat
        ``try_element_at`` arithmetic instead, and execution regressed
        ~20x (janino 64 KB blowouts + per-plan compile churn — see
        functions/vectors.py); the staged HOF form is the measured
        winner."""
        return self._stage_dists(self._stage_subs(df, vec_name, keep), keep)

    @property
    def codes_sql(self) -> str:
        return (
            "array("
            + ",".join(
                f"cast(array_position(_d{s}, array_min(_d{s})) - 1 as int)"
                for s in range(self.m)
            )
            + ")"
        )

    def encode(self, df: DataFrame, vec_name: str, keep: list[str]) -> DataFrame:
        """``keep + (codes array<int>)``: per-subspace integer argmin
        (ties to the lower code id — array_position's first minimum)."""
        return self._staged(df, vec_name, keep).select(
            *keep, F.expr(self.codes_sql).alias("codes")
        )

    def luts(self, df: DataFrame, vec_name: str, keep: list[str]) -> DataFrame:
        """``keep + (lut array<array<bigint>>)``: the ADC lookup table —
        exact integer L2^2 from the vector's sub-slices to every code."""
        return self._staged(df, vec_name, keep).select(
            *keep,
            F.array(*[F.col(f"_d{s}") for s in range(self.m)]).alias("lut"),
        )


def ivf_residual_vectors(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(id_col, vec_col)``: each corpus vector's RESIDUAL to its
    assigned IVF centroid — the training input for residual PQ codebooks
    (standard IVF-ADC, Jégou et al. 2011, "Product Quantization for
    Nearest Neighbor Search" §IV).  Computed on the shared integer grid
    (quantized vector minus quantized centroid) and scaled back to
    floats, so downstream ``quantize_vector`` recovers the exact ints
    the search-time encoder subtracts — trainer and searcher quantize
    identically by construction."""
    cen = _quantized(centroids, id_col, vec_col, "cen")
    c = _quantized(corpus, id_col, vec_col, "c")
    if ARGMAX_ASSIGN:
        # r14: per-row argmax with the winning centroid's quantized
        # vector carried as a literal struct field — the residual
        # subtract and /1000.0 scale-back are the identical integer /
        # double ops on identical operands as the groupBy form
        cen_rows = cen.collect()
        if not cen_rows:
            return c.select(
                F.col("c_id").alias(id_col),
                F.transform(
                    F.col("c_qv"),
                    lambda v: v.cast("double") / F.lit(1000.0),
                ).alias(vec_col),
            ).filter(F.lit(False))
        from topic_store_spark.operators.util import project_once

        best = argmax_best_sql(cen_rows, "c_qv", with_vec=True)
        return project_once(
            c,
            _res=F.expr(
                f"transform(zip_with(c_qv, ({best}).cen_qv, "
                "(x, y) -> x - y), "
                "v -> CAST(v AS DOUBLE) / 1000.0D)"
            ),
        ).select(
            F.col("c_id").alias(id_col), F.col("_res").alias(vec_col)
        )
    aff = _int_dot("c_qv", "cen_qv") / F.sqrt(F.col("cen_n").cast("double"))
    best = F.max(
        F.struct(
            F.col("aff"),
            (-F.col("cen_id")).alias("neg_cen"),
            F.col("c_qv"),
            F.col("cen_qv"),
        )
    ).alias("best")
    return (
        c.crossJoin(F.broadcast(cen))
        .withColumn("aff", aff)
        .groupBy("c_id")
        .agg(best)
        .select(
            F.col("c_id").alias(id_col),
            F.transform(
                F.zip_with(
                    F.col("best.c_qv"), F.col("best.cen_qv"), lambda x, y: x - y
                ),
                lambda v: v.cast("double") / F.lit(1000.0),
            ).alias(vec_col),
        )
    )


def ivf_pq_ann_neighbors(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    codebooks: list[list[list[int]]],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    residual: bool = False,
) -> DataFrame:
    """IVF-PQ approximate top-k (the FAISS IVFPQ composition): coarse
    IVF inverted lists bound the candidate set, and within the probed
    lists candidates are scored by ASYMMETRIC DISTANCE COMPUTATION over
    product-quantized codes — ``m`` sub-vector codes of ``ceil(log2 k)``
    bits each instead of the full vector.

    Why it matters at 100 TB: the searched representation shrinks ~32x
    (64 int cells -> 8 small codes per vector), so the inverted lists
    that actually move through the probe join carry codes, not vectors —
    ADC is ``m`` table lookups + adds per candidate, and the per-query
    LUT (``m * k`` integer distances) is computed once on the tiny
    broadcast side.  Here the codes ride next to the vectors for
    oracle-checkability; a production index would persist codes only.

    ``residual=True`` encodes each vector's residual to its assigned
    coarse centroid and builds the query LUT from the query's residual
    to each PROBED centroid (one LUT per (query, list) instead of per
    query) — standard IVF-ADC (Jégou et al. 2011).  Residuals are far
    smaller than raw vectors, so the same code budget quantizes them
    much more finely: measured recall@10 roughly doubles vs no-residual
    at equal nprobe (RECALL.md).  Pair with codebooks trained on
    :func:`ivf_residual_vectors` output.

    Determinism contract (shared with the SQL oracle): encoding is
    integer argmin of exact L2^2 on the quantized grid, ties to the
    lower code id (``array_position`` returns the FIRST minimum); ADC
    sums exact integers; residual subtraction happens on the integer
    grid, so both variants stay bit-reproducible cross-engine.

    Returns ``(query_id, neighbor_id, rank, adc_dist)`` — rank 1 is the
    SMALLEST approximate distance, tie-broken on neighbor id.
    """
    coder = PQCoder(codebooks)
    cen = _quantized(centroids, id_col, vec_col, "cen")
    c = _quantized(corpus, id_col, vec_col, "c")
    q = _quantized(queries, id_col, vec_col, "q")
    encoded = _pq_encode_corpus(c, cen, coder, residual)
    luts = _pq_query_luts(q, cen, coder, nprobe, residual)
    return _pq_adc_rank(encoded, luts, k)


def _pq_encode_corpus(
    c: DataFrame, cen: DataFrame, coder: PQCoder, residual: bool,
) -> DataFrame:
    """``(c_id, list_id, codes)``: coarse-assign every corpus vector
    and PQ-encode it (residual or raw) in staged projections.  The full
    vector is DROPPED here — downstream carries ``m`` codes/row.

    r14 (``ARGMAX_ASSIGN``): the coarse assignment is a per-row argmax
    over collected centroid literals — map-side, removing the
    corpus-scale crossJoin+groupBy exchange (the r13 fallback shuffled
    n rows with their full quantized vectors).  The best struct is
    STAGED in its own projection because both ``list_id`` and the
    residual read it (HOFs get no subexpression elimination)."""
    if ARGMAX_ASSIGN:
        cen_rows = cen.collect()
        if not cen_rows:
            ctype = cen.schema["cen_id"].dataType
            assigned = c.select(
                "c_id",
                F.col("c_qv").alias("c_ev"),
                F.lit(None).cast(ctype).alias("list_id"),
            ).filter(F.lit(False))
            return coder.encode(assigned, "c_ev", ["c_id", "list_id"])
        from topic_store_spark.operators.util import project_once

        best = argmax_best_sql(cen_rows, "c_qv", with_vec=True)
        # project_once, not a plain staged projection: pushed
        # isnotnull(list_id)/join predicates would substitute the alias
        # and re-run the whole argmax per row (the ann_ivf lesson)
        staged = project_once(c, _best=F.expr(best))
        enc_sql = (
            "zip_with(c_qv, _best.cen_qv, (x, y) -> x - y)"
            if residual
            else "c_qv"
        )
        assigned = staged.select(
            "c_id",
            F.expr(enc_sql).alias("c_ev"),
            F.col("_best.cen_id").alias("list_id"),
        )
        return coder.encode(assigned, "c_ev", ["c_id", "list_id"])
    aff = _int_dot("c_qv", "cen_qv") / F.sqrt(F.col("cen_n").cast("double"))
    best = F.max(
        F.struct(
            F.col("aff"),
            (-F.col("cen_id")).alias("neg_cen"),
            F.col("cen_id"),
            F.col("c_qv"),
            F.col("cen_qv"),
        )
    ).alias("best")
    enc_vec = (
        F.zip_with(F.col("best.c_qv"), F.col("best.cen_qv"), lambda x, y: x - y)
        if residual
        else F.col("best.c_qv")
    )
    assigned = (
        c.crossJoin(F.broadcast(cen))
        .withColumn("aff", aff)
        .groupBy("c_id")
        .agg(best)
        .select(
            "c_id",
            enc_vec.alias("c_ev"),
            F.col("best.cen_id").alias("list_id"),
        )
    )
    return coder.encode(assigned, "c_ev", ["c_id", "list_id"])


def _pq_query_luts(
    q: DataFrame, cen: DataFrame, coder: PQCoder, nprobe: int, residual: bool,
) -> DataFrame:
    """``(q_id, list_id, lut)``: the nprobe nearest lists per query with
    the ADC lookup table for each probe.  No-residual LUTs depend on the
    query alone; residual LUTs on the (query, probed list) pair — either
    way this side is probe-sized (the residual zip_with stays the HOF
    form deliberately: probe-count rows, never corpus-scale)."""
    q_aff = _int_dot("q_qv", "cen_qv") / F.sqrt(F.col("cen_n").cast("double"))
    w_probe = Window.partitionBy("q_id").orderBy(
        F.col("aff").desc(), F.col("cen_id").asc()
    )
    q_enc = (
        F.zip_with(F.col("q_qv"), F.col("cen_qv"), lambda x, y: x - y)
        if residual
        else F.col("q_qv")
    )
    probes = (
        q.crossJoin(F.broadcast(cen))
        .withColumn("aff", q_aff)
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= nprobe)
        .select("q_id", q_enc.alias("q_ev"), F.col("cen_id").alias("list_id"))
    )
    return coder.luts(probes, "q_ev", ["q_id", "list_id"])


def _pq_adc_rank(
    encoded: DataFrame, luts: DataFrame, k: int
) -> DataFrame:
    """Score every (probe, same-list code row) pair by integer ADC and
    keep each query's top-k (smallest distance, ties to lower id)."""
    if FAST_EXPR:
        # same fold as the Column form below, one py4j round trip
        adc = F.expr(
            "aggregate(zip_with(codes, lut, "
            "(cd, l) -> element_at(l, cd + 1)), "
            "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        )
    else:
        adc = F.aggregate(
            F.zip_with(
                F.col("codes"), F.col("lut"), lambda cd, l: F.element_at(l, cd + 1)
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
    scored = (
        encoded.join(F.broadcast(luts), "list_id")
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn("adc_dist", adc)
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("adc_dist").asc(), F.col("c_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            "rank",
            "adc_dist",
        )
    )


def kmeans_centroids(
    df: DataFrame,
    k: int,
    max_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tol: float = 1e-6,
) -> DataFrame:
    """Distributed Lloyd's k-means over an embedding column — trains the
    centroid table ``ivf_ann_neighbors`` probes (the missing half of an
    IVF index build; FAISS-style train-then-assign, expressed as
    DataFrame ops).

    Returns ``(cen_id long, embedding array<double>)``, ``cen_id`` dense
    0..k-1.

    Determinism + scale shape:

    - init is k-means||-flavored but deterministic: the k seeds are the
      vectors with the smallest ``md5(id)`` (a reproducible uniform
      sample — no RNG, no driver-side data);
    - each iteration = ONE broadcast of the k centroids over the corpus
      (nearest-centroid assignment, tie on lower cen_id) + ONE
      groupBy(cluster) mean with map-side partials.  The corpus never
      shuffles its vectors by cluster — only k*dim partial sums move;
    - per-iteration results are materialized (``materialize_iter``), so
      lineage stays flat and the convergence check costs one k-row
      comparison, not a recompute of every prior round;
    - empty clusters keep their previous centroid (standard Lloyd
      fallback), so the output is always exactly k rows.
    """
    from topic_store_spark.operators.util import materialize_iter

    dim_row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if dim_row is None:
        raise ValueError("kmeans_centroids: empty input")
    vecs = df.select(
        F.col(id_col).alias("_km_id"),
        F.col(vec_col).cast("array<double>").alias("_km_v"),
    )
    seeds = (
        vecs.orderBy(F.md5(F.col("_km_id").cast("string")), F.col("_km_id"))
        .limit(k)
        .select("_km_v")
    )
    centroids = materialize_iter(
        seeds.select(
            (F.row_number().over(Window.orderBy("_km_v")) - 1).alias("cen_id"),
            F.col("_km_v").alias("_km_c"),
        )
    )

    def _dist2(a: str, b: str):
        return F.aggregate(
            F.zip_with(F.col(a), F.col(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    for _ in range(max_iter):
        w = Window.partitionBy("_km_id").orderBy("d2", "cen_id")
        assigned = (
            vecs.crossJoin(F.broadcast(centroids))
            .withColumn("d2", _dist2("_km_v", "_km_c"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("cen_id", "_km_v")
        )
        # mean per cluster: element-wise partial sums via posexplode —
        # only (k * dim) aggregated cells shuffle, never the vectors
        sums = (
            assigned.select("cen_id", F.posexplode("_km_v").alias("pos", "x"))
            .groupBy("cen_id", "pos")
            .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n"))
            .groupBy("cen_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", (F.col("sx") / F.col("n")).alias("m")))
                ).alias("pm")
            )
            .select("cen_id", F.transform("pm", lambda s: s["m"]).alias("_km_new"))
        )
        new_centroids = materialize_iter(
            centroids.join(sums, "cen_id", "left").select(
                "cen_id", F.coalesce("_km_new", "_km_c").alias("_km_c")
            )
        )
        shift = (
            centroids.alias("o")
            .join(new_centroids.alias("n"), "cen_id")
            .select(
                F.max(
                    F.aggregate(
                        F.zip_with(
                            F.col("o._km_c"), F.col("n._km_c"),
                            lambda x, y: (x - y) * (x - y),
                        ),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    )
                ).alias("s")
            )
            .first()["s"]
        )
        centroids = new_centroids
        if shift is not None and shift <= tol:
            break
    return centroids.select("cen_id", F.col("_km_c").alias("embedding"))


# ---------------------------------------------------------------------------
# OPQ: optimized product quantization (learned rotation)
# ---------------------------------------------------------------------------

def _variance_balanced_perm_of(vecs: list[list[int]]) -> list[int]:
    """The allocation rule of :func:`variance_balanced_permutation`,
    over already-quantized integer vectors (shared by the fused
    :func:`opq_permuted_codebooks` so both paths use ONE formula)."""
    dims = len(vecs[0])
    if dims % 2:
        raise ValueError("variance_balanced_permutation: even dim count only")
    n = len(vecs)
    varnum = [
        n * sum(v[d] * v[d] for v in vecs) - sum(v[d] for v in vecs) ** 2
        for d in range(dims)
    ]
    order = sorted(range(dims), key=lambda d: (-varnum[d], d))
    perm: list[int] = []
    for s in range(dims // 2):
        perm += [order[s], order[dims - 1 - s]]
    return perm


def opq_permuted_codebooks(
    residuals: DataFrame,
    m: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[int], list[list[list[int]]]]:
    """Fused OPQ-permutation + PQ-codebook derivation from ONE bounded
    collect of the residual training sample (r13 optimization round).

    Exactly equal to the composed pipeline it replaces —
    ``perm = variance_balanced_permutation(residuals)`` followed by
    ``pq_codebooks(ivf_residual_vectors(permute_vectors(corpus, perm),
    permuted_centroids), m)`` — because every step commutes with the
    permutation EXACTLY (pinned by tests/test_dedup_similarity.py
    ::test_opq_fused_codebooks_equal_composed):

    - ``quantize_vector`` is per-element, so quantize∘permute =
      permute∘quantize bit-for-bit;
    - IVF assignment is permutation-invariant: the integer dot/self-dot
      sums are the same multiset of ``long`` addends (exact regardless
      of order), so every affinity double — and hence every
      argmax/tie-break on ``(aff, -cen_id)`` — is IDENTICAL;
    - the residual is an element-wise integer subtract, so the permuted
      pipeline's residual ints are the permutation of the unpermuted
      residual ints;
    - ``pq_codebooks`` would re-quantize the residual floats
      (``ints/1000.0``), which recovers the ints exactly (the
      established grid contract ``round((i/1000.0)*1000.0) == i``).

    The composed form costs TWO eager driver jobs on every DataFrame
    build (the permutation's collect + the codebook collect, each a
    crossJoin/groupBy residual computation); this costs one.  The
    Python-side int conversion is shared with
    :func:`variance_balanced_permutation` so the allocation rule cannot
    drift between the two paths.

    Returns ``(perm, codebooks)`` with ``codebooks[s][j]`` the ``s``-th
    sub-slice of the ``j``-th PERMUTED residual (ordered by id, exactly
    :func:`pq_codebooks`' layout).
    """
    if FAST_EXPR:
        qv = F.expr(quantize_sql(_q(vec_col))).alias("_qv")
    else:
        qv = quantize_vector(F.col(vec_col)).alias("_qv")
    rows = (
        residuals.select(F.col(id_col).alias("_id"), qv)
        .orderBy("_id")
        .collect()
    )
    if not rows:
        raise ValueError("opq_permuted_codebooks: empty source table")
    vecs = [list(r["_qv"]) for r in rows]
    dims = len(vecs[0])
    if dims % m != 0:
        raise ValueError(f"opq_permuted_codebooks: dim {dims} not divisible by m={m}")
    perm = _variance_balanced_perm_of(vecs)
    sub = dims // m
    permuted = [[v[p] for p in perm] for v in vecs]
    books = [
        [v[s * sub : (s + 1) * sub] for v in permuted] for s in range(m)
    ]
    return perm, books


def variance_balanced_permutation(
    residuals: DataFrame, vec_col: str = "embedding"
) -> list[int]:
    """OPQ-lite learned "rotation" as a variance-balanced DIMENSION
    PERMUTATION (the parametric-OPQ allocation intuition of Ge et al.
    2013 §4: spread variance evenly across subspaces).  A signless
    permutation is an exactly-orthogonal matrix whose application is
    EXACT on the shared integer grid — so unlike the float Procrustes
    rotation (`train_opq_rotation`), the permuted encoding reproduces
    bit-for-bit in the DuckDB oracle (the r7 blocker for carrying OPQ
    in `ann_pq`).

    Allocation for 2-d subspaces: sort dims by residual variance
    (exact integer numerator ``n*sum(x^2) - sum(x)^2``, ties by dim
    index) and pair the s-th highest with the s-th lowest —
    ``perm[2s], perm[2s+1] = sorted[s], sorted[D-1-s]``.

    ``residuals`` is the (BOUNDED — the codebook training sample, 16
    vectors in the carried config) residual relation from
    `ivf_residual_vectors`; the collect here is the same bounded
    driver-side step the codebook derivation already takes."""
    rows = residuals.select(vec_col).collect()
    if not rows:
        raise ValueError("variance_balanced_permutation: empty sample")
    vecs = [
        [int(round(x * 1000.0)) for x in r[0]] for r in rows
    ]  # back to the exact integer grid
    return _variance_balanced_perm_of(vecs)


def permute_vectors(
    df: DataFrame, perm: list[int], vec_col: str = "embedding"
) -> DataFrame:
    """Apply a dimension permutation to a vector column — one JVM-side
    array rebuild, exact for any value (no float arithmetic at all)."""
    col = F.col(vec_col)
    return df.withColumn(
        vec_col, F.array(*[F.element_at(col, i + 1) for i in perm])
    )


def train_opq_rotation(
    df: DataFrame,
    m: int,
    k: int = 16,
    iters: int = 8,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Learn an OPQ rotation (Ge et al. 2013, "Optimized Product
    Quantization"): an orthogonal matrix ``R`` that redistributes
    variance across the ``m`` PQ subspaces so the independent
    per-subspace codebooks waste less of their code budget.  Alternating
    optimization: fix ``R``, train per-subspace k-means on the rotated
    sample; fix the codes, solve the orthogonal Procrustes problem
    ``min_R ||X R - C||_F`` (SVD of ``X^T C``).

    Driver-side by design: the rotation is a ``dim x dim`` matrix and
    training needs only a SAMPLE (first ``sample`` vectors by id —
    deterministic), never the corpus.  numpy's SVD and the index-grid
    k-means init keep the result reproducible run-to-run.

    Returns ``R`` as row-major ``dim x dim`` floats in the
    ``y = R @ v`` convention :func:`rotate_vectors` applies (the
    internal solver works in the right-multiplied ``X S`` form; the
    transpose is taken on return so the two compose EXACTLY — an
    orthogonal matrix's transpose is its inverse, so mixing the
    conventions silently applies the inverse rotation).  Apply to
    corpus, queries AND IVF centroids (an orthogonal map preserves
    inner products, so coarse assignments are unchanged up to grid
    rounding), then train codebooks on the rotated residuals exactly
    as without OPQ.
    """
    import numpy as np

    rows = (
        df.select(F.col(id_col).alias("_i"), F.col(vec_col).alias("_v"))
        .orderBy("_i")
        .limit(sample)
        .collect()
    )
    if not rows:
        raise ValueError("train_opq_rotation: empty input")
    X = np.asarray([list(r["_v"]) for r in rows], dtype=np.float64)
    dim = X.shape[1]
    if dim % m != 0:
        raise ValueError(f"train_opq_rotation: dim {dim} not divisible by m={m}")
    sub = dim // m
    R = np.eye(dim)

    def _kmeans(Z: "np.ndarray") -> "np.ndarray":
        # deterministic init: evenly spaced sample rows
        idx = np.linspace(0, len(Z) - 1, k).astype(int)
        cen = Z[idx].copy()
        for _ in range(6):
            d2 = ((Z[:, None, :] - cen[None, :, :]) ** 2).sum(-1)
            a = d2.argmin(1)
            for j in range(k):
                pts = Z[a == j]
                if len(pts):
                    cen[j] = pts.mean(0)
        return cen

    for _ in range(iters):
        Y = X @ R
        C = np.empty_like(Y)
        for s in range(m):
            Z = Y[:, s * sub : (s + 1) * sub]
            cen = _kmeans(Z)
            d2 = ((Z[:, None, :] - cen[None, :, :]) ** 2).sum(-1)
            C[:, s * sub : (s + 1) * sub] = cen[d2.argmin(1)]
        U, _, Vt = np.linalg.svd(X.T @ C)
        R = U @ Vt
    return [[float(x) for x in row] for row in R.T]


def rotate_vectors(
    df: DataFrame,
    rotation: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Apply a ``dim x dim`` rotation to ``vec_col`` (out = R @ v), all
    JVM-side: the matrix rides as ONE SQL array-literal string (the
    PQCoder pattern — a Column tree would cost thousands of py4j
    round-trips), the matvec is transform+aggregate over it.  O(dim^2)
    arithmetic per row, no shuffle, no Python in the hot path."""
    dim = len(rotation)
    if any(len(row) != dim for row in rotation):
        raise ValueError("rotate_vectors: rotation must be square")
    rows_sql = ",".join(
        "array(" + ",".join(f"{x!r}D" for x in row) + ")" for row in rotation
    )
    matvec = (
        f"transform(array({rows_sql}), r -> aggregate("
        f"zip_with(r, `{vec_col}`, (a, b) -> a * cast(b AS double)), "
        f"0D, (s, x) -> s + x))"
    )
    return df.withColumn(vec_col, F.expr(matvec))
