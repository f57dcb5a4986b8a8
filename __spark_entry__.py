"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H-Q1-style pricing summary)
on sf0.001.  ``queries()`` exposes one callable per implemented operator
from SURVEY.md §2 plus the training-data-pipeline extensions (dedup /
similarity / text analysis); ``oracle_sql()`` gives the DuckDB-equivalent
SQL for each.

Determinism rules used throughout so the value-hash comparison is exact:

- money aggregations run in DECIMAL (exact, engine-independent), never as
  double sums whose value depends on partial-aggregation order;
- double-valued metric aggregations quantize to integer milli-units first
  (``round(value*1000)::long``), sum exactly, and derive doubles from the
  exact integers (deterministic IEEE ops on identical operands);
- every hash-based operator (MinHash/SimHash/fingerprints) is md5-derived,
  which is bit-identical in Spark and DuckDB (see
  topic_store_spark/functions/hashing.py);
- top-k queries always carry a unique tie-break column.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from topic_store_spark.tables import load_table

#: r14 optimization-round toggle (`tools/ab_bench.py asofstage:
#: snapshot_asof`): True stages q_snapshot_asof's click and purchase
#: event subsets ONCE each, hash(user_id)-partitioned + persisted +
#: plan-finalized, so the asof/interval branches' four user-keyed
#: exchanges (quote-dedup groupBy, asof union window, interval bin
#: join at scale, per-click sum) inherit the staging partitioning
#: instead of planning their own.  Runtime shuffle stages measured
#: 6 -> 4 with broadcast disabled (the 100 TB regime) and 4 -> 1
#: locally; results identical both regimes (repartition + persist are
#: row-preserving) — oracle-checked.  DEFAULT False: the interleaved
#: receipt (BENCH_AB_asofstage_snapshot_asof.json) stamped
#: stage_off_faster at sf0.1 — the two persist+finalize probe jobs
#: cost more than the exchanges they save on this fixture, where every
#: branch's shuffle is a few MB.  The staging is the documented 100 TB
#: configuration (exchange bytes scale with the corpus, the probe jobs
#: are constant); flipping it on is a one-line production conf, and
#: the A/B keeps both shapes measurable per round.
ASOF_SHARED_STAGE = False


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _dec(col, prec: int = 18, scale: int = 2):
    return F.col(col).cast(f"decimal({prec},{scale})") if isinstance(col, str) else col.cast(f"decimal({prec},{scale})")


def _epoch_sec(df: DataFrame, col: str = "ts"):
    """Epoch seconds (double, microsecond precision) from ``col`` no matter
    how the testdata generation materialized it (numeric epoch in r1,
    ``timestamp[us]``/TIMESTAMP_NTZ since the r2 regeneration).

    The NTZ branch is timezone-proof: the wall-clock is diffed against the
    NTZ epoch origin (pure calendar arithmetic, no session-tz involvement),
    which is exactly DuckDB's ``epoch(ts)`` on a naive timestamp.  A
    ``cast(timestamp_ltz)`` round-trip would shift by the session offset and
    ``unix_timestamp`` truncates sub-seconds — both verified wrong here.
    """
    dtype = dict(df.dtypes).get(col, "")
    c = F.col(col)
    if dtype == "timestamp_ntz":
        origin = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        return F.timestamp_diff("MICROSECOND", origin, c) / F.lit(1000000.0)
    if dtype.startswith("timestamp"):  # LTZ: instant semantics, tz-free cast
        return c.cast("double")
    return c.cast("double")


# ---------------------------------------------------------------------------
# Reference parity: Mongo query-dict frontend (SURVEY §2.2 P1-P6, §2.3 R1-R3)
# ---------------------------------------------------------------------------

def q_mongo_find_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P5 composite, one tagged union of two compiled finds: the
    events predicate exercises $in, $nin, range comparisons ($gt/$lt),
    $exists and $mod in a single conjunction; the documents predicate
    covers the boolean/string corners — $or over implicit-AND branches,
    nested $and, $gte/$lt, positive $regex, $not($regex) (Mongo
    null-safe negation), $ne and $mod (reference database.py:193-204
    passes this dialect through to the server; the compiler turns it
    into Catalyst predicates, each branch pushed to its own scan).
    The third branch (r9) is a ``$jsonSchema`` validator find —
    required/enum/numeric range/multipleOf/pattern/min-maxLength plus
    an anyOf combinator — oracle-carried against DuckDB's equivalent
    type/null/length/regexp predicates (previously pinned only by the
    differential fuzz sweep)."""
    from topic_store_spark.query.compiler import compile_query

    events = _t(spark, sf_dir, "events")
    ev_query = {
        "event_type": {"$in": ["click", "purchase", "view"], "$nin": ["view"]},
        "value": {"$gt": 5.0, "$lt": 400.0},
        "props": {"$exists": True},
        "user_id": {"$mod": [3, 1]},
    }
    ev = events.filter(compile_query(ev_query, events.schema)).select(
        F.lit("events").alias("part"),
        F.col("event_id").alias("id"),
        F.col("user_id").alias("num"),
        F.col("event_type").alias("s1"),
        F.lit(None).cast("string").alias("s2"),
        F.col("value").cast("double").alias("v"),
    )
    docs = _t(spark, sf_dir, "documents")
    doc_query = {
        "$or": [
            {"lang": "en", "n_chars": {"$gte": 700}},
            {"$and": [{"source": {"$regex": "^src[13]"}}, {"n_chars": {"$lt": 150}}]},
        ],
        "source": {"$not": {"$regex": "^src0"}},
        "lang": {"$ne": "xx"},
        "doc_id": {"$mod": [2, 1]},
    }
    dc = docs.filter(compile_query(doc_query, docs.schema)).select(
        F.lit("docs").alias("part"),
        F.col("doc_id").alias("id"),
        F.col("n_chars").cast("long").alias("num"),
        F.col("lang").alias("s1"),
        F.col("source").alias("s2"),
        F.lit(None).cast("double").alias("v"),
    )
    js_query = {
        "$jsonSchema": {
            "required": ["lang", "source"],
            "properties": {
                "lang": {"bsonType": "string",
                         "enum": ["en", "de", "fr", "es", "zh"]},
                "n_chars": {"bsonType": "long", "minimum": 120,
                            "maximum": 5000, "multipleOf": 5},
                "source": {"pattern": "^src[0-4]", "minLength": 4,
                           "maxLength": 8},
                "text": {"minLength": 50},
            },
            "anyOf": [
                {"properties": {"lang": {"enum": ["en"]}}},
                {"properties": {"n_chars": {"maximum": 900}}},
            ],
            # r10 keywords, all DuckDB-mirrored: presence-count floor,
            # compile-time name-pattern schemas, presence-triggered deps
            "minProperties": 4,
            "patternProperties": {"^(lang|source)$": {"minLength": 2}},
            "dependencies": {
                "text": {"properties": {"n_chars": {"minimum": 100}}}
            },
        }
    }
    dj = docs.filter(compile_query(js_query, docs.schema)).select(
        F.lit("jschema").alias("part"),
        F.col("doc_id").alias("id"),
        F.col("n_chars").cast("long").alias("num"),
        F.col("lang").alias("s1"),
        F.col("source").alias("s2"),
        F.lit(None).cast("double").alias("v"),
    )
    return ev.unionByName(dc).unionByName(dj)


def q_mongo_projection_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1/R3/R4 composite: nested-dotted projection dict pruning a
    struct tree, then the dotted-name flatten — the full reference
    read-path reshaping (projection dict -> pruned select -> flat
    dotted columns) in one query."""
    from topic_store_spark.operators.util import ensure_parallelism
    from topic_store_spark.query.projection import apply_projection, flatten_dotted

    # single-file testdata parquet scans as 1 partition; spread the
    # struct-rebuild work across cores like the sibling carriers
    events = ensure_parallelism(_t(spark, sf_dir, "events"))
    nested = events.select(
        "event_id",
        F.struct(
            F.col("user_id").alias("user"),
            F.struct(F.col("event_type").alias("type"), F.col("value").alias("v")).alias(
                "detail"
            ),
        ).alias("meta"),
    )
    proj = apply_projection(nested, {"event_id": 1, "meta.user": 1, "meta.detail.v": 1})
    return flatten_dotted(proj)


def q_mongo_group_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 composite, one tagged union over the same orders scan: the
    $match -> $group subset (compound _id, $sum/$max/$min/$median
    accumulators — $median is the r6 exact continuous percentile, DuckDB
    twin quantile_cont), the $bucket histogram (explicit boundaries +
    default overflow bucket), and (r7) the n-ary accumulator + cast
    families — $topN (sort-aware collect/sort/slice, one aggregate per
    group, DuckDB twin ordered list(...)[1:n]) plus $convert-with-onError
    / $toLong / $substrBytes inside the accumulator arguments.  Three
    pipeline invocations, each a single partial-aggregated shuffle."""
    from topic_store_spark.query.pipeline import apply_pipeline

    orders = _t(spark, sf_dir, "orders")
    grouped = apply_pipeline(
        orders,
        [
            {"$match": {"o_orderstatus": {"$in": ["F", "O"]}}},
            {
                "$group": {
                    "_id": {"priority": "$o_orderpriority", "status": "$o_orderstatus"},
                    "n": {"$sum": 1},
                    "max_price": {"$max": "$o_totalprice"},
                    "min_price": {"$min": "$o_totalprice"},
                    "med_price": {"$median": {"input": "$o_totalprice",
                                              "method": "approximate"}},
                }
            },
        ],
    ).select(
        F.lit("group").alias("part"),
        F.col("priority").alias("g1"),
        F.col("status").alias("g2"),
        "n",
        "max_price",
        "min_price",
        "med_price",
        F.lit(None).cast("string").alias("top_keys"),
        F.lit(None).cast("long").alias("prio_num"),
        F.lit(None).cast("long").alias("max_odate_ms"),
    )
    bucketed = apply_pipeline(
        orders,
        [
            {
                "$bucket": {
                    "groupBy": "$o_totalprice",
                    "boundaries": [0, 100000, 200000, 300000, 400000],
                    "default": "big",
                    "output": {
                        "n": {"$sum": 1},
                        "max_price": {"$max": "$o_totalprice"},
                    },
                }
            },
        ],
    ).select(
        F.lit("bucket").alias("part"),
        F.col("_id").alias("g1"),
        F.lit(None).cast("string").alias("g2"),
        "n",
        "max_price",
        F.lit(None).cast("double").alias("min_price"),
        F.lit(None).cast("double").alias("med_price"),
        F.lit(None).cast("string").alias("top_keys"),
        F.lit(None).cast("long").alias("prio_num"),
        F.lit(None).cast("long").alias("max_odate_ms"),
    )
    topn = apply_pipeline(
        orders,
        [
            {
                "$group": {
                    "_id": {"priority": "$o_orderpriority"},
                    "n": {"$sum": 1},
                    "top3": {
                        "$topN": {
                            "n": 3,
                            "sortBy": {"o_totalprice": -1, "o_orderkey": 1},
                            "output": "$o_orderkey",
                        }
                    },
                    "prio_num": {
                        "$max": {
                            "$convert": {
                                "input": {
                                    "$substrBytes": ["$o_orderpriority", 0, 1]
                                },
                                "to": "long",
                                "onError": -1,
                            }
                        }
                    },
                    "max_odate_ms": {"$max": {"$toLong": "$o_orderdate"}},
                }
            },
        ],
    ).select(
        F.lit("topn").alias("part"),
        F.col("priority").alias("g1"),
        F.lit(None).cast("string").alias("g2"),
        "n",
        F.lit(None).cast("double").alias("max_price"),
        F.lit(None).cast("double").alias("min_price"),
        F.lit(None).cast("double").alias("med_price"),
        F.concat_ws(",", F.col("top3").cast("array<string>")).alias("top_keys"),
        "prio_num",
        "max_odate_ms",
    )
    return grouped.unionByName(bucketed).unionByName(topn)


def q_mongo_pipeline_unwind(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: $project($split) -> $unwind -> $group -> $sort -> $limit — a
    word count written entirely in the Mongo pipeline dialect."""
    from topic_store_spark.query.pipeline import apply_pipeline

    docs = _t(spark, sf_dir, "documents")
    pipeline = [
        {"$project": {"doc_id": 1, "tok": {"$split": ["$text", " "]}}},
        {"$unwind": "$tok"},
        {"$group": {"_id": {"word": "$tok"}, "n": {"$sum": 1}}},
        {"$sort": {"n": -1, "word": 1}},
        {"$limit": 50},
    ]
    return apply_pipeline(docs, pipeline).select("word", "n")


def q_mongo_pipeline_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: BOTH $lookup forms in one pipeline — the equality form
    (localField/foreignField: foreign side pre-aggregates per key, only
    the dimension shuffles) via $lookup+$unwind against customer, THEN
    the correlated let+pipeline form (r4): per urgent order, count the
    same customer's strictly-pricier orders across the whole orders
    table ($eq key + $gt residual — the general row-id path of
    query/pipeline.py _lookup_pipeline)."""
    from topic_store_spark.query.pipeline import apply_pipeline

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    pipeline = [
        {"$match": {"o_orderpriority": "1-URGENT", "o_totalprice": {"$gt": 350000.0}}},
        {
            "$lookup": {
                "from": "customer",
                "localField": "o_custkey",
                "foreignField": "c_custkey",
                "as": "cust",
            }
        },
        {"$unwind": "$cust"},
        {
            "$lookup": {
                "from": "orders",
                "let": {"c": "$o_custkey", "p": "$o_totalprice"},
                "pipeline": [
                    {
                        "$match": {
                            "$expr": {
                                "$and": [
                                    {"$eq": ["$o_custkey", "$$c"]},
                                    {"$gt": ["$o_totalprice", "$$p"]},
                                ]
                            }
                        }
                    },
                    {"$sort": {"o_orderkey": 1}},
                ],
                "as": "pricier_peers",
            }
        },
        {
            "$project": {
                "o_orderkey": 1,
                "o_totalprice": 1,
                "cust_name": "$cust.c_name",
                "segment": "$cust.c_mktsegment",
                "n_pricier_peers": {"$toLong": {"$size": "$pricier_peers"}},
            }
        },
    ]
    return apply_pipeline(
        orders, pipeline, tables={"customer": customer, "orders": orders}
    )


def q_mongo_window_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 composite: $setWindowFields (documentNumber, running milli sum
    over [unbounded, current], $shift(-1)) THEN $fill repairing a gapped
    copy of the value two ways (locf + linear interpolation against the
    numeric sort key) — one pipeline, windows sharing the user_id
    exchange.  Running sums quantize to milli-units and interpolation
    keeps identical operand order so the doubles hash identically across
    engines."""
    from topic_store_spark.query.pipeline import apply_pipeline

    events = _t(spark, sf_dir, "events")
    gap = {
        "$cond": [
            {"$eq": [{"$mod": ["$event_id", 5]}, 0]},
            None,
            "$value",
        ]
    }
    pipeline = [
        {
            "$addFields": {
                "milli": {"$round": [{"$multiply": ["$value", 1000]}, 0]},
                "v_locf": gap,
                "v_lin": gap,
            }
        },
        {
            "$setWindowFields": {
                "partitionBy": "$user_id",
                "sortBy": {"ts": 1, "event_id": 1},
                "output": {
                    "doc_num": {"$documentNumber": {}},
                    "running_milli": {
                        "$sum": "$milli",
                        "window": {"documents": ["unbounded", "current"]},
                    },
                    "prev_event": {
                        "$shift": {"output": "$event_id", "by": -1, "default": -1}
                    },
                },
            }
        },
        {
            "$fill": {
                "partitionBy": "$user_id",
                "sortBy": {"event_id": 1},
                "output": {
                    "v_locf": {"method": "locf"},
                    "v_lin": {"method": "linear"},
                },
            }
        },
        # r7 RANGE window: VALUE-based frame over the event_id key —
        # every row whose id is within 100 BELOW the current one,
        # regardless of row adjacency (compiles to Spark rangeBetween;
        # DuckDB twin is RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
        {
            "$setWindowFields": {
                "partitionBy": "$user_id",
                "sortBy": {"event_id": 1},
                "output": {
                    "near_cnt": {
                        "$count": {},
                        "window": {"range": [-100, "current"]},
                    },
                    "near_milli": {
                        "$sum": "$milli",
                        "window": {"range": [-100, "current"]},
                    },
                },
            }
        },
    ]
    return apply_pipeline(events, pipeline).select(
        "user_id", "event_id", "doc_num", "running_milli", "prev_event",
        "v_locf", "v_lin", "near_cnt", "near_milli",
    )


def q_mongo_sample_reshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 composite: deterministic $sample (md5-of-_id order — compiles
    to TakeOrderedAndProject, reproducible across engines) feeding the
    document-reshaping stages ($unset -> $addFields -> $replaceRoot) and
    a closing $group rollup.  The $addFields stage carries the r6
    value-expression long tail through the oracle: $switch,
    $trim/$concat/$replaceAll, $regexMatch, $dateTrunc/$dateDiff/$toDate,
    and $mergeObjects building the $replaceRoot document (every operator
    the reference's pass-through aggregate() would hand to a real server,
    query/pipeline.py compile_value)."""
    from topic_store_spark.query.pipeline import apply_pipeline

    orders = _t(spark, sf_dir, "orders")
    pipeline = [
        {
            "$project": {
                "_id": "$o_orderkey",
                "total": "$o_totalprice",
                "status": "$o_orderstatus",
                "odate": "$o_orderdate",
                "priority": "$o_orderpriority",
            }
        },
        {"$sample": {"size": 200}},
        {"$unset": ["_id"]},
        {
            "$addFields": {
                "band": {
                    "$switch": {
                        "branches": [
                            {"case": {"$lt": ["$total", 100000]}, "then": "low"},
                            {"case": {"$lt": ["$total", 250000]}, "then": "mid"},
                        ],
                        "default": "high",
                    }
                },
                "tag": {
                    "$replaceAll": {
                        "input": {
                            "$trim": {
                                "input": {
                                    "$concat": ["  ", "$status", "-", "$priority", " "]
                                }
                            }
                        },
                        "find": "-",
                        "replacement": "_",
                    }
                },
                "urgent": {"$regexMatch": {"input": "$priority", "regex": "^[12]"}},
                "qtr": {"$dateTrunc": {"date": "$odate", "unit": "quarter"}},
                "age_days": {
                    "$dateDiff": {
                        "startDate": "$odate",
                        "endDate": {"$toDate": "2026-01-01T00:00:00"},
                        "unit": "day",
                    }
                },
                # r7 named-IANA-timezone rendering through the oracle:
                # midnight-UTC order dates land on the PREVIOUS New York
                # day (19:00 EST / 20:00 EDT), so both the string and the
                # $dateToParts hour genuinely exercise the tzdb
                "ny_day": {"$dateToString": {
                    "date": "$odate", "format": "%Y-%m-%d %H:%M",
                    "timezone": "America/New_York",
                }},
                "ny_hour": {"$getField": {
                    "field": "hour",
                    "input": {"$dateToParts": {
                        "date": "$odate", "timezone": "America/New_York",
                    }},
                }},
            }
        },
        {
            "$addFields": {
                "doc": {
                    "$mergeObjects": [
                        {"st": "$band", "tot": "$total"},
                        {
                            "tag": "$tag",
                            "urgent": "$urgent",
                            "qtr": "$qtr",
                            "age_days": "$age_days",
                            "ny_day": "$ny_day",
                            "ny_hour": "$ny_hour",
                        },
                    ]
                }
            }
        },
        {"$replaceRoot": {"newRoot": "$doc"}},
        {
            "$group": {
                "_id": "$st",
                "n": {"$sum": 1},
                "max_tot": {"$max": "$tot"},
                "n_urgent": {"$sum": {"$cond": ["$urgent", 1, 0]}},
                "max_tag": {"$max": "$tag"},
                "min_age": {"$min": "$age_days"},
                "min_qtr": {"$min": "$qtr"},
                # r6: $let-bound $indexOfCP through the oracle (position
                # of the first underscore replaceAll just wrote)
                "max_us": {"$max": {"$let": {
                    "vars": {"t": "$tag"},
                    "in": {"$indexOfCP": ["$$t", "_"]},
                }}},
                # r7: named-timezone rendering + UTF-8 byte size
                "min_ny": {"$min": "$ny_day"},
                "max_nyh": {"$max": "$ny_hour"},
                "max_bs": {"$max": {"$binarySize": "$tag"}},
            }
        },
    ]
    # split at the $sample: its deterministic TakeOrdered produces ONE
    # partition, which would serialize the whole reshape+rollup onto
    # one core — re-spread the 200-doc sample before the expression
    # stages (stage composition is associative, semantics unchanged)
    from topic_store_spark.operators.util import ensure_parallelism

    sampled = ensure_parallelism(apply_pipeline(orders, pipeline[:2]))
    return apply_pipeline(sampled, pipeline[2:]).select(
        "_id", "n", "max_tot", "n_urgent", "max_tag", "min_age", "min_qtr",
        "max_us", "min_ny", "max_nyh", "max_bs",
    )


def q_mongo_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: $facet — two sub-pipelines over the same input collapsed into
    one summary row via $size / $arrayElemAt.  The $sortByCount branch
    (count desc, key asc — Mongo's deterministic order) also surfaces
    its top element, so the stage's ORDERING is driver-checked, not just
    its cardinality."""
    from topic_store_spark.query.pipeline import apply_pipeline

    events = _t(spark, sf_dir, "events")
    pipeline = [
        {
            "$facet": {
                "by_type": [{"$sortByCount": "$event_type"}],
                "high": [
                    {"$match": {"value": {"$gt": 400.0}}},
                    {"$count": "n"},
                ],
            }
        },
        {
            "$project": {
                "n_types": {"$size": "$by_type"},
                "n_high": {"$arrayElemAt": ["$high.n", 0]},
                "top_type": {"$arrayElemAt": ["$by_type._id", 0]},
                "top_type_n": {"$arrayElemAt": ["$by_type.count", 0]},
            }
        },
    ]
    return apply_pipeline(events, pipeline)


def q_mongo_graph_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: $graphLookup — ancestor closure over the halving hierarchy
    (parent = floor(doc_id / 2)), maxDepth 3, with a self-loop at the
    root exercising the cycle guard.  One distributed equi-join per
    depth level over DISTINCT start keys; oracle is a recursive CTE."""
    from topic_store_spark.query.pipeline import apply_pipeline

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    base = apply_pipeline(
        docs,
        [{"$addFields": {"parent": {"$floor": {"$divide": ["$doc_id", 2]}}}}],
    )
    pipeline = [
        {
            "$graphLookup": {
                "from": "base",
                "startWith": "$parent",
                "connectFromField": "parent",
                "connectToField": "doc_id",
                "as": "ancestry",
                "maxDepth": 3,
            }
        },
        {
            "$project": {
                "doc_id": 1,
                "n_anc": {"$size": "$ancestry"},
                "min_anc": {"$arrayElemAt": ["$ancestry.doc_id", 0]},
                "max_anc": {"$arrayElemAt": ["$ancestry.doc_id", -1]},
            }
        },
    ]
    return apply_pipeline(base, pipeline, tables={"base": base}).select(
        "doc_id", "n_anc", "min_anc", "max_anc"
    )


def q_mongo_fill_telemetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: $fill — telemetry gap repair.  Every 5th reading is nulled,
    then repaired two ways in one pass: locf (last observation carried
    forward) and linear interpolation against the numeric sort key.
    Two WindowExec passes over one exchange on user_id; interpolation
    arithmetic uses identical operand order in both engines so the
    doubles hash identically."""
    from topic_store_spark.query.pipeline import apply_pipeline

    events = _t(spark, sf_dir, "events")
    gap = {
        "$cond": [
            {"$eq": [{"$mod": ["$event_id", 5]}, 0]},
            None,
            "$value",
        ]
    }
    pipeline = [
        {"$addFields": {"v_locf": gap, "v_lin": gap}},
        {
            "$fill": {
                "partitionBy": "$user_id",
                "sortBy": {"event_id": 1},
                "output": {
                    "v_locf": {"method": "locf"},
                    "v_lin": {"method": "linear"},
                },
            }
        },
    ]
    return apply_pipeline(events, pipeline).select(
        "user_id", "event_id", "v_locf", "v_lin"
    )


def q_mongo_densify_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: $densify + $fill — complete per-language token histogram:
    group into width-8 buckets, add filler docs for the empty buckets
    over the full global range, zero-fill their counts.  The grid is
    (range/step) x languages rows — the anti-join keys on (lang,
    bucket) and the union appends a tiny relation."""
    from topic_store_spark.query.pipeline import apply_pipeline

    docs = _t(spark, sf_dir, "documents")
    pipeline = [
        {
            "$project": {
                "lang": 1,
                "bucket": {
                    "$multiply": [
                        {
                            "$floor": {
                                "$divide": [
                                    {"$size": {"$split": ["$text", " "]}},
                                    8,
                                ]
                            }
                        },
                        8,
                    ]
                },
            }
        },
        {"$group": {"_id": {"lang": "$lang", "bucket": "$bucket"}, "n": {"$sum": 1}}},
        {
            "$densify": {
                "field": "bucket",
                "partitionByFields": ["lang"],
                "range": {"step": 8, "bounds": "full"},
            }
        },
        {"$fill": {"output": {"n": {"value": 0}}}},
    ]
    return apply_pipeline(docs, pipeline).select("lang", "bucket", "n")


def q_store_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9/F10/F12 composite scalar report, one tagged union: JSON-decoded
    props rollup per event type, corpus size accounting per source, and
    credential-masked URIs — the reference's scalar-function surface
    (redaction convert.py:254-259, size accounting, JSON codec) in one
    driver row."""
    from topic_store_spark.functions.scalars import redact_uri

    events = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    js = events.groupBy("event_type").agg(
        F.sum(k).alias("k_sum"),
        F.max(k).alias("k_max"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        F.lit("json").alias("probe"),
        F.col("event_type").alias("key"),
        F.col("k_sum").alias("v1"),
        F.col("k_max").alias("v2"),
        F.col("n").alias("v3"),
        F.lit(None).cast("long").alias("v4"),
        F.lit(None).cast("string").alias("uri"),
        F.lit(None).cast("string").alias("redacted"),
    )
    docs = _t(spark, sf_dir, "documents")
    size = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.octet_length("text")).alias("total_bytes"),
        F.max(F.octet_length("text")).alias("max_bytes"),
    ).select(
        F.lit("size").alias("probe"),
        F.col("source").alias("key"),
        F.col("n_docs").alias("v1"),
        F.col("total_chars").alias("v2"),
        F.col("total_bytes").alias("v3"),
        F.col("max_bytes").alias("v4"),
        F.lit(None).cast("string").alias("uri"),
        F.lit(None).cast("string").alias("redacted"),
    )
    uri = F.concat(
        F.lit("mongodb://user"),
        F.col("user_id").cast("string"),
        F.lit(":secret@db.example.com/"),
        F.col("event_type"),
    )
    red = events.filter(F.col("event_id") < 500).select(
        F.lit("redact").alias("probe"),
        F.col("event_id").cast("string").alias("key"),
        F.lit(None).cast("long").alias("v1"),
        F.lit(None).cast("long").alias("v2"),
        F.lit(None).cast("long").alias("v3"),
        F.lit(None).cast("long").alias("v4"),
        uri.alias("uri"),
        redact_uri(uri).alias("redacted"),
    )
    return js.unionByName(size).unionByName(red)


def q_objectid_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3/F4 + A2/A3: mint deterministic ObjectIds (time prefix + md5
    payload), recover generation time, and build the per-session summary
    the reference derives from ObjectId.generation_time
    (database.py:258-266) — one groupBy, no N+1."""
    from topic_store_spark.objectid import generation_time, object_id_col

    events = _t(spark, sf_dir, "events")
    with_id = events.select(
        "user_id",
        object_id_col(
            ts_col=_epoch_sec(events),
            key_col=F.col("event_id"),
        ).alias("_id"),
    )
    return with_id.groupBy(F.col("user_id").alias("session")).agg(
        F.count(F.lit(1)).alias("count"),
        F.min(generation_time(F.col("_id"))).alias("first_seen"),
        F.date_format(
            F.min(generation_time(F.col("_id"))), "dd-MM-yyyy HH:mm:ss"
        ).alias("date_collected"),
        F.min("_id").alias("min_id"),
    )


def q_mongo_legacy_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: the reference's legacy session pipeline (database.py:243-256)
    run verbatim through the pipeline dialect — $match($exists) ->
    $group -> $project with $dateFromParts($year..$second) applied to
    ObjectId generation time.  $first is order-dependent, so the
    deterministic $min stands in for it."""
    from topic_store_spark.objectid import object_id_col
    from topic_store_spark.query.pipeline import apply_pipeline

    events = _t(spark, sf_dir, "events")
    docs = events.select(
        object_id_col(
            ts_col=_epoch_sec(events),
            key_col=F.col("event_id"),
        ).alias("_id"),
        F.struct(
            F.col("user_id").cast("string").alias("session"),
            _epoch_sec(events).alias("sys_time"),
        ).alias("_ts_meta"),
    )
    pipeline = [
        {"$match": {"_ts_meta.session": {"$exists": True}}},
        {
            "$group": {
                "_id": {"session": "$_ts_meta.session"},
                "count": {"$sum": 1},
                "sys_time": {"$min": "$_ts_meta.sys_time"},
                "min_id": {"$min": "$_id"},
            }
        },
        {
            "$project": {
                "session": 1,
                "count": 1,
                "sys_time": 1,
                "date_collected": {
                    "$dateFromParts": {
                        "year": {"$year": "$min_id"},
                        "month": {"$month": "$min_id"},
                        "day": {"$dayOfMonth": "$min_id"},
                        "hour": {"$hour": "$min_id"},
                        "minute": {"$minute": "$min_id"},
                        "second": {"$second": "$min_id"},
                    }
                },
            }
        },
    ]
    return apply_pipeline(docs, pipeline).select(
        "session", "count", "sys_time", "date_collected"
    )


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-cleaning composite: (a) corpus-curation PII pass —
    emails/IPv4/phone-shaped runs masked + per-class audit counts, PII
    injected deterministically from doc fields so the oracle sees
    byte-identical input, patterns alternation-free so Java regex and
    RE2 agree (functions/text.py PII_PATTERNS); (b) HTML -> text
    extraction (functions/html.py) — each doc wrapped in deterministic
    markup (tags, script block, entities) and stripped back by the pure
    codegen regexp_replace chain, RE2-safe so the oracle runs the
    IDENTICAL patterns (html_to_text_sql)."""
    from topic_store_spark.functions.html import html_to_text
    from topic_store_spark.functions.text import pii_counts, redact_pii
    from topic_store_spark.operators.util import ensure_parallelism

    # regex redaction + HTML stripping are CPU-bound per-row work; a
    # single-file corpus must not run them on one core (plan-audit
    # parallelism advisory)
    docs = ensure_parallelism(
        _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    )
    pii = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".1 tel +1 (555) 010-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    counts = pii_counts(pii)
    html = F.concat(
        F.lit('<html><head><style>p{}</style><script>var x="<p>";</script>'
              "</head><body><h1>Doc &amp; "),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit('</p><ul><li>lang&nbsp;'),
        F.col("lang"),
        F.lit("</li></ul><!-- tail --></body></html>"),
    )
    return docs.select(
        "doc_id",
        redact_pii(pii).alias("redacted"),
        counts["n_emails"].alias("n_emails"),
        counts["n_ips"].alias("n_ips"),
        html_to_text(html).alias("extracted"),
    )


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: near-dup pairs of a NEW batch (the
    near-dup clones) against the standing corpus (the originals) —
    (new x corpus) + (new x new) candidates only, the corpus never
    self-joins (operators/dedup.py minhash_lsh_pairs_incremental)."""
    from topic_store_spark.operators.dedup import minhash_lsh_pairs_incremental

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # the batch is 10% of the corpus — the production asymmetry.  (With
    # a batch as large as the corpus a Bloom filter of its bands keeps
    # ~everything and the prefilter is pure overhead; at 10% it drops
    # ~90% of the corpus band relation map-side.)
    new_batch = docs.filter(F.col("doc_id") % 10 == 3).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" qq ww")).alias("text"),
    )
    # bloom_prefilter stays OFF here by cost model, not capability: the
    # IN-LINE operator must compute corpus signatures from text either
    # way, so a Bloom can only prune the (cheap) band-join input — pure
    # added jobs.  The prefilter pays when corpus bands are READ, not
    # computed: MinHashIndex.query (operators/index.py) runs it against
    # the persisted index by default, and test_bloom/test_index prove
    # results are bit-identical with it on or off.
    return minhash_lsh_pairs_incremental(
        new_batch, docs, n=3, num_perm=12, bands=4,
        threshold_num=8, threshold_den=10,
    )


def q_id_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 + J1/J2 composite, one tagged union: the id-set DIFFERENCE
    (users with a big purchase but no comparably big signup —
    ``subtract`` compiles to a hash left-anti aggregate) and the
    incremental-clone ANTI-JOIN (customers with no finished 1995 order —
    left_anti replaces the reference's $nin id-list + 15MB fallback,
    convert.py:72)."""
    events = _t(spark, sf_dir, "events")
    left = events.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 80.0)
    ).select("user_id")
    right = events.filter(
        (F.col("event_type") == "signup") & (F.col("value") > 80.0)
    ).select("user_id")
    exc = left.subtract(right).select(
        F.lit("except").alias("part"),
        F.col("user_id").alias("k"),
        F.lit(None).cast("string").alias("name"),
        F.lit(None).cast("string").alias("segment"),
    )
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "F")
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    anti = customer.join(
        orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
    ).select(
        F.lit("anti").alias("part"),
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
    )
    return exc.unionByName(anti)


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: inverted lists by nearest centroid, nprobe=2 probing —
    the bucketed scale path with a full SQL oracle (unlike the
    hyperplane-LSH variant)."""
    from topic_store_spark.operators.similarity import ivf_ann_neighbors

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_ann_neighbors(
        emb,
        queries=emb.filter(F.col("vec_id") < 10),
        centroids=emb.filter(F.col("vec_id") < 8),
        k=5,
        nprobe=2,
    )


def q_session_rollup_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A3 + F5 via the skew-resilient path: the reference's per-session
    metadata summary (one groupBy replacing its N+1 distinct+count round
    trips, database.py:258-266) computed through the two-phase SALTED
    aggregation (operators/skew.py) — result-identical to a direct
    groupBy for algebraic aggregates, so the oracle is the plain GROUP
    BY; the salting is physical-plan insurance against hot sessions."""
    from topic_store_spark.operators.skew import salted_aggregate

    events = _t(spark, sf_dir, "events")
    milli = F.round(F.col("value") * 1000).cast("long")
    prepared = events.select(
        F.col("user_id").alias("session"), F.col("ts"), milli.alias("milli")
    )
    rolled = salted_aggregate(
        prepared,
        ["session"],
        {
            "count": ("count", "*"),
            "first_ts": ("min", "ts"),
            "last_ts": ("max", "ts"),
            "milli_sum": ("sum", "milli"),
            "milli_max": ("max", "milli"),
        },
        salt_buckets=8,
    )
    return rolled.select(
        "session",
        "count",
        "first_ts",
        "last_ts",
        F.date_format(F.col("first_ts"), "dd-MM-yyyy HH:mm:ss").alias(
            "date_collected"
        ),
        "milli_sum",
        "milli_max",
    )


def q_multimodal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal normal form: opaque binary payload + typed metadata
    struct (media_type/size/sha256) — here the payload is the utf-8 bytes
    of text so the oracle can reproduce it; the same plumbing wraps
    image/audio bytes (multimodal/binary.py)."""
    from topic_store_spark.multimodal.binary import attach_binary_metadata
    from topic_store_spark.operators.util import ensure_parallelism

    # sha256 over every payload is CPU-bound Arrow work; spread a
    # single-file corpus across cores (plan-audit parallelism advisory)
    docs = ensure_parallelism(_t(spark, sf_dir, "documents"))
    payload = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    with_meta = attach_binary_metadata(payload, "payload", media_type="text")
    return with_meta.select(
        "doc_id",
        F.col("payload_meta.media_type").alias("media_type"),
        F.col("payload_meta.size_bytes").alias("size_bytes"),
        F.col("payload_meta.sha256").alias("sha256"),
        F.ceil(F.col("payload_meta.size_bytes") / 256).alias("n_chunks"),
    )


#: one Z-ordered copy of the events table per (session, sf_dir) — the
#: layout job a pipeline runs once and amortizes over every later
#: multi-predicate scan (operators/zorder.py cost model).
_ZORDER_EVENTS_MEMO: dict = {}

_SESSION_TMPDIRS: list = []


def _session_tmpdir(prefix: str) -> str:
    """mkdtemp registered for atexit removal — memoized parquet
    artifacts (z-order copy, minhash pair index) must not accumulate one
    copy per process lifetime on shared hosts."""
    import atexit
    import shutil
    import tempfile

    path = tempfile.mkdtemp(prefix=prefix)
    if not _SESSION_TMPDIRS:
        atexit.register(
            lambda: [
                shutil.rmtree(p, ignore_errors=True) for p in _SESSION_TMPDIRS
            ]
        )
    _SESSION_TMPDIRS.append(path)
    return path


def _zordered_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events re-written Z-ORDERED on (user_id, value): bit-interleaved
    quantile-bucketed Morton codes, range-partitioned into 16 files
    (operators/zorder.py write_zordered).  Row content is identical to
    the source table — only the LAYOUT changes — so any query over the
    copy keeps its plain-`events` oracle, while two-predicate range
    probes skip most files on min-max stats (measured footer evidence:
    COVERAGE.md 'Z-order scan pruning')."""
    key = (spark.sparkContext.applicationId, sf_dir)
    path = _ZORDER_EVENTS_MEMO.get(key)
    if path is None:
        from topic_store_spark.operators.zorder import write_zordered

        path = _session_tmpdir("tss_zorder_events_")
        write_zordered(
            _t(spark, sf_dir, "events"), path, ["user_id", "value"],
            bits=8, num_files=16,
        )
        _ZORDER_EVENTS_MEMO[key] = path
    return spark.read.parquet(path)


def q_orders_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O3/A1 composite probe set (+ Z-order layout proof), one tagged
    result: the top-100 orders by price (sort+limit =>
    TakeOrderedAndProject, no full sort), an exact count under a
    compiled find predicate, a find_by_id point lookup, and a
    TWO-PREDICATE range probe over the Z-ORDERED events copy
    (`_zordered_events`) — the scan-pruning layout `write_zordered`
    exists for, kept oracle-green because z-ordering changes layout,
    never content.  Each branch keeps its own scan with its own pushed
    filter; the union is four tiny relations."""
    from topic_store_spark.query.compiler import compile_query

    orders = _t(spark, sf_dir, "orders")
    topk = (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select(
            F.lit("topk").alias("probe"),
            F.col("o_orderkey").alias("k"),
            F.col("o_totalprice").cast("double").alias("v"),
        )
    )
    li = _t(spark, sf_dir, "lineitem")
    cnt_q = {"l_quantity": {"$gte": 30.0}, "l_returnflag": {"$ne": "A"}}
    cnt = (
        li.filter(compile_query(cnt_q, li.schema))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.lit("count").alias("probe"),
            F.col("cnt").alias("k"),
            F.col("cnt").cast("double").alias("v"),
        )
    )
    events = _t(spark, sf_dir, "events")
    point = events.filter(compile_query({"event_id": 4242}, events.schema)).select(
        F.lit("point").alias("probe"),
        F.col("event_id").alias("k"),
        F.col("value").cast("double").alias("v"),
    )
    zev = _zordered_events(spark, sf_dir)
    zprobe = (
        zev.filter(
            F.col("user_id").between(40, 60)
            & F.col("value").between(100.0, 200.0)
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.max("value").alias("mx"),
        )
        .select(
            F.lit("zorder").alias("probe"),
            F.col("cnt").alias("k"),
            F.col("mx").cast("double").alias("v"),
        )
    )
    return topk.unionByName(cnt).unionByName(point).unionByName(zprobe)


# ---------------------------------------------------------------------------
# Reference parity: joins / sorts / sessions (SURVEY §2.4-2.6)
# ---------------------------------------------------------------------------

def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag + running sum of
    session-start flags, then per-session rollup."""
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_sec = _epoch_sec(events)
    prev = F.lag(ts_sec).over(w)
    flagged = events.withColumn(
        "is_new", F.when(prev.isNull() | (ts_sec - prev > 1800.0), 1).otherwise(0)
    ).withColumn(
        "session_seq",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return flagged.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
    )


# ---------------------------------------------------------------------------
# Reference parity: streaming ops, batch form (SURVEY §2.10 T5/T8/T9)
# ---------------------------------------------------------------------------

def q_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 + temporal-join composite, one tagged union of the three
    temporal primitives: the latest-value snapshot per topic
    (event_type = topic); the backward AS-OF join — every click event
    annotated with the user's latest purchase value at-or-before its
    timestamp (operators/asof.py: tag-union + one keyed window pass,
    the merge-join shape — never a range cross join); and the INTERVAL
    join — every click landing inside a same-user [purchase,
    purchase+4h) attribution window, summed per click
    (operators/interval.py: bin-and-equi-join decomposition, one hash
    shuffle — never a per-key cross product).  The DuckDB oracle uses
    its NATIVE ASOF JOIN (partitioned search) and IEJoin range join, so
    both engines verify the semantics via independent algorithms."""
    from topic_store_spark.operators.asof import asof_join
    from topic_store_spark.operators.interval import interval_join
    from topic_store_spark.operators.snapshot import latest_snapshot

    events = _t(spark, sf_dir, "events")
    latest = latest_snapshot(
        events, key_col="event_type", ts_col="ts", tie_col="event_id"
    ).select(
        F.lit("latest").alias("part"),
        F.col("event_id").alias("k"),
        F.col("ts"),
        F.col("event_type").alias("key"),
        F.col("value").cast("double").alias("v"),
    )
    if ASOF_SHARED_STAGE:
        # r14 (guide §2.4, VERDICT r13 item 5): the asof and interval
        # branches read the SAME two event subsets, both keyed on
        # user_id — stage each ONCE, hash(user_id)-partitioned, persist,
        # and finalize the cached plan so every consumer inherits the
        # partitioning: the asof quote-dedup groupBy (user_id, ts), the
        # asof union window (user_id), the interval bin equi-join
        # (user_id, _iv_bin) and the per-click sum (event_id, user_id,
        # ts) all cluster on supersets of user_id, so none plans its
        # own exchange.  Two staging exchanges replace four
        # branch-local ones (six at scale, where the bin join cannot
        # broadcast), and events is scanned twice instead of four
        # times.  Row values are untouched — repartition + persist are
        # row-preserving — so the oracle is unchanged.
        from topic_store_spark.operators.util import (
            expose_cached_partitioning,
            hash_partition,
            persist_tracked,
        )

        clicks_staged = expose_cached_partitioning(
            persist_tracked(
                hash_partition(
                    events.filter(F.col("event_type") == "click").select(
                        "event_id", "user_id", "ts",
                        _epoch_sec(events).alias("ts_sec"),
                    ),
                    "user_id",
                )
            )
        )
        purchases_staged = expose_cached_partitioning(
            persist_tracked(
                hash_partition(
                    events.filter(F.col("event_type") == "purchase").select(
                        "user_id", "ts", "value", "event_id",
                        _epoch_sec(events).alias("ts_sec"),
                    ),
                    "user_id",
                )
            )
        )
        probes = clicks_staged.select("event_id", "user_id", "ts")
        quotes = purchases_staged.select("user_id", "ts", "value", "event_id")
    else:
        probes = events.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        quotes = events.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "value", "event_id"
        )
    joined = asof_join(
        probes, quotes, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["value"], tie_col="event_id",
    )
    asof_part = joined.select(
        F.lit("asof").alias("part"),
        F.col("event_id").alias("k"),
        F.col("ts"),
        F.col("user_id").cast("string").alias("key"),
        F.col("asof_value").cast("double").alias("v"),
    )
    if ASOF_SHARED_STAGE:
        clicks = clicks_staged
        wins = purchases_staged.select(
            "user_id",
            F.col("ts_sec").alias("w_start"),
            (F.col("ts_sec") + 14400.0).alias("w_end"),
            F.round(F.col("value") * 1000).cast("long").alias("w_milli"),
        )
    else:
        clicks = events.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts", _epoch_sec(events).alias("ts_sec")
        )
        wins = events.filter(F.col("event_type") == "purchase").select(
            "user_id",
            _epoch_sec(events).alias("w_start"),
            (_epoch_sec(events) + 14400.0).alias("w_end"),
            F.round(F.col("value") * 1000).cast("long").alias("w_milli"),
        )
    iv = interval_join(
        clicks, wins, on="user_id", left_ts="ts_sec",
        right_start="w_start", right_end="w_end", bin_width=3600.0,
    )
    # quantize-then-sum: the per-click attribution total stays derivable
    # as an exact integer regardless of float summation order
    iv_part = (
        iv.groupBy("event_id", "user_id", "ts")
        .agg(F.sum("w_milli").alias("milli"))
        .select(
            F.lit("interval").alias("part"),
            F.col("event_id").alias("k"),
            F.col("ts"),
            F.col("user_id").cast("string").alias("key"),
            (F.col("milli") / 1000.0).cast("double").alias("v"),
        )
    )
    return latest.unionByName(asof_part).unionByName(iv_part)


def q_windowed_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8/T9: windowed rate/size monitor — hourly count + exact milli-unit
    value sum per topic (quantize-then-sum keeps the double derivable)."""
    events = _t(spark, sf_dir, "events")
    milli = F.round(F.col("value") * 1000).cast("long")
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            F.col("event_type").alias("key"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(milli).alias("value_milli_sum"),
        )
        .withColumn(
            "avg_value", F.col("value_milli_sum") / 1000.0 / F.col("n")
        )
    )


# ---------------------------------------------------------------------------
# Analytics on the TPC-H-ish tables (joins, group-agg at scale)
# ---------------------------------------------------------------------------

def q_tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary (TPC-H Q1 shape): one shuffle, map-side partials,
    exact DECIMAL arithmetic."""
    li = _t(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(18,2)")
    disc_price = _dec("l_extendedprice") * (one - _dec("l_discount"))
    # Sums accumulate in exact DECIMAL; only the OUTPUT is cast to double.
    # Both Spark (BigDecimal.doubleValue) and the DuckDB oracle (via a
    # VARCHAR round-trip, i.e. strtod) round correctly, so the doubles are
    # bit-identical across engines — raw decimal outputs are not, because
    # the driver's pandas canonicalization turns DuckDB's widened
    # DECIMAL(38,s) into float64 while Spark ships Decimal objects.
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn(
            "avg_qty",
            (F.col("sum_qty") / F.col("count_order")),
        )
    )


def q_tpch_q3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority top-10 (TPC-H Q3 shape): broadcast dim filter,
    shuffle join on orderkey, TakeOrderedAndProject."""
    customer = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    one = F.lit(1).cast("decimal(18,2)")
    revenue = _dec("l_extendedprice") * (one - _dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join (TPC-H Q5 shape): all dims broadcast, facts
    never shuffle until the final group."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    one = F.lit(1).cast("decimal(18,2)")
    revenue = _dec("l_extendedprice") * (one - _dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Training-data pipeline: dedup (exact / Jaccard / MinHash-LSH / SimHash /
# embedding-cosine) — each on a corpus with constructed duplicates so the
# result set is non-trivial and oracle-checkable.
# ---------------------------------------------------------------------------

def _docs_with_exact_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    clone = docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    return docs.unionByName(clone)


def _docs_with_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    clone = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" qq ww")).alias("text"),
    )
    return docs.unionByName(clone)


def q_dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup composite: the duplicate-group REPORT (md5 fingerprint
    groupBy — one shuffle on the hash) joined to the materialized
    APPLICATION step (lowest-id survivor per fingerprint) — each kept
    document with the group it survived from."""
    from topic_store_spark.operators.dedup import deduplicate_exact, exact_duplicates

    corpus = _docs_with_exact_dups(spark, sf_dir)
    groups = exact_duplicates(corpus).select(
        "fingerprint",
        "n_docs",
        "keep_id",
        F.array_join("doc_ids", ",").alias("doc_ids_csv"),
    )
    survivors = deduplicate_exact(corpus).select("doc_id", "text")
    return survivors.join(
        groups, survivors["doc_id"] == groups["keep_id"]
    ).select("doc_id", "text", "fingerprint", "n_docs", "doc_ids_csv")


def q_dedup_word_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram overlap screens — exact Jaccard (>= 0.8) and
    near-subset containment (>= 0.9) with per-metric hit flags — run
    through the PREFIX-FILTERED AllPairs/PPJoin plan
    (``prefix_filter=True``: the Jaccard prefix x prefix join unioned
    with the containment-sound smaller-prefix x full join, verified on
    full cap-filtered sets).  This is the plan you'd ship at 100 TB —
    candidates fall to ~(1-t)^2 of the full shingle self-join's and skew
    toward rare shingles — and since r6 it's the one that earns the
    driver CORRECTNESS row; output is bit-identical to the plain capped
    self-join (equality-tested across thresholds), which stays benched
    via the char-gram carrier (`q_dedup_char_jaccard`) so both plan
    families stay visible per round.  Same ``max_shingle_freq``
    stop-shingle cap: boilerplate word-3-grams ("all rights reserved")
    carry quadratic pair fan-out at web scale."""
    from topic_store_spark.operators.dedup import word_overlap_pairs

    corpus = _docs_with_near_dups(spark, sf_dir)
    return word_overlap_pairs(
        corpus, n=3, jaccard_num=8, jaccard_den=10,
        containment_num=9, containment_den=10,
        max_shingle_freq=_CHAR_SHINGLE_FREQ_CAP,
        prefix_filter=True,
    )


#: one verified MinHash pair set per (session, sf_dir): the pair query
#: and the clustering query are two READS of the same artifact, exactly
#: as a production pipeline derives both from one signature/index build
#: (`operators/index.MinHashIndex` is the standing-pipeline form).  The
#: r4 bench showed dedup_clusters re-deriving 16/8 signatures its
#: sibling had just computed at 12/4 — at 100 TB the signature pass
#: dominates, so computing it twice is the one cost a real pipeline
#: would never pay.
_MINHASH_PAIRS_MEMO: dict = {}


def _shared_minhash_pairs(
    spark: SparkSession, sf_dir: str, rebuild: bool = False
) -> DataFrame:
    """Verified near-dup pairs at the permissive 16-perm/8-band scheme
    (2 rows/band: band-collision probability s^2 — near-certain
    candidacy at the 0.8 threshold; measured 100% recall vs the exact
    oracle sf0.001-0.1).

    The BUILD query (`q_dedup_minhash_lsh`) always recomputes and
    MATERIALIZES the pair set to a parquet artifact — so its benched
    time is the true signature/band/verify cost every round, never a
    cache read; the CLUSTER query reuses the standing artifact, the way
    a production pipeline derives clusters from the index it just
    built.  Parquet, not a Spark cache: `bench.py` clears the cache
    between queries, and a real pipeline persists its index to storage,
    not executor memory."""
    key = (spark.sparkContext.applicationId, sf_dir)
    path = _MINHASH_PAIRS_MEMO.get(key)
    if path is None or rebuild:
        from topic_store_spark.operators.dedup import minhash_lsh_pairs

        corpus = _docs_with_near_dups(spark, sf_dir)
        pairs = minhash_lsh_pairs(
            corpus, n=3, num_perm=16, bands=8,
            threshold_num=8, threshold_den=10,
        )
        if path is None:
            path = _session_tmpdir("tss_minhash_pairs_")
        pairs.write.mode("overwrite").parquet(path)
        _MINHASH_PAIRS_MEMO[key] = path
    return spark.read.parquet(path)


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) -> 8-band LSH candidates -> exact-Jaccard verify.
    The scale path: candidate generation is a band-bucket equi-join.
    This is the index BUILD query — it always pays the full
    signature/band/verify cost and materializes the pair artifact that
    `q_dedup_clusters` derives clusters from (`_shared_minhash_pairs`).
    The returned relation is the artifact RE-READ (tiny single-file
    parquet -> one partition); re-spread it so downstream consumers of
    the pair set start parallel."""
    from topic_store_spark.operators.util import ensure_parallelism

    return ensure_parallelism(_shared_minhash_pairs(spark, sf_dir, rebuild=True))


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup CLUSTERING: near-dup pairs -> connected components
    (min-label propagation) -> one row per duplicate group with its
    members.  The step that turns pairwise hits into "keep one document
    per group" in a training-data pipeline.  Pairs come from the scale
    path (MinHash band candidates, exact-Jaccard verified); the oracle is
    ground truth — a DuckDB recursive CTE computing min-reachable-id over
    the EXACT Jaccard pair relation, the same fixpoint the propagation
    converges to.  Pairs come from the SHARED permissive 16-perm/8-band
    pair set (`_shared_minhash_pairs` — ONE signature/band/verify pass
    serves both this carrier and `q_dedup_minhash_lsh`, the way a
    production pipeline derives pairs and clusters from one standing
    index; 2 rows per band: band-collision probability s^2 per band for
    similarity s — near-certain candidacy at the 0.8 threshold);
    measured 100% recall vs the exact oracle at sf0.001 THROUGH sf0.1,
    where the narrower 12/4 scheme dropped two borderline pairs at
    sf0.001.  Banding only ever DROPS exact-verified pairs, so the
    Spark result is always a refinement of the oracle fixpoint, never
    an invention."""
    from topic_store_spark.operators.dedup import connected_components

    pairs = _shared_minhash_pairs(spark, sf_dir)
    labels = connected_components(pairs)
    members = F.array_sort(F.collect_list("node"))
    return labels.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.array_join(
            F.transform(members, lambda x: x.cast("string")), ","
        ).alias("members_csv"),
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(32-bit) band candidates, Hamming <= 3 verified."""
    from topic_store_spark.operators.dedup import simhash_pairs

    corpus = _docs_with_exact_dups(spark, sf_dir)
    return simhash_pairs(corpus, bits=32, band_bits=8, max_hamming=3)


def q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs, scale path (the PRIMARY carrier since
    r4 — the exact O(n^2) baseline ``embedding_dup_pairs`` is guarded
    behind a max-input check and exercised in tests only):
    hyperplane-bucket candidates (pair space / 2^8) then the exact
    quantized-cosine threshold."""
    from topic_store_spark.operators.dedup import embedding_dup_pairs_lsh

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    clone = emb.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    both = emb.unionByName(clone)
    return embedding_dup_pairs_lsh(both, threshold_num=95, threshold_den=100)


def q_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact-substring dedup (ExactSubstr-shaped): corpus
    = documents + token-SUFFIX clones (each clone drops the original's
    first 5 tokens), so every original shares an exact >=20-token
    substring with its clone without being a whole-document duplicate —
    the case doc-level dedup misses and span-level dedup exists for.
    Emits the merged maximal duplicated spans per document
    (operators/dedup.py duplicated_spans)."""
    from topic_store_spark.functions.text import tokens
    from topic_store_spark.operators.dedup import duplicated_spans

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    tk = docs.select("doc_id", tokens(F.col("text")).alias("_tk"))
    clone = tk.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.array_join(F.slice("_tk", 6, 1000000), " ").alias("text"),
    )
    corpus = docs.unionByName(clone)
    return duplicated_spans(corpus, window=20, min_occurrences=2)


def q_dedup_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level paragraph dedup (FineWeb-recipe): a two-paragraph
    corpus where each body paragraph appears in exactly two documents
    (XOR-partner construction) plus a corpus-wide boilerplate footer —
    the keep-first-occurrence rule must retain each paragraph exactly
    once and strip the footer everywhere but document 0
    (operators/dedup.py paragraph_dedup)."""
    from topic_store_spark.functions.text import tokens
    from topic_store_spark.operators.dedup import paragraph_dedup

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    tk = docs.select("doc_id", tokens(F.col("text")).alias("_tk"))
    p = tk.select(
        "doc_id", F.array_join(F.slice("_tk", 1, 10), " ").alias("para")
    )
    a = p.alias("a")
    b = p.alias("b")
    corpus = a.join(
        b, F.col("b.doc_id") == F.col("a.doc_id").bitwiseXOR(F.lit(1))
    ).select(
        F.col("a.doc_id").alias("doc_id"),
        F.concat(
            F.col("a.para"),
            F.lit("\n\n"),
            F.col("b.para"),
            F.lit("\n\n"),
            F.lit("shared footer boilerplate"),
        ).alias("text"),
    )
    return paragraph_dedup(corpus)


# ---------------------------------------------------------------------------
# Training-data pipeline: similarity search
# ---------------------------------------------------------------------------

def q_ann_topk_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for 10 query vectors via BOTH
    physical strategies, tagged and unioned: the per-query TopK window
    (broadcast queries, corpus never shuffles) and the PARTIAL top-k
    aggregation (each scan partition reduces to a local top-k map-side,
    so only Q x partitions x k candidate rows shuffle).  The two halves
    are result-identical by construction — the oracle is the same
    relation twice, which IS the cross-plan equivalence check."""
    from topic_store_spark.operators.similarity import (
        topk_neighbors,
        topk_neighbors_partial,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    win = topk_neighbors(emb, queries, k=5).withColumn("variant", F.lit("window"))
    par = topk_neighbors_partial(emb, queries, k=5).withColumn(
        "variant", F.lit("partial")
    )
    return win.unionByName(par)


def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN in the RESIDUAL (IVF-ADC, Jégou et al. 2011) form:
    coarse inverted lists (8 centroids, nprobe=2), each vector
    PQ-encoded as its residual to its assigned centroid, queries scored
    through a per-(query, probed-list) LUT built from the query's
    residual — 32x16 codes (2-d subspaces, the production dimension
    split: RECALL.md's clustered sweep shows m=32 holding >=0.8x of
    plain IVF's recall) instead of the 64-cell vector (the 100 TB
    memory story).  Codebooks derive deterministically from the first 16
    vectors' RESIDUALS (operators/similarity.py ivf_residual_vectors +
    pq_codebooks; the k-means trainer is the pytest-covered production
    path), and residual subtraction happens on the integer grid, so the
    argmin encoding and integer ADC sums reproduce exactly in the DuckDB
    oracle."""
    from topic_store_spark.operators.similarity import (
        ivf_pq_ann_neighbors,
        ivf_residual_vectors,
        opq_permuted_codebooks,
        permute_vectors,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cen = emb.filter(F.col("vec_id") < 8)
    # r8: OPQ-lite learned rotation rides the carrier — a
    # variance-balanced dimension PERMUTATION (exactly orthogonal,
    # integer-exact, so the rotated encoding reproduces bit-for-bit in
    # DuckDB where the float Procrustes rotation could not).  IVF
    # assignment is permutation-invariant; only the subspace split (and
    # hence codebooks/codes/ADC) changes — the OPQ effect.
    # r13: ONE bounded collect derives both the permutation and the
    # permuted-residual codebooks (opq_permuted_codebooks) — the
    # composed variance_balanced_permutation + pq_codebooks form ran
    # TWO eager residual-pipeline driver jobs per DataFrame build.
    # Exactly equal by the permutation-commutes argument pinned in
    # tests/test_dedup_similarity.py::test_opq_fused_codebooks_equal_composed.
    # similarity.FUSED_OPQ=False restores the composed build for
    # `ab_bench.py opqfuse:ann_pq` interleaved receipts.
    import topic_store_spark.operators.similarity as _sim

    src = ivf_residual_vectors(emb.filter(F.col("vec_id") < 16), cen)
    if _sim.FUSED_OPQ:
        perm, books = opq_permuted_codebooks(src, m=32)
        emb_p = permute_vectors(emb, perm)
        cen_p = emb_p.filter(F.col("vec_id") < 8)
    else:
        from topic_store_spark.operators.similarity import (
            pq_codebooks,
            variance_balanced_permutation,
        )

        perm = variance_balanced_permutation(src)
        emb_p = permute_vectors(emb, perm)
        cen_p = emb_p.filter(F.col("vec_id") < 8)
        src_p = ivf_residual_vectors(emb_p.filter(F.col("vec_id") < 16), cen_p)
        books = pq_codebooks(src_p, m=32)
    return ivf_pq_ann_neighbors(
        emb_p,
        queries=emb_p.filter(F.col("vec_id") < 10),
        centroids=cen_p,
        codebooks=books,
        k=5,
        nprobe=2,
        residual=True,
    )


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via random-hyperplane LSH buckets (the 100 TB
    plan: bucket-key equi-join instead of a cross join), TWO tagged
    variants: the plain own-bucket probe and the r6 quality-aware
    MULTI-PROBE (probes=4: also join the three buckets reached by
    flipping the query's smallest-margin sign bits — Lu et al. 2007,
    ~3-5x measured recall at the same planes, RECALL.md).  Oracle-checked
    end to end: the md5-derived hyperplane weights, the left-fold
    projection sums, AND the margin ordering + bit-flip probe-key
    derivation are reproduced exactly in DuckDB (identical operand order
    => identical IEEE doubles => identical signs, margins, and probe
    sets)."""
    from topic_store_spark.operators.similarity import lsh_ann_neighbors

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    single = lsh_ann_neighbors(emb, queries, k=5, planes=8).withColumn(
        "variant", F.lit("single")
    )
    multi = lsh_ann_neighbors(
        emb, queries, k=5, planes=8, probes=4
    ).withColumn("variant", F.lit("multiprobe"))
    return single.unionByName(multi)


# ---------------------------------------------------------------------------
# Training-data pipeline: text analysis
# ---------------------------------------------------------------------------

#: Hot-key cap for the char-shingle self-join: shingles in more than
#: this many docs are stop-shingles — dropped from BOTH numerator and
#: denominator (metrics are exact in the filtered universe).  An
#: ABSOLUTE cap is the scale guarantee: per-shingle pair work is bounded
#: by cap^2 no matter the corpus size, where an uncapped join degenerates
#: quadratically (measured 6.2e9 candidate pairs at sf0.1 uncapped vs
#: 2.4e5 with this cap).
_CHAR_SHINGLE_FREQ_CAP = 64


def q_dedup_char_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-5-gram Jaccard pairs >= 0.8 (catches intra-word edits that
    word shingles miss), with the ``max_shingle_freq`` hot-key cap the
    100x plan requires (_CHAR_SHINGLE_FREQ_CAP) AND the AllPairs/PPJoin
    prefix-filtered candidate plan (operators/dedup.py
    _prefix_filtered_pairs): only each doc's ~20% rarest shingles are
    indexed, candidates fall to ~(1-t)^2 of the full self-join's, and
    the exact verify keeps the output bit-identical — so the oracle
    below is the plain full-join SQL."""
    from topic_store_spark.operators.dedup import char_jaccard_pairs

    corpus = _docs_with_near_dups(spark, sf_dir)
    return char_jaccard_pairs(
        corpus, n=5, threshold_num=8, threshold_den=10,
        max_shingle_freq=_CHAR_SHINGLE_FREQ_CAP,
        prefix_filter=True,
    )


def q_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text-analysis profile in one pass: stopword-heuristic
    language ID, quality features + composite score (all JVM-side
    expressions; ratios are divisions of exact integers), the
    Gopher-family intra-doc repetition signals (duplicate-2-gram and
    top-2-gram fractions) joined on doc_id, and (folded from the former
    text_tokens carrier, r4) every per-doc hashing/counting primitive:
    the BPE-ish token count, the order-sensitive rolling-hash
    fingerprint, and the order-insensitive md5 content fingerprint —
    plus (r4) the fastText-shaped hashed-linear classifier score
    (operators/classify.py): unigram+bigram feature hashing folded
    map-side inside codegen, deterministic stub weights, zero extra
    shuffle."""
    from topic_store_spark.functions.hashing import md5_fingerprint, rolling_fingerprint
    from topic_store_spark.functions.text import (
        BULLET_LINE_PATTERN,
        ELLIPSIS_LINE_PATTERN,
        SYMBOL_PATTERN,
        language_id,
        line_array,
        quality_features,
        quality_score,
        shingles_from_tokens,
        sorted_run_stats,
        tokens,
        bpe_token_count,
    )
    from topic_store_spark.operators.classify import hashed_linear_score
    from topic_store_spark.operators.util import ensure_parallelism

    # the expression pipeline is CPU-bound per-row work; a single-file
    # corpus must not serialize ~10 md5s/token onto one core (measured
    # 4.8s -> 1.4s at sf0.1; a no-op at real scale where splits dominate)
    docs = ensure_parallelism(_t(spark, sf_dir, "documents"))
    feats = quality_features(F.col("text"))
    tk = docs.select(
        "doc_id", "text", tokens(F.col("text")).alias("_tk")
    )
    # repetition/line signals are intra-document -> pure row expressions:
    # sort each derived array once, then one linear run-length pass
    # (sorted_run_stats).  r10 replaced the former repetition_stats
    # explode + 2 doc-keyed exchanges + join; the whole carrier is now
    # ONE shuffle-free projection chain over the scan.
    arrs = tk.select(
        "doc_id",
        "text",
        "_tk",
        F.array_sort(shingles_from_tokens(F.col("_tk"), 2)).alias("_s2"),
        F.array_sort(shingles_from_tokens(F.col("_tk"), 5)).alias("_s5"),
        line_array(F.col("text")).alias("_ln"),
    )
    mid = arrs.select(
        "doc_id",
        language_id(F.col("text")).alias("lang_guess"),
        feats["n_chars"].alias("n_chars"),
        feats["n_tokens"].alias("n_tokens"),
        feats["avg_token_len"].alias("avg_token_len"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["alpha_ratio"].alias("alpha_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        quality_score(F.col("text")).alias("quality"),
        bpe_token_count(F.col("text")).alias("n_tokens_bpe"),
        rolling_fingerprint(F.col("_tk")).alias("rolling_hash"),
        md5_fingerprint(F.col("text")).alias("fingerprint"),
        hashed_linear_score(F.col("_tk")).alias("clf_score"),
        F.size("_s2").cast("long").alias("_ng2"),
        sorted_run_stats(F.col("_s2")).alias("_r2"),
        sorted_run_stats(F.col("_s5")).alias("_r5"),
        F.size("_ln").cast("long").alias("n_lines"),
        sorted_run_stats(F.array_sort("_ln")).alias("_rl"),
        F.size(
            F.filter("_ln", lambda l: l.rlike(BULLET_LINE_PATTERN))
        ).cast("long").alias("_nbul"),
        F.size(
            F.filter("_ln", lambda l: l.rlike(ELLIPSIS_LINE_PATTERN))
        ).cast("long").alias("_nell"),
        F.regexp_count(F.col("text"), F.lit(SYMBOL_PATTERN))
        .cast("long").alias("_nsym"),
    )
    zero = F.lit(0.0)
    return mid.select(
        "doc_id", "lang_guess", "n_chars", "n_tokens", "avg_token_len",
        "punct_ratio", "alpha_ratio", "stopword_ratio", "quality",
        "n_tokens_bpe", "rolling_hash", "fingerprint", "clf_score",
        # word-2-gram repetition (count-weighted, the r4 columns)
        F.when(F.col("_ng2") == 0, zero)
        .otherwise(1.0 - F.col("_r2")["n_distinct"] / F.col("_ng2"))
        .alias("dup_frac"),
        F.when(F.col("_ng2") == 0, zero)
        .otherwise(F.col("_r2")["top_freq"] / F.col("_ng2")).alias("top_frac"),
        # Gopher char-weighted: characters covered by the single most
        # repeated 2-gram / by all duplicated 5-grams, over doc chars
        # (occurrences overlap, so >1.0 is possible on degenerate docs)
        F.when(F.col("n_chars") == 0, zero)
        .otherwise(F.col("_r2")["top_chars"] / F.col("n_chars"))
        .alias("top_gram_char_frac"),
        F.when(F.col("n_chars") == 0, zero)
        .otherwise(F.col("_r5")["dup_chars"] / F.col("n_chars"))
        .alias("dup_gram_char_frac"),
        # line-level repetition + layout signals
        "n_lines",
        F.when(F.col("n_lines") == 0, zero)
        .otherwise(1.0 - F.col("_rl")["n_distinct"] / F.col("n_lines"))
        .alias("dup_line_frac"),
        F.when(F.col("_rl")["tot_chars"] == 0, zero)
        .otherwise(F.col("_rl")["dup_chars"] / F.col("_rl")["tot_chars"])
        .alias("dup_line_char_frac"),
        F.when(F.col("n_lines") == 0, zero)
        .otherwise(F.col("_nbul") / F.col("n_lines")).alias("bullet_line_frac"),
        F.when(F.col("n_lines") == 0, zero)
        .otherwise(F.col("_nell") / F.col("n_lines")).alias("ellipsis_line_frac"),
        F.when(F.col("n_tokens") == 0, zero)
        .otherwise(F.col("_nsym") / F.col("n_tokens")).alias("symbol_word_ratio"),
    )


# ---------------------------------------------------------------------------
# Training-data pipeline: corpus curation (contamination / funnel / balance)
# ---------------------------------------------------------------------------

def q_contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination report: documents split by id parity
    into a train corpus and an eval set; per eval doc, the fraction of
    its distinct word-3-grams found anywhere in train.  The eval shingle
    set broadcasts; the train side is scanned once, map-side shingled,
    and never shuffles its full shingle relation."""
    from topic_store_spark.operators.corpus import ngram_contamination

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # eval is 10% of the corpus — the realistic asymmetry (benchmark
    # suites are MBs against a TB-scale train side); the broadcast side
    # must stay small for the plan to be the right one
    train = docs.filter(F.col("doc_id") % 10 != 1)
    eval_df = docs.filter(F.col("doc_id") % 10 == 1)
    return ngram_contamination(train, eval_df, n=3)


def q_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language cleaning funnel (total -> lang-ID agrees -> quality
    gate -> exact-dedup keeper) over a corpus with constructed exact
    duplicates so the keeper stage is non-trivial."""
    from topic_store_spark.operators.corpus import quality_filter_funnel

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    clone = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang"
    )
    corpus = docs.unionByName(clone)
    return quality_filter_funnel(corpus, min_quality=0.5)


def q_domain_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-structure composite, one tagged union: (a) domain
    balancing — top-5 docs per source by quality score (deterministic
    tie-break on doc_id), the per-domain cap of a web-scale corpus
    build, one shuffle on the domain key; (b) EXACT heavy-hitter tokens
    (>= 300 occurrences) via the count-min-sketch-pruned two-pass plan
    (operators/sketch.py) — the first pass shuffles at most depth*width
    partial-aggregated counter rows no matter the corpus size, and the
    CMS's one-sided error makes the pruned exact count identical to the
    oracle's plain GROUP BY ... HAVING."""
    from topic_store_spark.functions.text import tokens
    from topic_store_spark.operators.corpus import domain_topk
    from topic_store_spark.operators.sketch import heavy_hitters

    docs = _t(spark, sf_dir, "documents")
    topk = domain_topk(docs, domain_col="source", k=5).select(
        F.lit("topk").alias("kind"),
        F.col("domain").alias("key"),
        F.col("rank").cast("long").alias("k"),
        F.col("doc_id").cast("long").alias("n"),
        F.col("quality").alias("v"),
    )
    from topic_store_spark.operators.util import ensure_parallelism

    # parallelize BEFORE the explode: a single-file parquet scan would
    # otherwise run the whole token fan-out on one core
    tok = ensure_parallelism(docs).select(
        F.explode(tokens(F.col("text"))).alias("token")
    )
    heavy = heavy_hitters(tok, "token", min_count=300).select(
        F.lit("heavy").alias("kind"),
        F.col("value").alias("key"),
        F.lit(0).cast("long").alias("k"),
        F.col("n").cast("long").alias("n"),
        F.lit(None).cast("double").alias("v"),
    )
    return topk.unionByName(heavy)


def q_corpus_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length planning composite, one tagged union: the
    per-language token-length histogram (width-8 buckets, pure
    partial-aggregate plan) and the exact discrete p50/p90/p99 length
    percentiles (rank-at-ceil(p*n) under a total order — engine-
    unambiguous, no interpolation)."""
    from topic_store_spark.operators.corpus import length_percentiles, token_histogram

    docs = _t(spark, sf_dir, "documents")
    hist = token_histogram(docs, bucket_width=8).select(
        F.lit("bucket").alias("kind"),
        F.col("lang").alias("strata"),
        F.col("bucket_lo").alias("k"),
        F.col("n_docs").alias("v"),
    )
    pct = length_percentiles(docs, percentiles=(50, 90, 99))
    # ONE pass over pct (r12 Exchange diet): the old 4-way union of
    # per-percentile selects duplicated the window+rollup subtree four
    # times in the plan — Catalyst does not share non-cached subtrees
    # across union branches, so the strata exchange executed 4x.  The
    # same four output rows per stratum come from one explode over an
    # inline struct array: 5 at-scale exchanges -> 2 (histogram rollup
    # + one percentile window), oracle rows unchanged.
    def _row(kind: str, k, v):
        return F.struct(
            F.lit(kind).alias("kind"),
            F.col("strata").alias("strata"),
            F.lit(k).cast("long").alias("k"),
            v.cast("long").alias("v"),
        )

    pct_rows = pct.select(
        F.explode(
            F.array(
                _row("p50", 50, F.col("p50")),
                _row("p90", 90, F.col("p90")),
                _row("p99", 99, F.col("p99")),
                _row("n_docs", 0, F.col("n_docs")),
            )
        ).alias("_r")
    ).select("_r.kind", "_r.strata", "_r.k", "_r.v")
    return hist.unionByName(pct_rows)


def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic dedup, one tagged union (r13 carries the
    scale valve into the oracle): (a) ``uncapped`` — broadcast centroid
    assignment into 8 clusters, then within-cluster quantized-cosine
    pairs >= 0.95 (cluster-keyed join — pair space sum(|cluster|^2),
    not n^2); (b) ``capped`` — the same relation under
    ``max_cluster_size=32``: clusters above the cap are
    deterministically sub-split on the first ceil(log2(|c|/32))
    hyperplane SIGN BITS of the quantized vector, so pairs generate
    within a (cluster, sub-bucket) and per-bucket pair space shrinks
    ~quadratically.  This is the fixed-centroid-set regime's safety
    valve: SCALING.md r12 measured the UNCAPPED fixed-k=8 law at 50x
    work on 10x data (sum(|c|^2) blowup); the capped branch is the
    configuration a 100 TB run with a frozen centroid artifact would
    carry.  The sub-split is hash-free and deterministic (md5-derived
    hyperplane weights), hence DuckDB-expressible — the recall trade
    (a near-dup pair straddling a chosen plane is dropped, P(miss)
    ~= 1 - 0.9^bits) is pinned by
    tests/test_dedup_similarity.py::test_semantic_dedup_max_cluster_size_valve;
    (c) ``bucket_audit`` — the capped assignment's per-(cluster,
    sub-bucket) occupancy histogram (operators/dedup.py
    semantic_bucket_audit).  The surviving 0.95-pairs here are all
    exact clones, which co-bucket under ANY sign function — the audit
    branch is what actually certifies the hyperplane sub-bucket keys
    cross-engine (one wrong sign bit on any vector shifts two
    counts).

    Runs through the FUSED ``semantic_dedup_report`` (r13): all three
    branches read ONE persisted assignment, so the corpus is assigned
    and shuffled once instead of once per branch; row-identical to
    the composed three-operator form (pinned by test), which is how
    the oracle states it."""
    from topic_store_spark.operators.dedup import semantic_dedup_report

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    clone = emb.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    both = emb.unionByName(clone)
    cen = emb.filter(F.col("vec_id") < 8)
    return semantic_dedup_report(
        both, centroids=cen, max_cluster_size=32, dim=64
    )


def q_salient_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-relevance composite, one tagged union: (a) per-doc top-3
    salient terms (TF-IDF family, integer-exact ranking: tf desc, df
    asc, term asc), TF/DF rollups with map-side partials + a per-doc
    window top-k; (b) Okapi BM25 scores for a fixed 3-term query
    (operators/corpus.py bm25_scores) — query-term postings filtered
    map-side before any shuffle, per-term contributions rounded to
    milli-units so the per-doc total is an exact integer sum."""
    from topic_store_spark.operators.corpus import bm25_scores, salient_terms

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    sal = salient_terms(docs, k=3).select(
        F.lit("salient").alias("part"),
        "doc",
        F.col("rank").cast("long").alias("rank"),
        "term",
        F.col("tf").cast("long").alias("tf"),
        F.col("df_docs").cast("long").alias("df_docs"),
        F.col("salience").cast("double").alias("v"),
    )
    bm = bm25_scores(docs, ["merge", "window", "shuffle"]).select(
        F.lit("bm25").alias("part"),
        "doc",
        F.col("n_terms_matched").alias("rank"),
        F.lit(None).cast("string").alias("term"),
        F.lit(None).cast("long").alias("tf"),
        F.lit(None).cast("long").alias("df_docs"),
        F.col("bm25_milli").cast("double").alias("v"),
    )
    return sal.unionByName(bm)


def q_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide adjacent-token-pair counts, top-20 — the counting
    step of one BPE merge iteration; partial-aggregated rollup + global
    TakeOrdered top-k (no full sort)."""
    from topic_store_spark.operators.corpus import merge_pair_counts

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return merge_pair_counts(docs, k=20)


def q_sampling_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic-sampling composite, one tagged union (r4 fold of the
    former mixture_sample + split_report carriers): (a) hash-based
    mixture sampling — per-domain keep rates applied as a map-side
    predicate, rolled up per source; (b) the hash-bucket train/val/test
    split audit — assignment is a map-side md5-bucket expression, the
    only shuffle is the tiny (lang, split) rollup; (c) temperature
    (alpha=1/2) mixture flattening — per-stratum ``sqrt(n_min/n_s)``
    keep rates evaluated in SQUARED integer form (decimal(38), no float
    pow/sqrt) so the kept set is engine-exact.  All three decisions are
    RNG-free: re-runs and late shards make identical choices.

    r12: runs through the FUSED ``sampling_report`` operator — all
    three decisions are map-side predicates on the same row, so one
    tagged explode + ONE rollup replaces the three-branch union (two
    corpus scans and two data exchanges instead of four and four);
    row-identical to the composed form (pinned by test)."""
    from topic_store_spark.operators.corpus import sampling_report

    docs = _t(spark, sf_dir, "documents")
    weights = {"src0": 1.0, "src1": 0.25, "src2": 0.5, "src3": 0.75}
    return sampling_report(docs, weights, val_permille=100, test_permille=100)


def q_unigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-quality composite, one tagged union: (a) per-document
    NLL under the corpus's own UNIGRAM LM; (b) NLL under a BIGRAM LM
    with stupid backoff trained on the curated slice (doc_id % 10 == 1)
    and scoring the full corpus — the CCNet shape where unseen bigrams
    genuinely back off (n_backoff counts them).  Both use fixed-point
    milli-nat integer log-probs so distributed sums are exact and
    engine-reproducible (operators/corpus.py unigram_logprob /
    bigram_logprob).

    r10 shuffle/scan diet: the corpus is tokenized ONCE into a
    persisted ``array<string>`` relation shared by BOTH LM branches
    (the operators accept pre-tokenized input) — the r9 plan rebuilt
    its own scan→tokenize chain in each union branch (and the bigram
    branch three more times for the LM-slice counts); at 100 TB those
    are whole extra corpus passes.  MEMORY_AND_DISK so a
    corpus-sized token relation spills instead of evicting.

    r11 Exchange diet: the persisted relation is HASH-PARTITIONED BY
    doc_id (one compact corpus shuffle of (id, token-array) rows,
    inside the shared cache so it happens once for both branches).
    Every downstream doc-keyed aggregation then needs NO exchange:
    hash(doc_id) satisfies the clustered distribution of the
    (doc, term) / (doc, bg) tf rollups (subset key) AND of the final
    per-doc NLL rollups that the broadcast LM joins preserve
    partitioning into — so the four corpus-scale Exchanges the r10
    plan moved (token-partials by (doc,term), bigram-partials by
    (doc,bg), and two per-doc rollups) all collapse into the one
    array-row shuffle.  doc_id is unique, so the hash partitioning
    cannot skew beyond a single document's length.  The remaining
    at-scale Exchanges are vocabulary-side only (term/bg/first-word
    rollups derived from already-aggregated relations —
    operators/corpus.py r11).

    r13 Exchange diet: the r11 design assumed the cache's hash(doc_id)
    partitioning was visible downstream, but under Spark 4 a cached
    plan reports UNKNOWN partitioning until its own AQE plan finalizes
    (the r12 discovery), so both branches' per-doc NLL rollups were
    still drawing their own doc exchanges at runtime.
    ``expose_cached_partitioning`` on the pinned relation finalizes it
    once; the per-doc rollups then inherit hash(doc) exchange-free —
    pinned static==runtime in tests/test_plan_audit.py."""
    from pyspark import StorageLevel

    from topic_store_spark.functions.text import tokens
    from topic_store_spark.operators.corpus import bigram_logprob, unigram_logprob
    from topic_store_spark.operators.util import (
        expose_cached_partitioning,
        hash_partition,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    tk = expose_cached_partitioning(
        hash_partition(docs, "doc_id")
        .select("doc_id", tokens(F.col("text")).alias("toks"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    uni = unigram_logprob(tk, text_col="toks").select(
        F.lit("unigram").alias("kind"),
        "doc",
        F.col("n_tokens").alias("n_events"),
        F.lit(0).cast("long").alias("n_backoff"),
        "nll_milli",
        "mean_nll_milli",
        "ppl_bucket",
    )
    lm = tk.filter(F.col("doc_id") % 10 == 1)
    bi = bigram_logprob(tk, lm, text_col="toks").select(
        F.lit("bigram").alias("kind"),
        "doc",
        "n_events",
        "n_backoff",
        "nll_milli",
        "mean_nll_milli",
        "ppl_bucket",
    )
    return uni.unionByName(bi)


def q_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-shaped importance resampling: hashed-unigram (64-bucket)
    feature distributions for a curated target slice (doc_id % 10 == 1 —
    same eval-side asymmetry as the contamination carrier) vs the raw
    corpus; per-doc importance weight = exact integer sum of fixed-point
    per-bucket log-ratios; acceptance by deterministic md5-thresholded
    resampling.  Both feature tables collapse to 64 rows and broadcast —
    nothing large joins anything large.

    r11 Exchange diet (same pattern as the perplexity carrier): the
    corpus is tokenized ONCE into a persisted relation hash-partitioned
    by doc_id; the target slice is a filter of the same cache, so the
    corpus is scanned/tokenized once instead of three times, and the
    (doc, bucket) tf rollup + per-doc weight rollup inherit hash(doc)
    and need no exchange — which requires the cache's partitioning to
    be VISIBLE (r13: ``expose_cached_partitioning``; see the
    perplexity carrier's docstring for the Spark 4 cached-plan
    rationale)."""
    from pyspark import StorageLevel

    from topic_store_spark.functions.text import tokens
    from topic_store_spark.operators.corpus import importance_resample
    from topic_store_spark.operators.util import (
        expose_cached_partitioning,
        hash_partition,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    tk = expose_cached_partitioning(
        hash_partition(docs, "doc_id")
        .select("doc_id", tokens(F.col("text")).alias("toks"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    target = tk.filter(F.col("doc_id") % 10 == 1)
    return importance_resample(tk, target, text_col="toks")


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-layout composite, one tagged union of the two training
    layouts: (a) concat-and-chunk PACKING into 128-token context windows,
    16-way sharded — one shuffle on the shard key, packing is
    partition-parallel (never a global sort); (b) overlapping 64/16
    token-window CHUNKING (the retrieval/RAG layout,
    operators/corpus.py chunk_documents) — chunk fan-out is a map-side
    explode, audited per (shard, chunks-per-doc) with the group-min
    chunk fingerprint proving the slice content end-to-end."""
    from topic_store_spark.operators.corpus import chunk_documents, pack_sequences

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    pack = pack_sequences(docs, ctx=128, shards=16).select(
        F.lit("pack").alias("kind"),
        "shard",
        "window_id",
        "n_docs",
        "first_doc",
        "tokens_started",
        F.lit(None).cast("string").alias("group_fp"),
    )
    ch = chunk_documents(docs, chunk=64, overlap=16).withColumn(
        "shard", F.col("doc_id") % 16
    )
    per_doc = ch.groupBy("shard", "doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").cast("long").alias("tok"),
        F.min("chunk_fp").alias("fp"),
    )
    chunk_part = per_doc.groupBy("shard", F.col("n_chunks").alias("window_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
        F.sum("tok").cast("long").alias("tokens_started"),
        F.min("fp").alias("group_fp"),
    ).select(
        F.lit("chunk").alias("kind"), "shard", "window_id",
        "n_docs", "first_doc", "tokens_started", "group_fp",
    )
    return pack.unionByName(chunk_part)




# ---------------------------------------------------------------------------
# Contract surface
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_tpch_q1_pricing(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """EXACTLY 50 entries — the driver's correctness gate checks the
    first 50, so at this size every registered query earns a same-round
    oracle row every round (the r3 verdict's top ask).  Consolidation
    from r3's 70: single-operator demonstrations were merged into
    composites that exercise the same code branches (find-dialect
    composites, tagged probe unions, one-pass jaccard+containment,
    window+fill pipeline, sample+replaceRoot pipeline, salted session
    rollup) — no operator branch lost its last carrier.  Two further r4
    folds (set-difference + anti-join -> id_set_ops; $group + $bucket ->
    mongo_group_bucket) freed the slots for the two new span/paragraph
    dedup operators; two more (text_tokens -> text_profile;
    mixture_sample + split_report -> sampling_report) freed the slots
    for the unigram-perplexity and DSIR importance-resampling quality
    operators.  New/changed queries lead; unchanged complex carriers
    follow."""
    return {
        # --- new or changed in round 4 --------------------------------------
        "unigram_perplexity": q_unigram_perplexity,
        "importance_resample": q_importance_resample,
        "sampling_report": q_sampling_report,
        "dedup_substring": q_dedup_substring,
        "dedup_paragraph": q_dedup_paragraph,
        "ann_pq": q_ann_pq,
        "id_set_ops": q_id_set_ops,
        "mongo_group_bucket": q_mongo_group_bucket,
        "mongo_find_dialect": q_mongo_find_dialect,
        "mongo_projection_flatten": q_mongo_projection_flatten,
        "orders_probe": q_orders_probe,
        "store_scalars": q_store_scalars,
        "dedup_exact_groups": q_dedup_exact_groups,
        "dedup_word_overlap": q_dedup_word_overlap,
        "dedup_char_jaccard": q_dedup_char_jaccard,
        "ann_topk_both": q_ann_topk_both,
        "text_profile": q_text_profile,
        "session_rollup_salted": q_session_rollup_salted,
        "mongo_facet": q_mongo_facet,
        "mongo_window_fill": q_mongo_window_fill,
        "mongo_sample_reshape": q_mongo_sample_reshape,
        "corpus_lengths": q_corpus_lengths,
        "pii_redact": q_pii_redact,
        # --- unchanged carriers ---------------------------------------------
        "ann_lsh": q_ann_lsh,
        "contamination_ngram": q_contamination_ngram,
        "quality_funnel": q_quality_funnel,
        "domain_topk": q_domain_topk,
        "dedup_semantic": q_dedup_semantic,
        "salient_terms": q_salient_terms,
        "merge_pairs": q_merge_pairs,
        "pack_sequences": q_pack_sequences,
        "objectid_sessions": q_objectid_sessions,
        "mongo_legacy_sessions": q_mongo_legacy_sessions,
        "sessionize": q_sessionize,
        "dedup_incremental": q_dedup_incremental,
        "mongo_graph_lookup": q_mongo_graph_lookup,
        # minhash_lsh before clusters: the bench then charges the shared
        # 16/8 signature/verify pass to the pair query, and the cluster
        # query reads the persisted pair set (production-index shape)
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_clusters": q_dedup_clusters,
        "dedup_simhash": q_dedup_simhash,
        "dedup_embedding_lsh": q_dedup_embedding_lsh,
        "ann_ivf": q_ann_ivf,
        "multimodal_stats": q_multimodal_stats,
        "windowed_rates": q_windowed_rates,
        "tpch_q1_pricing": q_tpch_q1_pricing,
        "tpch_q3_topk": q_tpch_q3_topk,
        "region_revenue": q_region_revenue,
        "mongo_pipeline_unwind": q_mongo_pipeline_unwind,
        "mongo_pipeline_lookup": q_mongo_pipeline_lookup,
        "mongo_densify_histogram": q_mongo_densify_histogram,
        "snapshot_asof": q_snapshot_asof,
    }


# --- shared SQL fragments (kept in one place so Spark/SQL stay in sync) ---

_TOKENS = r"list_filter(regexp_split_to_array(trim({col}), '\s+'), x -> x <> '')"

_EXACT_CORPUS = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents
)
"""

_NEAR_CORPUS = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text || ' qq ww' AS text FROM documents
)
"""

# distinct word-3-gram shingles per doc (matches functions/text.word_shingles)
_SHINGLES = (
    """
tok AS (
  SELECT doc_id, """
    + _TOKENS.format(col="text")
    + """ AS tk FROM corpus
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(tk) >= 3
              THEN list_distinct([array_to_string(tk[i:i+2], ' ')
                                  for i in range(1, len(tk) - 1)])
              ELSE [] END AS sh
  FROM tok
),
shx AS (SELECT doc_id AS doc, unnest(sh) AS shingle FROM sh),
sizes AS (SELECT doc, count(*) AS sz FROM shx GROUP BY doc)
"""
)

_VERIFY_JACCARD = """
common AS (
  SELECT a.doc AS a_doc, b.doc AS b_doc, count(*) AS common
  FROM shx a JOIN shx b ON a.shingle = b.shingle AND a.doc < b.doc
  {candidate_filter}
  GROUP BY 1, 2
)
SELECT c.a_doc, c.b_doc, c.common,
       sa.sz + sb.sz - c.common AS union_sz,
       c.common / (sa.sz + sb.sz - c.common) AS jaccard
FROM common c
JOIN sizes sa ON sa.doc = c.a_doc
JOIN sizes sb ON sb.doc = c.b_doc
WHERE c.common * 10 >= 8 * (sa.sz + sb.sz - c.common)
"""

_QUANT_EMB = (
    "list_transform(embedding, x -> CAST(round(x * 1000) AS BIGINT))"
)


def _minhash_sig_sql(num_perm: int) -> str:
    """Universal-hash MinHash signature CTE — the DuckDB twin of
    ``hashing.shingle_keys`` + ``minhash_signature_from_keys``: one
    md5-derived 28-bit key per shingle, then ``num_perm`` integer
    multiply-mod permutations whose (a_i, b_i) literals come from the
    SAME ``mix_constants`` the Spark plan embeds."""
    from topic_store_spark.functions.hashing import MERSENNE31, mix_constants

    perms = ",\n          ".join(
        f"list_min(list_transform(ks, x -> (x * {a} + {b}) % {MERSENNE31}))"
        for a, b in mix_constants(num_perm)
    )
    return f"""
keyed AS (
  SELECT doc_id,
         list_transform(sh,
           s -> CAST(('0x' || substr(md5(s), 1, 7)) AS BIGINT)) AS ks
  FROM sh WHERE len(sh) > 0
),
sig AS (
  SELECT doc_id,
         [{perms}] AS sig
  FROM keyed
)"""


def _hyperplane_proj_sql(p: int, col: str = "embedding") -> str:
    """Hyperplane projection for plane ``p`` over ``col`` —
    weight_i = hexint(md5('p:i')[0:4])/65536 - 0.5, folding left over
    index order (same operand order as Spark's F.aggregate => identical
    IEEE doubles)."""
    w = (
        f"(CAST(('0x' || substr(md5({p} || ':' || i), 1, 4)) AS BIGINT)"
        " / 65536.0 - 0.5)"
    )
    return (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(0, 64), i -> CAST({col}[i + 1] AS DOUBLE) * {w})), "
        "(a, b) -> a + b)"
    )


def _hyperplane_sign_sql(p: int, col: str = "embedding") -> str:
    """Sign bit of the plane-``p`` projection (identical doubles =>
    identical sign bits cross-engine)."""
    return f"CASE WHEN {_hyperplane_proj_sql(p, col)} >= 0 THEN '1' ELSE '0' END"

_INT_DOT = (
    "list_sum(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]))"
)

# exact integer L2^2 between two equal-length quantized sub-vectors
_INT_L2 = (
    "CAST(list_sum(list_transform(range(1, len({b}) + 1),"
    " i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))) AS BIGINT)"
)

# element-wise integer difference of two equal-length quantized vectors
# (the IVF-PQ residual, computed on the shared integer grid)
_INT_SUB = (
    "list_transform(range(1, len({a}) + 1), i -> {a}[i] - {b}[i])"
)

_LANG_PATTERNS = {
    "en": r"\b(the|and|of|to|in|is|you|that|it|for|on|with|as|are)\b",
    "es": r"\b(el|la|de|que|y|los|del|las|un|por|con|una|es|para)\b",
    "de": r"\b(der|die|und|das|ist|von|mit|den|im|ein|eine|nicht|auf)\b",
    "fr": r"\b(le|la|les|de|des|et|est|un|une|du|que|pour|dans|qui)\b",
}


def _lang_score_sql() -> str:
    scores = ",\n         ".join(
        f"len(regexp_extract_all(lower(text), '{pat}')) AS {lang}"
        for lang, pat in _LANG_PATTERNS.items()
    )
    return (
        "s AS (SELECT doc_id,\n         "
        + scores
        + ",\n         len(regexp_extract_all(text, '[一-龥]')) AS zh\n  FROM documents)"
    )


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}

    sql["mongo_find_dialect"] = """
        SELECT 'events' AS part, event_id AS id, user_id AS num,
               event_type AS s1, CAST(NULL AS VARCHAR) AS s2,
               CAST(value AS DOUBLE) AS v
        FROM events
        WHERE event_type IN ('click', 'purchase', 'view')
          AND event_type NOT IN ('view')
          AND value > 5.0 AND value < 400.0
          AND props IS NOT NULL
          AND user_id % 3 = 1
        UNION ALL
        SELECT 'docs', doc_id, CAST(n_chars AS BIGINT),
               lang, source, CAST(NULL AS DOUBLE)
        FROM documents
        WHERE ((lang = 'en' AND n_chars >= 700)
            OR (regexp_matches(source, '^src[13]') AND n_chars < 150))
          AND NOT coalesce(regexp_matches(source, '^src0'), FALSE)
          AND lang <> 'xx'
          AND doc_id % 2 = 1
        UNION ALL
        -- $jsonSchema branch: property schemas constrain only PRESENT
        -- values (NULL passes); required = presence
        SELECT 'jschema', doc_id, CAST(n_chars AS BIGINT),
               lang, source, CAST(NULL AS DOUBLE)
        FROM documents
        WHERE lang IS NOT NULL AND source IS NOT NULL
          AND (lang IS NULL OR lang IN ('en', 'de', 'fr', 'es', 'zh'))
          AND (n_chars IS NULL OR (n_chars >= 120 AND n_chars <= 5000
               AND CAST(n_chars AS DOUBLE) % 5 = 0))
          AND (source IS NULL OR (regexp_matches(source, '^src[0-4]')
               AND length(source) >= 4 AND length(source) <= 8))
          AND (text IS NULL OR length(text) >= 50)
          AND ((lang IS NULL OR lang = 'en')
               OR (n_chars IS NULL OR n_chars <= 900))
          -- r10: minProperties = presence count over the static field
          -- set; patternProperties = name-matched property schemas;
          -- dependencies = presence-triggered subschema
          AND ((CASE WHEN doc_id IS NULL THEN 0 ELSE 1 END)
             + (CASE WHEN text IS NULL THEN 0 ELSE 1 END)
             + (CASE WHEN lang IS NULL THEN 0 ELSE 1 END)
             + (CASE WHEN source IS NULL THEN 0 ELSE 1 END)
             + (CASE WHEN n_chars IS NULL THEN 0 ELSE 1 END)) >= 4
          AND (lang IS NULL OR length(lang) >= 2)
          AND (source IS NULL OR length(source) >= 2)
          AND (text IS NULL OR (n_chars IS NULL OR n_chars >= 100))
    """

    sql["mongo_projection_flatten"] = """
        SELECT event_id,
               user_id AS "meta.user",
               value AS "meta.detail.v"
        FROM events
    """

    sql["mongo_group_bucket"] = """
        SELECT 'group' AS part,
               o_orderpriority AS g1, o_orderstatus AS g2,
               count(*) AS n,
               max(o_totalprice) AS max_price,
               min(o_totalprice) AS min_price,
               quantile_cont(o_totalprice, 0.5) AS med_price,
               CAST(NULL AS VARCHAR) AS top_keys,
               CAST(NULL AS BIGINT) AS prio_num,
               CAST(NULL AS BIGINT) AS max_odate_ms
        FROM orders
        WHERE o_orderstatus IN ('F', 'O')
        GROUP BY 2, 3
        UNION ALL
        SELECT 'bucket',
               CASE
                 WHEN o_totalprice >= 0 AND o_totalprice < 100000 THEN '0'
                 WHEN o_totalprice >= 100000 AND o_totalprice < 200000 THEN '100000'
                 WHEN o_totalprice >= 200000 AND o_totalprice < 300000 THEN '200000'
                 WHEN o_totalprice >= 300000 AND o_totalprice < 400000 THEN '300000'
                 ELSE 'big' END,
               CAST(NULL AS VARCHAR),
               count(*),
               max(o_totalprice),
               CAST(NULL AS DOUBLE),
               CAST(NULL AS DOUBLE),
               CAST(NULL AS VARCHAR),
               CAST(NULL AS BIGINT),
               CAST(NULL AS BIGINT)
        FROM orders GROUP BY 2
        UNION ALL
        SELECT 'topn',
               o_orderpriority,
               CAST(NULL AS VARCHAR),
               count(*),
               CAST(NULL AS DOUBLE),
               CAST(NULL AS DOUBLE),
               CAST(NULL AS DOUBLE),
               array_to_string(
                 (list(o_orderkey ORDER BY o_totalprice DESC, o_orderkey ASC))[1:3],
                 ','),
               max(coalesce(TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT), -1)),
               max(CAST(epoch_ms(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT))
        FROM orders GROUP BY 2
    """

    sql["mongo_pipeline_unwind"] = """
        SELECT word, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        GROUP BY 1
        ORDER BY n DESC, word ASC
        LIMIT 50
    """

    sql["mongo_pipeline_lookup"] = """
        SELECT o.o_orderkey, o.o_totalprice,
               c.c_name AS cust_name, c.c_mktsegment AS segment,
               (SELECT count(*) FROM orders p
                WHERE p.o_custkey = o.o_custkey
                  AND p.o_totalprice > o.o_totalprice) AS n_pricier_peers
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderpriority = '1-URGENT' AND o.o_totalprice > 350000.0
    """

    sql["mongo_sample_reshape"] = """
        WITH sampled AS (
          SELECT o_orderkey AS _id,
                 o_totalprice AS total,
                 o_orderstatus AS status,
                 o_orderdate AS odate,
                 o_orderpriority AS priority
          FROM orders
          ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
          LIMIT 200
        ),
        shaped AS (
          SELECT CASE WHEN total < 100000 THEN 'low'
                      WHEN total < 250000 THEN 'mid'
                      ELSE 'high' END AS st,
                 total AS tot,
                 replace(trim('  ' || status || '-' || priority || ' '),
                         '-', '_') AS tag,
                 regexp_matches(priority, '^[12]') AS urgent,
                 CAST(date_trunc('quarter', odate) AS TIMESTAMP) AS qtr,
                 date_diff('day', odate, TIMESTAMP '2026-01-01') AS age_days,
                 strftime((CAST(odate AS TIMESTAMP) AT TIME ZONE 'UTC')
                            AT TIME ZONE 'America/New_York',
                          '%Y-%m-%d %H:%M') AS ny_day,
                 CAST(hour((CAST(odate AS TIMESTAMP) AT TIME ZONE 'UTC')
                             AT TIME ZONE 'America/New_York') AS INT)
                   AS ny_hour
          FROM sampled
        )
        SELECT st AS _id, count(*) AS n, max(tot) AS max_tot,
               CAST(sum(CASE WHEN urgent THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_urgent,
               max(tag) AS max_tag, min(age_days) AS min_age,
               min(qtr) AS min_qtr,
               CAST(max(strpos(tag, '_') - 1) AS INT) AS max_us,
               min(ny_day) AS min_ny,
               CAST(max(ny_hour) AS INT) AS max_nyh,
               CAST(max(strlen(tag)) AS INT) AS max_bs
        FROM shaped GROUP BY 1
    """

    sql["mongo_facet"] = """
        SELECT CAST((SELECT count(DISTINCT event_type) FROM events) AS INT)
                 AS n_types,
               (SELECT count(*) FROM events WHERE value > 400.0) AS n_high,
               (SELECT event_type FROM events GROUP BY 1
                ORDER BY count(*) DESC, event_type ASC LIMIT 1) AS top_type,
               (SELECT count(*) FROM events GROUP BY event_type
                ORDER BY count(*) DESC, event_type ASC LIMIT 1) AS top_type_n
    """

    sql["mongo_graph_lookup"] = """
        WITH RECURSIVE base AS (
          SELECT doc_id, CAST(floor(doc_id / 2) AS BIGINT) AS parent
          FROM documents
        ),
        anc AS (
          SELECT b.doc_id AS src, p.doc_id AS anc_id, p.parent AS nxt,
                 0 AS depth
          FROM base b JOIN base p ON p.doc_id = b.parent
          UNION
          SELECT a.src, p.doc_id, p.parent, a.depth + 1
          FROM anc a JOIN base p ON p.doc_id = a.nxt
          WHERE a.depth < 3
        )
        SELECT src AS doc_id,
               CAST(count(DISTINCT anc_id) AS INT) AS n_anc,
               min(anc_id) AS min_anc,
               max(anc_id) AS max_anc
        FROM anc GROUP BY src
    """

    sql["mongo_window_fill"] = """
        WITH gappy AS (
          SELECT user_id, event_id, ts, value,
                 CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
          FROM events
        )
        SELECT user_id, event_id,
               CAST(row_number() OVER w AS INT) AS doc_num,
               sum(round(value * 1000)) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS running_milli,
               coalesce(lag(event_id) OVER w, -1) AS prev_event,
               last_value(v IGNORE NULLS) OVER fwd AS v_locf,
               CASE WHEN v IS NOT NULL THEN v
                    WHEN last_value(v IGNORE NULLS) OVER fwd IS NULL
                      OR first_value(v IGNORE NULLS) OVER bwd IS NULL
                      THEN NULL
                    ELSE last_value(v IGNORE NULLS) OVER fwd
                         + (first_value(v IGNORE NULLS) OVER bwd
                            - last_value(v IGNORE NULLS) OVER fwd)
                           * ((CAST(event_id AS DOUBLE)
                               - last_value(CASE WHEN v IS NOT NULL
                                   THEN CAST(event_id AS DOUBLE) END
                                   IGNORE NULLS) OVER fwd)
                              / (first_value(CASE WHEN v IS NOT NULL
                                   THEN CAST(event_id AS DOUBLE) END
                                   IGNORE NULLS) OVER bwd
                                 - last_value(CASE WHEN v IS NOT NULL
                                     THEN CAST(event_id AS DOUBLE) END
                                     IGNORE NULLS) OVER fwd))
               END AS v_lin,
               CAST(count(*) OVER rng AS BIGINT) AS near_cnt,
               sum(round(value * 1000)) OVER rng AS near_milli
        FROM gappy
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
               fwd AS (PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               bwd AS (PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
               rng AS (PARTITION BY user_id ORDER BY event_id
                       RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
    """

    sql["mongo_densify_histogram"] = """
        WITH h AS (
          SELECT lang,
                 CAST(floor(len(str_split(text, ' ')) / 8) AS BIGINT) * 8
                   AS bucket,
                 count(*) AS n
          FROM documents GROUP BY 1, 2
        ),
        grid AS (
          SELECT l.lang, g.bucket
          FROM (SELECT DISTINCT lang FROM h) l
          CROSS JOIN (
            SELECT unnest(generate_series(
              (SELECT min(bucket) FROM h),
              (SELECT max(bucket) FROM h), 8)) AS bucket
          ) g
        )
        SELECT g.lang, g.bucket, coalesce(h.n, 0) AS n
        FROM grid g LEFT JOIN h USING (lang, bucket)
    """

    sql["session_rollup_salted"] = """
        SELECT user_id AS session,
               count(*) AS count,
               min(ts) AS first_ts, max(ts) AS last_ts,
               strftime(min(ts), '%d-%m-%Y %H:%M:%S') AS date_collected,
               CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
                 AS milli_sum,
               max(CAST(round(value * 1000) AS BIGINT)) AS milli_max
        FROM events GROUP BY 1
    """

    sql["store_scalars"] = """
        SELECT 'json' AS probe, event_type AS key,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS v1,
               max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS v2,
               count(*) AS v3,
               CAST(NULL AS BIGINT) AS v4,
               CAST(NULL AS VARCHAR) AS uri,
               CAST(NULL AS VARCHAR) AS redacted
        FROM events GROUP BY 2
        UNION ALL
        SELECT 'size', source,
               count(*),
               CAST(sum(n_chars) AS BIGINT),
               CAST(sum(strlen(text)) AS BIGINT),
               max(strlen(text)),
               NULL, NULL
        FROM documents GROUP BY 2
        UNION ALL
        SELECT 'redact', CAST(event_id AS VARCHAR),
               NULL, NULL, NULL, NULL,
               'mongodb://user' || CAST(user_id AS VARCHAR)
                 || ':secret@db.example.com/' || event_type,
               regexp_replace(
                 'mongodb://user' || CAST(user_id AS VARCHAR)
                   || ':secret@db.example.com/' || event_type,
                 '://[^/@]+@', '://****:****@')
        FROM events WHERE event_id < 500
    """

    sql["objectid_sessions"] = """
        WITH ids AS (
          SELECT user_id,
                 printf('%08x', CAST(floor(epoch(ts)) AS BIGINT))
                   || substr(md5(CAST(event_id AS VARCHAR)), 1, 16) AS _id,
                 make_timestamp(CAST(floor(epoch(ts)) AS BIGINT) * 1000000) AS gen_ts
          FROM events
        )
        SELECT user_id AS session,
               count(*) AS count,
               min(gen_ts) AS first_seen,
               strftime(min(gen_ts), '%d-%m-%Y %H:%M:%S') AS date_collected,
               min(_id) AS min_id
        FROM ids GROUP BY 1
    """

    sql["mongo_legacy_sessions"] = """
        WITH ids AS (
          SELECT CAST(user_id AS VARCHAR) AS session,
                 epoch(ts) AS sys_time,
                 printf('%08x', CAST(floor(epoch(ts)) AS BIGINT))
                   || substr(md5(CAST(event_id AS VARCHAR)), 1, 16) AS _id
          FROM events
        ),
        g AS (
          SELECT session, count(*) AS count, min(sys_time) AS sys_time,
                 min(_id) AS min_id
          FROM ids GROUP BY 1
        )
        SELECT session, count, sys_time,
               make_timestamp(CAST(('0x' || substr(min_id, 1, 8)) AS BIGINT)
                              * 1000000) AS date_collected
        FROM g
    """

    from topic_store_spark.functions.html import html_to_text_sql

    _html_expr = (
        "'<html><head><style>p{}</style><script>var x=\"<p>\";</script>"
        "</head><body><h1>Doc &amp; ' || CAST(doc_id AS VARCHAR)"
        " || '</h1><p>' || text || '</p><ul><li>lang&nbsp;' || lang"
        " || '</li></ul><!-- tail --></body></html>'"
    )
    sql["pii_redact"] = r"""
        WITH src AS (
          SELECT doc_id, text, lang,
                 text || ' contact user' || CAST(doc_id AS VARCHAR)
                      || '@example.com or 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.1 tel +1 (555) 010-'
                      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS pii
          FROM documents WHERE doc_id < 1000
        )
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(pii,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                 '\+?(?:\d{1,3}[ .-])?\(?\b\d{3}\)?[ .-]?\d{3}[ .-]?\d{2,4}\b', '<PHONE>', 'g') AS redacted,
               len(regexp_extract_all(pii,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
               len(regexp_extract_all(pii,
                 '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
               EXTRACTED AS extracted
        FROM src
    """.replace("EXTRACTED", html_to_text_sql(_html_expr))

    sql["id_set_ops"] = """
        SELECT 'except' AS part, user_id AS k,
               CAST(NULL AS VARCHAR) AS name, CAST(NULL AS VARCHAR) AS segment
        FROM (
          SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 80.0
          EXCEPT
          SELECT user_id FROM events WHERE event_type = 'signup' AND value > 80.0
        )
        UNION ALL
        SELECT 'anti', c_custkey, c_name, c_mktsegment FROM customer c
        WHERE NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderstatus = 'F'
            AND o.o_orderdate < TIMESTAMP '1996-01-01'
        )
    """

    sql["dedup_substring"] = (
        """
        WITH tok0 AS (
          SELECT doc_id, """
        + _TOKENS.format(col="text")
        + """ AS tk FROM documents
        ),
        corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000, array_to_string(tk[6:1000000], ' ')
          FROM tok0
        ),
        tok AS (
          SELECT doc_id, """
        + _TOKENS.format(col="text")
        + """ AS tk FROM corpus
        ),
        sh AS (
          SELECT doc_id,
                 CASE WHEN len(tk) >= 20
                      THEN [{'pos': i - 1,
                             'fp': md5(array_to_string(tk[i:i+19], ' '))}
                            for i in range(1, len(tk) - 18)]
                      ELSE [] END AS wins
          FROM tok
        ),
        win AS (
          SELECT doc_id AS doc, unnest(wins, recursive := true) FROM sh
        ),
        dupfp AS (SELECT fp FROM win GROUP BY fp HAVING count(*) >= 2),
        d AS (SELECT doc, pos FROM win WHERE fp IN (SELECT fp FROM dupfp)),
        lagged AS (
          SELECT doc, pos, lag(pos) OVER (PARTITION BY doc ORDER BY pos) AS prev
          FROM d
        ),
        isl AS (
          SELECT doc, pos,
                 sum(CASE WHEN prev IS NULL OR pos > prev + 20 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc ORDER BY pos ROWS UNBOUNDED PRECEDING)
                   AS island
          FROM lagged
        )
        SELECT doc AS doc_id,
               min(pos) AS span_start,
               max(pos) + 20 AS span_end,
               max(pos) + 20 - min(pos) AS n_dup_tokens,
               count(*) AS n_windows
        FROM isl GROUP BY doc, island
    """
    )

    sql["dedup_paragraph"] = (
        r"""
        WITH tok0 AS (
          SELECT doc_id, """
        + _TOKENS.format(col="text")
        + r""" AS tk FROM documents
        ),
        p AS (
          SELECT doc_id, array_to_string(tk[1:10], ' ') AS para FROM tok0
        ),
        c AS (
          SELECT a.doc_id,
                 a.para || chr(10) || chr(10) || b.para || chr(10) || chr(10)
                        || 'shared footer boilerplate' AS text
          FROM p a JOIN p b ON b.doc_id = xor(a.doc_id, 1)
        ),
        parr AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '\n{2,}'), x -> x <> '')
                   AS ps
          FROM c
        ),
        paras AS (
          SELECT doc_id AS doc,
                 unnest([{'pos': i - 1, 'para': ps[i]}
                         for i in range(1, len(ps) + 1)], recursive := true)
          FROM parr
        ),
        fpd AS (
          SELECT doc, pos, para,
                 md5(lower(trim(regexp_replace(para, '\s+', ' ', 'g')))) AS fp
          FROM paras
        ),
        kept AS (
          SELECT doc, pos, para FROM fpd
          QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc, pos) = 1
        ),
        tot AS (SELECT doc, count(*) AS n_paras FROM fpd GROUP BY doc),
        agg AS (
          SELECT doc, count(*) AS n_kept,
                 string_agg(para, chr(10) || chr(10) ORDER BY pos) AS clean_text
          FROM kept GROUP BY doc
        )
        SELECT t.doc AS doc_id, t.n_paras,
               coalesce(a.n_kept, 0) AS n_kept,
               coalesce(a.clean_text, '') AS clean_text
        FROM tot t LEFT JOIN agg a ON t.doc = a.doc
    """
    )

    sql["ann_ivf"] = (
        """
        WITH q0 AS (
          SELECT vec_id, """
        + _QUANT_EMB
        + """ AS qv FROM embeddings
        ),
        n0 AS (
          SELECT vec_id, qv, """
        + _INT_DOT.format(a="qv", b="qv")
        + """ AS nrm FROM q0
        ),
        cen AS (SELECT vec_id AS cen_id, qv AS cen_qv, nrm AS cen_n
                FROM n0 WHERE vec_id < 8),
        assigned AS (
          SELECT vec_id AS c_id, qv AS c_qv, nrm AS c_n, cen_id AS list_id
          FROM (
            SELECT c.vec_id, c.qv, c.nrm, cen.cen_id,
                   row_number() OVER (
                     PARTITION BY c.vec_id
                     ORDER BY """
        + _INT_DOT.format(a="c.qv", b="cen.cen_qv")
        + """ / sqrt(CAST(cen.cen_n AS DOUBLE)) DESC, cen.cen_id ASC) AS rn
            FROM n0 c CROSS JOIN cen
          ) WHERE rn = 1
        ),
        probes AS (
          SELECT vec_id AS q_id, qv AS q_qv, nrm AS q_n, cen_id AS list_id
          FROM (
            SELECT qs.vec_id, qs.qv, qs.nrm, cen.cen_id,
                   row_number() OVER (
                     PARTITION BY qs.vec_id
                     ORDER BY """
        + _INT_DOT.format(a="qs.qv", b="cen.cen_qv")
        + """ / sqrt(CAST(cen.cen_n AS DOUBLE)) DESC, cen.cen_id ASC) AS rn
            FROM n0 qs CROSS JOIN cen
            WHERE qs.vec_id < 10
          ) WHERE rn <= 2
        ),
        scored AS (
          SELECT p.q_id, a.c_id, """
        + _INT_DOT.format(a="p.q_qv", b="a.c_qv")
        + """ AS dot, p.q_n, a.c_n
          FROM probes p JOIN assigned a ON p.list_id = a.list_id
          WHERE p.q_id <> a.c_id
        )
        SELECT q_id AS query_id, c_id AS neighbor_id,
               CAST(row_number() OVER (PARTITION BY q_id
                                       ORDER BY dot DESC, c_id ASC) AS INT) AS rank,
               dot / sqrt(CAST(q_n * c_n AS DOUBLE)) AS cosine_q
        FROM scored
        QUALIFY rank <= 5
    """
    )

    _crsub = "c_rv[cb.s*2+1 : cb.s*2+2]"
    _qrsub = "q_rv[cb.s*2+1 : cb.s*2+2]"
    sql["ann_pq"] = (
        """
        WITH q0 AS (
          SELECT vec_id, """
        + _QUANT_EMB
        + """ AS qv FROM embeddings
        ),
        n0 AS (
          SELECT vec_id, qv, """
        + _INT_DOT.format(a="qv", b="qv")
        + """ AS nrm FROM q0
        ),
        cen AS (SELECT vec_id AS cen_id, qv AS cen_qv, nrm AS cen_n
                FROM n0 WHERE vec_id < 8),
        -- every vector's best coarse list AND its integer-grid RESIDUAL
        -- to that centroid (the residual-IVFPQ encoding input)
        assigned AS (
          SELECT vec_id AS c_id, cen_id AS list_id, """
        + _INT_SUB.format(a="qv", b="cen_qv")
        + """ AS c_rv
          FROM (
            SELECT c.vec_id, c.qv, cen.cen_id, cen.cen_qv,
                   row_number() OVER (
                     PARTITION BY c.vec_id
                     ORDER BY """
        + _INT_DOT.format(a="c.qv", b="cen.cen_qv")
        + """ / sqrt(CAST(cen.cen_n AS DOUBLE)) DESC, cen.cen_id ASC) AS rn
            FROM n0 c CROSS JOIN cen
          ) WHERE rn = 1
        ),
        -- codebook sources: the first 16 vectors' residuals, id-ordered
        src AS (
          SELECT row_number() OVER (ORDER BY c_id) - 1 AS j, c_rv AS sqv
          FROM assigned WHERE c_id < 16
        ),
        -- r8 OPQ-lite: variance-balanced dimension permutation, learned
        -- from the SAME residual sample (exact integer variance
        -- numerator n*sum(x^2)-sum(x)^2; pair s-th highest with s-th
        -- lowest).  Permutation = orthogonal rotation, integer-exact.
        dimvar AS (
          SELECT dd.dim,
                 CAST(count(*) * sum(src.sqv[dd.dim + 1] * src.sqv[dd.dim + 1])
                      - sum(src.sqv[dd.dim + 1]) * sum(src.sqv[dd.dim + 1])
                      AS BIGINT) AS varnum
          FROM src CROSS JOIN (SELECT unnest(range(0, 64)) AS dim) dd
          GROUP BY dd.dim
        ),
        sorted_dims AS (
          SELECT dim,
                 row_number() OVER (ORDER BY varnum DESC, dim ASC) AS rn
          FROM dimvar
        ),
        perm AS (
          SELECT ss.s * 2 AS pos, sd.dim
          FROM (SELECT unnest(range(0, 32)) AS s) ss
          JOIN sorted_dims sd ON sd.rn = ss.s + 1
          UNION ALL
          SELECT ss.s * 2 + 1 AS pos, sd.dim
          FROM (SELECT unnest(range(0, 32)) AS s) ss
          JOIN sorted_dims sd ON sd.rn = 64 - ss.s
        ),
        srcp AS (
          SELECT s.j, list(s.sqv[p.dim + 1] ORDER BY p.pos) AS sqv
          FROM src s CROSS JOIN perm p GROUP BY s.j
        ),
        assignedp AS (
          SELECT a.c_id, a.list_id,
                 list(a.c_rv[p.dim + 1] ORDER BY p.pos) AS c_rv
          FROM assigned a CROSS JOIN perm p GROUP BY a.c_id, a.list_id
        ),
        cb AS (
          SELECT ss.s, srcp.j, srcp.sqv[ss.s*2+1 : ss.s*2+2] AS sv
          FROM srcp CROSS JOIN (SELECT unnest(range(0, 32)) AS s) ss
        ),
        codes AS (
          SELECT c_id, list_id, s, j AS code
          FROM (
            SELECT a.c_id, a.list_id, cb.s, cb.j,
                   row_number() OVER (
                     PARTITION BY a.c_id, cb.s
                     ORDER BY """
        + _INT_L2.format(a=f"a.{_crsub}", b="cb.sv")
        + """ ASC, cb.j ASC) AS rn
            FROM assignedp a CROSS JOIN cb
          ) WHERE rn = 1
        ),
        -- per-(query, probed list) residual — the LUT key is the pair
        probes AS (
          SELECT vec_id AS q_id, cen_id AS list_id, """
        + _INT_SUB.format(a="qv", b="cen_qv")
        + """ AS q_rv
          FROM (
            SELECT qs.vec_id, qs.qv, cen.cen_id, cen.cen_qv,
                   row_number() OVER (
                     PARTITION BY qs.vec_id
                     ORDER BY """
        + _INT_DOT.format(a="qs.qv", b="cen.cen_qv")
        + """ / sqrt(CAST(cen.cen_n AS DOUBLE)) DESC, cen.cen_id ASC) AS rn
            FROM n0 qs CROSS JOIN cen
            WHERE qs.vec_id < 10
          ) WHERE rn <= 2
        ),
        probesp AS (
          SELECT pr.q_id, pr.list_id,
                 list(pr.q_rv[p.dim + 1] ORDER BY p.pos) AS q_rv
          FROM probes pr CROSS JOIN perm p GROUP BY pr.q_id, pr.list_id
        ),
        lut AS (
          SELECT p.q_id, p.list_id, cb.s, cb.j, """
        + _INT_L2.format(a=f"p.{_qrsub}", b="cb.sv")
        + """ AS d2
          FROM probesp p CROSS JOIN cb
        ),
        scored AS (
          SELECT p.q_id, c.c_id, CAST(sum(l.d2) AS BIGINT) AS adc_dist
          FROM probesp p
          JOIN codes c ON c.list_id = p.list_id AND c.c_id <> p.q_id
          JOIN lut l ON l.q_id = p.q_id AND l.list_id = p.list_id
                    AND l.s = c.s AND l.j = c.code
          GROUP BY 1, 2
        )
        SELECT q_id AS query_id, c_id AS neighbor_id,
               CAST(row_number() OVER (PARTITION BY q_id
                      ORDER BY adc_dist ASC, c_id ASC) AS INT) AS rank,
               adc_dist
        FROM scored
        QUALIFY rank <= 5
    """
    )

    sql["multimodal_stats"] = """
        SELECT doc_id,
               'text' AS media_type,
               strlen(text) AS size_bytes,
               sha256(text) AS sha256,
               CAST(ceil(strlen(text) / 256.0) AS BIGINT) AS n_chunks
        FROM documents
    """

    sql["orders_probe"] = """
        SELECT 'topk' AS probe, o_orderkey AS k,
               CAST(o_totalprice AS DOUBLE) AS v
        FROM (SELECT o_orderkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100)
        UNION ALL
        SELECT 'count', cnt, CAST(cnt AS DOUBLE)
        FROM (SELECT count(*) AS cnt FROM lineitem
              WHERE l_quantity >= 30.0 AND l_returnflag <> 'A')
        UNION ALL
        SELECT 'point', event_id, CAST(value AS DOUBLE)
        FROM events WHERE event_id = 4242
        UNION ALL
        -- the Spark side probes the Z-ORDERED copy; layout never
        -- changes content, so plain `events` is the oracle
        SELECT 'zorder', count(*), CAST(max(value) AS DOUBLE)
        FROM events
        WHERE user_id BETWEEN 40 AND 60 AND value BETWEEN 100.0 AND 200.0
    """

    sql["sessionize"] = """
        WITH flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(epoch(ts)) OVER w IS NULL
                        OR epoch(ts) - lag(epoch(ts)) OVER w > 1800.0
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        numbered AS (
          SELECT user_id, ts,
                 CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING)
                      AS BIGINT) AS session_seq
          FROM flagged
        )
        SELECT user_id, session_seq, count(*) AS n_events,
               min(ts) AS start_ts, max(ts) AS end_ts
        FROM numbered GROUP BY 1, 2
    """

    # the asof half uses DuckDB's NATIVE ASOF JOIN — a different
    # algorithm (partitioned search) than Spark's union+window merge
    # plan, making this a genuinely independent semantic check
    sql["snapshot_asof"] = """
        SELECT 'latest' AS part, event_id AS k, ts,
               event_type AS key, CAST(value AS DOUBLE) AS v
        FROM events
        QUALIFY row_number() OVER (PARTITION BY event_type
                                   ORDER BY ts DESC, event_id DESC) = 1
        UNION ALL
        SELECT 'asof', p.event_id, p.ts,
               CAST(p.user_id AS VARCHAR), CAST(q.v AS DOUBLE)
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click') p
        ASOF LEFT JOIN
             (SELECT user_id, ts, max_by(value, event_id) AS v
              FROM events WHERE event_type = 'purchase'
              GROUP BY 1, 2) q
          ON p.user_id = q.user_id AND p.ts >= q.ts
        UNION ALL
        SELECT 'interval', p.event_id, p.ts, CAST(p.user_id AS VARCHAR),
               CAST(sum(w.w_milli) / 1000.0 AS DOUBLE)
        FROM (SELECT event_id, user_id, ts, epoch(ts) AS ts_sec FROM events
              WHERE event_type = 'click') p
        JOIN (SELECT user_id, epoch(ts) AS w_start, epoch(ts) + 14400.0 AS w_end,
                     CAST(round(value * 1000) AS BIGINT) AS w_milli
              FROM events WHERE event_type = 'purchase') w
          ON p.user_id = w.user_id
         AND p.ts_sec >= w.w_start AND p.ts_sec < w.w_end
        GROUP BY 1, 2, 3, 4
    """

    sql["windowed_rates"] = """
        SELECT date_trunc('hour', ts) AS window_start,
               event_type AS key,
               count(*) AS n,
               CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
                 AS value_milli_sum,
               CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS DOUBLE)
                 / 1000.0 / count(*) AS avg_value
        FROM events GROUP BY 1, 2
    """

    # Decimal sums are emitted as doubles via a VARCHAR round-trip: DuckDB's
    # direct DECIMAL->DOUBLE cast is not correctly rounded (observed 1.8%
    # off-by-one-ulp at 12-digit magnitudes), but VARCHAR->DOUBLE (strtod)
    # is, matching Spark's BigDecimal.doubleValue exactly.
    sql["tpch_q1_pricing"] = """
        SELECT l_returnflag, l_linestatus,
               CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR)
                    AS DOUBLE) AS sum_qty,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
                    AS DOUBLE) AS sum_base_price,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                    AS VARCHAR) AS DOUBLE) AS sum_disc_price,
               count(*) AS count_order,
               CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR)
                    AS DOUBLE) / count(*) AS avg_qty
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        GROUP BY 1, 2
    """

    sql["tpch_q3_topk"] = """
        SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
               CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
                    AS VARCHAR) AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
          AND l.l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
    """

    sql["region_revenue"] = """
        SELECT r.r_name, n.n_name,
               CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
                    AS VARCHAR) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2
    """

    sql["dedup_exact_groups"] = (
        "WITH "
        + _EXACT_CORPUS
        + r""",
        fp AS (
          SELECT doc_id, text,
                 md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
                   AS fingerprint
          FROM corpus
        ),
        survivors AS (
          SELECT doc_id, text FROM fp
          QUALIFY doc_id = min(doc_id) OVER (PARTITION BY fingerprint)
        ),
        groups AS (
          SELECT fingerprint,
                 count(*) AS n_docs,
                 min(doc_id) AS keep_id,
                 array_to_string(list_sort(list(doc_id)), ',') AS doc_ids_csv
          FROM fp
          GROUP BY 1 HAVING count(*) > 1
        )
        SELECT s.doc_id, s.text, g.fingerprint, g.n_docs, g.doc_ids_csv
        FROM survivors s JOIN groups g ON s.doc_id = g.keep_id
    """
    )

    # hot-key cap mirrors word_overlap_pairs(max_shingle_freq=64): stop
    # shingles (df > 64) leave BOTH the join and the size denominators,
    # so the metrics are exact in the filtered universe
    sql["dedup_word_overlap"] = (
        "WITH "
        + _NEAR_CORPUS
        + ","
        + _SHINGLES
        + """,
        keep AS (
          SELECT shingle FROM shx GROUP BY shingle HAVING count(*) <= 64
        ),
        shk AS (SELECT shx.doc, shx.shingle FROM shx JOIN keep USING (shingle)),
        sizesk AS (SELECT doc, count(*) AS sz FROM shk GROUP BY doc),
        common AS (
          SELECT a.doc AS a_doc, b.doc AS b_doc, count(*) AS common
          FROM shk a JOIN shk b ON a.shingle = b.shingle AND a.doc < b.doc
          GROUP BY 1, 2
        )
        SELECT c.a_doc, c.b_doc, c.common,
               sa.sz + sb.sz - c.common AS union_sz,
               least(sa.sz, sb.sz) AS min_sz,
               c.common / (sa.sz + sb.sz - c.common) AS jaccard,
               c.common / least(sa.sz, sb.sz) AS containment,
               c.common * 10 >= 8 * (sa.sz + sb.sz - c.common) AS jaccard_hit,
               c.common * 10 >= 9 * least(sa.sz, sb.sz) AS containment_hit
        FROM common c
        JOIN sizesk sa ON sa.doc = c.a_doc
        JOIN sizesk sb ON sb.doc = c.b_doc
        WHERE c.common * 10 >= 8 * (sa.sz + sb.sz - c.common)
           OR c.common * 10 >= 9 * least(sa.sz, sb.sz)
    """
    )

    # connected-components clustering over the verified Jaccard pairs:
    # the recursive CTE computes min-reachable-id — the same fixpoint the
    # Spark min-label propagation converges to
    sql["dedup_clusters"] = (
        "WITH RECURSIVE "
        + _NEAR_CORPUS
        + ","
        + _SHINGLES
        + r"""
        ,
        common AS (
          SELECT a.doc AS a_doc, b.doc AS b_doc, count(*) AS common
          FROM shx a JOIN shx b ON a.shingle = b.shingle AND a.doc < b.doc
          GROUP BY 1, 2
        ),
        pairs AS (
          SELECT c.a_doc, c.b_doc
          FROM common c
          JOIN sizes sa ON sa.doc = c.a_doc
          JOIN sizes sb ON sb.doc = c.b_doc
          WHERE c.common * 10 >= 8 * (sa.sz + sb.sz - c.common)
        ),
        edges AS (
          SELECT a_doc AS s, b_doc AS d FROM pairs
          UNION
          SELECT b_doc, a_doc FROM pairs
        ),
        nodes AS (SELECT DISTINCT s AS node FROM edges),
        reach(node, m) AS (
          SELECT node, node FROM nodes
          UNION
          SELECT r.node, e.d FROM reach r JOIN edges e ON e.s = r.m
        ),
        labels AS (SELECT node, min(m) AS component FROM reach GROUP BY 1)
        SELECT component, count(*) AS n_members,
               array_to_string(list_sort(list(node)), ',') AS members_csv
        FROM labels GROUP BY 1
    """
    )

    # full MinHash->LSH->verify pipeline, same universal-hash signature
    # family: one md5-derived 28-bit key per shingle, permutation i =
    # min((a_i*x+b_i) mod 2^31-1) with the (a_i, b_i) literals produced
    # by the SAME mix_constants() the Spark plan embeds
    sql["dedup_minhash_lsh"] = (
        "WITH "
        + _NEAR_CORPUS
        + ","
        + _SHINGLES
        + ""","""
        + _minhash_sig_sql(16)
        + """,
banded AS (
  SELECT doc_id AS doc,
         unnest([CAST(b AS VARCHAR) || '|' ||
                 array_to_string(sig[b*2+1:b*2+2], ',')
                 for b in range(0, 8)]) AS band
  FROM sig
),
cands AS (
  SELECT DISTINCT x.doc AS a_doc, y.doc AS b_doc
  FROM banded x JOIN banded y ON x.band = y.band AND x.doc < y.doc
),
"""
        + _VERIFY_JACCARD.format(
            candidate_filter="JOIN cands ON cands.a_doc = a.doc AND cands.b_doc = b.doc"
        )
    )

    # incremental: 12/4 band scheme (the batch-ingest operator default),
    # and candidates
    # require at least one NEW-side (clone, id >= 100000) endpoint — the
    # corpus-corpus pair space is excluded by construction
    sql["dedup_incremental"] = (
        """WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000 AS doc_id, text || ' qq ww' AS text
          FROM documents WHERE doc_id % 10 = 3
        ),"""
        + _SHINGLES
        + ""","""
        + _minhash_sig_sql(12)
        + """,
banded AS (
  SELECT doc_id AS doc,
         unnest([CAST(b AS VARCHAR) || '|' ||
                 array_to_string(sig[b*3+1:b*3+3], ',')
                 for b in range(0, 4)]) AS band
  FROM sig
),
cands AS (
  SELECT DISTINCT x.doc AS a_doc, y.doc AS b_doc
  FROM banded x JOIN banded y ON x.band = y.band AND x.doc < y.doc
  WHERE x.doc >= 100000 OR y.doc >= 100000
),
"""
        + _VERIFY_JACCARD.format(
            candidate_filter="JOIN cands ON cands.a_doc = a.doc AND cands.b_doc = b.doc"
        )
    )

    # capped variant: stop-shingles (df > cap) drop out of BOTH the join
    # and the size denominators — exact Jaccard in the filtered universe,
    # mirroring _cooccurring_pairs(max_shingle_freq=64)
    sql["dedup_char_jaccard"] = (
        "WITH "
        + _NEAR_CORPUS
        + r""",
norm AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
  FROM corpus
),
sh AS (
  SELECT doc_id,
         CASE WHEN length(nt) >= 5
              THEN list_distinct([nt[i:i+4] for i in range(1, length(nt) - 3)])
              ELSE [] END AS sh
  FROM norm
),
shx_all AS (SELECT doc_id AS doc, unnest(sh) AS shingle FROM sh),
keep AS (SELECT shingle FROM shx_all GROUP BY 1
         HAVING count(*) <= """
        + str(_CHAR_SHINGLE_FREQ_CAP)
        + """),
shx AS (SELECT s.doc, s.shingle FROM shx_all s JOIN keep USING (shingle)),
sizes AS (SELECT doc, count(*) AS sz FROM shx GROUP BY doc),
"""
        + _VERIFY_JACCARD.format(candidate_filter="")
    )

    ws_tokens = _TOKENS.format(col="text")
    sql["dedup_simhash"] = (
        "WITH "
        + _EXACT_CORPUS
        + """,
tok AS (
  SELECT doc_id,
         list_transform("""
        + _TOKENS.format(col="text")
        + """, t -> md5(t)) AS hs,
         len("""
        + _TOKENS.format(col="text")
        + """) AS n
  FROM corpus
),
sigs AS (
  SELECT doc_id AS doc,
         array_to_string([CASE WHEN 2 * len(list_filter(hs,
             h -> strpos('13579bdf', h[i]) > 0)) > n
           THEN '1' ELSE '0' END for i in range(1, 33)], '') AS sim
  FROM tok
),
banded AS (
  SELECT doc, sim,
         unnest([CAST(b AS VARCHAR) || '|' || sim[b*8+1:b*8+8]
                 for b in range(0, 4)]) AS band
  FROM sigs
),
pairs AS (
  SELECT DISTINCT x.doc AS a_doc, y.doc AS b_doc,
         x.sim AS a_sim, y.sim AS b_sim
  FROM banded x JOIN banded y ON x.band = y.band AND x.doc < y.doc
)
SELECT a_doc, b_doc,
       len([i for i in range(1, 33) if a_sim[i] <> b_sim[i]]) AS hamming
FROM pairs
WHERE len([i for i in range(1, 33) if a_sim[i] <> b_sim[i]]) <= 3
"""
    )

    sql["dedup_embedding_lsh"] = (
        """
        WITH corpus AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings
        ),
        b AS (
          SELECT vec_id AS vid, {bucket} AS bucket, """.format(
            bucket=" || ".join(_hyperplane_sign_sql(p) for p in range(8))
        )
        + _QUANT_EMB
        + """ AS qv FROM corpus
        ),
        n AS (
          SELECT vid, bucket, qv, """
        + _INT_DOT.format(a="qv", b="qv")
        + """ AS nrm FROM b
        ),
        pairs AS (
          SELECT a.vid AS a_id, b.vid AS b_id,
                 """
        + _INT_DOT.format(a="a.qv", b="b.qv")
        + """ AS dot,
                 a.nrm AS a_n, b.nrm AS b_n
          FROM n a JOIN n b ON a.bucket = b.bucket AND a.vid < b.vid
        )
        SELECT a_id, b_id,
               dot / sqrt(CAST(a_n * b_n AS DOUBLE)) AS cosine_q
        FROM pairs
        WHERE dot > 0
          AND CAST(dot AS HUGEINT) * dot * 10000 >= CAST(a_n AS HUGEINT) * b_n * 9025
    """
    )

    _ann_exact = (
        """
        WITH q AS (
          SELECT vec_id, """
        + _QUANT_EMB
        + """ AS qv FROM embeddings
        ),
        n AS (
          SELECT vec_id, qv, """
        + _INT_DOT.format(a="qv", b="qv")
        + """ AS nrm FROM q
        ),
        scored AS (
          SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id,
                 """
        + _INT_DOT.format(a="qs.qv", b="c.qv")
        + """ AS dot,
                 qs.nrm AS q_n, c.nrm AS c_n
          FROM n qs JOIN n c ON qs.vec_id <> c.vec_id
          WHERE qs.vec_id < 10
        )
        SELECT query_id, neighbor_id,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY dot DESC, neighbor_id ASC) AS INT)
                 AS rank,
               dot / sqrt(CAST(q_n * c_n AS DOUBLE)) AS cosine_q
        FROM scored
        QUALIFY rank <= 5
    """
    )

    # both physical strategies are result-identical by construction, so
    # the oracle is the same exact-topk relation tagged twice
    sql["ann_topk_both"] = (
        f"WITH base AS ({_ann_exact}) "
        "SELECT *, 'window' AS variant FROM base "
        "UNION ALL SELECT *, 'partial' AS variant FROM base"
    )

    proj_cols = ",\n                 ".join(
        f"{_hyperplane_proj_sql(p)} AS pr{p}" for p in range(8)
    )
    bucket_from_prs = " || ".join(
        f"(CASE WHEN pr{p} >= 0 THEN '1' ELSE '0' END)" for p in range(8)
    )
    margins = (
        "["
        + ", ".join(f"{{'m': abs(pr{p}), 'p': {p}}}" for p in range(8))
        + "]"
    )
    sql["ann_lsh"] = (
        f"""
        WITH b AS (
          SELECT vec_id, {proj_cols}, """
        + _QUANT_EMB
        + f""" AS qv FROM embeddings
        ),
        n AS (
          SELECT vec_id, {bucket_from_prs} AS bucket, qv, """
        + _INT_DOT.format(a="qv", b="qv")
        + f""" AS nrm,
                 list_sort({margins}) AS ord
          FROM b
        ),
        -- multi-probe keys: own bucket + flips of the 3 smallest-margin
        -- sign bits (margin order ties break on plane id, same as the
        -- Spark array_sort of (abs(proj), plane) structs)
        probes AS (
          SELECT vec_id, qv, nrm,
                 CASE WHEN gs.i = 0 THEN bucket
                      ELSE substr(bucket, 1, ord[gs.i].p)
                           || (CASE WHEN substr(bucket, ord[gs.i].p + 1, 1) = '1'
                                    THEN '0' ELSE '1' END)
                           || substr(bucket, ord[gs.i].p + 2)
                 END AS bucket
          FROM n CROSS JOIN (SELECT unnest(range(0, 4)) AS i) gs
          WHERE vec_id < 10
        ),
        scored_s AS (
          SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id,
                 """
        + _INT_DOT.format(a="qs.qv", b="c.qv")
        + """ AS dot,
                 qs.nrm AS q_n, c.nrm AS c_n
          FROM n qs JOIN n c ON qs.bucket = c.bucket AND qs.vec_id <> c.vec_id
          WHERE qs.vec_id < 10
        ),
        scored_m AS (
          SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS neighbor_id,
                 """
        + _INT_DOT.format(a="p.qv", b="c.qv")
        + """ AS dot,
                 p.nrm AS q_n, c.nrm AS c_n
          FROM probes p JOIN n c ON p.bucket = c.bucket AND p.vec_id <> c.vec_id
        ),
        ranked_s AS (
          SELECT query_id, neighbor_id,
                 CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY dot DESC, neighbor_id ASC) AS INT) AS rank,
                 dot / sqrt(CAST(q_n * c_n AS DOUBLE)) AS cosine_q
          FROM scored_s QUALIFY rank <= 5
        ),
        ranked_m AS (
          SELECT query_id, neighbor_id,
                 CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY dot DESC, neighbor_id ASC) AS INT) AS rank,
                 dot / sqrt(CAST(q_n * c_n AS DOUBLE)) AS cosine_q
          FROM scored_m QUALIFY rank <= 5
        )
        SELECT *, 'single' AS variant FROM ranked_s
        UNION ALL
        SELECT *, 'multiprobe' AS variant FROM ranked_m
    """
    )

    lang_cases = " ".join(
        f"WHEN {lang} = greatest(en, es, de, fr, zh) THEN '{lang}'"
        for lang in ("en", "es", "de", "fr", "zh")
    )
    en_pat = _LANG_PATTERNS["en"]
    ntok = _TOKENS.format(col="text")
    sql["text_profile"] = (
        "WITH "
        + _lang_score_sql()
        + rf""",
        f AS (
          SELECT doc_id,
                 length(text) AS n_chars,
                 len({ntok}) AS n_tokens,
                 length(regexp_replace(trim(text), '\s+', '', 'g')) AS squashed,
                 len(regexp_extract_all(text, '[\.,;:!\?]')) AS n_punct,
                 len(regexp_extract_all(text, '[a-zA-Z]')) AS n_alpha,
                 len(regexp_extract_all(lower(text), '{en_pat}')) AS n_stop,
                 len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+'))
                   AS n_tokens_bpe,
                 len(regexp_extract_all(text, '#|\.\.\.|…')) AS n_sym,
                 list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                     list_transform({ntok},
                       t -> CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT))),
                   (a, b) -> (a * 257 + b) % 2147483647) AS rolling_hash,
                 md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
                   AS fingerprint
          FROM documents
        ),
        tok AS (SELECT doc_id, {ntok} AS tk FROM documents),
        clf AS (
          SELECT doc_id,
                 CASE WHEN len(feats) > 0
                      THEN list_sum(list_transform(feats,
                        t -> CAST(('0x' || substr(md5('w:' ||
                               CAST(CAST(('0x' || substr(md5(t), 1, 7))
                                    AS BIGINT) % 4096 AS VARCHAR)), 1, 7))
                             AS BIGINT) % 2001 - 1000)) / len(feats)
                      ELSE NULL END AS clf_score
          FROM (
            SELECT doc_id,
                   list_concat(tk,
                     CASE WHEN len(tk) >= 2
                          THEN [array_to_string(tk[i:i+1], ' ')
                                for i in range(1, len(tk))]
                          ELSE [] END) AS feats
            FROM tok
          )
        ),
        g AS (
          SELECT doc_id,
                 unnest(CASE WHEN len(tk) >= 2
                             THEN [array_to_string(tk[i:i+1], ' ')
                                   for i in range(1, len(tk))]
                             ELSE [] END) AS gram
          FROM tok
        ),
        cnt AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
        per AS (
          SELECT doc_id,
                 CAST(sum(c) AS BIGINT) AS n_grams,
                 count(*) AS n_distinct,
                 max(c) AS top_freq,
                 max(c * length(gram)) AS top_chars
          FROM cnt GROUP BY 1
        ),
        g5 AS (
          SELECT doc_id,
                 unnest(CASE WHEN len(tk) >= 5
                             THEN [array_to_string(tk[i:i+4], ' ')
                                   for i in range(1, len(tk) - 3)]
                             ELSE [] END) AS gram
          FROM tok
        ),
        per5 AS (
          SELECT doc_id,
                 sum(c * length(gram)) FILTER (WHERE c > 1) AS dup5_chars
          FROM (SELECT doc_id, gram, count(*) AS c FROM g5 GROUP BY 1, 2)
          GROUP BY 1
        ),
        ln AS (
          SELECT doc_id,
                 list_filter(
                   list_transform(regexp_split_to_array(text, '\r?\n'),
                                  l -> trim(l)),
                   l -> l <> '') AS lines
          FROM documents
        ),
        lper AS (
          SELECT doc_id,
                 len(lines) AS n_lines,
                 len(list_distinct(lines)) AS nd_lines,
                 len(list_filter(lines,
                     l -> regexp_matches(l, '^[-*•]'))) AS n_bullet,
                 len(list_filter(lines,
                     l -> regexp_matches(l, '(\.\.\.|…)\z'))) AS n_ell
          FROM ln
        ),
        ldup AS (
          SELECT doc_id,
                 sum(c * length(line)) FILTER (WHERE c > 1) AS dupl_chars,
                 sum(c * length(line)) AS totl_chars
          FROM (SELECT doc_id, line, count(*) AS c
                FROM (SELECT doc_id, unnest(lines) AS line FROM ln)
                GROUP BY 1, 2)
          GROUP BY 1
        )
        SELECT f.doc_id,
               CASE WHEN greatest(en, es, de, fr, zh) = 0 THEN 'und'
                    {lang_cases}
                    ELSE 'und' END AS lang_guess,
               f.n_chars, f.n_tokens,
               squashed / f.n_tokens AS avg_token_len,
               n_punct / f.n_chars AS punct_ratio,
               n_alpha / f.n_chars AS alpha_ratio,
               n_stop / f.n_tokens AS stopword_ratio,
               0.4 * (n_alpha / f.n_chars)
                 + 0.3 * (CASE WHEN f.n_tokens >= 5 AND f.n_chars >= 30
                               THEN 1.0 ELSE 0.0 END)
                 + 0.3 * (1.0 - least((n_punct / f.n_chars) * 5.0, 1.0)) AS quality,
               f.n_tokens_bpe, f.rolling_hash, f.fingerprint,
               CASE WHEN coalesce(p.n_grams, 0) = 0 THEN 0.0
                    ELSE 1.0 - p.n_distinct / p.n_grams END AS dup_frac,
               CASE WHEN coalesce(p.n_grams, 0) = 0 THEN 0.0
                    ELSE p.top_freq / p.n_grams END AS top_frac,
               CASE WHEN f.n_chars = 0 THEN 0.0
                    ELSE coalesce(p.top_chars, 0) / f.n_chars
                    END AS top_gram_char_frac,
               CASE WHEN f.n_chars = 0 THEN 0.0
                    ELSE coalesce(p5.dup5_chars, 0) / f.n_chars
                    END AS dup_gram_char_frac,
               CAST(lp.n_lines AS BIGINT) AS n_lines,
               CASE WHEN lp.n_lines = 0 THEN 0.0
                    ELSE 1.0 - lp.nd_lines / lp.n_lines END AS dup_line_frac,
               CASE WHEN coalesce(ld.totl_chars, 0) = 0 THEN 0.0
                    ELSE coalesce(ld.dupl_chars, 0) / ld.totl_chars
                    END AS dup_line_char_frac,
               CASE WHEN lp.n_lines = 0 THEN 0.0
                    ELSE lp.n_bullet / lp.n_lines END AS bullet_line_frac,
               CASE WHEN lp.n_lines = 0 THEN 0.0
                    ELSE lp.n_ell / lp.n_lines END AS ellipsis_line_frac,
               CASE WHEN f.n_tokens = 0 THEN 0.0
                    ELSE n_sym / f.n_tokens END AS symbol_word_ratio,
               c.clf_score
        FROM f
        JOIN s ON s.doc_id = f.doc_id
        JOIN clf c ON c.doc_id = f.doc_id
        LEFT JOIN per p ON p.doc_id = f.doc_id
        LEFT JOIN per5 p5 ON p5.doc_id = f.doc_id
        JOIN lper lp ON lp.doc_id = f.doc_id
        LEFT JOIN ldup ld ON ld.doc_id = f.doc_id
    """
    )

    # word-3-gram shingle CTE body, parameterized by source relation
    _sh3 = """
      SELECT doc_id,
             CASE WHEN len(tk) >= 3
                  THEN list_distinct([array_to_string(tk[i:i+2], ' ')
                                      for i in range(1, len(tk) - 1)])
                  ELSE [] END AS sh
      FROM {src}
    """

    sql["contamination_ngram"] = (
        rf"""
        WITH ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 1),
        tr AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 1),
        evtok AS (SELECT doc_id, {ntok} AS tk FROM ev),
        evsh AS ("""
        + _sh3.format(src="evtok")
        + rf"""),
        evx AS (SELECT doc_id AS eval_doc, unnest(sh) AS shingle FROM evsh),
        evsz AS (SELECT doc_id AS eval_doc, len(sh) AS n_shingles FROM evsh),
        trtok AS (SELECT doc_id, {ntok} AS tk FROM tr),
        trsh AS ("""
        + _sh3.format(src="trtok")
        + """),
        trx AS (SELECT DISTINCT shingle
                FROM (SELECT unnest(sh) AS shingle FROM trsh)),
        hits AS (
          SELECT eval_doc, count(*) AS n_contaminated
          FROM evx JOIN trx USING (shingle)
          GROUP BY eval_doc
        )
        SELECT s.eval_doc, s.n_shingles,
               coalesce(h.n_contaminated, 0) AS n_contaminated,
               CASE WHEN s.n_shingles = 0 THEN 0.0
                    ELSE coalesce(h.n_contaminated, 0) / s.n_shingles END
                 AS contamination
        FROM evsz s LEFT JOIN hits h USING (eval_doc)
    """
    )

    # quality score expression (identical operand order to
    # functions/text.quality_score -> identical IEEE doubles)
    _qexpr = """(0.4 * (n_alpha / n_chars)
                 + 0.3 * (CASE WHEN n_tokens >= 5 AND n_chars >= 30
                               THEN 1.0 ELSE 0.0 END)
                 + 0.3 * (1.0 - least((n_punct / n_chars) * 5.0, 1.0)))"""
    _qfeat = rf"""
             length(text) AS n_chars,
             len({ntok}) AS n_tokens,
             len(regexp_extract_all(text, '[\.,;:!\?]')) AS n_punct,
             len(regexp_extract_all(text, '[a-zA-Z]')) AS n_alpha"""

    lang_score_cols = ",\n             ".join(
        f"len(regexp_extract_all(lower(text), '{pat}')) AS {lang}"
        for lang, pat in _LANG_PATTERNS.items()
    )
    sql["quality_funnel"] = (
        rf"""
        WITH corpus AS (
          SELECT doc_id, text, lang FROM documents
          UNION ALL
          SELECT doc_id + 100000 AS doc_id, text, lang FROM documents
        ),
        f AS (
          SELECT doc_id, lang,
             md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
             {lang_score_cols},
             len(regexp_extract_all(text, '[一-龥]')) AS zh,"""
        + _qfeat
        + f"""
          FROM corpus
        ),
        g AS (
          SELECT lang, doc_id, fp,
                 (CASE WHEN greatest(en, es, de, fr, zh) = 0 THEN 'und'
                       {lang_cases}
                       ELSE 'und' END) = lang AS lang_ok,
                 {_qexpr} >= 0.5 AS q_ok,
                 doc_id = min(doc_id) OVER (PARTITION BY fp) AS keep
          FROM f
        )
        SELECT lang,
               count(*) AS n_total,
               CAST(sum(CASE WHEN lang_ok THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_lang_ok,
               CAST(sum(CASE WHEN lang_ok AND q_ok THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_quality_ok,
               CAST(sum(CASE WHEN lang_ok AND q_ok AND keep THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_survivors
        FROM g
        GROUP BY lang
    """
    )

    sql["domain_topk"] = (
        """
        WITH f AS (
          SELECT doc_id, source AS domain,"""
        + _qfeat
        + f"""
          FROM documents
        ),
        s AS (SELECT domain, doc_id, {_qexpr} AS quality FROM f)
        SELECT 'topk' AS kind, domain AS key,
               CAST(row_number() OVER (PARTITION BY domain
                                       ORDER BY quality DESC, doc_id ASC)
                    AS BIGINT) AS k,
               doc_id AS n, quality AS v
        FROM s
        QUALIFY k <= 5
        UNION ALL
        SELECT 'heavy' AS kind, token AS key, CAST(0 AS BIGINT) AS k,
               count(*) AS n, CAST(NULL AS DOUBLE) AS v
        FROM (SELECT unnest({ws_tokens}) AS token FROM documents)
        GROUP BY 2 HAVING count(*) >= 300
    """
    )

    sql["corpus_lengths"] = rf"""
        WITH hist AS (
          SELECT lang,
                 CAST(floor(len({ntok}) / 8) AS BIGINT) * 8 AS bucket_lo,
                 count(*) AS n_docs
          FROM documents
          GROUP BY lang, bucket_lo
        ),
        ranked AS (
          SELECT lang AS strata, n_chars AS value,
                 row_number() OVER (
                   PARTITION BY lang ORDER BY n_chars ASC, doc_id ASC
                 ) AS rn,
                 count(*) OVER (PARTITION BY lang) AS n
          FROM documents
        ),
        pct AS (
          SELECT strata,
                 max(n) AS n_docs,
                 max(CASE WHEN rn = (50 * n + 99) // 100 THEN value END) AS p50,
                 max(CASE WHEN rn = (90 * n + 99) // 100 THEN value END) AS p90,
                 max(CASE WHEN rn = (99 * n + 99) // 100 THEN value END) AS p99
          FROM ranked GROUP BY strata
        )
        SELECT 'bucket' AS kind, lang AS strata, bucket_lo AS k,
               CAST(n_docs AS BIGINT) AS v FROM hist
        UNION ALL
        SELECT 'p50', strata, 50, CAST(p50 AS BIGINT) FROM pct
        UNION ALL
        SELECT 'p90', strata, 90, CAST(p90 AS BIGINT) FROM pct
        UNION ALL
        SELECT 'p99', strata, 99, CAST(p99 AS BIGINT) FROM pct
        UNION ALL
        SELECT 'n_docs', strata, 0, CAST(n_docs AS BIGINT) FROM pct
    """

    # the valve's sub-bucket key: first b_bits chars of the 16-plane
    # sign pattern over the QUANTIZED vector (operators/dedup.py
    # semantic_cluster_dedup max_cluster_size path)
    _bits16 = "concat(" + ", ".join(
        _hyperplane_sign_sql(p, "a.c_qv") for p in range(16)
    ) + ")"
    sql["dedup_semantic"] = (
        """
        WITH corpus AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings
        ),
        q0 AS (
          SELECT vec_id, """
        + _QUANT_EMB
        + """ AS qv FROM corpus
        ),
        n0 AS (
          SELECT vec_id, qv, """
        + _INT_DOT.format(a="qv", b="qv")
        + """ AS nrm FROM q0
        ),
        cen AS (SELECT vec_id AS cen_id, qv AS cen_qv, nrm AS cen_n
                FROM n0 WHERE vec_id < 8),
        assigned AS (
          SELECT vec_id AS c_id, qv AS c_qv, nrm AS c_n, cen_id AS cluster_id
          FROM (
            SELECT c.vec_id, c.qv, c.nrm, cen.cen_id,
                   row_number() OVER (
                     PARTITION BY c.vec_id
                     ORDER BY """
        + _INT_DOT.format(a="c.qv", b="cen.cen_qv")
        + """ / sqrt(CAST(cen.cen_n AS DOUBLE)) DESC, cen.cen_id ASC) AS rn
            FROM n0 c CROSS JOIN cen
          ) WHERE rn = 1
        ),
        sizes AS (
          SELECT cluster_id,
                 CAST(ceil(log2(greatest(ceil(count(*) / 32), 1)))
                      AS INT) AS b_bits
          FROM assigned GROUP BY cluster_id
        ),
        subbed AS (
          SELECT a.c_id, a.c_qv, a.c_n, a.cluster_id,
                 substr("""
        + _bits16
        + """, 1, s.b_bits) AS sub
          FROM assigned a JOIN sizes s USING (cluster_id)
        ),
        pairs AS (
          SELECT a.cluster_id, a.c_id AS a_id, b.c_id AS b_id,
                 """
        + _INT_DOT.format(a="a.c_qv", b="b.c_qv")
        + """ AS dot, a.c_n AS a_n, b.c_n AS b_n
          FROM assigned a JOIN assigned b
            ON a.cluster_id = b.cluster_id AND a.c_id < b.c_id
        ),
        pairs_c AS (
          SELECT a.cluster_id, a.c_id AS a_id, b.c_id AS b_id,
                 """
        + _INT_DOT.format(a="a.c_qv", b="b.c_qv")
        + """ AS dot, a.c_n AS a_n, b.c_n AS b_n
          FROM subbed a JOIN subbed b
            ON a.cluster_id = b.cluster_id AND a.sub = b.sub
               AND a.c_id < b.c_id
        )
        SELECT 'uncapped' AS variant, cluster_id, a_id, b_id,
               dot / sqrt(CAST(a_n * b_n AS DOUBLE)) AS cosine_q,
               CAST(NULL AS VARCHAR) AS sub, CAST(NULL AS BIGINT) AS n_vec
        FROM pairs
        WHERE dot > 0
          AND CAST(dot AS HUGEINT) * dot * 10000
              >= CAST(a_n AS HUGEINT) * b_n * 9025
        UNION ALL
        SELECT 'capped' AS variant, cluster_id, a_id, b_id,
               dot / sqrt(CAST(a_n * b_n AS DOUBLE)) AS cosine_q,
               CAST(NULL AS VARCHAR) AS sub, CAST(NULL AS BIGINT) AS n_vec
        FROM pairs_c
        WHERE dot > 0
          AND CAST(dot AS HUGEINT) * dot * 10000
              >= CAST(a_n AS HUGEINT) * b_n * 9025
        UNION ALL
        SELECT 'bucket_audit' AS variant, cluster_id,
               CAST(NULL AS BIGINT) AS a_id, CAST(NULL AS BIGINT) AS b_id,
               CAST(NULL AS DOUBLE) AS cosine_q,
               sub, count(*) AS n_vec
        FROM subbed GROUP BY cluster_id, sub
    """
    )

    sql["sampling_report"] = """
        WITH rated AS (
          SELECT doc_id, source,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                      AS BIGINT) % 10000 AS bucket,
                 CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.25
                             WHEN 'src2' THEN 0.5 WHEN 'src3' THEN 0.75
                             ELSE 0.0 END AS rate
          FROM documents
        ),
        assigned AS (
          SELECT lang AS strata, doc_id,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                      AS BIGINT) % 1000 AS bucket
          FROM documents
        )
        SELECT 'mixture' AS kind, source AS strata, 'kept' AS subkey,
               count(*) AS n_docs,
               min(doc_id) AS min_doc,
               max(doc_id) AS max_doc
        FROM rated WHERE bucket < rate * 10000
        GROUP BY source
        UNION ALL
        SELECT 'split' AS kind, strata,
               CASE WHEN bucket < 100 THEN 'val'
                    WHEN bucket < 200 THEN 'test'
                    ELSE 'train' END AS subkey,
               count(*) AS n_docs,
               min(doc_id) AS min_doc,
               max(doc_id) AS max_doc
        FROM assigned
        GROUP BY 1, 2, 3
        UNION ALL
        SELECT 'temperature' AS kind, source AS strata, 'kept' AS subkey,
               count(*) AS n_docs,
               min(doc_id) AS min_doc,
               max(doc_id) AS max_doc
        FROM (
          SELECT d.doc_id, d.source
          FROM documents d
          JOIN (SELECT source, count(*) AS n FROM documents GROUP BY 1) c
            ON d.source = c.source
          CROSS JOIN (SELECT min(n) AS nmin FROM
                      (SELECT count(*) AS n FROM documents GROUP BY source))
          WHERE CAST(CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 7))
                          AS BIGINT) AS HUGEINT)
                * CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 7))
                       AS BIGINT)
                * c.n < CAST(72057594037927936 AS HUGEINT) * nmin
        )
        GROUP BY 1, 2, 3
    """

    sql["unigram_perplexity"] = rf"""
        WITH terms AS (
          SELECT doc_id AS doc, unnest({ws_tokens}) AS term FROM documents
        ),
        tf AS (
          SELECT doc, term, count(*) AS tf FROM terms GROUP BY 1, 2
        ),
        vocab AS (
          SELECT term, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY 1
        ),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM vocab),
        lp AS (
          SELECT term,
                 CAST(round(ln(cnt / n_total) * 1000) AS BIGINT) AS lp_milli
          FROM vocab, tot
        ),
        agg AS (
          SELECT doc,
                 CAST(sum(tf) AS BIGINT) AS n_tokens,
                 CAST(-sum(tf * lp_milli) AS BIGINT) AS nll_milli
          FROM tf JOIN lp USING (term) GROUP BY doc
        )
        SELECT 'unigram' AS kind, doc, n_tokens AS n_events,
               CAST(0 AS BIGINT) AS n_backoff, nll_milli,
               nll_milli // n_tokens AS mean_nll_milli,
               (nll_milli // n_tokens) // 500 AS ppl_bucket
        FROM agg
        UNION ALL
        SELECT 'bigram', doc, n_events, n_backoff, nll_milli,
               nll_milli // n_events AS mean_nll_milli,
               (nll_milli // n_events) // 500 AS ppl_bucket
        FROM (
          WITH tokd AS (
            SELECT doc_id AS doc, {ws_tokens} AS tk FROM documents
          ),
          bg AS (
            SELECT doc, unnest(CASE WHEN len(tk) >= 2
                   THEN [array_to_string(tk[i:i+1], ' ')
                         for i in range(1, len(tk))]
                   ELSE [] END) AS bg
            FROM tokd
          ),
          lm_bg AS (SELECT bg.bg FROM bg WHERE bg.doc % 10 = 1),
          c12 AS (SELECT bg, CAST(count(*) AS BIGINT) AS c12
                  FROM lm_bg GROUP BY 1),
          c1 AS (SELECT string_split(bg, ' ')[1] AS w1,
                        CAST(count(*) AS BIGINT) AS c1
                 FROM lm_bg GROUP BY 1),
          uni AS (
            SELECT term, CAST(count(*) AS BIGINT) AS c2 FROM (
              SELECT unnest(tk) AS term FROM tokd WHERE doc % 10 = 1
            ) GROUP BY 1
          ),
          tot AS (SELECT CAST(sum(c2) AS BIGINT) AS n_total FROM uni),
          dbg AS (
            SELECT doc, bg, CAST(count(*) AS BIGINT) AS tf,
                   string_split(bg, ' ')[1] AS w1,
                   string_split(bg, ' ')[2] AS w2
            FROM bg GROUP BY 1, 2
          ),
          ev AS (
            SELECT d.doc, d.tf, c12.c12,
                   CASE
                     WHEN c12.c12 IS NOT NULL
                       THEN CAST(round(ln(c12.c12 / c1.c1) * 1000) AS BIGINT)
                     WHEN uni.c2 IS NOT NULL
                       THEN CAST(round(ln(0.4 * uni.c2 / tot.n_total) * 1000)
                                 AS BIGINT)
                     ELSE CAST(round(ln(0.4 / tot.n_total) * 1000) AS BIGINT)
                   END AS lp_milli
            FROM dbg d
            LEFT JOIN c12 ON c12.bg = d.bg
            LEFT JOIN c1 ON c1.w1 = d.w1
            LEFT JOIN uni ON uni.term = d.w2
            CROSS JOIN tot
          )
          SELECT doc,
                 CAST(sum(tf) AS BIGINT) AS n_events,
                 CAST(sum(CASE WHEN c12 IS NULL THEN tf ELSE 0 END) AS BIGINT)
                   AS n_backoff,
                 CAST(-sum(tf * lp_milli) AS BIGINT) AS nll_milli
          FROM ev GROUP BY 1
        )
    """

    sql["importance_resample"] = rf"""
        WITH terms AS (
          SELECT doc_id AS doc, unnest({ws_tokens}) AS term FROM documents
        ),
        raw_tf AS (
          SELECT doc,
                 CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) % 64
                   AS bucket,
                 count(*) AS tf
          FROM terms GROUP BY 1, 2
        ),
        tgt AS (
          SELECT bucket, CAST(sum(tf) AS BIGINT) AS t_cnt
          FROM raw_tf WHERE doc % 10 = 1 GROUP BY 1
        ),
        srcc AS (
          SELECT bucket, CAST(sum(tf) AS BIGINT) AS s_cnt
          FROM raw_tf GROUP BY 1
        ),
        spine AS (
          SELECT bucket,
                 coalesce(t_cnt, 0) AS t_cnt, coalesce(s_cnt, 0) AS s_cnt
          FROM (SELECT range AS bucket FROM range(64)) b
          LEFT JOIN tgt USING (bucket) LEFT JOIN srcc USING (bucket)
        ),
        tot AS (
          SELECT CAST(sum(t_cnt) AS BIGINT) AS t_total,
                 CAST(sum(s_cnt) AS BIGINT) AS s_total
          FROM spine
        ),
        ratios AS (
          SELECT bucket,
                 CAST(round(ln(((t_cnt + 1) / (t_total + 64))
                              / ((s_cnt + 1) / (s_total + 64))) * 1000)
                      AS BIGINT) AS ratio_milli
          FROM spine, tot
        ),
        scored AS (
          SELECT doc,
                 CAST(sum(tf) AS BIGINT) AS n_tokens,
                 CAST(sum(tf * ratio_milli) AS BIGINT) AS weight_milli
          FROM raw_tf JOIN ratios USING (bucket) GROUP BY doc
        )
        SELECT doc, n_tokens, weight_milli,
               weight_milli // n_tokens AS avg_ratio_milli,
               (CAST(('0x' || substr(md5(CAST(doc AS VARCHAR)), 1, 8))
                     AS BIGINT) % 10000) / 10000.0
                 < exp(least(weight_milli // n_tokens, 0) / 1000.0) AS accept
        FROM scored
    """

    sql["salient_terms"] = rf"""
        WITH terms AS (
          SELECT doc_id AS doc, unnest({ntok}) AS term FROM documents
        ),
        tf AS (
          SELECT doc, term, count(*) AS tf FROM terms GROUP BY 1, 2
        ),
        dfreq AS (
          SELECT term, count(*) AS df_docs FROM tf GROUP BY 1
        ),
        ranked AS (
          SELECT tf.doc, tf.term, tf.tf, dfreq.df_docs,
                 row_number() OVER (
                   PARTITION BY tf.doc
                   ORDER BY tf.tf DESC, dfreq.df_docs ASC, tf.term ASC
                 ) AS rank
          FROM tf JOIN dfreq USING (term)
        )
        SELECT 'salient' AS part, doc, rank, term, tf, df_docs,
               tf * ((SELECT count(*) FROM documents) / df_docs) AS v
        FROM ranked WHERE rank <= 3
        UNION ALL
        SELECT 'bm25', doc, n_terms_matched AS rank,
               CAST(NULL AS VARCHAR) AS term, CAST(NULL AS BIGINT) AS tf,
               CAST(NULL AS BIGINT) AS df_docs,
               CAST(bm25_milli AS DOUBLE) AS v
        FROM (
          WITH dl AS (SELECT doc, count(*) AS dl FROM terms GROUP BY 1),
          stats AS (
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(dl) AS BIGINT) AS tok_total
            FROM dl
          ),
          qtf AS (
            SELECT doc, term, count(*) AS tf FROM terms
            WHERE term IN ('merge', 'window', 'shuffle') GROUP BY 1, 2
          ),
          qdf AS (SELECT term, count(*) AS df_docs FROM qtf GROUP BY 1),
          contrib AS (
            SELECT q.doc,
                   CAST(round(
                     ln((s.n_docs - d.df_docs + 0.5) / (d.df_docs + 0.5) + 1.0)
                     * ((q.tf * (1.2 + 1.0)) /
                        (q.tf + 1.2 * (1.0 - 0.75
                          + 0.75 * l.dl / (s.tok_total / s.n_docs))))
                     * 1000) AS BIGINT) AS c
            FROM qtf q
            JOIN qdf d USING (term)
            JOIN dl l USING (doc)
            CROSS JOIN stats s
          )
          SELECT doc, CAST(count(*) AS BIGINT) AS n_terms_matched,
                 CAST(sum(c) AS BIGINT) AS bm25_milli
          FROM contrib GROUP BY 1
        )
    """

    sql["merge_pairs"] = rf"""
        WITH tok AS (SELECT doc_id, {ntok} AS tk FROM documents),
        grams AS (
          SELECT unnest(CASE WHEN len(tk) >= 2
                             THEN [array_to_string(tk[i:i+1], ' ')
                                   for i in range(1, len(tk))]
                             ELSE [] END) AS pair
          FROM tok
        )
        SELECT pair, count(*) AS n_occurrences
        FROM grams GROUP BY pair
        ORDER BY n_occurrences DESC, pair ASC
        LIMIT 20
    """

    sql["pack_sequences"] = rf"""
        WITH t AS (
          SELECT doc_id % 16 AS shard, doc_id AS doc,
                 len({ntok}) AS n_tok
          FROM documents
        ),
        placed AS (
          SELECT shard, doc, n_tok,
                 CAST(floor(coalesce(sum(n_tok) OVER (
                   PARTITION BY shard ORDER BY doc
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) / 128) AS BIGINT) AS window_id
          FROM t
        )
        SELECT 'pack' AS kind, shard, window_id,
               count(*) AS n_docs,
               min(doc) AS first_doc,
               CAST(sum(n_tok) AS BIGINT) AS tokens_started,
               CAST(NULL AS VARCHAR) AS group_fp
        FROM placed GROUP BY 2, 3
        UNION ALL
        SELECT 'chunk' AS kind, shard, n_chunks AS window_id,
               count(*) AS n_docs,
               min(doc) AS first_doc,
               CAST(sum(tok) AS BIGINT) AS tokens_started,
               min(fp) AS group_fp
        FROM (
          SELECT shard, doc, count(*) AS n_chunks,
                 sum(n_tokens) AS tok, min(chunk_fp) AS fp
          FROM (
            SELECT shard, doc, cid,
                   len(tk[cid * 48 + 1 : cid * 48 + 64]) AS n_tokens,
                   md5(array_to_string(tk[cid * 48 + 1 : cid * 48 + 64], ' '))
                     AS chunk_fp
            FROM (
              SELECT doc_id % 16 AS shard, doc_id AS doc, {ntok} AS tk,
                     unnest(range(greatest(1,
                       (len({ntok}) - 16 + 47) // 48))) AS cid
              FROM documents
            )
          ) GROUP BY 1, 2
        ) GROUP BY 2, 3
    """

    return sql
