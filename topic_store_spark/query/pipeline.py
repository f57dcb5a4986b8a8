"""Mongo aggregation pipeline subset -> DataFrame operations.

Parity (SURVEY §2.5 A4, reference database.py:206-217 pass-through):
``$match $project $group $sort $limit $skip $unwind $count $addFields
$set`` with accumulator operators ``$sum $avg $min $max $first $last
$push $addToSet`` and a value-expression language covering field refs
(``"$a.b"``), literals, arithmetic, string ops and the date-part
operators the reference's legacy session pipeline uses
(reference database.py:243-256: ``$dateFromParts`` + ``$year`` ..
``$second`` applied to ObjectId creation time).

Each stage maps to one declarative DataFrame op, so Catalyst still owns
optimization: a ``$match`` early in the pipeline pushes into the scan,
``$group`` gets map-side partial aggregation, ``$sort``+``$limit``
becomes TakeOrderedAndProject.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from topic_store_spark.objectid import generation_time
from topic_store_spark.query.compiler import compile_query, path_col


def _as_timestamp(col: Column) -> Column:
    """Date-part helper: ObjectId strings resolve to their generation time,
    anything else casts to timestamp (reference database.py:250-256 applies
    date parts to ObjectId-derived times)."""
    text = col.cast("string")
    return F.when(
        text.rlike("^[0-9a-fA-F]{24}$"), generation_time(text)
    ).otherwise(col.cast("timestamp"))


def compile_value(expr: Any) -> Column:
    """Mongo value expression -> Column."""
    if isinstance(expr, str) and expr.startswith("$"):
        return path_col(expr[1:])
    if isinstance(expr, (int, float, bool)) or expr is None:
        return F.lit(expr)
    if isinstance(expr, str):
        return F.lit(expr)
    if isinstance(expr, list):
        return F.array(*[compile_value(e) for e in expr])
    if not isinstance(expr, dict):
        raise ValueError(f"unsupported value expression: {expr!r}")
    if len(expr) == 1:
        op, arg = next(iter(expr.items()))
        if op.startswith("$"):
            return _compile_value_op(op, arg)
    # plain document -> struct
    return F.struct(*[compile_value(v).alias(str(k)) for k, v in expr.items()])


_DATE_PARTS = {
    "$year": F.year,
    "$month": F.month,
    "$dayOfMonth": F.dayofmonth,
    "$hour": F.hour,
    "$minute": F.minute,
    "$second": F.second,
}

_VARIADIC = {
    "$add": lambda cols: _fold(cols, lambda a, b: a + b),
    "$subtract": lambda cols: _fold(cols, lambda a, b: a - b),
    "$multiply": lambda cols: _fold(cols, lambda a, b: a * b),
    "$divide": lambda cols: _fold(cols, lambda a, b: a / b),
    "$concat": lambda cols: F.concat(*cols),
}


def _fold(cols: list[Column], fn) -> Column:
    out = cols[0]
    for col in cols[1:]:
        out = fn(out, col)
    return out


def _compile_value_op(op: str, arg: Any) -> Column:
    if op == "$literal":
        return F.lit(arg)
    if op in _VARIADIC:
        return _VARIADIC[op]([compile_value(a) for a in arg])
    if op in _DATE_PARTS:
        return _DATE_PARTS[op](_as_timestamp(compile_value(arg)))
    if op == "$millisecond":
        ts = _as_timestamp(compile_value(arg))
        return (ts.cast("double") * 1000 % 1000).cast("int")
    if op == "$toDate":
        return _as_timestamp(compile_value(arg))
    if op == "$dateFromParts":
        get = lambda k, d: compile_value(arg[k]) if k in arg else F.lit(d)  # noqa: E731
        return F.make_timestamp(
            compile_value(arg["year"]),
            get("month", 1),
            get("day", 1),
            get("hour", 0),
            get("minute", 0),
            get("second", 0).cast("double") + get("millisecond", 0) / 1000.0,
        )
    if op == "$split":
        # Mongo $split is a literal-delimiter split; Spark's is regex
        if not (isinstance(arg[1], str) and not arg[1].startswith("$")):
            raise ValueError("$split delimiter must be a string literal")
        import re

        return F.split(compile_value(arg[0]), re.escape(arg[1]))
    if op == "$toLower":
        return F.lower(compile_value(arg))
    if op == "$toUpper":
        return F.upper(compile_value(arg))
    if op == "$size":
        return F.size(compile_value(arg))
    if op == "$ifNull":
        return F.coalesce(*[compile_value(a) for a in arg])
    if op == "$cond":
        if isinstance(arg, dict):
            branches = [arg["if"], arg["then"], arg["else"]]
        else:
            branches = arg
        return F.when(
            compile_value(branches[0]), compile_value(branches[1])
        ).otherwise(compile_value(branches[2]))
    if op in ("$eq", "$ne", "$gt", "$gte", "$lt", "$lte"):
        left, right = (compile_value(a) for a in arg)
        import operator as _op

        table = {
            "$eq": _op.eq, "$ne": _op.ne, "$gt": _op.gt,
            "$gte": _op.ge, "$lt": _op.lt, "$lte": _op.le,
        }
        return table[op](left, right)
    raise ValueError(f"unsupported value operator: {op}")


def _attach_computed(df: DataFrame, computed: dict[str, Any]) -> DataFrame:
    """Attach computed fields in a single ``select`` so every expression
    evaluates against the stage's INPUT document (Mongo semantics for
    ``$project``/``$addFields``): a field that shadows an input column
    overwrites it in place, but sibling expressions still read the input."""
    if not computed:
        return df
    exprs = {name: compile_value(spec) for name, spec in computed.items()}
    cols = [
        exprs[c].alias(c) if c in exprs else F.col(f"`{c}`")
        for c in df.columns
    ]
    cols += [e.alias(n) for n, e in exprs.items() if n not in df.columns]
    return df.select(*cols)


_ACCUMULATORS = {
    "$sum": lambda c: F.sum(c),
    "$avg": lambda c: F.avg(c),
    "$min": lambda c: F.min(c),
    "$max": lambda c: F.max(c),
    "$first": lambda c: F.first(c, ignorenulls=False),
    "$last": lambda c: F.last(c, ignorenulls=False),
    "$push": lambda c: F.collect_list(c),
    "$addToSet": lambda c: F.collect_set(c),
}


def _compile_group(df: DataFrame, spec: dict[str, Any]) -> DataFrame:
    key_expr = spec["_id"]
    if key_expr is None:
        grouped = df.groupBy()
        key_cols: list[str] = []
    elif isinstance(key_expr, dict) and not any(
        k.startswith("$") for k in key_expr
    ):
        keys = [compile_value(v).alias(str(k)) for k, v in key_expr.items()]
        df = df.select(*keys, "*")
        grouped = df.groupBy(*[f"`{k}`" for k in key_expr])
        key_cols = [str(k) for k in key_expr]
    else:
        df = df.withColumn("_id__group", compile_value(key_expr))
        grouped = df.groupBy("_id__group")
        key_cols = ["_id__group"]

    aggs = []
    for name, acc in spec.items():
        if name == "_id":
            continue
        if not isinstance(acc, dict) or len(acc) != 1:
            raise ValueError(f"bad accumulator for {name}: {acc!r}")
        op, arg = next(iter(acc.items()))
        if op == "$count" or (op == "$sum" and arg == 1):
            aggs.append(F.count(F.lit(1)).alias(name))
        elif op in _ACCUMULATORS:
            aggs.append(_ACCUMULATORS[op](compile_value(arg)).alias(name))
        else:
            raise ValueError(f"unsupported accumulator: {op}")
    out = grouped.agg(*aggs) if aggs else grouped.agg(F.count(F.lit(1)).alias("count"))
    if key_cols == ["_id__group"]:
        out = out.withColumnRenamed("_id__group", "_id")
    return out


def apply_pipeline(
    df: DataFrame,
    pipeline: list[dict[str, Any]],
    tables: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Run a Mongo-style aggregation pipeline over a DataFrame.

    ``tables`` resolves ``$lookup.from`` names to DataFrames (the engine
    analog of "another collection in the same database")."""
    from topic_store_spark.query.projection import apply_projection

    out = df
    for stage in pipeline:
        if len(stage) != 1:
            raise ValueError(f"each stage must have exactly one operator: {stage}")
        op, spec = next(iter(stage.items()))
        if op == "$lookup":
            if not tables or spec["from"] not in tables:
                raise ValueError(f"$lookup: unknown collection {spec.get('from')!r}")
            foreign = tables[spec["from"]]
            local, remote, as_name = (
                spec["localField"],
                spec["foreignField"],
                spec["as"],
            )
            # Mongo $lookup: array of matching foreign docs per row (empty
            # array when none).  Pre-aggregate the foreign side per key —
            # only the (dimension-sized) foreign table shuffles; local rows
            # stay intact through a left join, duplicates preserved.
            fstruct = F.struct(*[F.col(f"`{c}`").alias(c) for c in foreign.columns])
            fagg = foreign.groupBy(F.col(f"`{remote}`").alias("_lk_key")).agg(
                F.array_sort(F.collect_list(fstruct)).alias(as_name)
            )
            arr_type = fagg.schema[as_name].dataType.simpleString()
            out = (
                out.join(fagg, path_col(local) == F.col("_lk_key"), "left")
                .drop("_lk_key")
                .withColumn(
                    as_name,
                    F.coalesce(F.col(f"`{as_name}`"), F.array().cast(arr_type)),
                )
            )
        elif op == "$match":
            out = out.filter(compile_query(spec, out.schema))
        elif op == "$project":
            flags = {k: v for k, v in spec.items() if v in (0, 1, True, False)}
            computed = {k: v for k, v in spec.items() if k not in flags}
            # computed fields see the *input* document (Mongo semantics):
            # every expression compiles against the stage input and all are
            # attached in ONE select, so a computed field that references
            # (or shadows) another projected field still reads the input
            # value, never a freshly computed one.
            out = _attach_computed(out, computed)
            if flags:
                proj = dict(flags)
                if any(v in (1, True) for v in flags.values()):
                    for name in computed:
                        proj[name] = 1
                out = apply_projection(out, proj)
        elif op in ("$addFields", "$set"):
            # same input-document semantics as $project computed fields
            out = _attach_computed(out, spec)
        elif op == "$group":
            out = _compile_group(out, spec)
        elif op == "$sort":
            order = [
                F.col(f"`{k}`").asc() if direction >= 0 else F.col(f"`{k}`").desc()
                for k, direction in spec.items()
            ]
            out = out.orderBy(*order)
        elif op == "$limit":
            out = out.limit(int(spec))
        elif op == "$skip":
            out = out.offset(int(spec))
        elif op == "$unwind":
            path = spec["path"] if isinstance(spec, dict) else spec
            field = path[1:] if path.startswith("$") else path
            exploded = F.explode(path_col(field))
            if "." not in field:
                out = out.withColumn(field, exploded)
            else:
                # Mongo replaces the array at its original path: explode to
                # a scratch column (generators must sit at the top of a
                # projection), then rebuild the enclosing struct with the
                # element put back where the array was.
                top, rest = field.split(".", 1)
                out = (
                    out.withColumn("_unwind_elem", exploded)
                    .withColumn(
                        top, F.col(f"`{top}`").withField(rest, F.col("_unwind_elem"))
                    )
                    .drop("_unwind_elem")
                )
        elif op == "$sortByCount":
            field = spec[1:] if isinstance(spec, str) and spec.startswith("$") else spec
            out = (
                out.groupBy(path_col(field).alias("_id"))
                .agg(F.count(F.lit(1)).alias("count"))
                .orderBy(F.col("count").desc(), F.col("_id").asc())
            )
        elif op == "$bucket":
            group_by = compile_value(spec["groupBy"])
            bounds = spec["boundaries"]
            default = spec.get("default")
            # Mongo bucket ids may mix numeric boundaries with a string
            # default; Spark columns are single-typed, so a non-numeric
            # default forces the id to string
            stringify = default is not None and not isinstance(
                default, (int, float)
            )

            def _id_lit(v):
                return F.lit(str(v) if stringify else v)

            bucket = _id_lit(default) if default is not None else F.lit(None)
            for lo, hi in zip(bounds, bounds[1:]):
                bucket = F.when(
                    (group_by >= F.lit(lo)) & (group_by < F.lit(hi)), _id_lit(lo)
                ).otherwise(bucket)
            outputs = spec.get("output", {"count": {"$sum": 1}})
            bucketed = out.withColumn("_id__group", bucket)
            if default is None:
                bucketed = bucketed.filter(F.col("_id__group").isNotNull())
            grouped = bucketed.groupBy("_id__group")
            aggs = []
            for name, acc in outputs.items():
                acc_op, arg = next(iter(acc.items()))
                if acc_op == "$count" or (acc_op == "$sum" and arg == 1):
                    aggs.append(F.count(F.lit(1)).alias(name))
                elif acc_op in _ACCUMULATORS:
                    aggs.append(_ACCUMULATORS[acc_op](compile_value(arg)).alias(name))
                else:
                    raise ValueError(f"unsupported $bucket accumulator: {acc_op}")
            out = grouped.agg(*aggs).withColumnRenamed("_id__group", "_id")
        elif op == "$count":
            out = out.agg(F.count(F.lit(1)).alias(str(spec)))
        elif op in ("$out", "$merge"):
            if stage is not pipeline[-1]:
                raise ValueError(f"{op} must be the final pipeline stage")
            from topic_store_spark.api import load as load_storage

            if op == "$out":
                # Mongo $out replaces the target collection
                target = load_storage(spec, out.sparkSession)
                replace = getattr(target, "_overwrite", None)
                if replace is None:
                    raise ValueError("$out target storage cannot be replaced")
                replace(out)
            else:
                # $merge default semantics: insert new documents, keep
                # existing ones (match on _id) — the copy/dedup anti-join
                into = spec["into"] if isinstance(spec, dict) else spec
                target = load_storage(into, out.sparkSession)
                df = out
                if "_id" in df.columns:
                    existing = target.to_df()
                    if "_id" in existing.columns:
                        df = df.join(existing.select("_id"), "_id", "left_anti")
                target.write_df(df)
        else:
            raise ValueError(f"unsupported pipeline stage: {op}")
    return out
