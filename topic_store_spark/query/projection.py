"""Mongo projection dict -> nested-safe select/drop.

Parity (SURVEY §2.3 R1-R3): ``{field: 1}`` include / ``{field: 0}``
exclude with dotted nested paths, preserving struct shape on nested
includes (README example ``{"cameras.top.color": 1, "robot": 1}``).

Engine policy R2 (reference database.py:170-191): on inclusion
projections, ``_ts_meta`` is force-added and ``_id`` is kept unless
explicitly excluded; ``_ts_meta`` can never be excluded — documents must
stay reconstructible.  Catalyst's ColumnPruning then turns the select
into a pruned parquet ReadSchema for free (including nested pruning).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FORCED_FIELDS = ("_ts_meta",)


class _Tree(dict):
    """Prefix tree of projected paths; value None marks 'whole subtree'."""


def _build_tree(paths: list[str]) -> _Tree:
    tree = _Tree()
    for path in paths:
        node = tree
        parts = path.split(".")
        for part in parts[:-1]:
            nxt = node.get(part)
            if nxt is None and part in node:
                break  # whole-subtree marker already covers this path
            node = node.setdefault(part, _Tree())
        else:
            node[parts[-1]] = None
    return tree


def _include_struct(col: Column, dtype: T.DataType, tree: _Tree) -> Column:
    """Rebuild a struct containing only included children (recursively).
    A NULL source struct stays NULL — Mongo never materializes an object
    for a missing/null parent just because a nested path was included
    (caught by tests/test_projection_fuzz.py, which hit struct{x: null}
    where Mongo keeps s itself null)."""
    if not isinstance(dtype, T.StructType):
        raise ValueError("projection path descends into a non-struct field")
    by_name = {f.name: f for f in dtype.fields}
    parts = []
    for name, sub in tree.items():
        if name not in by_name:
            # unknown field: project as typed NULL so the shape is stable
            parts.append(F.lit(None).alias(name))
            continue
        child = col.getField(name)
        if sub is None:
            parts.append(child.alias(name))
        else:
            parts.append(
                _include_struct(child, by_name[name].dataType, sub).alias(name)
            )
    return F.when(col.isNotNull(), F.struct(*parts))


#: sentinel: "this subtree is not excluded at all" (distinct from the
#: tree's None marker, which means "whole subtree excluded")
_KEEP = object()


def _exclude_struct(col: Column, dtype: T.DataType, tree: _Tree) -> Column:
    """Rebuild a struct WITHOUT the excluded children (recursively).
    Paths descending into a non-struct are Mongo no-ops; a struct whose
    every field is excluded becomes the empty struct (Mongo: ``{}``);
    a NULL source struct stays NULL."""
    if not isinstance(dtype, T.StructType):
        return col  # cannot descend: exclusion is a no-op, keep as-is
    parts = []
    for f in dtype.fields:
        sub = tree.get(f.name, _KEEP)
        if sub is None:
            continue
        child = col.getField(f.name)
        if sub is _KEEP:
            parts.append(child.alias(f.name))
        else:
            parts.append(
                _exclude_struct(child, f.dataType, sub).alias(f.name)
            )
    return F.when(col.isNotNull(), F.struct(*parts))


_PROJ_OPS = ("$slice", "$elemMatch")


def _apply_proj_ops(df: DataFrame, ops: dict[str, dict]) -> DataFrame:
    """Projection OPERATORS over top-level array columns: ``$slice``
    (first n / last n / [skip, n] window) and ``$elemMatch`` (array
    reduced to its FIRST matching element; null when nothing matches —
    Mongo omits the field, the dialect's missing-as-null equivalent)."""
    from topic_store_spark.query.compiler import elem_match_predicate

    out = df
    for name, spec in ops.items():
        if name not in out.columns:
            raise ValueError(f"projection operator on unknown field {name!r}")
        (op, arg), = spec.items()
        col = F.col(f"`{name}`")
        if op == "$slice":
            if isinstance(arg, list):
                skip, n = int(arg[0]), int(arg[1])
                if n <= 0:
                    raise ValueError("$slice: limit must be positive")
                start = (
                    F.lit(skip + 1) if skip >= 0
                    else F.greatest(F.size(col) + skip + 1, F.lit(1))
                )
                sliced = F.slice(col, start, n)
            else:
                n = int(arg)
                if n >= 0:
                    sliced = F.slice(col, 1, n)
                else:  # last |n|, whole array when shorter
                    sliced = F.slice(
                        col, F.greatest(F.size(col) + n + 1, F.lit(1)), -n
                    )
            out = out.withColumn(name, sliced)
        else:  # $elemMatch
            matched = F.filter(col, elem_match_predicate(arg))
            out = out.withColumn(
                name,
                F.when(F.size(matched) > 0, F.slice(matched, 1, 1)),
            )
    return out


def apply_projection(df: DataFrame, projection: dict[str, Any] | None) -> DataFrame:
    if not projection:
        return df
    proj_ops = {
        k: v
        for k, v in projection.items()
        if isinstance(v, dict)
        and len(v) == 1
        and next(iter(v)) in _PROJ_OPS
    }
    if proj_ops:
        rest = {k: v for k, v in projection.items() if k not in proj_ops}
        # $elemMatch is always an inclusion; $slice joins the inclusion
        # list only when one exists (a lone $slice keeps every field,
        # Mongo's exclusion-like behavior)
        has_includes = any(
            v not in (0, False) for v in rest.values()
        ) or any(next(iter(v)) == "$elemMatch" for v in proj_ops.values())
        if has_includes:
            for k in proj_ops:
                rest[k] = 1
        base = apply_projection(df, rest) if rest else df
        return _apply_proj_ops(base, proj_ops)
    includes = [k for k, v in projection.items() if v not in (0, False)]
    excludes = [k for k, v in projection.items() if v in (0, False)]
    if includes and [e for e in excludes if e != "_id"]:
        raise ValueError("cannot mix include and exclude projections (except _id: 0)")
    if "_ts_meta" in excludes or any(e.startswith("_ts_meta.") for e in excludes):
        raise ValueError("projections must not exclude _ts_meta")

    top_names = set(df.columns)
    if includes:
        forced = [f for f in FORCED_FIELDS if f in top_names]
        if "_id" not in excludes and "_id" in top_names:
            forced.append("_id")
        paths = list(dict.fromkeys(includes + forced))
        tree = _build_tree(paths)
        by_name = {f.name: f for f in df.schema.fields}
        cols = []
        for name, sub in tree.items():
            if name not in by_name:
                cols.append(F.lit(None).alias(name))
            elif sub is None:
                cols.append(F.col(f"`{name}`"))
            else:
                cols.append(
                    _include_struct(
                        F.col(f"`{name}`"), by_name[name].dataType, sub
                    ).alias(name)
                )
        return df.select(*cols)

    # exclusion projection: ONE prefix tree drives a recursive struct
    # rebuild — sequential dropFields would fail on overlapping paths
    # (excluding both "s.t" and "s.t.u" is legal-and-redundant in Mongo,
    # but the second dropFields no longer finds "t"; caught by
    # tests/test_projection_fuzz.py)
    tree = _build_tree(excludes)
    by_name = {f.name: f for f in df.schema.fields}
    cols = []
    for name in df.columns:
        sub = tree.get(name, _KEEP)
        if sub is None:
            continue  # whole column excluded
        if sub is _KEEP:
            cols.append(F.col(f"`{name}`"))
        else:
            cols.append(
                _exclude_struct(
                    F.col(f"`{name}`"), by_name[name].dataType, sub
                ).alias(name)
            )
    return df.select(*cols)


def flatten_dotted(df: DataFrame, sep: str = ".") -> DataFrame:
    """Flatten every nested struct leaf into a top-level column named by
    its dotted path (R4 parity: reference data.py:94-114
    ``flatten_ros_msg_dict`` keys results ``parent.child``).

    Pure-metadata schema walk — the generated plan is a single ``select``
    of struct field accesses, which Catalyst collapses into nested-column
    pruning on the scan (no data movement, no UDF)."""
    cols: list[Column] = []

    def walk(col: Column, dtype: T.DataType, path: str) -> None:
        if isinstance(dtype, T.StructType):
            for field in dtype.fields:
                walk(col.getField(field.name), field.dataType, f"{path}{sep}{field.name}")
        else:
            cols.append(col.alias(path))

    for field in df.schema.fields:
        if isinstance(field.dataType, T.StructType):
            for sub in field.dataType.fields:
                walk(
                    F.col(f"`{field.name}`").getField(sub.name),
                    sub.dataType,
                    f"{field.name}{sep}{sub.name}",
                )
        else:
            cols.append(F.col(f"`{field.name}`"))
    return df.select(*cols)
