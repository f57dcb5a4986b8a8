"""Mongo filter document -> Catalyst ``Column`` predicate.

Parity surface (SURVEY §2.2 P1-P6): ``$eq $ne $gt $gte $lt $lte $in $nin
$exists $regex $mod $size $and $or $nor $not`` plus implicit equality and
dotted nested paths.  Null semantics follow MongoDB: ``$ne``/``$nin`` also
match documents where the field is missing (reads as NULL under
schema-on-read), ``$exists`` maps to null checks (SURVEY P3).

Everything compiles to built-in Column expressions, so predicates stay
JVM-side and push down to the parquet scan (PushedFilters) — no Python in
the hot path.
"""

from __future__ import annotations

import contextlib as _contextlib
import re
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

_OID_LITERAL = re.compile(r"^ObjectId\(\s*['\"]?([0-9a-fA-F]{24})['\"]?\s*\)$")

_LOGICAL = {"$and", "$or", "$nor"}


def path_col(path: str, schema=None) -> Column:
    """Dotted path -> Column, backtick-quoting each segment so field names
    survive verbatim.

    With a schema, paths that don't resolve become typed NULL — Mongo
    semantics under schema-on-read: a field absent from every document is
    simply missing, not an error (so ``$exists: False`` matches all docs).
    """
    if schema is not None and not _path_in_schema(schema, path):
        return F.lit(None)
    return F.col(".".join(f"`{part}`" for part in path.split(".")))


def _path_in_schema(schema, path: str) -> bool:
    from pyspark.sql import types as T

    node = schema
    for part in path.split("."):
        # Spark resolves a field access THROUGH arrays of structs
        # (``arr.field`` extracts per element) — the check must follow
        # the same rule or valid paths get nulled out
        while isinstance(node, T.ArrayType):
            node = node.elementType
        if not isinstance(node, T.StructType):
            return False
        match = next((f for f in node.fields if f.name == part), None)
        if match is None:
            return False
        node = match.dataType
    return True


def _static_path_type(schema, path: str):
    """Engine type of a dotted path under a KNOWN static schema, or None
    when the path doesn't resolve (follows field access through arrays,
    like _path_in_schema)."""
    from pyspark.sql import types as T

    node = schema
    for part in path.split("."):
        while isinstance(node, T.ArrayType):
            node = node.elementType
        if not isinstance(node, T.StructType):
            return None
        match = next((f for f in node.fields if f.name == part), None)
        if match is None:
            return None
        node = match.dataType
    return node


def _is_numeric_type(dtype) -> bool:
    from pyspark.sql import types as T

    while isinstance(dtype, T.ArrayType):
        dtype = dtype.elementType
    return isinstance(dtype, (T.NumericType, T.NullType))


def parse_objectid_literals(value: Any) -> Any:
    """CLI convenience: ``"ObjectId(<hex>)"`` strings become their 24-hex id
    (parity: reference convert.py:319-327)."""
    if isinstance(value, str):
        match = _OID_LITERAL.match(value)
        return match.group(1) if match else value
    if isinstance(value, dict):
        return {k: parse_objectid_literals(v) for k, v in value.items()}
    if isinstance(value, list):
        return [parse_objectid_literals(v) for v in value]
    return value


def _lit(value: Any) -> Column:
    return F.lit(value)


def _regex_to_rlike(pattern: Any, options: str | None) -> str:
    if isinstance(pattern, dict) and "$regex" in pattern:  # nested form
        options = pattern.get("$options", options)
        pattern = pattern["$regex"]
    flags = ""
    if options:
        allowed = set("imsx") & set(options)
        if allowed:
            flags = f"(?{''.join(sorted(allowed))})"
    return f"{flags}{pattern}"


def _compile_op(col: Column, op: str, value: Any, ops: dict[str, Any],
                engine_type=None) -> Column:
    if op == "$eq":
        return col.isNull() if value is None else col == _lit(value)
    if op == "$ne":
        if value is None:
            return col.isNotNull()
        return col.isNull() | (col != _lit(value))
    if op == "$gt":
        return col > _lit(value)
    if op == "$gte":
        return col >= _lit(value)
    if op == "$lt":
        return col < _lit(value)
    if op == "$lte":
        return col <= _lit(value)
    if op == "$in":
        non_null = [v for v in value if v is not None]
        cond = col.isin(non_null) if non_null else F.lit(False)
        if any(v is None for v in value):
            cond = cond | col.isNull()
        return cond
    if op == "$nin":
        non_null = [v for v in value if v is not None]
        cond = ~col.isin(non_null) if non_null else F.lit(True)
        cond = col.isNull() | cond
        if any(v is None for v in value):
            cond = cond & col.isNotNull()
        return cond
    if op == "$exists":
        return col.isNotNull() if value else col.isNull()
    if op == "$regex":
        return col.rlike(_regex_to_rlike(value, ops.get("$options")))
    if op == "$options":  # consumed by $regex
        return F.lit(True)
    if op == "$mod":
        divisor, remainder = value
        return col % _lit(divisor) == _lit(remainder)
    if op == "$size":
        return F.size(col) == _lit(value)
    if op == "$all":
        if not value:
            # Mongo: {field: {$all: []}} matches NO documents
            return F.lit(False)
        cond = F.lit(True)
        for v in value:
            cond = cond & F.array_contains(col, _lit(v))
        return cond
    if op == "$elemMatch":
        return F.exists(col, elem_match_predicate(value))
    if op == "$not":
        if isinstance(value, dict):
            inner = _compile_field(col, value)
        else:
            inner = col.rlike(_regex_to_rlike(value, None))
        return ~F.coalesce(inner, F.lit(False))
    if op == "$type":
        return _compile_type(col, value)
    if op in ("$bitsAllSet", "$bitsAnySet", "$bitsAllClear", "$bitsAnyClear"):
        # mask: an int bitmask or a list of bit POSITIONS; matches
        # integral values by 64-bit two's complement (Mongo).  A
        # fractional double with a nonzero fraction never matches —
        # the integrality test below handles doubles; null/missing
        # never matches (guarded by the isNotNull conjunct).
        if isinstance(value, list):
            mask = 0
            for pos in value:
                mask |= 1 << int(pos)
        else:
            mask = int(value)
        # try_cast (not cast): under ANSI a plain cast ERRORS the whole
        # query for string-typed fields / longs out of range, where
        # Mongo just treats the value as non-matching.  Mongo's
        # numbers-only rule (a castable string "5" must NOT match) is
        # enforced statically when the engine type is known; under the
        # ragged resolver numbers surface as strings, so there the
        # castability test IS the numeric test.
        if engine_type is not None and not _is_numeric_type(engine_type):
            return F.lit(False)
        v = col.try_cast("long")
        masked = v.bitwiseAND(F.lit(mask))
        integral = col.isNotNull() & v.isNotNull() & (
            v.cast("double").eqNullSafe(col.try_cast("double"))
        )
        pred = {
            "$bitsAllSet": masked == F.lit(mask),
            "$bitsAnySet": masked != F.lit(0),
            "$bitsAllClear": masked == F.lit(0),
            "$bitsAnyClear": masked != F.lit(mask),
        }[op]
        return integral & pred
    raise ValueError(f"unsupported query operator: {op}")


#: BSON type alias / numeric code -> predicate over ``typeof(col)``.
#: Spark's schema is static, so a field has ONE engine type — but the
#: check still runs through ``typeof`` so it works identically under the
#: ragged (schema-on-read) resolver, and ``objectId`` adds the 24-hex
#: shape test (ObjectIds here are hex strings, objectid.py:8-13).
_BSON_TYPE_PREFIXES: dict[str, tuple[str, ...]] = {
    "double": ("double", "float"),
    "string": ("string",),
    "object": ("struct<", "map<"),
    "array": ("array<",),
    "binData": ("binary",),
    "objectId": ("string",),
    "bool": ("boolean",),
    "date": ("timestamp", "date"),
    "int": ("int", "smallint", "tinyint"),
    "long": ("bigint",),
    "decimal": ("decimal(",),
    "number": ("double", "float", "int", "smallint", "tinyint", "bigint",
               "decimal("),
}

_BSON_TYPE_CODES = {
    1: "double", 2: "string", 3: "object", 4: "array", 5: "binData",
    7: "objectId", 8: "bool", 9: "date", 10: "null", 16: "int", 18: "long",
    19: "decimal",
}


def _compile_type(col: Column, value: Any) -> Column:
    """``$type``: match by BSON type alias/code (or a list of them).
    Null-valued fields match only the ``null`` alias, per Mongo."""
    aliases = value if isinstance(value, list) else [value]
    out: Column | None = None
    type_str = F.call_function("typeof", col)
    for alias in aliases:
        if isinstance(alias, int):
            if alias not in _BSON_TYPE_CODES:
                raise ValueError(f"$type: unknown BSON type code {alias}")
            alias = _BSON_TYPE_CODES[alias]
        if alias == "null":
            cond = col.isNull()
        else:
            prefixes = _BSON_TYPE_PREFIXES.get(alias)
            if prefixes is None:
                raise ValueError(f"$type: unsupported BSON type {alias!r}")
            match = F.lit(False)
            for p in prefixes:
                match = match | type_str.startswith(p)
            cond = col.isNotNull() & match
            if alias == "objectId":
                cond = cond & col.cast("string").rlike("^[0-9a-fA-F]{24}$")
        out = cond if out is None else (out | cond)
    return out if out is not None else F.lit(False)


def _is_operator_doc(value: Any) -> bool:
    return isinstance(value, dict) and value and all(k.startswith("$") for k in value)


def elem_match_predicate(value: dict[str, Any]):
    """``$elemMatch`` element predicate as a reusable callable —
    operator-doc form ({"$gt": 5}) matches the element itself, query-doc
    form ({"f": cond}) matches fields of struct elements.  Shared by the
    find dialect's array match and the projection dialect's
    first-matching-element $elemMatch."""
    if _is_operator_doc(value):
        return lambda e: _compile_field(e, value)

    def _elem_pred(e: Column) -> Column:
        cond = F.lit(True)
        for fname, fval in value.items():
            fcol = e[fname]
            if _is_operator_doc(fval):
                cond = cond & _compile_field(fcol, fval)
            elif fval is None:
                cond = cond & fcol.isNull()
            else:
                cond = cond & (fcol == _lit(fval))
        return cond

    return _elem_pred


def _compile_field(col: Column, ops: dict[str, Any], engine_type=None) -> Column:
    conds = [
        _compile_op(col, op, val, ops, engine_type)
        for op, val in ops.items()
        if op != "$options"
    ]
    out = conds[0] if conds else F.lit(True)
    for cond in conds[1:]:
        out = out & cond
    return out


def compile_query(query: dict[str, Any] | None, schema=None, resolver=None) -> Column:
    """Mongo filter dict -> boolean Column. Empty/None = full scan
    (parity: reference database.py:219).  Pass the DataFrame schema to get
    Mongo missing-field semantics for unresolvable paths.

    ``resolver(path, probe_value) -> Column`` overrides path resolution —
    the hook the ragged (schema-on-read JSON) storage mode uses to compile
    dotted paths into type-cast JSON extractions instead of struct
    accesses."""
    if not query:
        return F.lit(True)
    query = parse_objectid_literals(query)
    out: Column | None = None
    for key, value in query.items():
        if key == "$comment":  # annotation only, matches everything
            continue
        if key in _LOGICAL:
            subs = [compile_query(q, schema, resolver) for q in value]
            if key == "$and":
                cond = subs[0]
                for s in subs[1:]:
                    cond = cond & s
            else:
                cond = subs[0]
                for s in subs[1:]:
                    cond = cond | s
                if key == "$nor":
                    # Mongo matching is two-valued: a clause that
                    # evaluates NULL (comparison over a missing field)
                    # simply DOESN'T match, so its negation must match.
                    # Without the coalesce, ~NULL = NULL and $nor would
                    # drop exactly the missing-field docs Mongo keeps
                    # (caught by tests/test_find_fuzz.py).
                    cond = ~F.coalesce(cond, F.lit(False))
        elif key == "$not":
            cond = ~F.coalesce(
                compile_query(value, schema, resolver), F.lit(False)
            )
        elif key == "$expr":
            # aggregation-expression predicate inside a find filter —
            # shares the pipeline's value-expression compiler (and its
            # missing-field-is-NULL resolution when a schema is known)
            from topic_store_spark.query.pipeline import (
                _schema_scope,
                _truthy_expr,
            )

            with _schema_scope(schema) if schema is not None else _contextlib.nullcontext():
                cond = _truthy_expr(value)
        elif key == "$jsonSchema":
            cond = _compile_json_schema(value, schema, resolver, prefix="")
        elif key == "$where":
            raise NotImplementedError(
                "$where runs server-side JavaScript — a documented "
                "non-goal (use $expr with aggregation operators instead)"
            )
        elif key == "$sampleRate":
            # {"$match": {"$sampleRate": p}} — keep each doc with
            # probability p (Mongo 4.4.2).  Nondeterministic per run,
            # like Mongo; for a REPRODUCIBLE sample use the engine's
            # $sample stage (hash-ordered) instead.
            p = float(value)
            if not 0.0 <= p <= 1.0:
                raise ValueError("$sampleRate must be in [0, 1]")
            cond = F.rand() < F.lit(p)
        elif key.startswith("$"):
            raise ValueError(f"unsupported top-level operator: {key}")
        else:
            col = (
                resolver(key, _probe_value(value))
                if resolver is not None
                else path_col(key, schema)
            )
            if _is_operator_doc(value):
                etype = (
                    _static_path_type(schema, key)
                    if resolver is None and schema is not None
                    else None
                )
                cond = _compile_field(col, value, etype)
            elif value is None:
                cond = col.isNull()
            else:
                cond = col == _lit(value)
        out = cond if out is None else out & cond
    return out if out is not None else F.lit(True)


#: keywords a property subschema may carry (draft-4 core, the subset
#: MongoDB validates); `description`/`title` are annotations
_JS_KEYWORDS = {
    "bsonType", "type", "enum", "minimum", "maximum",
    "exclusiveMinimum", "exclusiveMaximum", "multipleOf",
    "minLength", "maxLength", "pattern", "minItems", "maxItems",
    "uniqueItems", "items", "additionalItems", "properties", "required",
    "additionalProperties", "minProperties", "maxProperties",
    "patternProperties", "dependencies",
    "allOf", "anyOf", "oneOf", "not", "description", "title",
}

#: JSON-Schema "type" name -> BSON alias for _compile_type
_JS_TYPE_TO_BSON = {
    "number": "number", "string": "string", "object": "object",
    "array": "array", "boolean": "bool", "null": "null",
}


def _js_typeof_is(col: Column, *prefixes: str) -> Column:
    t = F.call_function("typeof", col)
    out = F.lit(False)
    for p in prefixes:
        out = out | t.startswith(p)
    return out


def _js_field_type(etype, field: str):
    """Engine type of ``field`` under a property's known static type
    (follows field access through arrays, like _static_path_type);
    None when unknown."""
    from pyspark.sql import types as T

    node = etype
    while isinstance(node, T.ArrayType):
        node = node.elementType
    if isinstance(node, T.StructType):
        match = next((f for f in node.fields if f.name == field), None)
        return match.dataType if match is not None else None
    return None


def _js_value_pred(
    col: Column, spec: dict[str, Any], etype=None
) -> Column:
    """Property-level ``$jsonSchema`` predicate (draft-4 core as MongoDB
    validates it).  JSON-Schema semantics: each keyword constrains only
    values of its applicable type (``minimum`` ignores strings, ...) —
    non-applicable values pass.  Null handling is the caller's job
    (a property schema applies only when the property is present).
    ``etype`` is the property's STATIC engine type when known (None
    under the ragged resolver) — it gates the numeric keywords the same
    way the $bits* path is gated: on a string-typed column a
    numeric-LOOKING string like "3" must pass ``minimum: 5`` (keyword
    not applicable), where an unconditional try_cast would range-check
    it (r9 advice fix)."""
    extra = set(spec) - _JS_KEYWORDS
    if extra:
        raise NotImplementedError(
            f"$jsonSchema: unsupported keywords {sorted(extra)}"
        )
    conds: list[Column] = []

    def safe(p: Column) -> Column:
        # a keyword that evaluates NULL on a present value means "not
        # applicable to this type" -> pass
        return F.coalesce(p, F.lit(True))

    # numeric keywords apply only when the value can be a number: with
    # a known non-numeric engine type they are statically inapplicable
    # (pass); under the ragged resolver (etype None) numbers surface as
    # strings, so there the castability test IS the numeric test.
    # Direct type check, NOT _is_numeric_type: that helper unwraps
    # arrays (the $bits*/comparison element-match convention), but JSON
    # Schema applies `minimum` to the VALUE — an array is inapplicable,
    # and try_cast(array as double) would not even analyze.
    from pyspark.sql import types as T

    numeric_applicable = etype is None or isinstance(
        etype, (T.NumericType, T.NullType)
    )

    bt = spec.get("bsonType", spec.get("type"))
    if bt is not None:
        aliases = bt if isinstance(bt, list) else [bt]
        if "type" in spec and "bsonType" not in spec:
            if any(a == "integer" for a in aliases):
                raise NotImplementedError(
                    '$jsonSchema: type "integer" is rejected by MongoDB '
                    '(use bsonType "int"/"long")'
                )
            aliases = [_JS_TYPE_TO_BSON.get(a, a) for a in aliases]
        conds.append(_compile_type(col, aliases))
    if "enum" in spec:
        pred = F.lit(False)
        for v in spec["enum"]:
            if isinstance(v, (dict, list)):
                raise NotImplementedError(
                    "$jsonSchema enum: document/array constants are not "
                    "supported"
                )
            pred = pred | col.eqNullSafe(F.lit(v))
        conds.append(pred)
    num = col.try_cast("double")
    if "minimum" in spec and numeric_applicable:
        lo = F.lit(spec["minimum"])
        strict = spec.get("exclusiveMinimum") is True
        conds.append(safe(num > lo if strict else num >= lo))
    if "maximum" in spec and numeric_applicable:
        hi = F.lit(spec["maximum"])
        strict = spec.get("exclusiveMaximum") is True
        conds.append(safe(num < hi if strict else num <= hi))
    if "multipleOf" in spec and numeric_applicable:
        conds.append(safe(num % F.lit(spec["multipleOf"]) == 0))
    is_str = _js_typeof_is(col, "string")
    if "minLength" in spec:
        conds.append(
            safe(~is_str | (F.length(col.cast("string")) >= spec["minLength"]))
        )
    if "maxLength" in spec:
        conds.append(
            safe(~is_str | (F.length(col.cast("string")) <= spec["maxLength"]))
        )
    if "pattern" in spec:
        conds.append(
            safe(
                ~is_str
                | col.cast("string").rlike(
                    _regex_to_rlike(spec["pattern"], None)
                )
            )
        )
    # array keywords apply only when the value can be an array: with a
    # known non-array engine type they are statically inapplicable
    # (pass) — and the expressions (size/forall/get) would not even
    # ANALYZE against a non-array column (same static gate as the
    # numeric keywords)
    from pyspark.sql import types as T

    arr_applicable = etype is None or isinstance(etype, T.ArrayType)
    is_arr = _js_typeof_is(col, "array")
    if "minItems" in spec and arr_applicable:
        conds.append(safe(~is_arr | (F.size(col) >= spec["minItems"])))
    if "maxItems" in spec and arr_applicable:
        conds.append(safe(~is_arr | (F.size(col) <= spec["maxItems"])))
    if spec.get("uniqueItems") and arr_applicable:
        conds.append(
            safe(~is_arr | (F.size(F.array_distinct(col)) == F.size(col)))
        )
    if "items" in spec and arr_applicable:
        items = spec["items"]
        el_type = etype.elementType if isinstance(etype, T.ArrayType) else None
        if isinstance(items, list):
            # per-position schema array (draft-4, r9): element i
            # validates against schema i; arrays shorter than the list
            # are valid (missing positions unconstrained); elements past
            # the list are governed by additionalItems (r10): absent or
            # true = unconstrained, false = array length capped at the
            # schema list, schema-form = every extra element validates
            # against it.  Null elements pass (engine convention null ==
            # missing, same as the single-schema form).  F.get is
            # 0-based and null (not an ANSI error) out of range.
            per = F.lit(True)
            for i, si in enumerate(items):
                ei = F.get(col, i)
                per = per & F.when(
                    F.size(col) > i,
                    F.coalesce(
                        ei.isNull() | _js_value_pred(ei, si, el_type),
                        F.lit(True),
                    ),
                ).otherwise(F.lit(True))
            ai = spec.get("additionalItems", True)
            npfx = len(items)
            if ai is False:
                per = per & (F.size(col) <= npfx)
            elif isinstance(ai, dict):
                per = per & F.when(
                    F.size(col) > npfx,
                    F.coalesce(
                        F.forall(
                            F.slice(col, npfx + 1, F.size(col) - npfx),
                            lambda e: F.coalesce(
                                e.isNull() | _js_value_pred(e, ai, el_type),
                                F.lit(True),
                            ),
                        ),
                        F.lit(True),
                    ),
                ).otherwise(F.lit(True))
            elif ai is not True:
                raise NotImplementedError(
                    "$jsonSchema additionalItems: boolean or schema only"
                )
            conds.append(safe(~is_arr | per))
        else:
            conds.append(
                safe(
                    F.forall(
                        col,
                        lambda e: F.coalesce(
                            e.isNull() | _js_value_pred(e, items, el_type),
                            F.lit(True),
                        ),
                    )
                )
            )
    # -- object keywords (apply to struct-typed values; a known
    # non-object type makes them inapplicable -> pass; an unknown type
    # where enumeration is required refuses loudly, same policy as the
    # document level) --------------------------------------------------
    from pyspark.sql import types as T

    _obj_node = etype
    while isinstance(_obj_node, T.ArrayType):
        _obj_node = _obj_node.elementType

    _OBJ_KEYWORDS = ("minProperties", "maxProperties", "patternProperties",
                     "dependencies")
    if _obj_node is None and any(k in spec for k in _OBJ_KEYWORDS):
        raise NotImplementedError(
            "$jsonSchema minProperties/maxProperties/patternProperties/"
            "dependencies: need a statically-known document type (field "
            "enumeration; unavailable under the ragged resolver)"
        )
    pattern_matched: set[str] = set()
    if isinstance(_obj_node, T.StructType):
        # object keywords constrain only object-typed values; on a
        # known non-object type they are inapplicable -> pass
        if "patternProperties" in spec:
            import re as _re

            # property NAMES are static under a schema, so the regex is
            # evaluated at compile time (Python re over the struct's
            # field list — names are plain identifiers, where PCRE/
            # Java/RE2 agree)
            for pat, sub in spec["patternProperties"].items():
                for fld in _obj_node.fields:
                    if _re.search(pat, fld.name):
                        pattern_matched.add(fld.name)
                        fc = col[fld.name]
                        conds.append(
                            F.coalesce(
                                fc.isNull()
                                | _js_value_pred(fc, sub, fld.dataType),
                                F.lit(True),
                            )
                        )
        if "minProperties" in spec or "maxProperties" in spec:
            n_present = F.lit(0)
            for fld in _obj_node.fields:
                n_present = n_present + col[fld.name].isNotNull().cast("int")
            if "minProperties" in spec:
                conds.append(safe(n_present >= F.lit(spec["minProperties"])))
            if "maxProperties" in spec:
                conds.append(safe(n_present <= F.lit(spec["maxProperties"])))
        if "dependencies" in spec:
            for k, dep in spec["dependencies"].items():
                if not any(f.name == k for f in _obj_node.fields):
                    continue  # trigger can never be present -> vacuous
                present = col[k].isNotNull()
                if isinstance(dep, dict):
                    req = _js_value_pred(col, dep, etype)
                else:
                    req = F.lit(True)
                    for d in dep:
                        if any(f.name == d for f in _obj_node.fields):
                            req = req & col[d].isNotNull()
                        else:
                            req = F.lit(False)  # statically absent
                conds.append(~present | F.coalesce(req, F.lit(True)))

    ap = spec.get("additionalProperties", True)
    if ap is not True:
        if ap is not False:
            raise NotImplementedError(
                "$jsonSchema additionalProperties: schema-form is not "
                "supported (true/false only)"
            )
        node = _obj_node
        if node is None:
            raise NotImplementedError(
                "$jsonSchema additionalProperties: false needs a "
                "statically-known document type (closed field set = "
                "struct field enumeration; unavailable under the "
                "ragged resolver)"
            )
        if isinstance(node, T.StructType):
            # Mongo parity (r10, matching the document level): _id is
            # NOT implicitly admitted — and draft-4 admits fields
            # matched by patternProperties as non-additional
            allowed = set(spec.get("properties") or {}) | pattern_matched
            for fld in node.fields:
                if fld.name not in allowed:
                    # engine convention: null == missing, so "no
                    # additional property" compiles to "every other
                    # field is null"
                    conds.append(col[fld.name].isNull())
        # known non-object type: the keyword is inapplicable -> pass
    for f in spec.get("required") or []:
        conds.append(col[f].isNotNull())
    for f, sub in (spec.get("properties") or {}).items():
        fc = col[f]
        conds.append(
            F.coalesce(
                fc.isNull() | _js_value_pred(fc, sub, _js_field_type(etype, f)),
                F.lit(True),
            )
        )
    for comb in ("allOf", "anyOf", "oneOf"):
        if comb in spec:
            subs = [_js_value_pred(col, s, etype) for s in spec[comb]]
            if comb == "allOf":
                pred = F.lit(True)
                for s in subs:
                    pred = pred & safe(s)
            elif comb == "anyOf":
                pred = F.lit(False)
                for s in subs:
                    pred = pred | F.coalesce(s, F.lit(False))
            else:
                total = F.lit(0)
                for s in subs:
                    total = total + F.coalesce(s, F.lit(False)).cast("int")
                pred = total == 1
            conds.append(pred)
    if "not" in spec:
        conds.append(
            ~F.coalesce(_js_value_pred(col, spec["not"], etype), F.lit(True))
        )
    out = F.lit(True)
    for c in conds:
        out = out & c
    return out


def _compile_json_schema(
    spec: dict[str, Any], schema=None, resolver=None, prefix: str = ""
) -> Column:
    """``$jsonSchema`` (MongoDB's draft-4 subset) -> boolean predicate.
    Document level: ``required`` (presence; engine convention null ==
    missing, same as ``$exists``), ``properties`` (a property schema
    constrains only documents where the property is PRESENT),
    ``bsonType: object`` (trivially true for a document stream) and the
    combinators.  Property subschemas compile via :func:`_js_value_pred`.
    Parity: the reference passes find dicts through verbatim
    (reference database.py:193-204)."""
    spec = {k: v for k, v in spec.items() if k not in ("title", "description")}
    allowed = {"bsonType", "type", "properties", "required",
               "allOf", "anyOf", "oneOf", "not", "additionalProperties",
               "minProperties", "maxProperties", "patternProperties",
               "dependencies"}
    extra = set(spec) - allowed
    if extra:
        raise NotImplementedError(
            f"$jsonSchema: unsupported document-level keywords {sorted(extra)}"
        )
    ap = spec.get("additionalProperties", True)
    if ap is not True and ap is not False:
        raise NotImplementedError(
            "$jsonSchema additionalProperties: schema-form is not "
            "supported (true/false only)"
        )
    bt = spec.get("bsonType", spec.get("type"))
    if bt is not None:
        bts = bt if isinstance(bt, list) else [bt]
        if "object" not in bts:
            raise ValueError("$jsonSchema: the document root is an object")

    def resolve(path: str) -> Column:
        full = f"{prefix}.{path}" if prefix else path
        return (
            resolver(full, None)
            if resolver is not None
            else path_col(full, schema)
        )

    conds: list[Column] = []

    def static_type(path: str):
        # the property's engine type when the schema is static; None
        # under the ragged resolver (types unknown until runtime)
        if resolver is not None or schema is None:
            return None
        full = f"{prefix}.{path}" if prefix else path
        return _static_path_type(schema, full)

    from pyspark.sql import types as T

    def _doc_node(kw: str):
        # the document's static struct node (field enumeration); the
        # ragged resolver has no closed field set — refuse loudly
        node = schema if not prefix else _static_path_type(schema, prefix)
        if resolver is not None or not isinstance(node, T.StructType):
            raise NotImplementedError(
                f"$jsonSchema {kw}: needs a statically-known document "
                "type (closed field set = struct field enumeration; "
                "unavailable under the ragged resolver)"
            )
        return node

    pattern_matched: set[str] = set()
    if "patternProperties" in spec:
        import re as _re

        # field NAMES are static, so the regex runs at compile time
        # (Python re over plain identifiers, where PCRE/Java/RE2 agree)
        for pat, sub in spec["patternProperties"].items():
            for fld in _doc_node("patternProperties").fields:
                if _re.search(pat, fld.name):
                    pattern_matched.add(fld.name)
                    col = resolve(fld.name)
                    conds.append(
                        F.coalesce(
                            col.isNull()
                            | _js_value_pred(col, sub, static_type(fld.name)),
                            F.lit(True),
                        )
                    )
    if "minProperties" in spec or "maxProperties" in spec:
        n_present = F.lit(0)
        for fld in _doc_node("minProperties/maxProperties").fields:
            n_present = n_present + resolve(fld.name).isNotNull().cast("int")
        if "minProperties" in spec:
            conds.append(n_present >= F.lit(spec["minProperties"]))
        if "maxProperties" in spec:
            conds.append(n_present <= F.lit(spec["maxProperties"]))
    if "dependencies" in spec:
        # presence-triggered constraints work under BOTH the static
        # schema and the ragged resolver (presence is resolve().isNotNull)
        for k, dep in spec["dependencies"].items():
            present = resolve(k).isNotNull()
            if isinstance(dep, dict):
                req = _compile_json_schema(dep, schema, resolver, prefix)
            else:
                req = F.lit(True)
                for d in dep:
                    req = req & resolve(d).isNotNull()
            conds.append(~present | F.coalesce(req, F.lit(True)))

    if ap is False:
        # closed document (r9, _id parity fixed r10): with a static
        # schema, "no additional properties" enumerates the struct's
        # field set — every column not named in `properties` must be
        # absent (engine convention: null == missing).  Mongo does NOT
        # implicitly admit _id: the manual requires _id to be listed in
        # `properties` (or covered by `required`'s presence check plus
        # a property entry) or EVERY stored document fails validation —
        # a famous server footgun this compiler reproduces exactly, so
        # a spec that validates nothing here validates nothing there.
        # Draft-4: fields matched by patternProperties are NOT
        # additional.  The ragged resolver has no closed field
        # enumeration — refuse loudly.
        allowed = set(spec.get("properties") or {}) | pattern_matched
        for fld in _doc_node("additionalProperties: false").fields:
            if fld.name not in allowed:
                conds.append(resolve(fld.name).isNull())

    for f in spec.get("required") or []:
        conds.append(resolve(f).isNotNull())
    for f, sub in (spec.get("properties") or {}).items():
        col = resolve(f)
        conds.append(
            F.coalesce(
                col.isNull() | _js_value_pred(col, sub, static_type(f)),
                F.lit(True),
            )
        )
    for comb in ("allOf", "anyOf", "oneOf"):
        if comb in spec:
            subs = [
                _compile_json_schema(s, schema, resolver, prefix)
                for s in spec[comb]
            ]
            if comb == "allOf":
                pred = F.lit(True)
                for s in subs:
                    pred = pred & s
            elif comb == "anyOf":
                pred = F.lit(False)
                for s in subs:
                    pred = pred | F.coalesce(s, F.lit(False))
            else:
                total = F.lit(0)
                for s in subs:
                    total = total + F.coalesce(s, F.lit(False)).cast("int")
                pred = total == 1
            conds.append(pred)
    if "not" in spec:
        conds.append(
            ~F.coalesce(
                _compile_json_schema(spec["not"], schema, resolver, prefix),
                F.lit(True),
            )
        )
    out = F.lit(True)
    for c in conds:
        out = out & c
    return out


def _probe_value(value: Any) -> Any:
    """Representative literal for type-directed path resolution: the
    first concrete comparison value inside an operator doc, or the value
    itself for implicit equality."""
    if _is_operator_doc(value):
        for op, v in value.items():
            if op in ("$eq", "$ne", "$gt", "$gte", "$lt", "$lte"):
                if v is not None:
                    return v
            elif op in ("$in", "$nin") and isinstance(v, list):
                for item in v:
                    if item is not None:
                        return item
        return None
    return value
