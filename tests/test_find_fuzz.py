"""Differential fuzzer for the find-dialect compiler: hundreds of
randomly generated filters evaluated BOTH by ``compile_query`` on Spark
and by an independent pure-Python evaluator implementing MongoDB's
documented matching semantics (under this package's schema-on-read
contract: a missing field reads as NULL, so missing ≡ null throughout —
see query/compiler.py module doc).

The fixed oracle queries exercise chosen corners; this sweeps the
combinatorial space — especially three-valued-logic corners ($nor/$not
over NULL-producing comparisons) where SQL engines silently diverge
from Mongo's boolean matching.

Generation is seeded-random (not hypothesis): the recursive filter
space is easier to steer with a plain RNG, and failures print the exact
filter dict for replay.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from topic_store_spark.query.compiler import compile_query

# -- corpus -----------------------------------------------------------------

FIELDS = {
    "a": "int",     # small ints, sometimes null
    "b": "float",   # floats, sometimes null
    "c": "str",     # short strings, sometimes null
    "d": "arr",     # int arrays, sometimes null
}
SCHEMA = "_id long, a long, b double, c string, d array<long>"


def _docs(rng: random.Random, n: int = 80) -> list[dict]:
    out = []
    for i in range(n):
        out.append(
            {
                "_id": i,
                "a": rng.choice([None, *range(-3, 8)]),
                "b": rng.choice([None, -1.5, 0.0, 0.5, 1.0, 2.5, 7.25]),
                "c": rng.choice([None, "", "x", "xy", "abc", "zzz"]),
                "d": rng.choice(
                    [None, [], [1], [1, 2], [2, 2, 3], [0, 5, 9]]
                ),
            }
        )
    return out


# -- filter generator -------------------------------------------------------

def _leaf(rng: random.Random) -> dict:
    f = rng.choice(list(FIELDS))
    t = FIELDS[f]
    if t == "arr":
        return {f: {"$size": rng.randint(0, 3)}}
    if t == "int":
        lits = lambda: rng.randint(-4, 9)  # noqa: E731
    elif t == "float":
        lits = lambda: rng.choice([-1.5, 0.0, 0.5, 1.0, 2.5, 7.25, 9.0])  # noqa: E731
    else:
        lits = lambda: rng.choice(["", "x", "xy", "abc", "zzz", "nope"])  # noqa: E731
    kind = rng.randrange(8)
    if kind == 0:
        return {f: rng.choice([None, lits()])}  # implicit equality
    if kind == 1:
        op = rng.choice(["$eq", "$ne"])
        return {f: {op: rng.choice([None, lits()])}}
    if kind == 2:
        op = rng.choice(["$gt", "$gte", "$lt", "$lte"])
        return {f: {op: lits()}}
    if kind == 3:
        vals = [rng.choice([None, lits()]) for _ in range(rng.randint(0, 3))]
        return {f: {rng.choice(["$in", "$nin"]): vals}}
    if kind == 4:
        return {f: {"$exists": rng.random() < 0.5}}
    if kind == 5 and t == "int":
        if rng.random() < 0.4:
            op = rng.choice(["$bitsAllSet", "$bitsAnySet",
                             "$bitsAllClear", "$bitsAnyClear"])
            mask = (
                [p for p in range(4) if rng.random() < 0.5]
                if rng.random() < 0.5
                else rng.randint(0, 15)
            )
            if mask == []:
                mask = [rng.randint(0, 3)]
            return {f: {op: mask}}
        return {f: {"$mod": [rng.randint(1, 4), rng.randint(0, 3)]}}
    if kind == 6:
        # range doc: {f: {$gte: x, $lt: y}} (implicit AND inside the doc)
        return {f: {"$gte": lits(), "$lt": lits()}}
    inner_op = rng.choice(["$eq", "$gt", "$lte", "$ne"])
    return {f: {"$not": {inner_op: lits()}}}


def _filter(rng: random.Random, depth: int = 0) -> dict:
    if depth >= 2 or rng.random() < 0.45:
        return _leaf(rng)
    combo = rng.choice(["$and", "$or", "$nor", "multi"])
    subs = [_filter(rng, depth + 1) for _ in range(rng.randint(1, 3))]
    if combo == "multi":
        merged: dict = {}
        for s in subs:
            merged.update(s)  # implicit top-level AND (last key wins)
        return merged or _leaf(rng)
    return {combo: subs}


# -- reference evaluator (Mongo matching semantics, missing ≡ null) ---------

def _m_op(v, op, arg) -> bool:
    if op == "$eq":
        return v is None if arg is None else (v is not None and v == arg)
    if op == "$ne":
        return not _m_op(v, "$eq", arg)
    if op == "$gt":
        return v is not None and v > arg
    if op == "$gte":
        return v is not None and v >= arg
    if op == "$lt":
        return v is not None and v < arg
    if op == "$lte":
        return v is not None and v <= arg
    if op == "$in":
        return any(_m_op(v, "$eq", a) for a in arg) if arg else False
    if op == "$nin":
        return not _m_op(v, "$in", arg)
    if op == "$exists":
        return (v is not None) == bool(arg)
    if op == "$mod":
        # Mongo $mod is TRUNCATED remainder (sign of the dividend, like
        # C/Java and Spark's %), not Python's floored %
        d, r = arg
        return v is not None and abs(v) % abs(d) * (1 if v >= 0 else -1) == r
    if op == "$size":
        return v is not None and isinstance(v, list) and len(v) == arg
    if op == "$not":
        return not _m_field(v, arg)
    if op in ("$bitsAllSet", "$bitsAnySet", "$bitsAllClear", "$bitsAnyClear"):
        if v is None or isinstance(v, float) and v != int(v):
            return False
        mask = (
            sum(1 << p for p in arg) if isinstance(arg, list) else int(arg)
        )
        m = int(v) & mask
        return {
            "$bitsAllSet": m == mask,
            "$bitsAnySet": m != 0,
            "$bitsAllClear": m == 0,
            "$bitsAnyClear": m != mask,
        }[op]
    raise ValueError(op)


def _m_field(v, cond) -> bool:
    if isinstance(cond, dict) and cond and all(
        k.startswith("$") for k in cond
    ):
        return all(_m_op(v, op, arg) for op, arg in cond.items())
    if cond is None:
        return v is None
    return v is not None and v == cond


def _m_query(doc: dict, q: dict) -> bool:
    for key, val in q.items():
        if key == "$and":
            if not all(_m_query(doc, s) for s in val):
                return False
        elif key == "$or":
            if not any(_m_query(doc, s) for s in val):
                return False
        elif key == "$nor":
            if any(_m_query(doc, s) for s in val):
                return False
        else:
            if not _m_field(doc.get(key), val):
                return False
    return True


# -- the differential sweep -------------------------------------------------

N_FILTERS = 300
BATCH = 50


def test_find_dialect_matches_reference_evaluator(spark):
    rng = random.Random(0xC0FFEE)
    docs = _docs(rng)
    df = spark.createDataFrame(
        [tuple(d[k] for k in ["_id", "a", "b", "c", "d"]) for d in docs],
        SCHEMA,
    )
    filters = [_filter(rng) for _ in range(N_FILTERS)]

    failures = []
    for base in range(0, len(filters), BATCH):
        chunk = filters[base : base + BATCH]
        cols = [F.col("_id")]
        for j, q in enumerate(chunk):
            cols.append(
                F.coalesce(compile_query(q, df.schema), F.lit(False)).alias(
                    f"p{j}"
                )
            )
        rows = df.select(*cols).collect()
        got = {
            j: {r["_id"] for r in rows if r[f"p{j}"]}
            for j in range(len(chunk))
        }
        for j, q in enumerate(chunk):
            want = {d["_id"] for d in docs if _m_query(d, q)}
            if got[j] != want:
                failures.append(
                    (q, sorted(got[j] ^ want))
                )
    assert not failures, (
        f"{len(failures)}/{N_FILTERS} filters diverge from Mongo "
        f"semantics; first: {failures[0]}"
    )


# -- second sweep: dotted paths into structs, $elemMatch, $all ---------------

NESTED_SCHEMA = (
    "_id long, s struct<x: long, y: string>, arr array<long>, "
    "objs array<struct<v: long>>"
)


def _nested_docs(rng: random.Random, n: int = 60) -> list[dict]:
    out = []
    for i in range(n):
        out.append(
            {
                "_id": i,
                "s": rng.choice(
                    [None]
                    + [
                        {"x": rng.choice([None, *range(0, 6)]),
                         "y": rng.choice([None, "p", "q"])}
                        for _ in range(3)
                    ]
                ),
                "arr": rng.choice(
                    [None, [], [1], [1, 2], [2, 3, 4], [0, 5]]
                ),
                "objs": rng.choice(
                    [None, [], [{"v": 1}], [{"v": 2}, {"v": 5}],
                     [{"v": 0}, {"v": 3}, {"v": 7}]]
                ),
            }
        )
    return out


def _nested_filter(rng: random.Random) -> dict:
    kind = rng.randrange(6)
    if kind == 0:
        op = rng.choice(["$eq", "$ne", "$gt", "$lte", "$exists"])
        arg = rng.random() < 0.5 if op == "$exists" else rng.randint(-1, 6)
        return {"s.x": {op: arg}}
    if kind == 1:
        return {"s.y": rng.choice([None, "p", "q", "zz"])}
    if kind == 2:
        vals = [rng.randint(0, 5) for _ in range(rng.randint(0, 3))]
        return {"arr": {"$all": vals}}
    if kind == 3:
        return {"objs": {"$elemMatch": {"v": {rng.choice(["$gt", "$lte", "$eq"]): rng.randint(0, 7)}}}}
    if kind == 4:
        return {"arr": {"$elemMatch": {rng.choice(["$gte", "$lt"]): rng.randint(0, 5)}}}
    return {
        rng.choice(["$or", "$nor", "$and"]): [
            _nested_filter(rng), _nested_filter(rng)
        ]
    }


def _m_get(doc, path):
    node = doc
    for part in path.split("."):
        if not isinstance(node, dict):
            return None
        node = node.get(part)
    return node


def _m_nested(doc: dict, q: dict) -> bool:
    for key, val in q.items():
        if key == "$and":
            if not all(_m_nested(doc, s) for s in val):
                return False
        elif key == "$or":
            if not any(_m_nested(doc, s) for s in val):
                return False
        elif key == "$nor":
            if any(_m_nested(doc, s) for s in val):
                return False
        else:
            v = _m_get(doc, key)
            if isinstance(val, dict) and "$all" in val:
                terms = val["$all"]
                if not terms:
                    return False  # Mongo: $all: [] matches nothing
                if not (isinstance(v, list) and all(t in v for t in terms)):
                    return False
            elif isinstance(val, dict) and "$elemMatch" in val:
                cond = val["$elemMatch"]
                if not isinstance(v, list):
                    return False
                if all(k.startswith("$") for k in cond):
                    if not any(_m_field(e, cond) for e in v):
                        return False
                else:
                    ok = any(
                        all(
                            _m_field((e or {}).get(f), c)
                            for f, c in cond.items()
                        )
                        for e in v
                    )
                    if not ok:
                        return False
            else:
                if not _m_field(v, val):
                    return False
    return True


def test_nested_dialect_matches_reference_evaluator(spark):
    rng = random.Random(0xBEEF)
    docs = _nested_docs(rng)
    df = spark.createDataFrame(
        [
            (
                d["_id"],
                None if d["s"] is None else (d["s"]["x"], d["s"]["y"]),
                d["arr"],
                None if d["objs"] is None else [(o["v"],) for o in d["objs"]],
            )
            for d in docs
        ],
        NESTED_SCHEMA,
    )
    filters = [_nested_filter(rng) for _ in range(200)]
    failures = []
    for base in range(0, len(filters), BATCH):
        chunk = filters[base : base + BATCH]
        cols = [F.col("_id")] + [
            F.coalesce(compile_query(q, df.schema), F.lit(False)).alias(f"p{j}")
            for j, q in enumerate(chunk)
        ]
        rows = df.select(*cols).collect()
        for j, q in enumerate(chunk):
            got = {r["_id"] for r in rows if r[f"p{j}"]}
            want = {d["_id"] for d in docs if _m_nested(d, q)}
            if got != want:
                failures.append((q, sorted(got ^ want)))
    assert not failures, (
        f"{len(failures)}/200 nested filters diverge; first: {failures[0]}"
    )


# -- third sweep: the same filters through the RAGGED schema-on-read path ----

def test_ragged_resolver_matches_reference_evaluator(spark, tmp_path):
    """The ragged (JSON landing-zone) storage compiles the SAME find
    dialect through a get_json_object + try_cast resolver; the fuzzer
    re-runs the scalar-filter sweep against it.  The reference is the
    same Mongo evaluator, restricted to scalar fields (array ops don't
    apply to JSON-text extraction)."""
    import topic_store_spark as ts

    rng = random.Random(0x5EED)
    docs = _docs(rng, n=50)
    store = ts.load(str(tmp_path / "fuzz.ragged.parquet"), spark)
    payload = []
    for d in docs:
        doc = {k: v for k, v in d.items() if k != "d" and k != "_id" and v is not None}
        doc["n"] = d["_id"]  # row marker surviving the JSON round-trip
        payload.append(doc)
    store.insert_many(payload)

    scalar_fields = {k: v for k, v in FIELDS.items() if v != "arr"}
    checked = 0
    failures = []
    for _ in range(150):
        q = _filter(rng)
        # keep only filters touching scalar fields (no $size/array leaves)
        def fields_of(node):
            out = set()
            for k, v in node.items():
                if k in ("$and", "$or", "$nor"):
                    for s in v:
                        out |= fields_of(s)
                else:
                    out.add(k)
            return out

        if not fields_of(q) <= set(scalar_fields):
            continue
        checked += 1
        import json as _json

        got = {
            int(_json.loads(r["doc"])["n"])
            for r in store.find(q).collect()
        }
        want = {
            d["_id"]
            for d in docs
            if _m_query({k: v for k, v in d.items() if k != "d"}, q)
        }
        if got != want:
            failures.append((q, sorted(got ^ want)[:5]))
    assert checked >= 40  # the generator produced enough scalar filters
    assert not failures, (
        f"{len(failures)}/{checked} ragged filters diverge; "
        f"first: {failures[0]}"
    )


# -- fourth sweep: $jsonSchema (r8) ------------------------------------------
#
# Generator keeps keywords on fields of their applicable type (numeric
# keywords on numbers, string keywords on strings, ...), matching the
# implementation's documented lean: castability approximates JSON
# Schema's type-applicability under schema-on-read.

def _js_prop(rng: random.Random, f: str) -> dict:
    t = FIELDS[f]
    if t == "int":
        return rng.choice([
            {"minimum": rng.randint(-4, 9)},
            {"maximum": rng.randint(-4, 9)},
            {"minimum": rng.randint(-4, 5), "exclusiveMinimum": True},
            {"maximum": rng.randint(-2, 8), "exclusiveMaximum": True},
            {"enum": [rng.randint(-3, 8), rng.randint(-3, 8)]},
            {"bsonType": "long"},
            {"bsonType": "string"},
            {"multipleOf": rng.randint(1, 3)},
        ])
    if t == "float":
        return rng.choice([
            {"minimum": rng.choice([-1.5, 0.0, 0.5, 2.5])},
            {"maximum": rng.choice([0.0, 1.0, 7.25])},
            {"bsonType": "double"},
            {"multipleOf": 0.5},
        ])
    if t == "str":
        return rng.choice([
            {"minLength": rng.randint(0, 3)},
            {"maxLength": rng.randint(0, 3)},
            {"pattern": rng.choice(["^a", "x", "z+", "^$"])},
            {"enum": ["x", "abc", "nope"]},
            {"bsonType": "string"},
        ])
    return rng.choice([
        {"minItems": rng.randint(0, 3)},
        {"maxItems": rng.randint(0, 3)},
        {"uniqueItems": True},
        {"items": {"minimum": rng.randint(0, 5)}},
        # r9: per-position schema array — element i vs schema i,
        # shorter arrays and extra elements unconstrained
        {"items": [{"minimum": rng.randint(0, 5)}]},
        {"items": [{"maximum": rng.randint(0, 6)},
                   {"minimum": rng.randint(0, 4)}]},
        # r10: additionalItems — false caps the length at the schema
        # list, schema-form validates the suffix elements
        {"items": [{"minimum": rng.randint(0, 4)}],
         "additionalItems": False},
        {"items": [{"maximum": rng.randint(0, 6)}],
         "additionalItems": {"minimum": rng.randint(0, 4)}},
        {"bsonType": "array"},
    ])


def _js_schema(rng: random.Random, depth: int = 0) -> dict:
    spec: dict = {}
    if rng.random() < 0.5:
        spec["required"] = rng.sample(list(FIELDS), rng.randint(1, 2))
    props = {}
    for _ in range(rng.randint(0, 3)):
        f = rng.choice(list(FIELDS))
        props.setdefault(f, {}).update(_js_prop(rng, f))
    if props:
        spec["properties"] = props
    if depth == 0 and rng.random() < 0.3:
        comb = rng.choice(["anyOf", "allOf", "oneOf", "not"])
        if comb == "not":
            spec["not"] = _js_schema(rng, 1)
        else:
            spec[comb] = [_js_schema(rng, 1) for _ in range(rng.randint(1, 2))]
    if depth == 0 and rng.random() < 0.25:
        # r9: closed document — columns outside `properties` must be
        # absent (null).  r10 (_id parity): Mongo does NOT implicitly
        # admit _id, so most generated closed schemas list it (the
        # usable shape) while some omit it (the server footgun where
        # every doc with an _id fails) — both sides must agree on both.
        spec["additionalProperties"] = False
        if rng.random() < 0.75:
            spec.setdefault("properties", {}).setdefault("_id", {})
    # r10: the remaining draft-4 document keywords Mongo validates
    if depth == 0 and rng.random() < 0.2:
        spec["minProperties"] = rng.randint(0, 5)
    if depth == 0 and rng.random() < 0.2:
        spec["maxProperties"] = rng.randint(1, 5)
    if depth == 0 and rng.random() < 0.25:
        trig = rng.choice(list(FIELDS))
        if rng.random() < 0.5:  # property dependency
            spec["dependencies"] = {
                trig: rng.sample(list(FIELDS), rng.randint(1, 2))
            }
        else:  # schema dependency
            spec["dependencies"] = {
                trig: {"required": [rng.choice(list(FIELDS))]}
            }
    if depth == 0 and rng.random() < 0.25:
        pat = rng.choice(["^[ab]$", "a|c", "^d", "_id", "^c"])
        sub = rng.choice([
            {"bsonType": rng.choice(["long", "double", "string", "array"])},
            {"minimum": rng.randint(-2, 6)},
            {"minLength": rng.randint(0, 3)},
            {"minItems": rng.randint(0, 2)},
        ])
        spec["patternProperties"] = {pat: sub}
    if not spec:
        spec["required"] = [rng.choice(list(FIELDS))]
    return spec


def _js_num(v) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def _js_val_ok(v, sub: dict) -> bool:
    import math
    import re as _re

    for k, arg in sub.items():
        if k == "bsonType":
            ok = {
                "long": isinstance(v, int) and not isinstance(v, bool),
                "double": isinstance(v, float),
                "string": isinstance(v, str),
                "array": isinstance(v, list),
            }[arg]
            if not ok:
                return False
        elif k == "minimum":
            if _js_num(v):
                strict = sub.get("exclusiveMinimum") is True
                if not (v > arg if strict else v >= arg):
                    return False
        elif k == "maximum":
            if _js_num(v):
                strict = sub.get("exclusiveMaximum") is True
                if not (v < arg if strict else v <= arg):
                    return False
        elif k in ("exclusiveMinimum", "exclusiveMaximum"):
            pass
        elif k == "multipleOf":
            if _js_num(v) and math.fmod(v, arg) != 0:
                return False
        elif k == "enum":
            if not any(v == a for a in arg):
                return False
        elif k == "minLength":
            if isinstance(v, str) and len(v) < arg:
                return False
        elif k == "maxLength":
            if isinstance(v, str) and len(v) > arg:
                return False
        elif k == "pattern":
            if isinstance(v, str) and not _re.search(arg, v):
                return False
        elif k == "minItems":
            if isinstance(v, list) and len(v) < arg:
                return False
        elif k == "maxItems":
            if isinstance(v, list) and len(v) > arg:
                return False
        elif k == "uniqueItems":
            if arg and isinstance(v, list) and len(set(v)) != len(v):
                return False
        elif k == "items":
            if isinstance(arg, list):
                if isinstance(v, list) and not all(
                    v[i] is None or _js_val_ok(v[i], si)
                    for i, si in enumerate(arg)
                    if i < len(v)
                ):
                    return False
            elif isinstance(v, list) and not all(
                e is None or _js_val_ok(e, arg) for e in v
            ):
                return False
        elif k == "additionalItems":
            # applies only alongside the items schema LIST (draft-4:
            # ignored otherwise); engine-convention null elements pass
            items = sub.get("items")
            if isinstance(items, list) and isinstance(v, list):
                if arg is False:
                    if len(v) > len(items):
                        return False
                elif isinstance(arg, dict):
                    if not all(
                        e is None or _js_val_ok(e, arg)
                        for e in v[len(items):]
                    ):
                        return False
        else:
            raise ValueError(k)
    return True


def _js_ok(doc: dict, spec: dict) -> bool:
    import re as _re

    pattern_matched = set()
    for pat, sub in (spec.get("patternProperties") or {}).items():
        for f in doc:
            if _re.search(pat, f):
                pattern_matched.add(f)
                v = doc.get(f)
                if v is not None and not _js_val_ok(v, sub):
                    return False
    if spec.get("additionalProperties") is False:
        # Mongo parity (r10): _id is NOT implicitly admitted; draft-4:
        # patternProperties-matched fields are not additional
        allowed = set(spec.get("properties") or {}) | pattern_matched
        for f in doc:
            if f not in allowed and doc.get(f) is not None:
                return False
    n_present = sum(1 for v in doc.values() if v is not None)
    if "minProperties" in spec and n_present < spec["minProperties"]:
        return False
    if "maxProperties" in spec and n_present > spec["maxProperties"]:
        return False
    for k, dep in (spec.get("dependencies") or {}).items():
        if doc.get(k) is None:
            continue
        if isinstance(dep, dict):
            if not _js_ok(doc, dep):
                return False
        elif not all(doc.get(d) is not None for d in dep):
            return False
    for f in spec.get("required") or []:
        if doc.get(f) is None:
            return False
    for f, sub in (spec.get("properties") or {}).items():
        v = doc.get(f)
        if v is not None and not _js_val_ok(v, sub):
            return False
    if "allOf" in spec and not all(_js_ok(doc, s) for s in spec["allOf"]):
        return False
    if "anyOf" in spec and not any(_js_ok(doc, s) for s in spec["anyOf"]):
        return False
    if "oneOf" in spec and sum(_js_ok(doc, s) for s in spec["oneOf"]) != 1:
        return False
    if "not" in spec and _js_ok(doc, spec["not"]):
        return False
    return True


def test_json_schema_matches_reference_evaluator(spark):
    rng = random.Random(0x15C4E3A)
    docs = _docs(rng)
    df = spark.createDataFrame(
        [tuple(d[k] for k in ["_id", "a", "b", "c", "d"]) for d in docs],
        SCHEMA,
    )
    schemas = [_js_schema(rng) for _ in range(120)]

    failures = []
    for base in range(0, len(schemas), BATCH):
        chunk = schemas[base : base + BATCH]
        cols = [F.col("_id")]
        for j, spec in enumerate(chunk):
            cols.append(
                F.coalesce(
                    compile_query({"$jsonSchema": spec}, df.schema),
                    F.lit(False),
                ).alias(f"p{j}")
            )
        rows = df.select(*cols).collect()
        for j, spec in enumerate(chunk):
            got = {r["_id"] for r in rows if r[f"p{j}"]}
            want = {d["_id"] for d in docs if _js_ok(d, spec)}
            if got != want:
                failures.append((spec, sorted(got ^ want)[:5]))
    assert not failures, (
        f"{len(failures)}/120 $jsonSchema filters diverge; "
        f"first: {failures[0]}"
    )
