"""Differential fuzzer for the aggregation VALUE-EXPRESSION language
(`query/pipeline.compile_value`) — the semantic core every `$project` /
`$addFields` / `$expr` / window expression runs through.

Mongo's aggregation expressions are NOT SQL expressions:

- `$eq`/`$ne` are null-SAFE: ``{$eq: ["$a", null]}`` is Mongo's idiom
  for "a is null" and returns true/false, never null;
- ordering comparisons use the BSON total order in which null sorts
  BELOW every number, so ``{$gt: [5, null]}`` is TRUE and
  ``{$lt: [null, 5]}`` is TRUE (never null);
- `$and`/`$or`/`$not`/`$cond` evaluate TRUTHINESS where null/missing is
  falsy — two-valued output, never null.

The fuzzer evaluates random expression trees both through
``compile_value`` on Spark and through an independent pure-Python
evaluator of the documented Mongo semantics above (same-typed operands
only — BSON cross-type ordering is out of the dialect's scope).
Arithmetic/array ops share SQL's null-propagation, so those mostly pin
behavior; the comparison/boolean corners are where engines silently
diverge.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from topic_store_spark.query.pipeline import compile_value

SCHEMA = "_id long, a long, b long, p boolean, q boolean, d array<long>"


def _docs(rng: random.Random, n: int = 60) -> list[dict]:
    return [
        {
            "_id": i,
            "a": rng.choice([None, *range(-3, 7)]),
            "b": rng.choice([None, 0, 1, 2, 5]),
            "p": rng.choice([None, True, False]),
            "q": rng.choice([None, True, False]),
            "d": rng.choice([None, [], [1], [2, 4], [0, 3, 6]]),
        }
        for i in range(n)
    ]


# -- expression generator ---------------------------------------------------

def _num_expr(rng: random.Random, depth: int = 0):
    """Numeric-valued expression tree."""
    if depth >= 2 or rng.random() < 0.4:
        return rng.choice(["$a", "$b", rng.randint(-3, 6), None])
    k = rng.randrange(8)
    if k == 6:
        # total trig/angle ops (r7): defined on every real, so arbitrary
        # numeric subtrees are safe; asin/acosh-style partial-domain ops
        # are pinned by unit tests instead
        op = rng.choice(
            ["$sin", "$cos", "$tan", "$atan", "$sinh", "$tanh",
             "$degreesToRadians", "$radiansToDegrees"]
        )
        return {op: _num_expr(rng, depth + 1)}
    if k == 7:
        return {
            "$atan2": [_num_expr(rng, depth + 1), _num_expr(rng, depth + 1)]
        }
    if k == 0:
        return {"$add": [_num_expr(rng, depth + 1), _num_expr(rng, depth + 1)]}
    if k == 1:
        return {"$subtract": [_num_expr(rng, depth + 1), _num_expr(rng, depth + 1)]}
    if k == 2:
        return {"$multiply": [_num_expr(rng, depth + 1), _num_expr(rng, depth + 1)]}
    if k == 3:
        return {"$abs": _num_expr(rng, depth + 1)}
    if k == 4:
        return {"$ifNull": [_num_expr(rng, depth + 1), _num_expr(rng, depth + 1)]}
    return {
        "$cond": [
            _bool_expr(rng, depth + 1),
            _num_expr(rng, depth + 1),
            _num_expr(rng, depth + 1),
        ]
    }


def _bool_expr(rng: random.Random, depth: int = 0):
    """Boolean-valued expression tree."""
    if depth >= 2 or rng.random() < 0.35:
        if rng.random() < 0.5:
            return rng.choice(["$p", "$q", True, False, None])
        op = rng.choice(["$eq", "$ne", "$gt", "$gte", "$lt", "$lte"])
        return {op: [_num_expr(rng, depth + 1), _num_expr(rng, depth + 1)]}
    k = rng.randrange(3)
    subs = [_bool_expr(rng, depth + 1) for _ in range(rng.randint(2, 3))]
    if k == 0:
        return {"$and": subs}
    if k == 1:
        return {"$or": subs}
    return {"$not": _bool_expr(rng, depth + 1)}


def _arr_expr(rng: random.Random):
    k = rng.randrange(6)
    if k == 0:
        return {"$size": {"$ifNull": ["$d", []]}}
    if k == 1:
        return {"$arrayElemAt": ["$d", rng.randint(0, 2)]}
    if k == 2:
        return {"$arrayElemAt": ["$d", -1]}
    if k == 3:
        op = rng.choice(["$gt", "$lte", "$eq"])
        return {"$filter": {"input": "$d", "as": "e",
                            "cond": {op: ["$$e", rng.randint(0, 5)]}}}
    if k == 4:
        return {"$map": {"input": "$d", "as": "e",
                         "in": {"$add": ["$$e", rng.randint(-2, 3)]}}}
    return {"$reduce": {"input": "$d", "initialValue": rng.randint(0, 2),
                        "in": {"$add": ["$$value", "$$this"]}}}


def _expr(rng: random.Random):
    r = rng.random()
    if r < 0.45:
        return _bool_expr(rng)
    if r < 0.85:
        return _num_expr(rng)
    return _arr_expr(rng)


# -- reference evaluator (Mongo aggregation semantics) ----------------------

def _truthy(v) -> bool:
    """Mongo expression truthiness: null/missing, false, and 0 are
    falsy; everything else truthy."""
    return not (v is None or v is False or v == 0)


def _m_cmp(a, b) -> int:
    """Same-type BSON order with null lowest."""
    if a is None and b is None:
        return 0
    if a is None:
        return -1
    if b is None:
        return 1
    return (a > b) - (a < b)


#: static field layout of struct columns in the long-tail doc shape —
#: the engine's $mergeObjects is static-schema (a struct ref contributes
#: ALL its schema fields, null-valued ones included), so the reference
#: evaluator must know the layout too
_STRUCT_FIELDS = {"st": ["u", "w"], "st2": ["w", "z"]}

_TRIM_DEFAULT = " \t\n\r\x00\x0b\x0c"


def _m_eval(doc: dict, e):
    if isinstance(e, str) and e.startswith("$"):
        node = doc
        for part in e[1:].split("."):
            if not isinstance(node, dict):
                return None
            node = node.get(part)
        return node
    if not isinstance(e, dict):
        return e
    if not (len(e) == 1 and next(iter(e)).startswith("$")):
        # plain document literal
        return {k: _m_eval(doc, v) for k, v in e.items()}
    (op, arg), = e.items()
    if op == "$literal":
        return arg
    if op == "$add":
        vals = [_m_eval(doc, a) for a in arg]
        return None if any(v is None for v in vals) else sum(vals)
    if op == "$subtract":
        x, y = (_m_eval(doc, a) for a in arg)
        return None if x is None or y is None else x - y
    if op == "$multiply":
        vals = [_m_eval(doc, a) for a in arg]
        return None if any(v is None for v in vals) else math.prod(vals)
    if op == "$abs":
        v = _m_eval(doc, arg)
        return None if v is None else abs(v)
    if op in ("$sin", "$cos", "$tan", "$atan", "$sinh", "$tanh",
              "$degreesToRadians", "$radiansToDegrees"):
        v = _m_eval(doc, arg)
        if v is None:
            return None
        fn = {
            "$sin": math.sin, "$cos": math.cos, "$tan": math.tan,
            "$atan": math.atan, "$sinh": math.sinh, "$tanh": math.tanh,
            "$degreesToRadians": math.radians,
            "$radiansToDegrees": math.degrees,
        }[op]
        try:
            return fn(v)
        except OverflowError:  # sinh of a big product: Spark says inf
            return math.copysign(math.inf, v)
    if op == "$atan2":
        x, y = (_m_eval(doc, a) for a in arg)
        return None if x is None or y is None else math.atan2(x, y)
    if op == "$ifNull":
        for a in arg:
            v = _m_eval(doc, a)
            if v is not None:
                return v
        return None
    if op == "$cond":
        cond, then, other = arg
        return _m_eval(doc, then if _truthy(_m_eval(doc, cond)) else other)
    if op in ("$eq", "$ne", "$gt", "$gte", "$lt", "$lte"):
        c = _m_cmp(_m_eval(doc, arg[0]), _m_eval(doc, arg[1]))
        return {
            "$eq": c == 0, "$ne": c != 0, "$gt": c > 0,
            "$gte": c >= 0, "$lt": c < 0, "$lte": c <= 0,
        }[op]
    if op == "$and":
        return all(_truthy(_m_eval(doc, a)) for a in arg)
    if op == "$or":
        return any(_truthy(_m_eval(doc, a)) for a in arg)
    if op == "$not":
        inner = arg[0] if isinstance(arg, list) else arg
        return not _truthy(_m_eval(doc, inner))
    if op == "$size":
        v = _m_eval(doc, arg)
        return None if v is None else len(v)
    if op == "$arrayElemAt":
        v = _m_eval(doc, arg[0])
        idx = arg[1]
        if v is None:
            return None
        if -len(v) <= idx < len(v):
            return v[idx]
        return None  # out of range -> missing ≡ null
    if op == "$filter":
        v = _m_eval(doc, arg["input"])
        if v is None:
            return None
        name = arg.get("as", "this")
        out = []
        for e in v:
            scoped = dict(doc)
            scoped[f"__var_{name}"] = e
            if _truthy(_m_eval_scoped(scoped, arg["cond"], {name: e})):
                out.append(e)
        return out
    if op == "$map":
        v = _m_eval(doc, arg["input"])
        if v is None:
            return None
        name = arg.get("as", "this")
        return [_m_eval_scoped(doc, arg["in"], {name: e}) for e in v]
    if op == "$reduce":
        v = _m_eval(doc, arg["input"])
        if v is None:
            return None
        acc = arg["initialValue"]
        for e in v:
            acc = _m_eval_scoped(doc, arg["in"], {"value": acc, "this": e})
        return acc
    # ---- long-tail surface (round 6) ------------------------------------
    if op == "$switch":
        for b in arg["branches"]:
            if _truthy(_m_eval(doc, b["case"])):
                return _m_eval(doc, b["then"])
        return _m_eval(doc, arg["default"]) if "default" in arg else None
    if op == "$mergeObjects":
        operands = []
        for o in arg if isinstance(arg, list) else [arg]:
            if o is None:
                continue
            fields = (
                _STRUCT_FIELDS[o[1:]]
                if isinstance(o, str) and o.startswith("$")
                else list(o)
            )
            operands.append((_m_eval(doc, o), fields))
        order: list[str] = []
        for _, fs in operands:
            order.extend(f for f in fs if f not in order)
        out = {}
        for f in order:
            out[f] = None
            for val, fs in reversed(operands):
                if f in fs and val is not None:
                    out[f] = val.get(f)
                    break
        return out
    if op == "$objectToArray":
        v = _m_eval(doc, arg)
        if v is None:
            return None
        fields = (
            _STRUCT_FIELDS[arg[1:]]
            if isinstance(arg, str) and arg.startswith("$")
            else list(arg)
        )
        # documented dialect divergence: a struct with heterogeneous
        # field TYPES stringifies v (both fixture structs mix long+string)
        def _v(x):
            return None if x is None else str(x)

        return [{"k": f, "v": _v(v.get(f))} for f in fields]
    if op == "$getField":
        field = arg if isinstance(arg, str) else arg["field"]
        src = doc if isinstance(arg, str) else _m_eval(doc, arg["input"])
        return src.get(field) if isinstance(src, dict) else None
    if op == "$concatArrays":
        vals = [_m_eval(doc, a) for a in arg]
        if any(v is None for v in vals):
            return None
        return [x for v in vals for x in v]
    if op == "$slice":
        a = _m_eval(doc, arg[0])
        if a is None:
            return None
        if len(arg) == 2:
            n = _m_eval(doc, arg[1])
            return a[:n] if n >= 0 else a[n:]
        pos, n = (_m_eval(doc, x) for x in arg[1:])
        start = pos if pos >= 0 else max(len(a) + pos, 0)
        return a[start : start + n]
    if op == "$indexOfArray":
        a = _m_eval(doc, arg[0])
        if a is None:
            return None
        needle = _m_eval(doc, arg[1])
        start = _m_eval(doc, arg[2]) if len(arg) > 2 else 0
        end = _m_eval(doc, arg[3]) if len(arg) > 3 else len(a)
        for i in range(start, min(end, len(a))):
            if a[i] == needle:
                return i
        return -1
    if op == "$range":
        vals = [_m_eval(doc, a) for a in arg]
        return list(range(*vals))
    if op == "$zip":
        inputs = [_m_eval(doc, i) for i in arg["inputs"]]
        if any(v is None for v in inputs):
            return None
        if arg.get("useLongestLength"):
            n = max(len(v) for v in inputs)
            defaults = arg.get("defaults") or [None] * len(inputs)
            return [
                [v[i] if i < len(v) else _m_eval(doc, d)
                 for v, d in zip(inputs, defaults)]
                for i in range(n)
            ]
        n = min(len(v) for v in inputs)
        return [[v[i] for v in inputs] for i in range(n)]
    if op in ("$trim", "$ltrim", "$rtrim"):
        v = _m_eval(doc, arg["input"])
        if v is None:
            return None
        chars = arg.get("chars", _TRIM_DEFAULT)
        return {"$trim": v.strip, "$ltrim": v.lstrip, "$rtrim": v.rstrip}[op](chars)
    if op == "$replaceOne":
        v = _m_eval(doc, arg["input"])
        return None if v is None else v.replace(arg["find"], arg["replacement"], 1)
    if op == "$replaceAll":
        v = _m_eval(doc, arg["input"])
        return None if v is None else v.replace(arg["find"], arg["replacement"])
    if op == "$regexMatch":
        import re as _re

        v = _m_eval(doc, arg["input"])
        if v is None:
            return False
        flags = 0
        for ch, f in (("i", _re.I), ("m", _re.M), ("s", _re.S), ("x", _re.X)):
            if ch in (arg.get("options") or ""):
                flags |= f
        return _re.search(arg["regex"], v, flags) is not None
    if op == "$strLenCP":
        v = _m_eval(doc, arg)
        return None if v is None else len(v)
    if op == "$concat":
        vals = [_m_eval(doc, a) for a in arg]
        if any(v is None for v in vals):
            return None
        return "".join(vals)
    if op in ("$toLower", "$toUpper"):
        v = _m_eval(doc, arg)
        if v is None:
            return None
        return v.lower() if op == "$toLower" else v.upper()
    if op == "$reverseArray":
        v = _m_eval(doc, arg)
        return None if v is None else list(reversed(v))
    if op == "$sortArray":
        v = _m_eval(doc, arg["input"])
        if v is None:
            return None
        asc = arg.get("sortBy", 1) == 1
        # null-lowest in both directions (asc: nulls first; desc: last)
        return sorted(
            v,
            key=lambda x: (x is not None, x if x is not None else 0),
            reverse=not asc,
        )
    if op == "$setEquals":
        sets = [_m_eval(doc, a) for a in arg]
        if any(s is None for s in sets):
            return None
        return all(set(s) == set(sets[0]) for s in sets[1:])
    if op == "$setIsSubset":
        a, b = (_m_eval(doc, x) for x in arg)
        if a is None or b is None:
            return None
        return set(a) <= set(b)
    if op in ("$anyElementTrue", "$allElementsTrue"):
        inner = arg[0] if isinstance(arg, list) else arg
        v = _m_eval(doc, inner)
        if v is None:
            return op == "$allElementsTrue"
        truths = [_truthy(e) for e in v]
        return any(truths) if op == "$anyElementTrue" else all(truths)
    if op == "$isNumber":
        v = _m_eval(doc, arg)
        return isinstance(v, (int, float)) and not isinstance(v, bool)
    if op == "$regexFindAll":
        import re as _re

        v = _m_eval(doc, arg["input"])
        if v is None:
            return []
        out = []
        for m in _re.finditer(arg["regex"], v):
            out.append({
                "match": m.group(0),
                "idx": m.start(),
                "captures": [g if g is not None else "" for g in m.groups()],
            })
        return out
    if op in ("$bitAnd", "$bitOr", "$bitXor"):
        vals = [_m_eval(doc, a) for a in arg]
        if any(v is None for v in vals):
            return None
        import functools
        import operator as _op

        fn = {"$bitAnd": _op.and_, "$bitOr": _op.or_, "$bitXor": _op.xor}[op]
        return functools.reduce(fn, vals)
    if op == "$bitNot":
        inner = arg[0] if isinstance(arg, list) else arg
        v = _m_eval(doc, inner)
        return None if v is None else ~v
    if op == "$let":
        bound: dict = {}
        for vname, vexpr in arg["vars"].items():
            bound[vname] = _m_eval_scoped(doc, vexpr, dict(bound))
        return _m_eval_scoped(doc, arg["in"], bound)
    if op == "$toString":
        v = _m_eval(doc, arg)
        if v is None:
            return None
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)
    if op == "$strcasecmp":
        # Mongo coerces null/missing to "" (the $toLower family)
        a, b = ((_m_eval(doc, x) or "").lower() for x in arg)
        return (a > b) - (a < b)
    if op == "$indexOfCP":
        s = _m_eval(doc, arg[0])
        if s is None:
            return None
        sub = _m_eval(doc, arg[1])
        start = _m_eval(doc, arg[2]) if len(arg) > 2 else 0
        end = _m_eval(doc, arg[3]) if len(arg) > 3 else len(s)
        # Mongo searches within the [start, end) substring: the match
        # must lie FULLY inside the range
        pos = s.find(sub, start)
        return pos if pos >= start >= 0 and pos + len(sub) <= end else -1
    # ---- round-7 additions ----------------------------------------------
    if op == "$isArray":
        inner = arg[0] if isinstance(arg, list) else arg
        return isinstance(_m_eval(doc, inner), list)
    if op == "$type":
        inner = arg[0] if isinstance(arg, list) else arg
        # a literal int is "int" when it fits 32 bits (engine rule);
        # SCHEMA ints are long columns, so their values map to "long"
        if isinstance(inner, bool):
            return "bool"
        if isinstance(inner, int):
            return "int" if -(2**31) <= inner < 2**31 else "long"
        if isinstance(inner, float):
            return "double"
        v = _m_eval(doc, inner)
        if v is None:
            return "null"
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, int):
            return "long"
        if isinstance(v, float):
            return "double"
        if isinstance(v, str):
            return "string"
        if isinstance(v, list):
            return "array"
        return "object"
    if op == "$binarySize":
        inner = arg[0] if isinstance(arg, list) else arg
        v = _m_eval(doc, inner)
        return None if v is None else len(v.encode("utf-8"))
    if op in ("$first", "$last"):
        inner = arg[0] if isinstance(arg, list) else arg
        v = _m_eval(doc, inner)
        if v is None or not v:
            return None
        return v[0] if op == "$first" else v[-1]
    if op in ("$firstN", "$lastN", "$maxN", "$minN"):
        v = _m_eval(doc, arg["input"])
        n = _m_eval(doc, arg["n"])
        if v is None:
            return None
        if op == "$firstN":
            return v[:n]
        if op == "$lastN":
            return v[-n:] if n <= len(v) else list(v)
        nn = sorted(
            (x for x in v if x is not None), reverse=op == "$maxN"
        )
        return nn[:n]
    if op in ("$sum", "$avg"):
        def _is_num(x):
            return isinstance(x, (int, float)) and not isinstance(x, bool)

        if isinstance(arg, list):
            vals = [_m_eval(doc, a) for a in arg]
        else:
            v = _m_eval(doc, arg)
            vals = v if isinstance(v, list) else [v]
        nums = [x for x in vals if _is_num(x)]
        if op == "$sum":
            return sum(nums) if nums else 0
        return (sum(float(x) for x in nums) / len(nums)) if nums else None
    raise ValueError(op)


def _m_eval_scoped(doc: dict, e, bindings: dict):
    """Evaluate with $$var bindings resolved by substitution."""
    if isinstance(e, str) and e.startswith("$$"):
        name = e[2:].split(".")[0]
        if name in bindings:
            return bindings[name]
        raise ValueError(f"unbound {e}")
    if isinstance(e, dict):
        (op, arg), = e.items()
        sub = lambda x: _m_subst(x, bindings)  # noqa: E731
        return _m_eval(doc, {op: sub(arg)})
    return _m_eval(doc, e)


def _m_subst(x, bindings: dict):
    """Substitute bound $$vars with $literal-style constants."""
    if isinstance(x, str) and x.startswith("$$"):
        name = x[2:].split(".")[0]
        if name in bindings:
            v = bindings[name]
            return {"$literal": v} if not isinstance(v, dict) else v
        return x
    if isinstance(x, list):
        return [_m_subst(i, bindings) for i in x]
    if isinstance(x, dict):
        return {k: _m_subst(v, bindings) for k, v in x.items()}
    return x


# -- the sweep --------------------------------------------------------------

N_EXPRS = 300
BATCH = 50


def test_value_expressions_match_reference_evaluator(spark):
    rng = random.Random(0xFACADE)
    docs = _docs(rng)
    df = spark.createDataFrame(
        [tuple(d[k] for k in ["_id", "a", "b", "p", "q", "d"]) for d in docs],
        SCHEMA,
    )
    exprs = [_expr(rng) for _ in range(N_EXPRS)]
    failures = []
    for base in range(0, len(exprs), BATCH):
        chunk = exprs[base : base + BATCH]
        cols = [F.col("_id")] + [
            compile_value(e).alias(f"v{j}") for j, e in enumerate(chunk)
        ]
        rows = {r["_id"]: r for r in df.select(*cols).collect()}
        for j, e in enumerate(chunk):
            for d in docs:
                got = rows[d["_id"]][f"v{j}"]
                want = _m_eval(d, e)
                ok = (
                    got == want
                    if not (
                        isinstance(got, float) and isinstance(want, (int, float))
                    )
                    else got == pytest.approx(want)
                )
                if not ok:
                    failures.append((e, d["_id"], got, want))
                    break
    assert not failures, (
        f"{len(failures)}/{N_EXPRS} expressions diverge from Mongo "
        f"aggregation semantics; first: {failures[0]}"
    )


# -- long-tail sweep (round 6): $switch/$mergeObjects/$objectToArray/
#    $getField/$concatArrays/$slice/$indexOfArray/$range/$zip/$trim/
#    $replaceOne/$replaceAll/$regexMatch + string truthiness ------------------

LT_SCHEMA = (
    "_id long, s string, s2 string, d array<long>, e array<long>, "
    "sa array<string>, st struct<u: long, w: string>, "
    "st2 struct<w: string, z: long>"
)

_STR_POOL = ["", "false", "true", "Hello World", "xxabcxx", "a,b,a,b", " pad ", "0"]


def _lt_docs(rng: random.Random, n: int = 50) -> list[dict]:
    docs = []
    for i in range(n):
        st = rng.choice(
            [None, {"u": rng.choice([None, 1, 5]), "w": rng.choice([None, "p", "q"])}]
        )
        st2 = rng.choice(
            [None, {"w": rng.choice([None, "r"]), "z": rng.choice([None, 0, 9])}]
        )
        docs.append(
            {
                "_id": i,
                "s": rng.choice([None, *_STR_POOL]),
                "s2": rng.choice([None, *_STR_POOL]),
                "d": rng.choice([None, [], [1], [2, 4], [0, 3, 6, 3]]),
                "e": rng.choice([None, [], [3], [5, 0, 3]]),
                "sa": rng.choice([None, [], ["a"], ["b", "a"], ["x", "y", "z"]]),
                "st": st,
                "st2": st2,
            }
        )
    return docs


def _lt_str_expr(rng: random.Random, depth: int = 0):
    """String-valued expression tree."""
    if depth >= 2 or rng.random() < 0.4:
        return rng.choice(["$s", "$s2", *_STR_POOL])
    k = rng.randrange(7)
    if k == 0:
        which = rng.choice(["$trim", "$ltrim", "$rtrim"])
        spec = {"input": _lt_str_expr(rng, depth + 1)}
        if rng.random() < 0.5:
            spec["chars"] = rng.choice(["x", " x", "ab", " "])
        return {which: spec}
    if k == 1:
        return {"$replaceOne": {"input": _lt_str_expr(rng, depth + 1),
                                "find": rng.choice(["a", "x", "l", "Z"]),
                                "replacement": rng.choice(["", "_", "YY"])}}
    if k == 2:
        return {"$replaceAll": {"input": _lt_str_expr(rng, depth + 1),
                                "find": rng.choice(["a", "x", "l", "Z"]),
                                "replacement": rng.choice(["", "_", "YY"])}}
    if k == 3:
        return {"$toUpper": _lt_str_expr(rng, depth + 1)}
    if k == 4:
        return {"$concat": [_lt_str_expr(rng, depth + 1),
                            _lt_str_expr(rng, depth + 1)]}
    if k == 5:
        return {"$switch": {
            "branches": [
                {"case": _lt_bool_expr(rng, depth + 1),
                 "then": _lt_str_expr(rng, depth + 1)},
                {"case": _lt_bool_expr(rng, depth + 1),
                 "then": _lt_str_expr(rng, depth + 1)},
            ],
            **({"default": _lt_str_expr(rng, depth + 1)}
               if rng.random() < 0.7 else {}),
        }}
    if k == 6 and rng.random() < 0.5:
        return {"$let": {
            "vars": {"v1": _lt_str_expr(rng, depth + 1)},
            "in": rng.choice([
                "$$v1",
                {"$concat": [{"$ifNull": ["$$v1", "?"]}, "_t"]},
                {"$toUpper": "$$v1"},
            ]),
        }}
    if rng.random() < 0.4:
        # $type only supports statically-typeable operands: paths,
        # literals, and ops with a fixed result kind ($toUpper is
        # always-string, so it safely wraps arbitrary string trees;
        # every _lt_arr_expr root is an _ARRAY_OPS member)
        return {"$type": rng.choice([
            "$s", "$d", "$sa", "$st", "$st.u", "$st.w", 3, None, True,
            {"$toUpper": _lt_str_expr(rng, depth + 1)}, _lt_arr_expr(rng),
        ])}
    # string-typed fields only: this tree sits in STRING position, and
    # a long-valued field would type-clash in $replaceOne/$trim above
    # (numeric $getField is covered via _lt_doc_expr and $st.u paths)
    return {"$getField": {"field": rng.choice(["w", "nope"]),
                          "input": rng.choice(["$st", "$st2"])}}


def _lt_bool_expr(rng: random.Random, depth: int = 0):
    """Boolean tree whose leaves exercise STRING truthiness (the ANSI
    trap: any string — even "false" or "" — is truthy in Mongo) and
    $regexMatch."""
    if depth >= 2 or rng.random() < 0.4:
        r = rng.random()
        if r < 0.4:
            # bare string in boolean position — the r6 _truthy_expr fix
            return rng.choice(["$s", "$s2", "", "false", "0"])
        if r < 0.6:
            return {"$regexMatch": {
                "input": rng.choice(["$s", "$s2"]),
                "regex": rng.choice(["false", "Hello", "ab", "a.c", "^x", "o"]),
                **({"options": "i"} if rng.random() < 0.4 else {}),
            }}
        if r < 0.7:
            k2 = rng.randrange(4)
            if k2 == 0:
                return {"$setEquals": [rng.choice(["$d", "$e"]),
                                       rng.choice(["$d", "$e", [3], [0, 3, 6]])]}
            if k2 == 1:
                return {"$setIsSubset": [rng.choice(["$d", "$e", [3]]),
                                         rng.choice(["$d", "$e"])]}
            if k2 == 2:
                return {rng.choice(["$anyElementTrue", "$allElementsTrue"]):
                        [rng.choice(["$d", "$e"])]}
            if rng.random() < 0.5:
                return {"$isArray": [rng.choice(
                    ["$d", "$e", "$sa", "$s", "$st", "$st.u", 3, None, "lit"]
                )]}
            return {"$isNumber": rng.choice(["$st.u", "$st2.z", "$s", 3, None])}
        return {"$eq": [_lt_num_expr(rng, depth + 1), _lt_num_expr(rng, depth + 1)]}
    k = rng.randrange(3)
    if k == 0:
        return {"$and": [_lt_bool_expr(rng, depth + 1),
                         _lt_bool_expr(rng, depth + 1)]}
    if k == 1:
        return {"$or": [_lt_bool_expr(rng, depth + 1),
                        _lt_bool_expr(rng, depth + 1)]}
    return {"$not": _lt_bool_expr(rng, depth + 1)}


def _lt_num_expr(rng: random.Random, depth: int = 0):
    if depth >= 2 or rng.random() < 0.5:
        return rng.choice(["$st.u", "$st2.z", rng.randint(-2, 6), None])
    k = rng.randrange(6)
    if k == 4:
        which = rng.choice(["$bitAnd", "$bitOr", "$bitXor"])
        if rng.random() < 0.25:
            return {"$bitNot": _lt_num_expr(rng, depth + 1)}
        return {which: [_lt_num_expr(rng, depth + 1),
                        _lt_num_expr(rng, depth + 1)]}
    if k == 5:
        if rng.random() < 0.5:
            return {"$strcasecmp": [rng.choice(["$s", "$s2", "HELLO world"]),
                                    rng.choice(["$s", "$s2", "false"])]}
        args = [rng.choice(["$s", "$s2"]), rng.choice(["a", "l", "o", "Z"])]
        if rng.random() < 0.5:
            args.append(rng.randint(0, 4))
            if rng.random() < 0.5:
                args.append(rng.randint(1, 8))
        return {"$indexOfCP": args}
    if k == 0:
        return {"$indexOfArray": ["$d", rng.randint(0, 6)]
                + ([rng.randint(0, 2)] if rng.random() < 0.4 else [])}
    if k == 1:
        r = rng.random()
        if r < 0.3:
            return {"$binarySize": _lt_str_expr(rng, depth + 1)}
        if r < 0.6:
            # array-expression $sum/$avg: array field, list of numeric
            # operands (nulls skipped), or a scalar
            which = rng.choice(["$sum", "$avg"])
            a = rng.random()
            if a < 0.4:
                return {which: rng.choice(["$d", "$e", "$sa"])}
            if a < 0.8:
                return {which: [_lt_num_expr(rng, depth + 1),
                                _lt_num_expr(rng, depth + 1), None]}
            return {which: _lt_num_expr(rng, depth + 1)}
        if r < 0.8:
            # numeric arrays only: this expression sits in NUMERIC
            # position, so a string element would ANSI-clash upstream
            return {rng.choice(["$first", "$last"]):
                    [rng.choice(["$d", "$e"])]}
        return {"$strLenCP": {"$ifNull": [_lt_str_expr(rng, depth + 1), ""]}}
    if k == 2:
        return {"$add": [_lt_num_expr(rng, depth + 1), _lt_num_expr(rng, depth + 1)]}
    return {"$size": {"$ifNull": ["$d", []]}}


def _lt_arr_expr(rng: random.Random):
    k = rng.randrange(8)
    if k == 6:
        return {"$reverseArray": rng.choice(["$d", "$e", "$sa"])}
    if k == 7:
        return {"$sortArray": {"input": rng.choice(["$d", "$e", "$sa"]),
                               "sortBy": rng.choice([1, -1])}}
    if k == 0:
        return {"$concatArrays": [rng.choice(["$d", "$e"]),
                                  rng.choice(["$d", "$e", [7, 8]])]}
    if k == 1:
        arr = rng.choice(["$d", "$e"])
        if rng.random() < 0.5:
            return {"$slice": [arr, rng.randint(-4, 4)]}
        return {"$slice": [arr, rng.randint(-4, 3), rng.randint(1, 3)]}
    if k == 2:
        args = [rng.randint(-2, 2), rng.randint(-3, 8)]
        if rng.random() < 0.5:
            args.append(rng.choice([-2, -1, 1, 2, 3]))
        return {"$range": args}
    if k == 3:
        return {"$zip": {"inputs": ["$d", "$e"],
                         **({"useLongestLength": True,
                             "defaults": [rng.randint(-1, 1), rng.randint(-1, 1)]}
                            if rng.random() < 0.5 else {})}}
    if k == 4:
        if rng.random() < 0.5:
            return {rng.choice(["$firstN", "$lastN", "$maxN", "$minN"]): {
                "n": rng.randint(1, 4),
                "input": rng.choice(["$d", "$e", "$sa"]),
            }}
        return {"$objectToArray": rng.choice(["$st", "$st2"])}
    if k == 5 and rng.random() < 0.6:
        return {"$regexFindAll": {
            "input": rng.choice(["$s", "$s2"]),
            "regex": rng.choice(["a", "l+", "(a)(,?)", "x(x)", "o.?"]),
        }}
    return {"$slice": [{"$concatArrays": ["$d", "$e"]}, rng.randint(0, 5)]}


def _lt_doc_expr(rng: random.Random):
    inline = {"u": rng.randint(0, 9), "q": rng.randint(0, 9)}
    operands = rng.sample(["$st", "$st2", inline, None], rng.randint(2, 3))
    merged = {"$mergeObjects": operands}
    if rng.random() < 0.4:
        return {"$getField": {"field": rng.choice(["u", "w", "z", "q"]),
                              "input": merged}}
    return merged


def _lt_expr(rng: random.Random):
    r = rng.random()
    if r < 0.3:
        return _lt_bool_expr(rng)
    if r < 0.55:
        return _lt_str_expr(rng)
    if r < 0.8:
        return _lt_arr_expr(rng)
    return _lt_doc_expr(rng)


def _norm(v):
    """Spark Row/array-of-Row results -> plain python for comparison."""
    from pyspark.sql import Row

    if isinstance(v, Row):
        return {k: _norm(x) for k, x in v.asDict().items()}
    if isinstance(v, list):
        return [_norm(x) for x in v]
    return v


def test_longtail_expressions_match_reference_evaluator(spark):
    from topic_store_spark.query.pipeline import _schema_scope

    rng = random.Random(0xB16_7A11)
    docs = _lt_docs(rng)

    def _tup(d, key, fields):
        v = d[key]
        return None if v is None else tuple(v[f] for f in fields)

    rows = [
        (
            d["_id"], d["s"], d["s2"], d["d"], d["e"], d["sa"],
            _tup(d, "st", ["u", "w"]), _tup(d, "st2", ["w", "z"]),
        )
        for d in docs
    ]
    df = spark.createDataFrame(rows, LT_SCHEMA)
    exprs = [_lt_expr(rng) for _ in range(N_EXPRS)]
    failures = []
    for base in range(0, len(exprs), BATCH):
        chunk = exprs[base : base + BATCH]
        with _schema_scope(df.schema):
            cols = [F.col("_id")] + [
                compile_value(e).alias(f"v{j}") for j, e in enumerate(chunk)
            ]
        got_rows = {r["_id"]: r for r in df.select(*cols).collect()}
        for j, e in enumerate(chunk):
            for d in docs:
                got = _norm(got_rows[d["_id"]][f"v{j}"])
                want = _m_eval(d, e)
                if got != want:
                    failures.append((e, d["_id"], got, want))
                    break
    assert not failures, (
        f"{len(failures)}/{N_EXPRS} long-tail expressions diverge from "
        f"Mongo aggregation semantics; first: {failures[0]}"
    )
