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
    k = rng.randrange(6)
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


def _m_eval(doc: dict, e):
    if isinstance(e, str) and e.startswith("$"):
        return doc.get(e[1:])
    if not isinstance(e, dict):
        return e
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
