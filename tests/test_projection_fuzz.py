"""Differential fuzzer for Mongo projections (query/projection.py):
random include/exclude projection dicts over nested documents, applied
both by ``apply_projection`` on Spark and by a pure-Python reference of
the documented rules (R1-R3 + the engine's R2 policy: ``_ts_meta``
forced on inclusion, ``_id`` kept unless excluded, struct shape
preserved on nested includes, unknown fields projected as typed NULL —
a static schema cannot omit per-row the way Mongo does, and the
contract documents that).
"""

from __future__ import annotations

import random

from topic_store_spark.query.projection import apply_projection

SCHEMA = (
    "_id string, _ts_meta struct<session: string, sys_time: double>, "
    "a long, b string, s struct<x: long, y: string, t: struct<u: long>>"
)

PATHS = ["a", "b", "s", "s.x", "s.y", "s.t", "s.t.u"]


def _docs(rng: random.Random, n: int = 25) -> list[dict]:
    out = []
    for i in range(n):
        out.append(
            {
                "_id": f"id{i}",
                "_ts_meta": {"session": "s0", "sys_time": float(i)},
                "a": rng.choice([None, i]),
                "b": rng.choice([None, f"b{i}"]),
                "s": rng.choice(
                    [None]
                    + [
                        {
                            "x": rng.choice([None, i]),
                            "y": rng.choice([None, "y"]),
                            "t": rng.choice([None, {"u": i}]),
                        }
                    ]
                ),
            }
        )
    return out


def _projection(rng: random.Random) -> dict:
    if rng.random() < 0.5:  # inclusion
        proj = {p: 1 for p in rng.sample(PATHS, rng.randint(1, 3))}
        if rng.random() < 0.3:
            proj["_id"] = 0
        return proj
    # exclusion (never _ts_meta — contract forbids it)
    return {p: 0 for p in rng.sample(PATHS, rng.randint(1, 3))}


# -- reference --------------------------------------------------------------

def _get(doc, path):
    node = doc
    for part in path.split("."):
        if not isinstance(node, dict):
            return None
        node = node.get(part)
    return node


def _include(doc: dict, paths: list[str]):
    """Rebuild from a path prefix-tree, struct shape preserved."""
    tree: dict = {}
    for p in paths:
        node = tree
        parts = p.split(".")
        for part in parts[:-1]:
            if part in node and node[part] is None:
                break
            node = node.setdefault(part, {})
        else:
            node[parts[-1]] = None

    def build(src, t):
        out = {}
        for name, sub in t.items():
            v = src.get(name) if isinstance(src, dict) else None
            if sub is None:
                out[name] = v
            else:
                out[name] = None if v is None else build(v, sub)
        return out

    return build(doc, tree)


def _exclude(doc, paths):
    import copy

    out = copy.deepcopy(doc)
    for p in paths:
        parts = p.split(".")
        node = out
        for part in parts[:-1]:
            node = node.get(part) if isinstance(node, dict) else None
            if node is None:
                break
        else:
            if isinstance(node, dict):
                node.pop(parts[-1], None)
    return out


def _reference(doc: dict, proj: dict) -> dict:
    includes = [k for k, v in proj.items() if v not in (0, False)]
    excludes = [k for k, v in proj.items() if v in (0, False)]
    if includes:
        paths = list(dict.fromkeys(includes + ["_ts_meta"]))
        if "_id" not in excludes:
            paths.append("_id")
        return _include(doc, paths)
    return _exclude(doc, excludes)


def test_projections_match_reference(spark):
    rng = random.Random(0xD1CE)
    docs = _docs(rng)
    df = spark.createDataFrame(
        [
            (
                d["_id"],
                (d["_ts_meta"]["session"], d["_ts_meta"]["sys_time"]),
                d["a"],
                d["b"],
                None
                if d["s"] is None
                else (
                    d["s"]["x"],
                    d["s"]["y"],
                    None if d["s"]["t"] is None else (d["s"]["t"]["u"],),
                ),
            )
            for d in docs
        ],
        SCHEMA,
    )
    failures = []
    for trial in range(120):
        proj = _projection(rng)
        got = {
            r["_id"] if "_id" in r else f"row{j}": r.asDict(recursive=True)
            for j, r in enumerate(apply_projection(df, proj).collect())
        }
        for d in docs:
            want = _reference(d, proj)
            k = want.get("_id", None)
            if k is None:
                # _id excluded: match rows by _ts_meta.sys_time instead
                gk = {
                    v["_ts_meta"]["sys_time"]: v for v in got.values()
                }
                g = gk[d["_ts_meta"]["sys_time"]]
            else:
                g = got[k]
            if g != want:
                failures.append((proj, d["_id"], g, want))
                break
        if failures:
            break
    assert not failures, f"projection diverges: {failures[0]}"
