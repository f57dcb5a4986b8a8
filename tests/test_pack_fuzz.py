"""Differential fuzzer for `pack_sequences` at random (ctx, shards)
configurations: the carrier oracle pins ONE configuration per round;
this walks the config space with random corpora (empty docs, giant
docs straddling many windows, whitespace-only docs) against a
pure-Python reference of the documented concat-and-chunk semantics —
per-shard id-order prefix sums, floor-division window placement,
occupancy rollup.
"""

from __future__ import annotations

import random
import re
from collections import defaultdict

from tests.test_dedup_fuzz import _JAVA_WS


def test_pack_sequences_matches_reference(spark):
    from topic_store_spark.operators.corpus import pack_sequences

    rng = random.Random(0x9AC7)
    docs = []
    for i in range(120):
        r = rng.random()
        if r < 0.1:
            docs.append((i, rng.choice(["", " ", "\t \n"])))
        elif r < 0.2:  # giant doc straddling several windows
            docs.append((i, " ".join("w" for _ in range(rng.randint(100, 700)))))
        else:
            docs.append((i, " ".join("w" for _ in range(rng.randint(1, 60)))))
    ctx = rng.choice([32, 100, 256])
    shards = rng.choice([1, 4, 7])

    by_shard: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for i, t in docs:
        n_tok = len([x for x in re.split(_JAVA_WS, t) if x])
        by_shard[i % shards].append((i, n_tok))
    want: dict[tuple[int, int], list] = {}
    for shard, rows in by_shard.items():
        prefix = 0
        for i, n_tok in sorted(rows):
            win = prefix // ctx
            e = want.setdefault((shard, win), [0, i, 0])
            e[0] += 1
            e[1] = min(e[1], i)
            e[2] += n_tok
            prefix += n_tok

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["shard"], r["window_id"]): [r["n_docs"], r["first_doc"], r["tokens_started"]]
        for r in pack_sequences(df, ctx=ctx, shards=shards).collect()
    }
    assert got == {k: v for k, v in want.items()}, (
        f"ctx={ctx} shards={shards}: "
        f"extra={set(got) - set(want)} missing={set(want) - set(got)}"
    )
