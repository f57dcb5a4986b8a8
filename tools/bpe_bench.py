"""Measure the distributed BPE fallback's E[batch] on real corpus text.

The r6 batching work (`operators/bpe.py _select_merge_batch`) proves
each batch is equivalent to that many sequential merges, and the
property tests pin iterations < merges — but not HOW LARGE batches get
on a real word distribution, which decides whether a 32k-merge vocab
costs ~32k jobs or ~4k.  This tool forces the distributed path
(`local_max_words=0`) over the sf documents table, trains a >=1k-merge
vocabulary, and records:

- iterations and total merges -> E[batch] = merges/iterations;
- bounds_jobs (iterations that paid the second, bound-computing job —
  iterations whose disjoint prefix was 1 skip it);
- jobs-per-merge vs the sequential baseline's 1.0 (candidate jobs +
  bounds jobs, the two per-iteration Spark actions);
- the batch-size histogram (where conflicts actually bite).

It also verifies the batched merge list is IDENTICAL to batch_k=1 over
the first `check_merges` merges (the property the tests pin at small
scale, re-checked here at measurement scale).

Writes BPEBENCH.md and prints one JSON line.

Usage: python tools/bpe_bench.py [sf_dir] [n_merges] [min_freq]

(min_freq defaults to 2; pass 1 to measure full-depth vocabularies on
a small corpus whose pair counts exhaust early — the sf documents
table yields only ~100 merges at min_freq=2.)
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import Counter

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    min_freq = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    check_merges = int(os.environ.get("SPARK_GRAFT_BPE_CHECK", "64"))

    from topic_store_spark.operators.bpe import train_bpe
    from topic_store_spark.session import get_spark
    from topic_store_spark.tables import load_table

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    # the documents table's synthetic vocabulary is ~31 distinct words —
    # BPE fully merges it in ~107 steps regardless of min_freq, which
    # measures nothing.  Union in the name columns (customer alone has
    # 15k distinct digit-bearing tokens) for a vocabulary deep enough to
    # sustain a >=1k-merge training run.
    docs = load_table(spark, sf_dir, "documents").select("text")
    for tbl, col in (("customer", "c_name"), ("supplier", "s_name"),
                     ("part", "p_name")):
        docs = docs.unionByName(
            load_table(spark, sf_dir, tbl).select(
                F.col(col).alias("text")
            )
        )

    stats: dict = {}
    t0 = time.monotonic()
    merges = train_bpe(
        docs, n_merges=n_merges, min_freq=min_freq, local_max_words=0,
        batch_k=16, stats=stats,
    )
    el = time.monotonic() - t0

    iters = stats["iterations"]
    jobs = iters + stats["bounds_jobs"]  # candidate job + optional bound job
    e_batch = len(merges) / iters if iters else 0.0
    hist = Counter(stats["batch_sizes"])

    # identical-output check vs the sequential path at measurement scale
    check_merges = min(check_merges, len(merges))
    seq = train_bpe(
        docs, n_merges=check_merges, min_freq=min_freq, local_max_words=0,
        batch_k=1,
    )
    identical = seq == merges[:check_merges]

    out = {
        "metric": "bpe_distributed_batching",
        "sf": sf_dir,
        "min_freq": min_freq,
        "merges": len(merges),
        "iterations": iters,
        "bounds_jobs": stats["bounds_jobs"],
        "jobs": jobs,
        "e_batch": round(e_batch, 2),
        "jobs_per_merge": round(jobs / max(len(merges), 1), 3),
        "sec": round(el, 1),
        "batch_size_hist": dict(sorted(hist.items())),
        "seq_prefix_identical": identical,
        "check_merges": check_merges,
    }
    print(json.dumps(out))

    lines = [
        "# Distributed BPE fallback: measured batching",
        "",
        f"`python tools/bpe_bench.py {sf_dir} {n_merges} {min_freq}` — the"
        " distributed merge loop forced (`local_max_words=0`) over the"
        " sf documents+names corpus (the documents table alone has a"
        " ~31-word toy vocabulary that fully merges in ~107 steps;"
        " customer/supplier/part names add 15k+ digit-bearing tokens),"
        f" batch_k=16, min_freq={min_freq}.",
        "",
        f"- merges learned: **{len(merges)}** in **{iters}**"
        " iterations -> E[batch] ="
        f" **{e_batch:.2f}** merges/iteration",
        f"- Spark jobs: {iters} candidate top-k jobs +"
        f" {stats['bounds_jobs']} bound jobs = **{jobs}** total,"
        f" i.e. **{jobs / max(len(merges), 1):.3f} jobs/merge** vs the"
        " sequential loop's 1.0 (plus the shared fold/checkpoint"
        " lineage both paths pay)",
        f"- batch-size histogram: {dict(sorted(hist.items()))}",
        f"- merge-list parity: first {check_merges} merges"
        f" {'IDENTICAL' if identical else 'DIVERGED'} vs batch_k=1"
        " (the sequential reference) at this scale",
        f"- wall-clock: {el:.1f}s",
        "",
        "Reading: every iteration whose conflict-free contiguous prefix"
        " is 1 costs exactly the sequential path's one job (the bound"
        " job is skipped), so jobs/merge <= 1 always; the win equals"
        " the mass in the >=2 histogram buckets.  The r7 RELAXED"
        " conflict rule (shared-FIRST or shared-SECOND symbol pairs"
        " have provably disjoint occurrences and batch together; only"
        " q.a==p.b / q.b==p.a overlaps and merged-string collisions"
        " interact) moved this corpus from E[batch] 1.17 / 0.993"
        " jobs-per-merge to the numbers above — identical merge lists"
        " re-proven against the sequential reference on"
        " conflict-engineered corpora incl. a digit alphabet"
        " (test_bpe.py).  Conflicts concentrate where BPE's top pairs"
        " chain through the same hot symbol — early char-level rounds"
        " — and relax as tokens grow.",
        "",
    ]
    with open(os.path.join(_REPO, "BPEBENCH.md"), "w") as f:
        f.write("\n".join(lines))
    print("wrote BPEBENCH.md", file=sys.stderr)


if __name__ == "__main__":
    main()
