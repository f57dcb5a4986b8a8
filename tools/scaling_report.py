"""Scale-up evidence: per-query growth across bench runs at different
scale factors.

The 100 TB question is not "how fast at sf0.1" but "what happens when
the data grows 100x".  This report takes two or more `bench.py` JSON
outputs (different $SPARK_GRAFT_SF_DIR runs) and writes SCALING.md:
per-query wall-clock at each SF and the growth ratio between the
smallest and largest, sorted by ratio.  On local[32] a query whose time
grows far slower than the data is scheduler/constant-overhead bound
(healthy — the distributed work parallelizes); one whose ratio
approaches or exceeds the data ratio is the one to re-plan before a
real scale-up.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python bench.py > b1.json
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1   python bench.py > b3.json
  python tools/scaling_report.py b1.json b3.json
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    paths = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(paths) < 2:
        raise SystemExit("need at least two bench JSON files")
    runs = []
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        runs.append(d)
    runs.sort(key=lambda d: float(d["sf"]))
    sfs = [d["sf"] for d in runs]
    data_ratio = float(sfs[-1]) / float(sfs[0])

    common = set(runs[0]["queries"])
    for d in runs[1:]:
        common &= set(d["queries"])
    rows = []
    for q in common:
        times = [d["queries"][q] for d in runs]
        ratio = times[-1] / times[0] if times[0] > 0 else float("inf")
        rows.append((ratio, q, times))
    rows.sort(reverse=True)

    lines = [
        "# Scale-up behavior (bench wall-clock vs scale factor)",
        "",
        f"{len(common)} queries common to bench runs at sf="
        f"{', '.join(map(str, sfs))} on local[32] — a {data_ratio:.0f}x "
        "data range.  `growth` is time(largest sf) / time(smallest sf); "
        "at this node-bound scale most queries are dominated by fixed "
        "scheduler/stage overhead, so growth far below the data ratio "
        "means the distributed work parallelizes and the plan's cost "
        "scales with data/cores, not with data alone.  Growth at or "
        "above the data ratio flags a plan to re-examine before a real "
        "100x scale-up.",
        "",
        "| query | " + " | ".join(f"sf{sf} (s)" for sf in sfs)
        + f" | growth (data {data_ratio:.0f}x) |",
        "|---|" + "---|" * (len(sfs) + 1),
    ]
    for ratio, q, times in rows:
        lines.append(
            f"| {q} | " + " | ".join(f"{t:.2f}" for t in times)
            + f" | {ratio:.2f}x |"
        )
    totals = [d["value"] for d in runs]
    lines.append(
        "| **total** | " + " | ".join(f"{t:.1f}" for t in totals)
        + f" | {totals[-1] / totals[0]:.2f}x |"
    )
    lines += [
        "",
        "## The sf1 outlier: dedup_semantic (expected, and now valved)",
        "",
        "dedup_semantic's growth dominates the table (r12 measurement "
        "under the codegen-cache-fixed protocol: 1.5s at sf0.1 -> 76s "
        "at sf1, ~50x on 10x data; the pre-fix sweep measured 56s) and "
        "is the "
        "SemDeDup pair-space law, not an engine defect: within-cluster "
        "pairs are quadratic in cluster size, and the carrier holds the "
        "centroid count FIXED at 8 while the corpus grows — so "
        "sum(|c|^2) grows ~quadratically.  Production regime is k ~ n / "
        "target_cluster_size (cluster sizes constant, pair space "
        "linear).  For frozen centroid sets the operator now carries a "
        "`max_cluster_size` valve (r12): oversized clusters sub-split "
        "deterministically by hyperplane-sign LSH prefixes (a near-dup "
        "pair co-buckets with ~0.9 per bit instead of a content hash's "
        "1/n_sub), shrinking per-bucket pair space ~quadratically with "
        "a documented probabilistic recall trade — the same honesty "
        "knob as the text family's max_shingle_freq.  The "
        "carrier keeps the valve OFF so the oracle stays exact; this "
        "row is the standing receipt for why the knob exists.",
        "",
        "## Fixture shapes across the columns",
        "",
        "The driver's sf0.001-0.1 parquet files have exactly ONE row "
        "group at every SF (`pyarrow.parquet.ParquetFile(...)"
        ".num_row_groups == 1`), and a row group is the unit of scan "
        "parallelism — so at those SFs single-scan aggregations decode "
        "on ONE core and their growth ratios carry a fixture-shape "
        "component (r11 receipt: rewriting sf0.1 lineitem with "
        "row_group_size=50k, same bytes, took tpch_q1_pricing from "
        "1.00s min / 1.18s median to 0.52s / 0.60s on the same "
        "session; `spark.sql.files.maxPartitionBytes` cannot help — "
        "splits beyond row-group boundaries are empty).  The driver "
        "fixtures are read-only, so those columns stand with this "
        "receipt.  The sf1 column (r12) is generated by "
        "`tools/make_scaled_fixture.py`: a 10x replica of sf0.1 with "
        "PROPER row groups (sized for local[32] scan parallelism), "
        "consistent key-domain shifts, shingle-disjoint document "
        "replicas and rolled embedding replicas — so the final decade "
        "(sf0.1 -> sf1) measures per-row plan cost with scan "
        "parallelism restored, not single-core decode.  A query whose "
        "0.1->1 growth stays well under 10x parallelizes its real "
        "work; one approaching 10x is per-row bound on this node and "
        "is the one to watch (its cure at cluster scale is executors, "
        "not a different plan, IF its shuffle volume also scales "
        "linearly — see PLANS.md at-scale exchange counts).",
        "",
        "Regenerate: `python tools/make_scaled_fixture.py` for the sf1 "
        "dir, run `bench.py` per SF dir (see module docstring), then "
        "`python tools/scaling_report.py <jsons...>`.",
        "",
    ]
    with open(os.path.join(_REPO, "SCALING.md"), "w") as f:
        f.write("\n".join(lines))
    print("wrote SCALING.md")
    for ratio, q, times in rows[:8]:
        print(f"{ratio:6.2f}x  {q}  {times}")


if __name__ == "__main__":
    main()
