"""Measured Z-order scan-pruning evidence, straight from parquet footers.

Writes the events table twice — Z-ORDERED on (user_id, value) vs
linearly sorted on user_id alone — and, for the registered carrier
predicate (`orders_probe`'s zorder branch: user_id BETWEEN 40 AND 60
AND value BETWEEN 100 AND 200), counts how many files and row groups
each layout can SKIP on min-max statistics.  A reader must touch a row
group only if its [min,max] interval overlaps the predicate box on
EVERY filtered column; everything else is pruned before any IO.

This is the payoff `write_zordered` exists for: the single-column sort
prunes perfectly on its sort key and not at all on the other column;
the Morton layout prunes on BOTH.  Results are recorded in COVERAGE.md
("Z-order scan pruning").

Usage: python tools/zorder_pruning.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

#: three probe shapes: the carrier's two-predicate box, and each
#: column alone — the single-column layouts tie on their own sort key
#: and fall over on the other; Z-order prunes on all three.
PREDS = {
    "user_id 40-60 AND value 100-200": {
        "user_id": (40, 60), "value": (100.0, 200.0)
    },
    "user_id 40-60 only": {"user_id": (40, 60)},
    "value 100-200 only": {"value": (100.0, 200.0)},
}


def stats(path: str, pred: dict) -> dict:
    """Per-layout footer scan: (files, row groups) total and needed."""
    import pyarrow.parquet as pq

    files = [
        os.path.join(path, f)
        for f in sorted(os.listdir(path))
        if f.endswith(".parquet")
    ]
    n_rg = need_rg = need_files = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        file_needed = False
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            n_rg += 1
            overlap = True
            for col, (lo, hi) in pred.items():
                st = rg.column(names[col]).statistics
                if st is None:
                    continue  # no stats -> cannot prune
                if st.min > hi or st.max < lo:
                    overlap = False
                    break
            if overlap:
                need_rg += 1
                file_needed = True
        if file_needed:
            need_files += 1
    return {
        "files": len(files), "files_needed": need_files,
        "row_groups": n_rg, "row_groups_needed": need_rg,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from topic_store_spark.operators.zorder import write_zordered
    from topic_store_spark.session import get_spark
    from topic_store_spark.tables import load_table

    spark = get_spark()
    events = load_table(spark, sf_dir, "events")
    n_files = 16

    zpath = tempfile.mkdtemp(prefix="tss_zo_")
    write_zordered(events, zpath, ["user_id", "value"], bits=8,
                   num_files=n_files)

    lpath = tempfile.mkdtemp(prefix="tss_lin_")
    (
        events.repartitionByRange(n_files, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite").parquet(lpath)
    )

    total = events.count()
    print(f"corpus: {sf_dir}/events.parquet rows={total}")
    for pname, pred in PREDS.items():
        print(f"predicate: {pname}")
        for tag, p in [("zorder(user_id,value)", zpath),
                       ("sort(user_id)", lpath)]:
            s = stats(p, pred)
            print(
                f"  {tag:22s} files {s['files_needed']}/{s['files']} "
                f"row_groups {s['row_groups_needed']}/{s['row_groups']} "
                f"(skip {100 * (1 - s['row_groups_needed'] / s['row_groups']):.0f}%)"
            )


if __name__ == "__main__":
    main()
