"""Generate a multi-row-group, R x scaled replica of an sf testdata dir
(r11 VERDICT #5).

Two things the driver's small-SF parquet cannot show, and this fixture
can:

* **Row-group parallelism.** Every driver table has exactly ONE parquet
  row group at every SF, and a row group is Spark's unit of scan
  parallelism — so scan-bound queries serialize on one core and their
  SCALING.md growth ratios measure fixture shape, not plan cost (the
  r11 4.17x "grower" tpch_q1_pricing fell to ~0.5x wall-clock when the
  same data was rewritten into 12 row groups).  This fixture writes
  every large table with enough row groups to feed local[32].
* **One more decade of data.**  R=10 over sf0.1 approximates sf1 with
  realistic content growth (below), extending the measured scaling
  range to 1000x so real per-row costs can't hide behind constant
  scheduler overhead.

Replication is NOT blind row duplication — blind copies would distort
the workloads the bench times:

* key domains shift per replica by a decimal cap (``rid * 10**digits``)
  consistently across tables, so joins (orders⋈customer,
  lineitem⋈part/supplier) keep fan-outs and key cardinalities scale
  linearly; dimension tables (region, nation) stay fixed, like real
  TPC-H scaling.
* ``documents.text`` word-suffixes every token with ``~{rid}`` (the
  STREAMBENCH standing-corpus trick): replicas are shingle-disjoint, so
  dedup pair structure grows linearly instead of every doc acquiring
  R-1 exact duplicates (quadratic pair blowup the real generator would
  never produce).  ``n_chars`` is recomputed to match.
* ``embeddings.embedding`` cyclically rolls each vector by ``rid``
  positions: replicas decorrelate from their source (a roll of a
  near-random vector is a different direction), so ANN/semantic-dedup
  neighborhood structure scales like fresh data instead of creating
  R-sized near-identical clusters.
* ``events`` shifts event/user ids; timestamps keep their range (more
  users in the same window — how traffic actually grows).

Usage:
  python tools/make_scaled_fixture.py [src_dir] [out_dir] [replicas]
  # defaults: /root/testdata/sf0.1  /tmp/tss_scaled/sf1  10
Then:
  SPARK_GRAFT_SF_DIR=/tmp/tss_scaled/sf1 python bench.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

#: key columns shifted per replica, grouped by shared key domain so
#: foreign keys stay consistent across tables
KEY_DOMAINS: dict[str, list[tuple[str, str]]] = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
}

#: copied verbatim (fixed dimensions — real TPC-H scaling keeps them)
FIXED_TABLES = ["region", "nation"]

SCALED_TABLES = [
    "customer", "orders", "lineitem", "part", "supplier",
    "documents", "embeddings", "events",
]

#: target row groups for scan parallelism on large tables
TARGET_ROW_GROUPS = 48
MIN_ROW_GROUP = 2000


def _domain_caps(src: str) -> dict[tuple[str, str], int]:
    """Per (table, column) decimal shift cap, equal within a domain."""
    caps: dict[tuple[str, str], int] = {}
    for cols in KEY_DOMAINS.values():
        dmax = 0
        for table, col in cols:
            t = pq.read_table(
                os.path.join(src, f"{table}.parquet"), columns=[col])
            dmax = max(dmax, pc.max(t[col]).as_py() or 0)
        cap = 10 ** len(str(int(dmax)))
        for key in cols:
            caps[key] = cap
    return caps


def _suffix_words(texts: pa.ChunkedArray, rid: int) -> pa.Array:
    """Append ``~rid`` to every whitespace token (vectorized via arrow
    split/join — no Python per-row loop)."""
    parts = pc.split_pattern(texts.combine_chunks(), " ")
    flat = pc.binary_join_element_wise(
        parts.values, pa.scalar(f"~{rid}"), pa.scalar(""))
    joined = pc.binary_join(
        pa.LargeListArray.from_arrays(parts.offsets, flat)
        if isinstance(parts, pa.LargeListArray)
        else pa.ListArray.from_arrays(parts.offsets, flat),
        pa.scalar(" "),
    )
    return joined


def _replicate(name: str, table: pa.Table, rid: int,
               caps: dict[tuple[str, str], int]) -> pa.Table:
    if rid == 0:
        return table
    out = table
    for (tname, col), cap in caps.items():
        if tname != name:
            continue
        idx = out.schema.get_field_index(col)
        shifted = pc.add(out[col], pa.scalar(rid * cap, type=pa.int64()))
        out = out.set_column(
            idx, out.schema.field(idx).name,
            shifted.cast(out.schema.field(idx).type))
    if name == "documents":
        text = _suffix_words(out["text"], rid)
        out = out.set_column(out.schema.get_field_index("text"), "text",
                             text.cast(out.schema.field("text").type))
        n_chars = pc.utf8_length(out["text"]).cast(
            out.schema.field("n_chars").type)
        out = out.set_column(
            out.schema.get_field_index("n_chars"), "n_chars", n_chars)
    if name == "embeddings":
        emb = out["embedding"].combine_chunks()
        vals = emb.values.to_numpy(zero_copy_only=False)
        offs = emb.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offs)
        if len(set(widths.tolist())) == 1:  # fixed-dim: one vectorized roll
            d = int(widths[0])
            mat = vals.reshape(-1, d)
            rolled = np.roll(mat, rid % d if d else 0, axis=1).reshape(-1)
        else:  # ragged fallback: per-row roll
            rolled = np.concatenate([
                np.roll(vals[offs[i]:offs[i + 1]], rid)
                for i in range(len(offs) - 1)
            ]) if len(offs) > 1 else vals
        new = pa.ListArray.from_arrays(
            emb.offsets, pa.array(rolled, type=emb.values.type))
        out = out.set_column(
            out.schema.get_field_index("embedding"), "embedding",
            new.cast(out.schema.field("embedding").type))
    return out


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/tss_scaled/sf1"
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out_dir, exist_ok=True)
    caps = _domain_caps(src)

    for name in FIXED_TABLES:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        pq.write_table(t, os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name}: copied {t.num_rows} rows (fixed dim)")

    for name in SCALED_TABLES:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        parts = [_replicate(name, t, rid, caps) for rid in range(replicas)]
        big = pa.concat_tables(parts)
        rg = max(MIN_ROW_GROUP, big.num_rows // TARGET_ROW_GROUPS)
        path = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(big, path, row_group_size=rg)
        meta = pq.ParquetFile(path)
        print(f"{name}: {big.num_rows} rows, {meta.num_row_groups} row "
              f"groups ({os.path.getsize(path) >> 20} MiB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
