"""Z-order layout: interleave correctness and measured pruning effect
(per-file min-max spread from real parquet footers)."""

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from topic_store_spark.operators.zorder import (
    quantile_bucket,
    write_zordered,
    zvalue,
)


def test_zvalue_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5)], "x long, y long"
    )
    got = [
        r["z"]
        for r in df.select(zvalue(["x", "y"], bits=3).alias("z"))
        .orderBy("x", "y")
        .collect()
    ]
    # morton(x,y) with x at even bits, y at odd: (0,0)=0 (0,1)=2 (1,0)=1
    # (3,5)= x bits 11 -> 0b0101, y bits 101 -> 0b100010 -> 0b100111=39
    assert got == [0, 2, 1, 39]


def test_quantile_bucket_counts_boundaries(spark):
    df = spark.createDataFrame([(v,) for v in [1.0, 5.0, 9.0]], "v double")
    out = [
        r["b"]
        for r in df.select(
            quantile_bucket(F.col("v"), [2.0, 4.0, 8.0]).alias("b")
        )
        .orderBy("v")
        .collect()
    ]
    assert out == [0, 2, 3]


def _file_spreads(path, col):
    """(max-min) per parquet file for col, from footer stats."""
    spreads = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        los, his = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    los.append(c.statistics.min)
                    his.append(c.statistics.max)
        if los:
            spreads.append(max(his) - min(los))
    return spreads


def test_zorder_tightens_both_columns(spark, tmp_path):
    n = 20_000
    df = spark.range(n).select(
        (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 6), 16, 10)
         .cast("long") % 10_000).alias("a"),
        (F.conv(F.substring(F.md5(F.concat(F.lit("y"),
                                           F.col("id").cast("string"))), 1, 6),
                16, 10).cast("long") % 10_000).alias("b"),
    )
    z_path = str(tmp_path / "zorder")
    s_path = str(tmp_path / "single")
    write_zordered(df, z_path, ["a", "b"], bits=8, num_files=16)
    # baseline: classic single-column sort layout
    (
        df.repartitionByRange(16, "a")
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(s_path)
    )
    full = 10_000
    za, zb = _file_spreads(z_path, "a"), _file_spreads(z_path, "b")
    sa, sb = _file_spreads(s_path, "a"), _file_spreads(s_path, "b")
    # single-column sort: 'a' razor thin, 'b' useless (full range)
    assert sum(sa) / len(sa) < 0.15 * full
    assert sum(sb) / len(sb) > 0.85 * full
    # z-order: BOTH columns' per-file ranges shrink well below full
    assert sum(za) / len(za) < 0.45 * full
    assert sum(zb) / len(zb) < 0.45 * full
    # and the data itself round-trips
    assert spark.read.parquet(z_path).count() == n


def test_zvalue_roundtrip_property(spark):
    """Morton interleave is a bijection: de-interleaving the z-value in
    Python recovers every (x, y) pair exactly (whole 8-bit plane sampled
    pseudo-randomly)."""
    from pyspark.sql import functions as F

    df = spark.range(512).select(
        (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 4), 16, 10)
         .cast("long") % 256).alias("x"),
        (F.conv(F.substring(F.md5(F.concat(F.lit("q"), F.col("id").cast("string"))), 1, 4), 16, 10)
         .cast("long") % 256).alias("y"),
    )
    rows = df.select("x", "y", zvalue(["x", "y"], bits=8).alias("z")).collect()
    for r in rows:
        x = sum(((r["z"] >> (2 * i)) & 1) << i for i in range(8))
        y = sum(((r["z"] >> (2 * i + 1)) & 1) << i for i in range(8))
        assert (x, y) == (r["x"], r["y"])
