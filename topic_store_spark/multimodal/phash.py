"""Perceptual image hashing (pHash) + banded near-duplicate pairs —
image-modality dedup for a multimodal training corpus.

Text near-dup has MinHash/SimHash (operators/dedup.py); the image
analog is a DCT perceptual hash (the classic pHash construction): a
raster is grayscaled, downsampled to 32x32, 2-D DCT-II transformed, and
the 8x8 low-frequency block (DC excluded) is thresholded against its
median into a 64-bit fingerprint.  Re-encodes, resizes, brightness
shifts and mild noise move only a few bits, so near-duplicate frames
sit within a small Hamming radius — exactly the SimHash regime, and the
pair search REUSES the SimHash machinery: integer band keys from
``hashing.simhash_long_band_keys`` (8 bands x 8 bits: any pair within
Hamming distance 7 is GUARANTEED a shared band by pigeonhole) and a
``bit_count(a ^ b)`` verify.

Scale shape: hashing is Arrow `mapInPandas` (numpy matrix DCT per
image, the same batch contract as the other multimodal decoders); the
candidate join is a band-keyed equi-join over 8 longs per image —
never an all-pairs comparison.  No SQL engine computes a DCT, so like
the rest of the multimodal layer this is pytest-carried, with the
verify arithmetic (band keys, xor distance) shared with the
oracle-checked SimHash path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from topic_store_spark.functions.hashing import simhash_long_band_keys
from topic_store_spark.multimodal.binary import ENCODINGS, _raster

_D32 = None


def _dct32() -> np.ndarray:
    """32-point DCT-II basis matrix (orthonormal)."""
    global _D32
    if _D32 is None:
        n = 32
        k = np.arange(n)[:, None]
        m = np.arange(n)[None, :]
        d = np.cos(np.pi * (2 * m + 1) * k / (2 * n)) * np.sqrt(2 / n)
        d[0] /= np.sqrt(2)
        _D32 = d
    return _D32


def phash64(arr: np.ndarray) -> int:
    """64-bit pHash of a raster (any ENCODINGS dtype/channels)."""
    g = arr.astype("float64")
    if g.ndim == 3:
        g = g.mean(axis=2)
    h, w = g.shape
    ys = (np.arange(32) * h // 32).astype(int)
    xs = (np.arange(32) * w // 32).astype(int)
    g = g[np.ix_(ys, xs)]
    d = _dct32()
    t = d @ g @ d.T
    low = t[:8, :8].flatten()[1:]  # 63 AC coefficients, DC dropped
    med = np.median(low)
    bits = low > med
    out = 0
    for i, b in enumerate(bits):
        if b:
            out |= 1 << i
    # interpret as signed 64-bit for Spark LongType compatibility
    return out - (1 << 64) if out >= 1 << 63 else out


def phash_images(
    df: DataFrame,
    data_col: str = "data",
    height_col: str = "height",
    width_col: str = "width",
    encoding_col: str = "encoding",
    out_col: str = "phash",
) -> DataFrame:
    """Attach a 64-bit perceptual hash column to a raster relation
    (same batch plumbing as ``decode_images``)."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.LongType())]
    )

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for data, h, w, enc in zip(
                pdf[data_col], pdf[height_col], pdf[width_col], pdf[encoding_col]
            ):
                if data is None:
                    hashes.append(None)
                    continue
                hashes.append(
                    phash64(_raster(bytes(data), int(h), int(w), enc))
                )
            pdf = pdf.copy()
            pdf[out_col] = pd.array(hashes, dtype="Int64")
            yield pdf

    return df.mapInPandas(hash_batch, schema=out_schema)


def phash_pairs(
    df: DataFrame,
    id_col: str = "img_id",
    hash_col: str = "phash",
    max_distance: int = 6,
    band_bits: int = 8,
) -> DataFrame:
    """Near-duplicate image pairs: ``(a_id, b_id, distance)`` for every
    pair within ``max_distance`` Hamming bits that shares a band.  With
    the default 8-bit bands (8 bands over 64 bits), recall is TOTAL for
    ``max_distance <= 7`` (pigeonhole); wider radii trade recall like
    any LSH."""
    banded = df.select(
        F.col(id_col).alias("doc"),
        F.col(hash_col).alias("_ph"),
        F.explode(
            simhash_long_band_keys(F.col(hash_col), bits=64, band_bits=band_bits)
        ).alias("band"),
    )
    cands = (
        banded.alias("x")
        .join(banded.alias("y"), "band")
        .filter(F.col("x.doc") < F.col("y.doc"))
        .select(
            F.col("x.doc").alias("a_id"),
            F.col("y.doc").alias("b_id"),
            F.col("x._ph").alias("a_ph"),
            F.col("y._ph").alias("b_ph"),
        )
        .distinct()
    )
    dist = F.bit_count(F.col("a_ph").bitwiseXOR(F.col("b_ph")))
    return (
        cands.withColumn("distance", dist)
        .filter(F.col("distance") <= max_distance)
        .select("a_id", "b_id", "distance")
    )
