"""Hashed-feature linear classifier inference — the fastText shape
(Joulin et al. 2016, "Bag of Tricks for Efficient Text Classification")
that modern curation pipelines run corpus-wide as a quality / topic /
toxicity gate (the FineWeb-Edu recipe scores every document with a
linear-head classifier and thresholds on the score).

Model shape: a document's score is the mean over its features (unigrams
plus word bigrams) of a weight looked up by FEATURE HASH — no
vocabulary, so inference is a pure expression over the token array:

- bucket(f)  = first 7 md5 hex digits of the feature, mod num_buckets;
- weight(b)  = integer milli-weight for bucket b;
- score      = sum(weight) / n_features (exact-integer sum, one
  correctly-rounded double division at the end).

Everything runs inside whole-stage codegen as an ``aggregate`` fold over
the token array — NO shuffle, NO explode, NO Python; scoring 100 TB is
exactly one map-side pass, the same cost as a casts-only projection.
md5-derived buckets make the scores engine-portable (the DuckDB oracle
reproduces them bit-for-bit).

Weights come in two forms:

- ``weights=[...]``: a trained model's weight vector (length
  ``num_buckets``, milli-fixed-point ints), packed as 4-byte biased
  big-endian words in ONE BinaryType literal — the production path.
  Bytes cross py4j in a single transfer, where an equal-size ARRAY
  literal costs one driver round-trip per element (measured in
  `operators/bloom.py`: 71 s for 131k longs vs 0.5 s as bytes) — at a
  realistic 2^17+-bucket model the array form would stall plan
  construction for minutes.  Lookup is ``conv(hex(substring(...)))``
  minus the bias — still pure whole-stage codegen.
- ``weights=None``: deterministic pseudo-weights derived from md5 of
  the bucket index — the same stub policy as the multimodal codecs (no
  trained artifacts ship in this environment, so the STUB is
  deterministic and the PLUMBING — hashing, folding, exactness — is
  real and oracle-checked).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from topic_store_spark.functions.text import shingles_from_tokens


def _bucket(feat: Column, num_buckets: int) -> Column:
    return (
        F.conv(F.substring(F.md5(feat), 1, 7), 16, 10).cast("long")
        % num_buckets
    )


def _pseudo_weight(bucket: Column) -> Column:
    """Deterministic stub milli-weight in [-1000, 1000]: md5 of the
    bucket index re-hashed — fixed, portable, mean-zero-ish."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("w:"), bucket.cast("string"))), 1, 7),
            16,
            10,
        ).cast("long")
        % 2001
        - 1000
    )


def hashed_linear_score(
    tokens_col: Column,
    num_buckets: int = 1 << 12,
    weights: list[int] | None = None,
    bigrams: bool = True,
) -> Column:
    """Mean milli-weight over the document's hashed features as a
    double; NULL for documents with no features.  ``tokens_col`` must be
    a *materialized* token-array column (perf contract of
    ``text.shingles_from_tokens``)."""
    feats = tokens_col
    if bigrams:
        feats = F.concat(tokens_col, shingles_from_tokens(tokens_col, 2))

    if weights is not None:
        if len(weights) != num_buckets:
            raise ValueError("weights must have exactly num_buckets entries")
        # pack as (w + 2^31) big-endian u32 words in one binary literal;
        # 2^31 biasing sidesteps two's-complement in conv/hex round-trips
        bias = 1 << 31
        blob = bytearray(4 * num_buckets)
        for i, w in enumerate(weights):
            v = int(w) + bias
            if not 0 <= v < (1 << 32):
                raise ValueError("weights must fit in signed 32 bits")
            blob[4 * i : 4 * i + 4] = v.to_bytes(4, "big")
        wlit = F.lit(bytes(blob))

        def w_of(tok: Column) -> Column:
            word = F.conv(
                F.hex(
                    F.call_function(
                        "substring",
                        wlit,
                        (_bucket(tok, num_buckets) * 4 + 1).cast("int"),
                        F.lit(4),
                    )
                ),
                16,
                10,
            ).cast("long")
            return word - F.lit(bias)

    else:

        def w_of(tok: Column) -> Column:
            return _pseudo_weight(_bucket(tok, num_buckets))

    total = F.aggregate(
        feats, F.lit(0).cast("long"), lambda acc, t: acc + w_of(t)
    )
    n = F.size(feats)
    return F.when(n > 0, total / n).otherwise(F.lit(None).cast("double"))
