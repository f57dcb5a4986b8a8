"""Scalar/array function layer.

Everything here compiles to built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen'd) — no Python UDFs in the hot path.  The hashing
primitives are deliberately built on md5 hex strings, which DuckDB
computes identically, so every operator using them is oracle-checkable
bit-for-bit across engines.
"""

from topic_store_spark.functions.scalars import (
    humanize_size,
    objectid_timestamp,
    redact_uri,
    ros_time_as_ms,
    time_as_ms,
)
from topic_store_spark.functions.text import (
    char_shingles,
    language_id,
    normalize_text,
    quality_features,
    token_count,
    tokens,
    word_shingles,
)
from topic_store_spark.functions.hashing import (
    md5_fingerprint,
    minhash_signature,
    minhash_signature_from_keys,
    shingle_keys,
    simhash_bits,
)
from topic_store_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
    quantize_vector,
)

__all__ = [
    "humanize_size", "objectid_timestamp", "redact_uri", "ros_time_as_ms",
    "time_as_ms", "char_shingles", "language_id", "normalize_text",
    "quality_features", "token_count", "tokens", "word_shingles",
    "md5_fingerprint", "minhash_signature", "minhash_signature_from_keys",
    "shingle_keys", "simhash_bits",
    "cosine_similarity", "dot_product", "l2_norm", "quantize_vector",
]
