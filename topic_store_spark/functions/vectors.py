"""Vector math over ``array<float>`` embedding columns.

Two tiers:

- double-precision expressions (``dot_product``/``cosine_similarity``)
  for the Python API — built-in higher-order functions, JVM-side;
- an exact integer-quantized tier (``quantize_vector`` + integer dot)
  used by the oracle-checked operators: components scale to
  ``round(x * 1000)`` longs, so dot products and norms are exact integer
  arithmetic and threshold tests can be cross-multiplied — bit-identical
  in any engine, no floating-point summation-order hazards.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

QUANT_SCALE = 1000


def dot_product(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def quantize_vector(a: Column, scale: int = QUANT_SCALE) -> Column:
    """array<float> -> array<long> of round(x * scale)."""
    return F.transform(
        a, lambda x: F.round(x.cast("double") * scale).cast("long")
    )


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of quantized vectors (long)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def int_self_dot(a: Column) -> Column:
    return int_dot(a, a)
