"""Mongo-query-language frontend compiled to Catalyst expressions.

The reference passes Mongo filter/projection/pipeline dicts straight to a
MongoDB server (reference database.py:193-217); here those dicts ARE the
engine's IR and this package is its parser+analyzer.  Catalyst is the
optimizer: the compiled ``Column`` predicates push down to parquet scans
and the selects prune columns for free.
"""

from topic_store_spark.query.compiler import compile_query, parse_objectid_literals
from topic_store_spark.query.projection import apply_projection
from topic_store_spark.query.pipeline import apply_pipeline

__all__ = [
    "compile_query",
    "parse_objectid_literals",
    "apply_projection",
    "apply_pipeline",
]
