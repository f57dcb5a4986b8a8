"""topic_store_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of RaymondCM/topic_store.

The reference (``/root/reference/src/topic_store/``) is a document-oriented
batch + streaming ETL engine with a Mongo-query-language frontend.  This
package re-expresses that surface Spark-first:

- documents  -> DataFrame rows (nested StructType)        (reference data.py)
- sanitation -> ingest encoder (codec.py)                 (reference sanitation.py)
- Mongo query dicts -> Catalyst Column expressions        (reference database.py find/aggregate)
- stores     -> Parquet-backed Storage + load() dispatch  (reference api.py/filesystem.py/database.py)
- convert    -> distributed read->transform->write ETL    (reference convert.py)
- scenario   -> Structured Streaming ingestion            (reference scenario.py/store.py/load_balancer.py)

Beyond the reference surface it adds large-scale training-data pipeline
operators: deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search (brute-force + LSH-bucketed ANN),
multimodal binary-column plumbing and text analysis.
"""

from topic_store_spark.data import TopicStore
from topic_store_spark.api import Storage, load
from topic_store_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["TopicStore", "Storage", "load", "get_spark", "__version__"]
