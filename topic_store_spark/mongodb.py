"""MongoDB storage backend (parity: reference database.py MongoStorage,
SURVEY §2.1 S4/S5/S12).

Two data paths, chosen by workload shape:

- **Bulk analytics** (``to_df`` / ``write_df``): the Spark MongoDB
  connector (``format("mongodb")``) — partitioned distributed reads and
  writes, with Catalyst filter/column pushdown handled by the connector's
  aggregation-pipeline translation.  At 100 TB this is the only sane
  path: every executor reads its own partition range; nothing funnels
  through the driver.
- **Point CRUD** (``insert_one`` / ``update_one`` / ``delete_by_id`` /
  ``count``): a driver-side document client (pymongo when installed) —
  single-document operations shouldn't spin up a distributed job.

Both paths are injectable (``client=``, ``reader=``, ``writer=``), so
the backend is fully unit-testable without a MongoDB server or the
connector on the classpath — the same seam pattern as ``to_ros_bag``'s
fake bag writer (convert.py).

Reference parity map:
- connection / db / collection resolution  -> database.py:80-99
- ``uri_from_mongo_config`` (mongo yaml)   -> database.py:83-92
- ``load(scenario.yaml)`` w/ context as
  collection name                          -> database.py:94-99
- ``insert_one/update_one/update_one_by_id`` -> database.py:144-168
- ``find``/cursor surface                  -> database.py:193-204 (via
  the shared Storage query compiler; the connector pushes filters down)
- URI helpers ``is_uri``/``client_from_uri`` -> convert.py:236-251
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from topic_store_spark.api import Storage
from topic_store_spark.data import TopicStore

DEFAULT_DB_NAME = "topic_store"  # reference database.py:80 default


def is_uri(uri: Any) -> bool:
    """Parity: reference convert.py:236-237."""
    return isinstance(uri, str) and uri.startswith("mongodb://")


def uri_options(uri: str) -> dict[str, str]:
    """Query options from a ``mongodb://host:port/?k=v&...`` URI."""
    if "?" not in uri:
        return {}
    try:
        return dict(kv.split("=", 1) for kv in uri.split("?", 1)[1].split("&") if kv)
    except ValueError:
        return {}


def uri_from_mongo_config(mongo_config_path: str) -> str:
    """``mongodb://<bindIp>:<port>`` from a MongoDB server config yaml
    (parity: reference database.py:83-92)."""
    import os

    import yaml

    path = str(mongo_config_path)
    if not os.path.isfile(path) or not (
        path.endswith(".yaml") or path.endswith(".yml")
    ):
        raise IOError(f"'{path}' is not a valid MongoDB configuration file")
    with open(path) as fh:
        config = yaml.safe_load(fh)
    return "mongodb://{}:{}".format(config["net"]["bindIp"], config["net"]["port"])


class MongoStorage(Storage):
    """MongoDB-backed Storage: Spark connector for bulk, doc client for
    point ops.  Constructing never connects (pymongo's MongoClient is
    lazy, and the connector only resolves at read/write time), so a
    MongoStorage can be built anywhere and fails with a clear message at
    first use if neither a server nor an injected seam is available."""

    # dispatched via scenario yaml / URI, not path suffix
    suffixes: tuple[str, ...] = ()

    def __init__(
        self,
        spark: SparkSession,
        uri: str | None = None,
        db_name: str | None = None,
        collection: str = "default",
        config: str | None = None,
        client: Any | None = None,
        reader: Callable[[SparkSession], DataFrame] | None = None,
        writer: Callable[[DataFrame, str], None] | None = None,
    ) -> None:
        if config is not None and uri is None:
            uri = uri_from_mongo_config(config)
        if db_name is None:
            # DB name is usually the authSource URI option; default
            # otherwise (parity: convert.py:240-247, database.py:80)
            db_name = (uri and uri_options(uri).get("authSource")) or DEFAULT_DB_NAME
        self.spark = spark
        self.uri = uri
        self.name = db_name
        self.collection_name = collection
        self._client = client
        self._reader = reader
        self._writer = writer

    # -- construction helpers -------------------------------------------
    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "MongoStorage":
        """Open from a ``.yaml`` scenario file: storage config + context
        as the collection name (parity: reference database.py:94-99)."""
        from topic_store_spark.streaming.scenario import ScenarioFileParser

        scenario = ScenarioFileParser(path)
        if scenario.storage["method"] != "database":
            raise ValueError("scenario storage.method is not 'database'")
        return cls.from_scenario(scenario, spark)

    @classmethod
    def from_scenario(
        cls, scenario, spark: SparkSession, client: Any | None = None
    ) -> "MongoStorage":
        storage = scenario.storage
        return cls(
            spark,
            uri=storage.get("uri"),
            config=storage.get("config"),
            collection=scenario.context,
            client=client,
        )

    # -- seams -----------------------------------------------------------
    @property
    def client_collection(self):
        """The driver-side document collection handle (injected client or
        pymongo), lazily resolved."""
        if self._client is not None:
            return self._client
        try:
            import pymongo  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "MongoStorage point operations need pymongo (or an injected "
                "client=); bulk to_df()/write_df() go through the Spark "
                "MongoDB connector instead"
            ) from exc
        import pymongo

        self._client = pymongo.MongoClient(self.uri)[self.name][self.collection_name]
        return self._client

    def _connector_options(self) -> dict[str, str]:
        if not self.uri:
            raise ValueError("MongoStorage has no connection URI")
        return {
            "connection.uri": self.uri,
            "database": self.name,
            "collection": self.collection_name,
        }

    # -- bulk path (Spark MongoDB connector) ------------------------------
    def to_df(self) -> DataFrame:
        """The collection as a distributed DataFrame.  Filters/projections
        compiled by the shared Storage surface push down through the
        connector's pipeline translation — a ``find({"x": 1}, {"y": 1})``
        reads only matching documents' ``y`` fields, server-side."""
        if self._reader is not None:
            return self._reader(self.spark)
        reader = self.spark.read.format("mongodb")
        for k, v in self._connector_options().items():
            reader = reader.option(k, v)
        try:
            return reader.load()
        except Exception as exc:  # connector missing from classpath
            raise NotImplementedError(
                "reading MongoDB needs the Spark MongoDB connector on the "
                "classpath (spark.jars.packages "
                "org.mongodb.spark:mongo-spark-connector) or an injected "
                "reader="
            ) from exc

    def write_df(self, df: DataFrame, mode: str = "append") -> None:
        if self._writer is not None:
            self._writer(df, mode)
            return
        writer = df.write.format("mongodb").mode(mode)
        for k, v in self._connector_options().items():
            writer = writer.option(k, v)
        try:
            writer.save()
        except Exception as exc:
            raise NotImplementedError(
                "writing MongoDB needs the Spark MongoDB connector on the "
                "classpath or an injected writer="
            ) from exc

    # -- point CRUD (driver-side document client) -------------------------
    def insert_one(self, document: dict | TopicStore) -> str:
        store = document if isinstance(document, TopicStore) else TopicStore(document)
        self.client_collection.insert_one(store.dict)
        return store.id

    def insert_many(self, documents: list[dict | TopicStore]) -> list[str]:
        stores = [
            d if isinstance(d, TopicStore) else TopicStore(d) for d in documents
        ]
        self.client_collection.insert_many([s.dict for s in stores])
        return [s.id for s in stores]

    def update_one(self, query: dict, update: dict, *args, **kwargs):
        """Query-matched single-document update, passed straight through
        to the document client (parity: reference database.py:162-164)."""
        return self.client_collection.update_one(query, update, *args, **kwargs)

    def update_one_by_id(self, id_str: str, **kwargs):
        """Parity: reference database.py:166-168."""
        return self.update_one(query={"_id": id_str}, update={"$set": kwargs})

    def delete_by_id(self, document_id: str):
        return self.client_collection.delete_one({"_id": document_id})

    def count(self, query: dict | None = None, estimate: bool = False) -> int:
        """Count on the server when a client is available (no Spark job
        for a metadata question); falls back to the DataFrame path."""
        if estimate and query:
            raise ValueError("estimate=True cannot be combined with a query")
        client = self._client
        if client is not None:
            if estimate and hasattr(client, "estimated_document_count"):
                return int(client.estimated_document_count())
            if hasattr(client, "count_documents"):
                return int(client.count_documents(query or {}))
        return super().count(query=query, estimate=False)


def client_from_uri(
    uri: str, collection: str, spark: SparkSession | None = None
) -> MongoStorage:
    """Open a MongoStorage from a ``mongodb://`` URI (parity: reference
    convert.py:239-251 — db name from the ``authSource`` URI option when
    present)."""
    if not is_uri(uri):
        raise ValueError(f"Not a valid URI: {uri}")
    from topic_store_spark.session import get_spark

    return MongoStorage(spark or get_spark(), uri=uri, collection=collection)


def private_srv(srv: Any) -> Any:
    """Redact ``user:password@`` credentials from a connection string for
    log lines (parity: reference convert.py:254-259)."""
    original_type = type(srv)
    text = str(srv)
    if ":" in text and "@" in text:
        text = "mongodb://****:****@" + text.split("@")[1]
    return original_type(text)
