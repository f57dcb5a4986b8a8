"""Storage CRUD, convert pipelines, blob externalization tests
(model: reference test_database_storage.py / test_file_system_storage.py)."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from topic_store_spark import TopicStore, load
from topic_store_spark.blob import (
    collect_blob_paths,
    delete_blobs,
    externalize_blobs,
    rehydrate_blobs,
)
from topic_store_spark.convert import clone_incremental, copy, to_ros_bag
from topic_store_spark.filesystem import ParquetStorage, TopicStorage, write_topic_store


def test_crud_roundtrip(spark, tmp_path):
    # parity: test_database_storage.py:13-46 (insert -> find -> update -> delete)
    store = ParquetStorage(spark, str(tmp_path / "crud.parquet"))
    doc_id = store.insert_one({"name": "add_test", "number": 1})
    assert store.find_by_id(doc_id)["number"] == 1
    store.update_one_by_id(doc_id, number=2)
    assert store.find_by_id(doc_id)["number"] == 2
    store.delete_by_id(doc_id)
    assert store.find_by_id(doc_id) is None


def test_update_one_query_matched(spark, tmp_path):
    """Query-matched update_one (reference database.py:162-164): first
    match in _id order gets the $set; 0 matches is a no-op."""
    store = ParquetStorage(spark, str(tmp_path / "upd.parquet"))
    ids = store.insert_many([{"robot": "husky", "n": i} for i in range(3)])
    assert store.update_one({"robot": "husky"}, {"$set": {"n": 99}}) == 1
    hits = [r["n"] for r in store.find({"n": 99}).collect()]
    assert hits == [99]  # exactly one document updated
    first_id = min(ids)
    assert store.find_by_id(first_id)["n"] == 99  # deterministic: lowest _id
    assert store.update_one({"robot": "missing"}, {"$set": {"n": 1}}) == 0
    with pytest.raises(ValueError):
        store.update_one({"robot": "husky"}, {"$inc": {"n": 1}})


def test_filesystem_empty_append_reload(spark, tmp_path):
    # parity: test_file_system_storage.py:15-71
    path = str(tmp_path / "s.topic_store")
    store = TopicStorage(spark, path)
    assert list(store) == []
    for i in range(5):
        store.insert_one({"i": i})
    assert sum(1 for _ in store) == 5
    reloaded = load(path, spark)
    for i in range(3):
        reloaded.insert_one({"i": 10 + i})
    assert reloaded.to_df().count() == 8


def test_load_dispatch(spark, tmp_path):
    pq = load(str(tmp_path / "a.parquet"), spark)
    assert isinstance(pq, ParquetStorage)
    fs = load(str(tmp_path / "a.topic_store"), spark)
    assert isinstance(fs, TopicStorage)


def test_copy_and_incremental_clone(spark, tmp_path):
    src = ParquetStorage(spark, str(tmp_path / "src.parquet"))
    dst = ParquetStorage(spark, str(tmp_path / "dst.parquet"))
    src.insert_many([{"n": i} for i in range(10)])
    stats = copy(src, dst, query={"n": {"$lt": 7}})
    assert stats == {"copied": 7, "skipped_duplicates": 0}
    # second run: everything already there
    stats2 = clone_incremental(src, dst)
    assert stats2["copied"] == 3 and stats2["skipped_duplicates"] == 7
    assert dst.count() == 10


def test_copy_with_projection(spark, tmp_path):
    src = ParquetStorage(spark, str(tmp_path / "s2.parquet"))
    dst = ParquetStorage(spark, str(tmp_path / "d2.parquet"))
    src.insert_one({"keep": 1, "drop": {"deep": 2}})
    copy(src, dst, projection={"keep": 1})
    row = dst.to_df().first()
    assert "drop" not in row.asDict()
    assert row["_ts_meta"] is not None  # forced meta survived the ETL


def test_blob_externalize_roundtrip(spark, tmp_path):
    # parity: >16MB GridFS path, test_database_storage.py:77-99 (scaled down)
    blob_dir = str(tmp_path / "blobs")
    big = np.random.default_rng(42).integers(0, 255, 2_000_000, dtype=np.uint8).tobytes()
    small = b"tiny"
    df = spark.createDataFrame(
        [("a", bytearray(big)), ("b", bytearray(small))], "`_id` string, payload binary"
    )
    ext = externalize_blobs(df, blob_dir, threshold=1_000_000)
    pointers = {r["_id"]: r["payload"] for r in ext.collect()}
    assert pointers["a"]["__blob__"] is not None and pointers["a"]["inline"] is None
    assert pointers["b"]["__blob__"] is None and bytes(pointers["b"]["inline"]) == small
    assert os.path.exists(pointers["a"]["__blob__"])

    back = {r["_id"]: bytes(r["payload"]) for r in rehydrate_blobs(ext).collect()}
    assert back["a"] == big and back["b"] == small  # byte-exact round trip

    # lazy skip leaves pointers untouched
    lazy = rehydrate_blobs(ext, skip_fetch_binary=True)
    assert "__blob__" in lazy.schema["payload"].dataType.fieldNames()

    # GC (parity: delete_by_id blob walk)
    paths = collect_blob_paths(ext)
    assert delete_blobs(paths) == 1
    assert not os.path.exists(pointers["a"]["__blob__"])


def test_ros_bag_egress_with_fake_writer(spark):
    class FakeBag:
        def __init__(self):
            self.records = []
        def write(self, topic, msg, t):
            self.records.append((topic, msg.get("v"), t))
        def close(self):
            self.closed = True

    docs = [
        TopicStore({"cam": {"v": i, "_ros_meta": {"time": float(i), "type": "t/T",
                    "connection_header": {"topic": "/cam"}}}})
        for i in range(3)
    ]
    from topic_store_spark.codec import documents_to_rows, infer_schema
    trees = [d.dict for d in docs]
    schema = infer_schema(trees)
    df = spark.createDataFrame(documents_to_rows(trees, schema), schema)

    bag = FakeBag()
    n = to_ros_bag(df, "/tmp/fake.bag", bag_writer_factory=lambda p: bag)
    assert n == 3
    assert [r[0] for r in bag.records] == ["/cam", "/cam", "/cam"]
    # ordered by ros_time
    times = [r[2] for r in bag.records]
    assert times == sorted(times)
    assert bag.closed


def test_write_topic_store_egress(spark, tmp_path):
    store = ParquetStorage(spark, str(tmp_path / "x.parquet"))
    store.insert_many([{"n": i} for i in range(4)])
    out = str(tmp_path / "out.topic_store")
    assert write_topic_store(store.to_df(), out) == 4
    back = TopicStorage(spark, out)
    assert sum(1 for _ in back) == 4


def test_partitioned_store_prunes_directories(spark, tmp_path):
    """Date-partitioned canonical layout: a partition-column predicate
    becomes a directory-level PartitionFilter (no data IO for pruned
    dates)."""
    import time as _time

    from topic_store_spark.data import TopicStore
    from topic_store_spark.filesystem import ParquetStorage

    store = ParquetStorage(spark, str(tmp_path / "p.parquet"), partition_by=("_ts_date",))
    day = 86400.0
    base = 1704067200.0  # 2024-01-01 UTC
    docs = []
    for d in range(3):
        for i in range(4):
            doc = TopicStore({"n": d * 10 + i})
            doc.dict["_ts_meta"]["sys_time"] = base + d * day + i
            docs.append(doc)
    store.insert_many(docs)

    assert sorted(p.name for p in (tmp_path / "p.parquet").iterdir() if p.is_dir()) == [
        "_ts_date=2024-01-01", "_ts_date=2024-01-02", "_ts_date=2024-01-03",
    ]
    df = store.to_df().filter("_ts_date = date'2024-01-02'")
    assert df.count() == 4
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(_ts_date" in plan
    # query surface still works across partitions
    assert store.count({"n": {"$gte": 20}}) == 4


def test_storage_blob_policy_end_to_end(spark, tmp_path):
    """B1-B3 wired into the store: externalize on insert, rehydrate on
    find, lazy-skip flag, GC on delete."""
    import os

    from topic_store_spark.filesystem import ParquetStorage

    store = ParquetStorage(
        spark,
        str(tmp_path / "b.parquet"),
        blob_dir=str(tmp_path / "blobs"),
        blob_threshold=1_000,
    )
    big = bytes(range(256)) * 20  # 5120 B > threshold, not utf-8
    small = b"\xff\xfe tiny"
    id_big = store.insert_one({"payload": bytearray(big), "n": 1})
    store.insert_one({"payload": bytearray(small), "n": 2})

    raw = {r["n"]: r["payload"] for r in store.find(skip_fetch_binary=True).collect()}
    assert raw[1]["__blob__"] is not None and raw[1]["inline"] is None
    assert raw[2]["__blob__"] is None and bytes(raw[2]["inline"]) == small

    back = {r["n"]: bytes(r["payload"]) for r in store.find().collect()}
    assert back[1] == big and back[2] == small

    blob_path = raw[1]["__blob__"]
    assert os.path.exists(blob_path)
    store.delete_by_id(id_big)
    assert not os.path.exists(blob_path)  # GC (B4)
    assert store.count() == 1


def test_load_yaml_scenario_dispatch(spark, tmp_path):
    """S1 parity: load('scenario.yaml') resolves through the scenario's
    storage section (reference database.py:94-99)."""
    import yaml

    import topic_store_spark as ts

    scenario = {
        "context": "yaml_dispatch",
        "storage": {"method": "filesystem", "location": str(tmp_path / "y.parquet")},
        "data": {"x": "/topic"},
        "collection": {"method": "timer", "timer_delay": 1},
    }
    path = tmp_path / "scenario.yaml"
    path.write_text(yaml.safe_dump(scenario))

    store = ts.load(str(path), spark)
    store.insert_one({"n": 7})
    assert ts.load(str(path), spark).count() == 1

    db = dict(scenario, storage={"method": "database", "uri": "mongodb://h:27017"})
    db_path = tmp_path / "db.yaml"
    db_path.write_text(yaml.safe_dump(db))
    from topic_store_spark.mongodb import MongoStorage

    db_store = ts.load(str(db_path), spark)
    assert isinstance(db_store, MongoStorage)
    assert db_store.collection_name == "yaml_dispatch"


def test_append_null_field_adopts_store_type(spark, tmp_path):
    """A field that is null in the whole batch has no type evidence: it
    must adopt the store's existing column type, not a string placeholder
    that would wedge every later read (CANNOT_MERGE_SCHEMAS)."""
    store = ParquetStorage(spark, str(tmp_path / "nulls.parquet"))
    store.insert_one({"robot": {"x": 1.0}, "n": 1})
    store.insert_one({"robot": {"x": 2.0}, "n": None})  # was the footgun
    df = store.to_df()
    assert dict(df.dtypes)["n"] == "bigint"
    assert df.count() == 2
    assert store.find({"n": {"$exists": False}}).count() == 1


def test_append_conflicting_type_fails_at_write_time(spark, tmp_path):
    """An append whose type genuinely conflicts must fail THE WRITE with
    a clear error — never succeed and poison all subsequent reads."""
    import pytest as _pytest

    store = ParquetStorage(spark, str(tmp_path / "conflict.parquet"))
    store.insert_one({"n": 1, "nested": {"v": 2.5}})
    with _pytest.raises(ValueError, match="RaggedParquetStorage"):
        store.insert_one({"n": "not a number"})
    with _pytest.raises(ValueError, match="nested.v"):
        store.insert_one({"nested": {"v": "also wrong"}})
    # the store is still fully readable after the refused appends
    assert store.to_df().count() == 1
    assert store.find({"n": 1}).count() == 1


def test_distinct_field_and_array_elements(spark, tmp_path):
    """pymongo-surface distinct: dotted fields, optional filter, array
    fields contribute distinct ELEMENTS (reference database.py:266)."""
    store = ParquetStorage(spark, str(tmp_path / "distinct.parquet"))
    store.insert_many(
        [
            {"robot": {"name": "husky"}, "tags": ["a", "b"], "n": 1},
            {"robot": {"name": "husky"}, "tags": ["b", "c"], "n": 2},
            {"robot": {"name": "thorvald"}, "tags": [], "n": 3},
        ]
    )
    assert store.distinct("robot.name") == ["husky", "thorvald"]
    assert store.distinct("tags") == ["a", "b", "c"]
    assert store.distinct("robot.name", {"n": {"$lte": 2}}) == ["husky"]


def test_delete_many_and_compact(spark, tmp_path):
    """Retention sweep + small-file compaction: delete_many removes the
    matched set in one rewrite and reports the count; compact collapses
    the one-file-per-insert fragmentation into a bounded file count."""
    store = ParquetStorage(spark, str(tmp_path / "retention.parquet"))
    for i in range(8):
        store.insert_one({"n": i, "keep": i % 2 == 0})
    import os as _os

    files_before = sum(
        1
        for _r, _d, names in _os.walk(store.path)
        for f in names
        if f.startswith("part-") and f.endswith(".parquet")
    )
    assert files_before >= 8  # append-only: one part file per insert

    with pytest.raises(ValueError):
        store.delete_many({})  # dropping the store must be explicit
    assert store.delete_many({"keep": False}) == 4
    assert sorted(r["n"] for r in store.find().collect()) == [0, 2, 4, 6]

    n_files = store.compact()
    assert n_files == 1
    assert sorted(r["n"] for r in store.find().collect()) == [0, 2, 4, 6]
    assert store.count(estimate=True) == 4  # footer fast path intact
