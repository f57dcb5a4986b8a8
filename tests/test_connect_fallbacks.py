"""Spark Connect degradation contracts (r10, VERDICT #1/#2 + ADVICE).

Connect itself is environment-blocked here (no grpcio wheel), so these
pin the FALLBACK BRANCHES with duck-typed fakes: the classic probes
(`sparkContext`, `.rdd`) raise exactly like they do under Connect, and
the helpers must degrade the scale-safe way — never an unconditional
full shuffle of a possibly-huge relation, never a crash on a
non-numeric `spark.sql.shuffle.partitions`.
"""

from __future__ import annotations

from topic_store_spark.operators.util import ensure_parallelism
from topic_store_spark.streaming.ingest import _respread_target


class _FakeConf:
    def __init__(self, shuffle_partitions):
        self._sp = shuffle_partitions

    def get(self, key):
        assert key == "spark.sql.shuffle.partitions"
        return self._sp


class _FakeSession:
    """Spark Connect surface: no sparkContext attribute at all."""

    def __init__(self, shuffle_partitions="32"):
        self.conf = _FakeConf(shuffle_partitions)

    @property
    def sparkContext(self):
        raise AttributeError("sparkContext is not available on Connect")


class _FakeDF:
    def __init__(self, files, shuffle_partitions="32"):
        self.sparkSession = _FakeSession(shuffle_partitions)
        self._files = files
        self.repartitioned_to = None

    @property
    def rdd(self):
        raise AttributeError("rdd is not available on Connect")

    def inputFiles(self):
        if self._files is None:
            raise Exception("plan is not file-backed")
        return list(self._files)

    def repartition(self, n):
        self.repartitioned_to = n
        return self


def test_connect_fallback_file_backed_few_files_spreads():
    df = _FakeDF(files=["a.parquet", "b.parquet"])
    out = ensure_parallelism(df)
    assert out.repartitioned_to == 32


def test_connect_fallback_file_backed_many_files_noop():
    df = _FakeDF(files=[f"f{i}.parquet" for i in range(40)])
    out = ensure_parallelism(df)
    assert out.repartitioned_to is None


def test_connect_fallback_unprobeable_relation_is_noop():
    # r9 repartitioned here unconditionally — a full round-robin
    # Exchange of a possibly-100TB view-backed relation.  r10: no-op.
    for files in (None, []):
        df = _FakeDF(files=files)
        out = ensure_parallelism(df)
        assert out.repartitioned_to is None, files


def test_connect_fallback_unprobeable_with_explicit_min_partitions():
    # an explicit caller floor is the one license to spread blind
    df = _FakeDF(files=None)
    out = ensure_parallelism(df, min_partitions=8)
    assert out.repartitioned_to == 8


def test_connect_fallback_auto_shuffle_partitions_is_noop():
    # managed/Databricks AQE sets the conf to "auto" — int() raised in r9
    df = _FakeDF(files=["a.parquet"], shuffle_partitions="auto")
    out = ensure_parallelism(df)
    assert out.repartitioned_to is None


def test_respread_target_connect_is_none():
    # foreachBatch micro-batches expose no sparkContext/.rdd on Connect
    # and are never file-backed: keep the source layout.
    batch = _FakeDF(files=None)
    assert _respread_target(batch, n_in=1_000_000) is None


def test_respread_target_classic(spark):
    one = spark.range(0, 10_000).coalesce(1)
    want = _respread_target(one, n_in=10_000)
    assert want == min(spark.sparkContext.defaultParallelism, 10_000 // 256)
    # small batches keep their layout
    assert _respread_target(one, n_in=64) is None
    wide = spark.range(0, 10_000).repartition(64)
    assert _respread_target(wide, n_in=10_000) is None
