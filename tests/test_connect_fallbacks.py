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
    # an explicit caller floor is the one license to spread blind.
    # r11: min_partitions is a FLOOR — the target is max(floor, conf),
    # never capped below the session parallelism by the caller's value.
    df = _FakeDF(files=None)
    out = ensure_parallelism(df, min_partitions=8)
    assert out.repartitioned_to == 32


def test_connect_fallback_min_partitions_is_floor_not_cap():
    # floor above the conf raises the target ...
    df = _FakeDF(files=["a.parquet"], shuffle_partitions="16")
    out = ensure_parallelism(df, min_partitions=64)
    assert out.repartitioned_to == 64
    # ... and a floor below it does NOT cap (r10 bug: target=min_partitions)
    df = _FakeDF(files=["a.parquet"], shuffle_partitions="16")
    out = ensure_parallelism(df, min_partitions=4)
    assert out.repartitioned_to == 16
    # unprobeable + "auto" conf + explicit floor: floor alone drives it
    df = _FakeDF(files=None, shuffle_partitions="auto")
    out = ensure_parallelism(df, min_partitions=8)
    assert out.repartitioned_to == 8


def test_classic_min_partitions_is_floor_not_cap(spark):
    dp = spark.sparkContext.defaultParallelism
    one = spark.range(0, 10_000).coalesce(1)
    # a floor BELOW defaultParallelism must not cap the spread below it
    out = ensure_parallelism(one, min_partitions=2)
    assert out.rdd.getNumPartitions() == dp
    # a floor ABOVE defaultParallelism raises the target
    out = ensure_parallelism(one, min_partitions=dp + 8)
    assert out.rdd.getNumPartitions() == dp + 8


class _ConnectProxy:
    """Wrap a REAL DataFrame but present the Spark Connect surface:
    ``sparkContext`` / ``.rdd`` raise, everything the fallback branch
    touches (conf, inputFiles) delegates to the real session/plan, and
    the repartition decision is recorded instead of executed — so the
    SAME physical relation can be pushed through both branches and the
    decisions compared (r10 VERDICT #4)."""

    class _Sess:
        def __init__(self, real):
            self.conf = real.conf

        @property
        def sparkContext(self):
            raise AttributeError("sparkContext is not available on Connect")

    def __init__(self, real_df):
        self._real = real_df
        self.sparkSession = self._Sess(real_df.sparkSession)
        self.repartitioned_to = None

    @property
    def rdd(self):
        raise AttributeError("rdd is not available on Connect")

    def inputFiles(self):
        return self._real.inputFiles()

    def repartition(self, n):
        self.repartitioned_to = n
        return self


def _classic_decision(df):
    out = ensure_parallelism(df)
    n_before = df.rdd.getNumPartitions()
    n_after = out.rdd.getNumPartitions()
    return n_after if n_after != n_before else None


def test_branch_parity_same_relation_same_or_noop(spark, tmp_path):
    """Contract (r10 VERDICT #4): for the same relation shape, the
    Connect fallback branch must choose the SAME partition target as the
    classic branch, or conservatively no-op — never a different spread
    and never a spread the classic branch would refuse."""
    dp = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(dp))

    # shape 1: file-backed, fewer files than parallelism -> both spread,
    # to the same target
    p1 = str(tmp_path / "few")
    spark.range(0, 1000).coalesce(1).write.parquet(p1)
    few = spark.read.parquet(p1)
    classic = _classic_decision(few)
    proxy = _ConnectProxy(few)
    ensure_parallelism(proxy)
    assert classic == dp
    assert proxy.repartitioned_to == classic

    # shape 2: file-backed, files >= parallelism -> both no-op
    p2 = str(tmp_path / "many")
    spark.range(0, 10_000).repartition(dp + 4).write.parquet(p2)
    many = spark.read.parquet(p2)
    proxy = _ConnectProxy(many)
    ensure_parallelism(proxy)
    assert proxy.repartitioned_to is None
    # classic either no-ops or targets dp; the contract is the fallback
    # never spreads where classic wouldn't
    classic = _classic_decision(many)
    assert classic in (None, dp)

    # shape 3: unprobeable (post-shuffle in-memory) -> fallback no-ops;
    # allowed to diverge from classic only in the conservative direction
    mem = spark.range(0, 1000).repartition(2).select("id")
    proxy = _ConnectProxy(mem)
    ensure_parallelism(proxy)
    assert proxy.repartitioned_to is None

    # _respread_target parity: classic picks a target only when it
    # exceeds the current layout; Connect always keeps the layout
    one = spark.range(0, 10_000).coalesce(1)
    classic_want = _respread_target(one, n_in=10_000)
    assert classic_want == min(dp, 10_000 // 256)
    proxy = _ConnectProxy(one)
    assert _respread_target(proxy, n_in=10_000) is None


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
