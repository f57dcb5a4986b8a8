"""Registry-level contracts for the per-session shared artifacts
(`__spark_entry__._shared_minhash_pairs`, `_zordered_events`): the
build query always recomputes, the consumer reuses, and reuse is
result-identical to a fresh build."""

from pyspark.sql import functions as F


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_minhash_pair_artifact_reuse_is_identical(spark, sf_dir):
    import __spark_entry__ as e

    build1 = _rows(e.queries()["dedup_minhash_lsh"](spark, sf_dir))
    # consumer path: reuses the standing artifact (no rebuild)
    reused = _rows(e._shared_minhash_pairs(spark, sf_dir))
    assert reused == build1 and len(build1) > 0
    # a second BUILD overwrites in place and must reproduce exactly
    build2 = _rows(e.queries()["dedup_minhash_lsh"](spark, sf_dir))
    assert build2 == build1


def test_clusters_cover_exactly_the_paired_docs(spark, sf_dir):
    """Every doc in the shared pair set appears in exactly one cluster,
    and every cluster member comes from the pair set."""
    import __spark_entry__ as e

    pairs = e._shared_minhash_pairs(spark, sf_dir)
    paired = {
        r["d"]
        for r in pairs.select(F.col("a_doc").alias("d"))
        .unionByName(pairs.select(F.col("b_doc").alias("d")))
        .distinct()
        .collect()
    }
    clusters = e.queries()["dedup_clusters"](spark, sf_dir).collect()
    members: list[int] = []
    for row in clusters:
        ms = [int(x) for x in row["members_csv"].split(",")]
        assert len(ms) == row["n_members"]
        members.extend(ms)
    assert len(members) == len(set(members))  # disjoint clusters
    assert set(members) == paired


def test_zordered_events_content_identical(spark, sf_dir):
    """Z-ordering changes layout, never content."""
    import __spark_entry__ as e
    from topic_store_spark.tables import load_table

    z = e._zordered_events(spark, sf_dir)
    src = load_table(spark, sf_dir, "events")
    assert z.count() == src.count()
    # symmetric difference empty on the full row set
    zn = z.select([F.col(c).cast("string") for c in sorted(z.columns)])
    sn = src.select([F.col(c).cast("string") for c in sorted(z.columns)])
    assert zn.exceptAll(sn).count() == 0
    assert sn.exceptAll(zn).count() == 0
