"""Rolling-hash fingerprint, BPE-ish token count, char-shingle Jaccard."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_rolling_fingerprint_order_sensitive(spark):
    from topic_store_spark.functions.hashing import rolling_fingerprint
    from topic_store_spark.functions.text import tokens

    df = spark.createDataFrame(
        [("a b c",), ("c b a",), ("a b c",)], "t string"
    ).select(tokens(F.col("t")).alias("tk"))
    out = [r[0] for r in df.select(rolling_fingerprint(F.col("tk"))).collect()]
    assert out[0] == out[2]          # deterministic
    assert out[0] != out[1]          # order-sensitive
    assert all(0 <= h < (1 << 31) - 1 for h in out)


def test_rolling_fingerprint_empty(spark):
    from topic_store_spark.functions.hashing import rolling_fingerprint

    df = spark.createDataFrame([([],)], "tk array<string>")
    assert df.select(rolling_fingerprint(F.col("tk"))).collect()[0][0] == 0


def test_bpe_token_count(spark):
    from topic_store_spark.functions.text import bpe_token_count, token_count

    df = spark.createDataFrame([("hello, world! v2.0",)], "t string")
    row = df.select(
        token_count(F.col("t")).alias("ws"), bpe_token_count(F.col("t")).alias("bpe")
    ).collect()[0]
    # ws: ['hello,', 'world!', 'v2.0']
    assert row["ws"] == 3
    # bpe: hello , world ! v 2 . 0  -> 8
    assert row["bpe"] == 8


def test_char_jaccard_finds_intraword_edit(spark):
    from topic_store_spark.operators.dedup import char_jaccard_pairs

    base = "the quick brown fox jumps over the lazy dog and runs far away"
    df = spark.createDataFrame(
        [(1, base), (2, base.replace("jumps", "jumped")), (3, "completely different words here entirely")],
        "doc_id long, text string",
    )
    pairs = char_jaccard_pairs(df, n=5, threshold_num=7, threshold_den=10).collect()
    assert {(r["a_doc"], r["b_doc"]) for r in pairs} == {(1, 2)}
    assert all(0.7 <= r["jaccard"] <= 1.0 for r in pairs)


def test_redact_pii_classes(spark):
    from topic_store_spark.functions.text import pii_counts, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "server at 192.168.0.12 port 80"),
            (3, "call +1 (555) 010-1234 today"),
            (4, "clean text, version 2.5, room 12"),
            (5, "dial 555-010-1234 or 5550101234 ok"),
            # digit runs that must NOT be phone-redacted: ISO dates
            # (4-2-2 runs) and long numeric IDs (> 13 digits)
            (6, "shipped 2026-08-13 at 12:34:56"),
            (7, "order id 12345678901234567890 tracked"),
        ],
        "k long, t string",
    )
    out = {r["k"]: r["red"] for r in df.select("k", redact_pii(F.col("t")).alias("red")).collect()}
    assert out[1] == "mail <EMAIL> now"
    assert out[2] == "server at <IP> port 80"
    assert out[3] == "call <PHONE> today"
    assert out[4] == "clean text, version 2.5, room 12"  # no false positives
    assert out[5] == "dial <PHONE> or <PHONE> ok"
    assert out[6] == "shipped 2026-08-13 at 12:34:56"
    assert out[7] == "order id 12345678901234567890 tracked"
    c = pii_counts(F.col("t"))
    n = df.select(c["n_emails"].alias("e"), c["n_ips"].alias("i")).agg(
        F.sum("e").alias("e"), F.sum("i").alias("i")
    ).first()
    assert (n["e"], n["i"]) == (1, 1)
