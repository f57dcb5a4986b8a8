"""WARC ingestion: record parsing (plain + gzip members), HTTP envelope
split, the distributed read path, and the WARC -> HTML -> text -> quality
composition a crawl pipeline runs."""

import gzip

import pytest
from pyspark.sql import functions as F

from topic_store_spark.warc import parse_warc, read_warc


def _record(warc_type, uri, payload: bytes, extra=""):
    head = (
        f"WARC/1.0\r\nWARC-Type: {warc_type}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        "WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"{extra}"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def _response(uri, body: bytes, status=200, ctype="text/html"):
    env = (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return _record(
        "response", uri, env + body,
        extra="Content-Type: application/http; msgtype=response\r\n",
    )


HTML_A = b"<html><body><p>Hello &amp; welcome to page one.</p></body></html>"
HTML_B = b"<html><body><h1>Two</h1><script>x()</script><p>Second page text.</p></body></html>"


def _archive():
    info = _record("warcinfo", "-", b"software: test\r\n")
    return (
        info
        + _response("http://a.test/", HTML_A)
        + _response("http://b.test/", HTML_B, status=404)
    )


def test_parse_plain_and_gzip():
    for blob in (_archive(), gzip.compress(_archive())):
        recs = parse_warc(blob)
        assert [r["warc_type"] for r in recs] == [
            "warcinfo", "response", "response",
        ]
        a = recs[1]
        assert a["target_uri"] == "http://a.test/"
        assert a["http_status"] == 200
        assert a["http_content_type"] == "text/html"
        assert bytes(a["payload"]) == HTML_A
        assert recs[2]["http_status"] == 404


def test_rejects_garbage():
    with pytest.raises(ValueError):
        parse_warc(b"GARBAGE/1.0\r\n\r\n")


def test_distributed_read_and_extraction(spark, tmp_path):
    from topic_store_spark.functions.html import html_to_text

    (tmp_path / "a.warc").write_bytes(_archive())
    (tmp_path / "b.warc.gz").write_bytes(gzip.compress(_archive()))
    df = read_warc(spark, str(tmp_path / "*.warc*"))
    assert df.count() == 6  # 2 files x 3 records
    pages = (
        df.filter((F.col("warc_type") == "response") & (F.col("http_status") == 200))
        .select(
            "target_uri",
            html_to_text(F.col("payload").cast("string")).alias("text"),
        )
    )
    got = {r["target_uri"]: r["text"] for r in pages.collect()}
    assert got == {"http://a.test/": "Hello & welcome to page one."}


def test_escaped_markup_stays_escaped(spark):
    """`&amp;` decodes LAST: `&amp;lt;b&amp;gt;` is the ESCAPED text
    '&lt;b&gt;', not markup — decoding `&amp;` first would double-decode
    it into '<b>'.  Spark and the DuckDB twin must agree."""
    import duckdb

    from topic_store_spark.functions.html import html_to_text, html_to_text_sql

    doc = "<p>a &amp;lt;b&amp;gt; c &amp; d</p>"
    want = "a &lt;b&gt; c & d"
    df = spark.createDataFrame([(doc,)], "html string")
    got = df.select(html_to_text(F.col("html")).alias("t")).first()["t"]
    assert got == want
    sql = f"SELECT {html_to_text_sql('html')} AS t FROM (SELECT ? AS html)"
    assert duckdb.sql(sql, params=[doc]).fetchone()[0] == want
