"""WARC (Web ARChive) ingestion — the Common Crawl container format.

Web-scale corpus builds start from WARC: concatenated records, each a
``WARC/1.x`` header block plus a ``Content-Length`` payload, usually as
per-record gzip members (``.warc.gz``).  The format is simple enough to
parse with the standard library, which keeps ingestion dependency-free
like the rest of the repo's codecs.

Scale shape — the same one cc_net/fastwarc pipelines use: WARC archives
ship as MANY files of ~1 GB (a Common Crawl dump is ~60k files), so
parallelism is per-file: ``spark.read.format("binaryFile")`` lists the
files, each task parses its whole archive inside Arrow ``mapInPandas``,
and everything downstream (HTML extraction `functions/html.py`, quality
gates, dedup) is ordinary DataFrame work over the record table.  A
single giant archive does NOT split mid-file (per-record gzip members
have no file-level index); that is a property of the format, handled in
practice by the many-files layout.

``parse_warc`` handles plain and gzip archives, extracts the standard
record headers, and for ``response`` records splits the HTTP envelope
from the body (status line + headers dropped into ``http_status`` /
``http_content_type``).
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("record_idx", T.IntegerType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a multi-member gzip stream (the .warc.gz layout)."""
    out = io.BytesIO()
    with gzip.GzipFile(fileobj=io.BytesIO(data)) as gz:
        # GzipFile reads across members transparently
        out.write(gz.read())
    return out.getvalue()


def parse_warc(data: bytes) -> list[dict]:
    """All records of one WARC archive (plain or gzip) as dicts with
    the RECORD_SCHEMA fields (minus warc_file/record_idx)."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records = []
    off = 0
    n = len(data)
    while off < n:
        # skip inter-record CRLFs
        while off < n and data[off : off + 2] == b"\r\n":
            off += 2
        if off >= n:
            break
        head_end = data.find(b"\r\n\r\n", off)
        if head_end < 0:
            break
        head = data[off:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"not a WARC record at offset {off}")
        hdr = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            hdr[k.strip().lower()] = v.strip()
        length = int(hdr.get("content-length", "0"))
        payload = data[head_end + 4 : head_end + 4 + length]
        off = head_end + 4 + length

        rec = {
            "warc_type": hdr.get("warc-type"),
            "target_uri": hdr.get("warc-target-uri"),
            "warc_date": hdr.get("warc-date"),
            "content_type": hdr.get("content-type"),
            "http_status": None,
            "http_content_type": None,
            "payload": payload,
        }
        if rec["warc_type"] == "response" and payload[:5] == b"HTTP/":
            env_end = payload.find(b"\r\n\r\n")
            if env_end >= 0:
                env = payload[:env_end].decode("utf-8", "replace")
                env_lines = env.split("\r\n")
                parts = env_lines[0].split()
                if len(parts) >= 2 and parts[1].isdigit():
                    rec["http_status"] = int(parts[1])
                for line in env_lines[1:]:
                    k, _, v = line.partition(":")
                    if k.strip().lower() == "content-type":
                        rec["http_content_type"] = v.strip()
                rec["payload"] = payload[env_end + 4 :]
        records.append(rec)
    return records


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC record table over a file glob (see module doc
    for the parallelism model)."""
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RECORD_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for i, rec in enumerate(parse_warc(bytes(content))):
                    rec = dict(rec)
                    rec["warc_file"] = fpath
                    rec["record_idx"] = i
                    rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return files.select("path", "content").mapInPandas(
        parse, schema=RECORD_SCHEMA
    )
