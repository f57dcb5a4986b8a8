"""Round-trip fuzzer for the WARC reader: random structured records
(types, URIs, dates, binary payloads — including payloads containing
``\\r\\n\\r\\n`` and fake header blocks — HTTP response envelopes with
and without status digits / terminators) are SERIALIZED per the WARC
spec by an independent writer, stored as plain ``.warc``, whole-stream
gzip, and per-record gzip members (the real ``.warc.gz`` layout), and
read back through the distributed `read_warc` surface.  Every field of
every record must equal the expectation derived from the structured
source data, never from the parser.
"""

from __future__ import annotations

import gzip
import os
import random
import shutil
import tempfile

_TYPES = ["response", "request", "warcinfo", "metadata", "resource"]


def _record(rng: random.Random, idx: int) -> dict:
    body = bytes(rng.randrange(256) for _ in range(rng.randint(0, 60)))
    if rng.random() < 0.3:  # payload containing WARC-ish bait
        body += b"\r\n\r\nWARC/1.0\r\n" + body
    rec = {
        "warc_type": rng.choice(_TYPES),
        "target_uri": f"https://ex.com/p{idx}?q={rng.randint(0, 999)}",
        "warc_date": f"2026-08-{rng.randint(10, 28):02d}T01:02:03Z",
        "content_type": rng.choice(
            ["application/http; msgtype=response", "text/plain", None]
        ),
        "envelope": None,
        "body": body,
    }
    if rec["warc_type"] == "response" and rng.random() < 0.8:
        status = rng.choice(["200", "404", "503", "OK"])  # OK = no digits
        env_lines = [f"HTTP/1.1 {status} X"]
        http_ct = None
        if rng.random() < 0.7:
            http_ct = rng.choice(["text/html", "text/html; charset=utf-8"])
            env_lines.append(f"Content-Type: {http_ct}")
        env_lines.append(f"X-Pad: {rng.randint(0, 9)}")
        terminated = rng.random() < 0.85
        if not terminated:
            # keep the expectation decidable: with no envelope terminator
            # the parser scans the WHOLE payload for one, so the body
            # must not supply it
            rec["body"] = rec["body"].replace(b"\r\n\r\n", b"X\r\nX")
        rec["envelope"] = {
            "raw": "\r\n".join(env_lines).encode()
            + (b"\r\n\r\n" if terminated else b""),
            "status": int(status) if status.isdigit() and terminated else None,
            "http_ct": http_ct if terminated else None,
            "terminated": terminated,
        }
    return rec


def _serialize(rec: dict) -> bytes:
    payload = (rec["envelope"]["raw"] if rec["envelope"] else b"") + rec["body"]
    head = [
        "WARC/1.0",
        f"WARC-Type: {rec['warc_type']}",
        f"WARC-Target-URI: {rec['target_uri']}",
        f"WARC-Date: {rec['warc_date']}",
        f"Content-Length: {len(payload)}",
    ]
    if rec["content_type"]:
        head.append(f"Content-Type: {rec['content_type']}")
    return "\r\n".join(head).encode() + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _expected(rec: dict) -> dict:
    """Parse expectation derived from the STRUCTURED data, not the parser."""
    env = rec["envelope"]
    if env and env["terminated"]:
        payload, status, http_ct = rec["body"], env["status"], env["http_ct"]
    elif env:  # unterminated envelope: whole payload stays raw
        payload, status, http_ct = env["raw"] + rec["body"], None, None
    else:
        payload, status, http_ct = rec["body"], None, None
    return {
        "warc_type": rec["warc_type"],
        "target_uri": rec["target_uri"],
        "warc_date": rec["warc_date"],
        "content_type": rec["content_type"],
        "http_status": status,
        "http_content_type": http_ct,
        "payload": payload,
    }


def test_warc_roundtrip_matches_reference(spark):
    from topic_store_spark.warc import parse_warc, read_warc

    rng = random.Random(0x3A9C)
    tmp = tempfile.mkdtemp(prefix="warcfuzz_")
    try:
        truth: dict[str, list[dict]] = {}
        for f in range(3):
            recs = [_record(rng, i) for i in range(rng.randint(1, 8))]
            raw = b"".join(_serialize(r) for r in recs)
            layout = f % 3
            if layout == 0:
                name = f"a{f}.warc"
                blob = raw
            elif layout == 1:  # whole-stream gzip
                name = f"a{f}.warc.gz"
                blob = gzip.compress(raw)
            else:  # per-record gzip members (the Common Crawl layout)
                name = f"a{f}.warc.gz"
                blob = b"".join(gzip.compress(_serialize(r)) for r in recs)
            with open(os.path.join(tmp, name), "wb") as fh:
                fh.write(blob)
            truth[name] = [_expected(r) for r in recs]

        rows = read_warc(spark, f"{tmp}/*.warc*").collect()
        got: dict[str, dict[int, dict]] = {}
        for r in rows:
            got.setdefault(os.path.basename(r["warc_file"]), {})[
                r["record_idx"]
            ] = r
        failures = []
        for name, recs in truth.items():
            if len(got.get(name, {})) != len(recs):
                failures.append(
                    f"{name}: {len(got.get(name, {}))} records, want {len(recs)}"
                )
                continue
            for i, want in enumerate(recs):
                have = got[name][i]
                for k, w in want.items():
                    h = bytes(have[k]) if k == "payload" else have[k]
                    if h != w:
                        failures.append(f"{name}[{i}].{k}: got {h!r} want {w!r}")
        assert not failures, "\n".join(failures[:15])

        # malformed archive refuses loudly instead of returning junk
        try:
            parse_warc(b"NOT-A-WARC\r\n\r\nxx")
            raise AssertionError("parse_warc accepted a non-WARC stream")
        except ValueError:
            pass
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
