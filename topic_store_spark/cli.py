"""Command-line batch ETL (parity: reference convert.py:262-344 CLI).

``python -m topic_store_spark -i SRC -o DST [-q QUERY] [-p PROJECTION]``

- ``-i/-o`` are storage paths dispatched through ``api.load`` (parquet
  canonical store, legacy ``.topic_store`` pickle streams), or
  ``mongodb://`` URIs opened as MongoStorage with ``-c/--collection``
  (parity: reference convert.py:263-344 ``is_uri`` branch).
- ``-q`` is a JSON Mongo filter document; ``"ObjectId(hex)"`` string
  literals coerce like the reference (convert.py:319-327 — handled by
  the query compiler).
- ``-p`` is a JSON Mongo projection document.
- ``--list-sessions`` replaces the reference's interactive session
  picker (convert.py:50-71) with a non-interactive listing; pass
  ``--session ID`` to copy a single session.

The copy itself is a distributed read -> filter -> project -> anti-join
-> write; nothing iterates documents through the driver.
"""

from __future__ import annotations

import argparse
import json
import sys

from topic_store_spark.api import load
from topic_store_spark.convert import copy


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="topic_store_spark",
        description="Copy/convert document stores (Mongo-dict query surface).",
    )
    parser.add_argument("-i", "--input", required=True, help="source store path")
    parser.add_argument("-o", "--output", help="destination store path")
    parser.add_argument(
        "-c",
        "--collection",
        default="default",
        help="MongoDB collection to use when a mongodb:// URI is passed",
    )
    parser.add_argument("-q", "--query", default=None, help="JSON filter document")
    parser.add_argument(
        "-p", "--projection", default=None, help="JSON projection document"
    )
    parser.add_argument(
        "--session", default=None, help="copy only this _ts_meta.session id"
    )
    parser.add_argument(
        "--list-sessions",
        action="store_true",
        help="print per-session counts of the input store and exit",
    )
    parser.add_argument(
        "--count", action="store_true", help="print matching-document count and exit"
    )
    parser.add_argument(
        "--delete",
        action="store_true",
        help="delete documents matching -q from the INPUT store (requires -q)",
    )
    parser.add_argument(
        "--distinct", default=None, metavar="FIELD",
        help="print distinct values of FIELD (dotted ok) under -q and exit",
    )
    parser.add_argument(
        "--compact",
        nargs="?",
        const=1_000_000,
        type=int,
        default=None,
        metavar="ROWS_PER_FILE",
        help="rewrite the INPUT store into ceil(rows/N) files and exit",
    )
    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    query = json.loads(args.query) if args.query else None
    projection = json.loads(args.projection) if args.projection else None
    if args.session:
        query = dict(query or {})
        query["_ts_meta.session"] = args.session

    def _open(path: str):
        from topic_store_spark.mongodb import client_from_uri, is_uri

        if is_uri(path):
            return client_from_uri(path, collection=args.collection)
        return load(path)

    src = _open(args.input)

    if args.list_sessions:
        for row in src.get_unique_sessions().collect():
            print(json.dumps(row.asDict(recursive=True), default=str))
        return 0

    if args.count:
        print(src.count(query))
        return 0

    if args.distinct:
        for v in src.distinct(args.distinct, query):
            print(v)
        return 0

    if args.delete:
        if not query:
            print("error: --delete requires a -q filter", file=sys.stderr)
            return 2
        print(json.dumps({"deleted": src.delete_many(query)}))
        return 0

    if args.compact is not None:
        print(json.dumps({"files": src.compact(args.compact)}))
        return 0

    if not args.output:
        print("error: -o/--output is required to copy", file=sys.stderr)
        return 2

    dst = _open(args.output)
    stats = copy(src, dst, query=query, projection=projection)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
