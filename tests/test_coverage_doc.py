"""COVERAGE.md traceability: every carrier query the doc cites must be
a live entry in ``__spark_entry__.queries()`` — the operator → carrier →
CORRECTNESS-row chain stays mechanically checkable (r4 review found
seven retired names after a registry consolidation; this pins it)."""

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_cited_carrier_query_is_registered():
    import __spark_entry__ as e

    live = set(e.queries())
    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    cited = set(re.findall(r"q:([A-Za-z0-9_]+)", text))
    assert cited, "COVERAGE.md cites no carrier queries — parse broke?"
    stale = sorted(cited - live)
    assert not stale, f"COVERAGE.md cites retired queries: {stale}"
