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


def test_measurement_docs_pin_their_regeneration_tools():
    """RECALL.md / SCALING.md / STREAMBENCH.md are regenerable
    artifacts: each must name its generator, and that tool must exist —
    a renamed or deleted tool would silently orphan the doc (r5 ADVICE:
    same exists-check COVERAGE carrier names got)."""
    docs = {
        "RECALL.md": "tools/recall_sweep.py",
        "SCALING.md": "tools/scaling_report.py",
        "STREAMBENCH.md": "tools/stream_bench.py",
    }
    for doc, tool in docs.items():
        doc_path = os.path.join(REPO, doc)
        assert os.path.exists(doc_path), f"{doc} missing"
        assert os.path.exists(os.path.join(REPO, tool)), (
            f"{tool} (generator of {doc}) missing"
        )
        text = open(doc_path).read()
        assert os.path.basename(tool) in text, (
            f"{doc} does not name its regeneration tool {tool}"
        )


def test_ppjoin_prose_quotes_the_on_disk_receipt():
    """r13 rule (VERDICT r12 #4): perf prose quotes RECEIPTS, never run
    logs.  COVERAGE.md's PPJoin bullet must carry the medians from the
    committed BENCH_AB_ppjoin_neardup.json — a re-stamp without a
    re-quote is exactly the drift r12 shipped."""
    import json

    with open(os.path.join(REPO, "BENCH_AB_ppjoin_neardup.json")) as fh:
        ab = json.load(fh)
    on = ab["variants"]["ppjoin_on"]["median"]
    off = ab["variants"]["ppjoin_off"]["median"]
    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    want = f"median {on:.2f}s vs {off:.2f}s"
    assert want in text, (
        f"COVERAGE.md PPJoin prose does not quote the receipt ({want!r});"
        " re-quote BENCH_AB_ppjoin_neardup.json after re-stamping"
    )


def test_valve_prose_quotes_the_on_disk_receipt():
    """Same rule for the semantic-valve sweep: SCALING.md's outlier
    section must carry the medians from the committed
    BENCH_valve_semantic.json (r13 sf1 re-measure, VERDICT r12 #1)."""
    import json

    with open(os.path.join(REPO, "BENCH_valve_semantic.json")) as fh:
        sweep = json.load(fh)["sweep"]
    text = open(os.path.join(REPO, "SCALING.md")).read()
    for shape in ("uncapped", "capped"):
        want = (
            f"{shape} median {sweep['sf0.1'][shape]['median']:.2f}s "
            f"→ {sweep['sf1'][shape]['median']:.2f}s"
        )
        assert want in text, (
            f"SCALING.md valve prose does not quote the receipt"
            f" ({want!r}); re-quote BENCH_valve_semantic.json after"
            " re-stamping"
        )
