"""Multi-seed fuzz marathon: rerun every differential fuzz harness
under FRESH seeds by intercepting ``random.Random``, so each round
re-derives the generators' hard-coded seeds from a round seed.  The
suite's fixed seeds make CI deterministic but explore one trajectory;
this tool is the soak that walks new ones.

    python tools/fuzz_marathon.py [rounds] [start]   # defaults 10, 1

Each round runs all forty-four harnesses (value expressions, long-tail
ops, find dialect x4 incl. the ragged resolver and the $jsonSchema
sweep, projections, the nine pipeline families incl. the r9
$redact-$$DESCEND / $graphLookup references and the r10 $merge
whenMatched x whenNotMatched mode-matrix reference — the stateful
writer surface, the r11 $facet/$unionWith/$documents sub-pipeline
compositions — whose construction immediately caught the $count
empty-input bug — and the r12 full-find-dialect-inside-$facet/$lookup
joint harness (dialect $matches compiled under sub-pipeline scoping,
the physical-sort strip, and collect+array_sort reassembly), plus the
r13 $jsonSchema/$expr-below-reshape harness ($project/$addFields
reshapes the struct ABOVE the schema predicate, exercising the static
closed-document enumeration against the reshaped field set) — the r10 text repetition-signal reference driven
through the text_profile carrier itself, and the r10 OPERATOR
references: the dedup family x4 — overlap pairs via BOTH physical
plans, exact groups, substring spans, paragraph dedup — connected
components via BOTH the driver fast path and star contraction, the
temporal joins x2, the hash-sketch family x3 — MinHash band keys,
SimHash majority longs, and hyperplane buckets are all deterministic
md5-derived values the references reproduce bit-for-bit — and the BPE
trainer three-way: pure-Python loop vs sequential-distributed vs the
batched `_select_merge_batch` path, plus apply vs segment_word, and
the .topic_store corrupt-frame resync: driver cursor vs distributed
scan must recover the identical frame set under adversarial
byte-level corruption, the Bloom filter: bit-for-bit blob parity with
a Python builder + probe parity + the no-false-negative guarantee,
CMS heavy hitters: exact at adversarially tiny widths, the WARC
reader: spec-serialized random records across plain / whole-gzip /
per-member-gzip layouts round-trip through the distributed scan, the
incremental dedup pair with the Bloom prefilter OFF and ON — which
must be bit-identical end-to-end — the salting helpers, which must
never change results at any salt_buckets, SemDeDup
`semantic_cluster_dedup` in single-assignment AND multi-probe modes,
the from-scratch CBOR codec: roundtrip, an independent serializer
emitting non-canonical wire forms — oversized widths, indefinite
lengths, half/single floats, RFC 8746 typed arrays — and
truncation-always-raises, randomized PNG/WAV lossless roundtrips
across shapes, bit depths, and filters, and the out-of-row blob
lifecycle: externalize/rehydrate byte-exact, pointer inventory and GC
exact, lazy-skip untouched, sequence packing at random (ctx, shards)
configurations, the hashed-linear classifier's trained-weights
blob path — pack/lookup arithmetic and biasing bit-for-bit — and
ObjectId layout/roundtrip/determinism/uniqueness properties); any divergence prints the harness, round, and
the failing case.  Finds from past runs (all fixed): last-ULP atan2
differences between JVM and Python libm (now quantized past in the
comparator), a generator flaw where a bare literal landed in
$project's include/exclude flag position, (r9, caught while WRITING
the $redact reference) null array elements being cond-evaluated under
$$DESCEND instead of passing through as non-documents, and (r10,
caught by the as-of reference) per-column ignorenulls fills stitching
an OLDER quote's payload onto the matched timestamp when the matched
quote's value was null, plus null-ts quotes leaking payloads into
null-ts probes.
"""
from __future__ import annotations

import pathlib
import random as _random
import sys
import tempfile
import traceback

_REPO = str(pathlib.Path(__file__).resolve().parent.parent)
sys.path.insert(0, _REPO)


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    from topic_store_spark.session import get_spark

    spark = get_spark(
        app_name="fuzz_marathon",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "12g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import tests.test_blob_fuzz as blf
    import tests.test_bpe_fuzz as bpf
    import tests.test_cbor_fuzz as cbf
    import tests.test_classify_fuzz as clf
    import tests.test_codec_roundtrip_fuzz as crf
    import tests.test_dedup_fuzz as ddf
    import tests.test_find_fuzz as ff
    import tests.test_hash_dedup_fuzz as hdf
    import tests.test_incremental_skew_fuzz as isf
    import tests.test_objectid_fuzz as oif
    import tests.test_pack_fuzz as pkf
    import tests.test_pickle_resync_fuzz as prf
    import tests.test_semantic_fuzz as smf
    import tests.test_sketch_fuzz as skf
    import tests.test_pipeline_fuzz as pf
    import tests.test_projection_fuzz as jf
    import tests.test_temporal_fuzz as tpf
    import tests.test_text_fuzz as tf
    import tests.test_value_expr_fuzz as vf
    import tests.test_warc_fuzz as wf

    harnesses = [
        ("value", vf.test_value_expressions_match_reference_evaluator),
        ("longtail", vf.test_longtail_expressions_match_reference_evaluator),
        ("find", ff.test_find_dialect_matches_reference_evaluator),
        ("find_nested", ff.test_nested_dialect_matches_reference_evaluator),
        ("find_jsonschema", ff.test_json_schema_matches_reference_evaluator),
        ("find_ragged", lambda sp: ff.test_ragged_resolver_matches_reference_evaluator(
            sp, pathlib.Path(tempfile.mkdtemp()))),
        ("projection", jf.test_projections_match_reference),
        ("pipe_window", pf.test_window_fill_densify_match_reference),
        ("pipe_lookup", pf.test_lookup_compositions_match_reference),
        ("pipe_stage", pf.test_stage_compositions_match_reference),
        ("pipe_nary", pf.test_nary_accumulators_and_convert_match_reference),
        ("pipe_redact", pf.test_redact_descend_matches_reference),
        ("pipe_graphlookup", pf.test_graph_lookup_matches_reference),
        ("pipe_merge", pf.test_merge_matches_reference),
        ("pipe_subpipes", pf.test_facet_union_documents_match_reference),
        ("pipe_find_in_subpipes",
         pf.test_find_dialect_in_subpipelines_matches_reference),
        ("pipe_schema_reshape",
         pf.test_jsonschema_expr_after_subpipeline_reshape_matches_reference),
        ("text", tf.test_text_profile_matches_reference),
        ("dedup_pairs", ddf.test_overlap_pairs_match_reference),
        ("dedup_exact", ddf.test_exact_dedup_matches_reference),
        ("dedup_spans", ddf.test_duplicated_spans_match_reference),
        ("dedup_paragraph", ddf.test_paragraph_dedup_matches_reference),
        ("components", ddf.test_connected_components_match_reference),
        ("asof", tpf.test_asof_join_matches_reference),
        ("interval", tpf.test_interval_join_matches_reference),
        ("minhash", hdf.test_minhash_lsh_matches_reference),
        ("simhash", hdf.test_simhash_matches_reference),
        ("embedding", hdf.test_embedding_dup_pairs_match_reference),
        ("bpe", bpf.test_bpe_trainer_paths_identical),
        ("resync", prf.test_pickle_resync_parity),
        ("bloom", skf.test_bloom_filter_matches_reference),
        ("cms", skf.test_heavy_hitters_exact_at_any_width),
        ("warc", wf.test_warc_roundtrip_matches_reference),
        ("inc_exact", isf.test_incremental_exact_matches_reference),
        ("inc_minhash", isf.test_incremental_minhash_matches_reference),
        ("salted_agg", isf.test_salted_aggregate_matches_reference),
        ("salted_join", isf.test_salted_join_matches_reference),
        ("semantic", smf.test_semantic_cluster_dedup_matches_reference),
        ("cbor", cbf.test_cbor_matches_reference),
        ("raster_audio", crf.test_png_wav_roundtrip_random),
        ("blob", blf.test_blob_lifecycle_random),
        ("pack", pkf.test_pack_sequences_matches_reference),
        ("classify", clf.test_hashed_linear_score_weights_match_reference),
        ("objectid", oif.test_objectid_properties),
    ]

    orig_random = _random.Random
    failures = 0
    try:
        for round_i in range(start, start + rounds):
            round_seed = 0xA5EED000 + round_i

            class SeededRandom(orig_random):
                def __init__(self, seed=None, _rs=round_seed):
                    super().__init__(f"{_rs}:{seed}")

            _random.Random = SeededRandom
            for name, fn in harnesses:
                try:
                    fn(spark)
                    print(f"round {round_i} {name}: ok", flush=True)
                except AssertionError as exc:
                    failures += 1
                    print(f"round {round_i} {name}: DIVERGENCE", flush=True)
                    print(str(exc)[:2000], flush=True)
                except Exception:
                    failures += 1
                    print(f"round {round_i} {name}: CRASH", flush=True)
                    traceback.print_exc()
    finally:
        _random.Random = orig_random
    print(f"marathon done, failures={failures}", flush=True)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
