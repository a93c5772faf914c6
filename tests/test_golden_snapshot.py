"""Golden-fixture gate (north_star): the FULL Spark pipeline's output must
match the checked-in golden snapshot under span-sequence equality on
(kind, text, media_ref, order) — pass rate 100%. The snapshot
(tests/golden_results.json) was generated once and hand-verified; any
behavioral drift in the engine fails here."""

from __future__ import annotations

import json
import os

from samu_ocr_extraction_poc_spark import fixtures as FX
from samu_ocr_extraction_poc_spark.plans.pipeline import run_extraction
from samu_ocr_extraction_poc_spark.schema import DOCUMENTS_SCHEMA
from samu_ocr_extraction_poc_spark.verify import pass_rate, span_equality_report

GOLDEN = json.load(open(os.path.join(os.path.dirname(__file__), "golden_results.json")))


def test_span_sequence_equality_pass_rate_is_100(spark):
    docs = FX.canonical_corpus(spark)
    results = run_extraction(docs, FX.OCR_LOOKUP)
    expected = spark.createDataFrame(
        [
            (
                g["doc_id"],
                [
                    (s["kind"], s["text"], s["media_ref"], s["offset"])
                    for s in g["out_spans"]
                ],
            )
            for g in GOLDEN.values()
        ],
        schema=DOCUMENTS_SCHEMA,
    )
    report = span_equality_report(results, expected)
    assert pass_rate(report) == 1.0, report.where("not equal").collect()


def test_full_result_columns_match_golden(spark):
    docs = FX.canonical_corpus(spark)
    rows = {
        r["doc_id"]: r.asDict(recursive=True)
        for r in run_extraction(docs, FX.OCR_LOOKUP).collect()
    }
    checked = 0
    for key, g in GOLDEN.items():
        got = rows[g["doc_id"]]
        for col in (
            "doc_type", "status", "pages", "header", "paragraphs", "entities",
            "sentiments", "key_phrases", "icd10_conditions", "prescriptions",
            "snomed_codes", "email", "transcript", "raw_text",
        ):
            want = g[col]
            have = got[col]
            assert have == want, (key, col, have, want)
            checked += 1
    assert checked == len(GOLDEN) * 14


def test_expenses_by_page_matches_golden(spark):
    # separate: map-typed column needs key-order-insensitive compare
    docs = FX.canonical_corpus(spark)
    rows = {
        r["doc_id"]: r.asDict(recursive=True)
        for r in run_extraction(docs, FX.OCR_LOOKUP).collect()
    }
    for key, g in GOLDEN.items():
        assert rows[g["doc_id"]]["expenses_by_page"] == g["expenses_by_page"], key
