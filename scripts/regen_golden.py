#!/usr/bin/env python
"""Regenerate tests/golden_results.json from the current engine.

ONLY for intentional semantic changes — the snapshot is the span-sequence
correctness gate (CLAUDE.md). Prints a diff summary against the existing
snapshot so the change can be hand-verified before committing.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from samu_ocr_extraction_poc_spark import fixtures as FX  # noqa: E402
from samu_ocr_extraction_poc_spark.plans.pipeline import extract_document  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden_results.json")

KEEP = [
    "doc_id", "doc_type", "status", "out_spans", "pages", "header",
    "paragraphs", "entities", "sentiments", "key_phrases",
    "icd10_conditions", "prescriptions", "snomed_codes", "expenses_by_page",
    "email", "transcript", "raw_text",
]


def main() -> None:
    old = json.load(open(OUT)) if os.path.exists(OUT) else {}
    golden = {}
    for key, spans in FX.canonical_docs():
        row = extract_document(FX.doc_id_for(key), spans, FX.OCR_LOOKUP)
        golden[key] = {k: row[k] for k in KEEP}
    changed = [
        k for k in golden
        if k not in old or any(old[k].get(c) != golden[k][c] for c in KEEP)
    ]
    removed = [k for k in old if k not in golden]
    with open(OUT, "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
    print(f"wrote {OUT}: {len(golden)} docs; changed={changed or 'none'} removed={removed or 'none'}")
    if changed or removed:
        print("HAND-VERIFY the diff (git diff tests/golden_results.json) before committing.")


if __name__ == "__main__":
    main()
