"""Migration facade: the reference's three extractor entry points by name.

A reference user triggers extraction by uploading to a prefix
(``.../Medical/``, ``.../Correspondence/``, ``.../Pleadings/`` —
README.md:137-148); each prefix fans into one Lambda family. Here each
function takes the interleaved documents table, runs the SAME engine, and
returns that family's result rows with the reference's DynamoDB item shape
(type/subtype + family columns).

Confidence thresholds are parameters, mirroring the per-Lambda env config
(lib/medical-extractor/stack.ts:133-164).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.medical import DEFAULT_THRESHOLDS, Thresholds
from .plans.pipeline import run_extraction


def start_medical_extraction(
    docs: DataFrame,
    ocr_lookup: dict[str, str] | None = None,
    thresholds: Thresholds = DEFAULT_THRESHOLDS,
) -> DataFrame:
    """Medical family (StartMedicalExtraction,
    medical/stack.MedicalExtractor.ts:33-76 + downstream savers): returns
    doc_id, type, rawText-analog pages, icd10Conditions, prescriptions,
    snomedCodes, expensesByPage."""
    res = run_extraction(docs, ocr_lookup=ocr_lookup, thresholds=thresholds)
    return res.where(F.col("doc_type") == "medical").select(
        "doc_id",
        F.lit("medical").alias("type"),
        F.col("pages"),
        F.col("icd10_conditions").alias("icd10Conditions"),
        F.col("prescriptions"),
        F.col("snomed_codes").alias("snomedCodes"),
        F.col("expenses_by_page").alias("expensesByPage"),
        "status",
        "error",
    )


def start_correspondence_extraction(
    docs: DataFrame, ocr_lookup: dict[str, str] | None = None
) -> DataFrame:
    """Correspondence family (correspondence-extractor.text-extract.ts:9-164
    + text-saver): email/transcript/letter rows with type/subtype,
    extraction payload, entities/sentiments/keyPhrases."""
    res = run_extraction(docs, ocr_lookup=ocr_lookup)
    subtype = (
        F.when(F.col("doc_type") == "correspondence_email", "email")
        .when(F.col("doc_type") == "correspondence_transcript", "transcript")
        .otherwise(F.lit(None))
    )
    return res.where(F.col("doc_type").startswith("correspondence")).select(
        "doc_id",
        F.lit("correspondence").alias("type"),
        subtype.alias("subtype"),
        F.col("email").alias("extraction"),
        "transcript",
        "entities",
        "sentiments",
        F.col("key_phrases").alias("keyPhrases"),
        F.col("raw_text").alias("rawText"),
        "status",
        "error",
    )


def start_pleading_extraction(
    docs: DataFrame, ocr_lookup: dict[str, str] | None = None
) -> DataFrame:
    """Pleading family (stack.PleadingExtractor.ts:26-56 +
    pleading/stack.TextSaver.ts:186-244): header (queries + caption merged,
    reference field names), paragraphs, entities, rawText."""
    res = run_extraction(docs, ocr_lookup=ocr_lookup)
    return res.where(F.col("doc_type") == "pleading").select(
        "doc_id",
        F.lit("pleading").alias("type"),
        "header",
        "paragraphs",
        "entities",
        F.col("raw_text").alias("rawText"),
        "status",
        "error",
    )
